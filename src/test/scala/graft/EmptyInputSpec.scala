package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions._

/** Empty-frame robustness: every operator family must degrade to an
  * empty (or correctly-shaped) result on zero rows — the edge a
  * partition-pruned 100 TB scan hits constantly (a filter that matches
  * nothing, a date range with no files). No operator may throw.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyKV = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")

  test("dedup pipelines on an empty corpus") {
    assert(Dedup.exactDupGroups(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.minhashVerifiedPairs(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.editDistancePairs(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", "text").count() === 0)
  }

  test("connected components of an empty pair set") {
    val cc = Cluster.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
    assert(cc.count() === 0)
  }

  test("rolling / EMA / groupby on an empty frame") {
    assert(Ema.ema(emptyKV, "k", "t", "v", 0.1).count() === 0)
    assert(Rolling.rollingAgg(emptyKV, Seq("k"), Seq(col("t")), 3,
      sum(_), "v", "out").count() === 0)
    assert(GroupOps.trimbr(emptyKV, Seq("k"), "v").count() === 0)
  }

  test("binning and stats on an empty frame") {
    val e = Seq.empty[(Double, Long)].toDF("v", "id")
    assert(Binning.qcut(e, "v", "id", 4).count() === 0)
    assert(Binning.qcutBoundaries(e, "v", 4).count() === 0)
    assert(Stats.classError(emptyKV.withColumnRenamed("t", "p"), "k", "p")
      .count() === 1) // whole-table reduce: one row of nulls
    assert(syntax.partition2(e, "v", "id", 10, "bk").count() === 0)
  }

  test("sampling and splits on an empty frame") {
    val e = Seq.empty[(Long, Double)].toDF("id", "w")
    assert(Split.weightedSample(e, "id", "w", 5).count() === 0)
    assert(Split.trainTest(emptyDocs, "doc_id", 80).count() === 0)
  }

  test("accumCols and mergeCats on empty slices") {
    val e = Seq.empty[(String, Double)].toDF("k", "v")
    val out = Reshape.accumCols(e, "k",
      Seq(Reshape.AccumColSpec("sv", col("v"))))
    // empty group frame + recombined Total row over nothing
    assert(out.count() === 1)
    val (dict, stacked) = Categorical.mergeCats(Seq(
      (Categorical.encode(e, "k"), Categorical.categories(e, "k"))))
    assert(dict.count() === 0 && stacked.count() === 0)
  }
}
