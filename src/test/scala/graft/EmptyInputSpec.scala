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

  test("pageRank: empty edge set puts every node at the teleport floor; " +
    "empty node set yields an empty frame") {
    val n = Seq(1L, 2L, 3L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val r = Graph.pageRank(n, noEdges, iters = 3).select("rank")
      .as[Double].collect()
    assert(r.length === 3 && r.forall(v => math.abs(v - 0.15 / 3.0) < 1e-15))
    assert(Graph.pageRank(Seq.empty[Long].toDF("id"), noEdges, iters = 2)
      .count() === 0)
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

  test("round-7 sketches, span ops, scorer, and PCA on empty frames") {
    val eV = Seq.empty[String].toDF("v")
    assert(Sketch.countMinTopK(eV, col("v")).count() === 0)
    assert(Sketch.countMinTopKBy(
      Seq.empty[(String, String)].toDF("g", "v"), Seq("g"),
      col("v")).count() === 0)
    assert(Sketch.kmvWithExact(
      Seq.empty[(String, String)].toDF("g", "v"), Seq("g"), col("v"), 8)
      .count() === 0)
    assert(Sketch.histQuantiles(
      Seq.empty[Double].toDF("x"), col("x"), 16, Seq(0.5)).count() === 0)
    assert(Dedup.dupSpanStats(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.removeDupSpans(emptyDocs, "doc_id", "text").count() === 0)
    assert(Curate.hashedLinearScore(emptyDocs, "doc_id", "text")
      .count() === 0)
    val eE = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.covarianceMatrix(eE, "embedding").count() === 0)
    assert(Similarity.pc1(eE, "embedding").isEmpty)
    assert(Similarity.projectPc1(eE, "vec_id", "embedding").count() === 0)
    Dedup.clearDedupCaches()
  }

  test("AUC, UniMax, MAD, and PQ on empty frames") {
    val eSY = Seq.empty[(Int, Int)].toDF("s", "y")
    // whole-table reduce: one row of nulls (the classError convention)
    assert(Stats.rocAuc(eSY, col("s"), col("y")).count() === 1)
    val eST = Seq.empty[(String, Long)].toDF("src", "tok")
    assert(Curate.unimaxBudgets(eST, "src", col("tok"), 2.0, 0.5)
      .count() === 0)
    assert(Stats.madOutliers(eST, Seq("src"), "tok").count() === 0)
    val eE = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val pq = Similarity.pqTopK(eE, eE.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", "vec_id", k = 3)
    assert(pq.count() === 0)
    assert(pq.columns.toSeq ===
      Seq("query_id", "rank", "neighbor_id", "approx_dist"))
  }

  test("round-8 drift / shards / BPE on empty frames") {
    // drift matrix + shard publication degrade to empty results; BPE
    // learns no merges and segments nothing. (The TWO-source drift
    // operators deliberately RAISE on an empty side — that contract is
    // DriftSpec's fail-loud test, not an empty-degrade case.)
    val eCats = Seq.empty[(String, String)].toDF("cat", "src")
    assert(Drift.categoricalDriftMatrix(eCats, $"cat", $"src").count() === 0)
    val eIds = Seq.empty[Tuple1[Long]].toDF("id")
    val sh = Drift.publishShards(eIds, "id", nShards = 4, seed = 1L)
    assert(sh.count() === 0 &&
      sh.columns.toSeq === Seq("shard", "seq", "id"))
    assert(Bpe.bpeMerges(emptyDocs, "text", rounds = 3).count() === 0)
    assert(Bpe.bpeSegmentCounts(emptyDocs, "text",
      Seq(("a", "b"))).count() === 0)
    Dedup.clearDedupCaches()
  }

  test("round-11 trained PQ / IVF-PQ / leakage audit on empty frames") {
    val eE = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.pqTrainedCodebook(eE, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 2).isEmpty)
    val tp = Similarity.pqTrainedTopK(eE, eE, "vec_id", "embedding",
      "vec_id", k = 3, m = 2, ksub = 4, iters = 2)
    assert(tp.count() === 0 && tp.columns.toSeq ===
      Seq("query_id", "rank", "neighbor_id", "approx_dist"))
    val ivf = Similarity.ivfPqTrainedTopK(eE, eE, "vec_id", "embedding",
      "vec_id", k = 3, coarseK = 4, nprobe = 2, m = 2, ksub = 4, iters = 2)
    assert(ivf.count() === 0 && ivf.columns.toSeq ===
      Seq("query_id", "rank", "neighbor_id", "approx_dist"))
    assert(Similarity.crossSplitSemanticLeakage(eE, eE, "vec_id",
      "embedding", threshold = 0.4).count() === 0)
    Dedup.clearDedupCaches()
  }

  test("round-12 model artifacts on empty frames: ensure round-trips " +
    "the empty model, serve yields the empty result shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mdl-e").toString
    val eE = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // empty corpus → empty model, WRITTEN and re-read as such (a crash
    // here would make an empty partition in a production corpus fatal)
    val cent = Models.ensureCentroids(eE, "vec_id", "embedding", 4, 1,
      dir = dir)
    val cb = Models.ensureCodebook(eE, "vec_id", "embedding", 2, 4, 1,
      dir = dir)
    assert(cent.isEmpty && cb.isEmpty)
    val t0 = Models.trains
    assert(Models.ensureCentroids(eE, "vec_id", "embedding", 4, 1,
      dir = dir).isEmpty)
    assert(Models.trains === t0, "the empty artifact must serve reads")
    val served = Similarity.ivfPqSearchWith(eE, eE, "vec_id", "embedding",
      "vec_id", k = 3, cent, cb, nprobe = 2, m = 2)
    assert(served.count() === 0 && served.columns.toSeq ===
      Seq("query_id", "rank", "neighbor_id", "approx_dist"))
    val eDocs = Seq.empty[(Long, String, Boolean)].toDF("id", "text", "lbl")
    val w = Models.ensureWeights(eDocs, "id", "text", col("lbl"),
      buckets = 16, iters = 2, dir = dir)
    assert(w.length === 16 && w.forall(_ == 0L),
      "empty corpus trains to the zero weight vector, bucket-shaped")
    assert(Curate.scoreTextWith(eDocs, "id", "text", col("lbl"), w)
      .count() === 0)
    assert(Models.ensureBpeMerges(eDocs, "text", rounds = 2,
      dir = dir).isEmpty)
    Dedup.clearDedupCaches()
  }

  test("round-12 bloom / DSIR / recall audits on empty frames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mdl-b").toString
    // empty eval suite → all-zero artifact bitmap → gate passes nothing
    val bm = Models.ensureBloom(emptyDocs, "doc_id", "text",
      shingleN = 3, threshold = 0.7, mBits = 1 << 10, dir = dir)
    assert(bm.length === (1 << 10) / 64 && bm.forall(_ == 0L))
    val docs = Seq((1L, "some corpus text here")).toDF("doc_id", "text")
    assert(Dedup.crossContainmentBloomWith(emptyDocs, docs, "doc_id",
      "text", bm, shingleN = 3, threshold = 0.7).count() === 0)
    assert(Dedup.crossContainmentBloom(emptyDocs, docs, "doc_id", "text",
      shingleN = 3, threshold = 0.7).count() === 0)
    // empty corpus through the bloom gate
    assert(Dedup.crossContainmentBloom(docs, emptyDocs, "doc_id", "text",
      shingleN = 3, threshold = 0.7).count() === 0)
    // DSIR: empty raw → empty scores; empty target still scores raw
    // (pure smoothing — every bucket gets the same prior) without a throw
    assert(Curate.dsirWeights(emptyDocs, docs, "doc_id", "text")
      .count() === 0)
    assert(Curate.dsirWeights(docs, emptyDocs, "doc_id", "text")
      .count() === 1)
    // recall audits: empty query set → empty, schema intact
    val eE = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val b = Similarity.bruteForceTopKL2(eE, eE, "vec_id", "embedding",
      "vec_id", 3)
    assert(b.count() === 0 && b.columns.toSeq ===
      Seq("query_id", "rank", "neighbor_id", "dist"))
    // S-curve on an empty corpus: no pairs, no bins
    assert(Dedup.lshSCurve(emptyDocs, "doc_id", "text").count() === 0)
    Dedup.clearDedupCaches()
  }
}
