package graft

import org.apache.spark.sql.functions._
import graft.operators.Curate

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("mixSample honors per-source budgets and is deterministic") {
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val w = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val got = Curate.mixSample(docs, "doc_id", "source", w, 100)
    val counts = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts === Map("src0" -> 50L, "src1" -> 30L, "src2" -> 20L))
    val again = Curate.mixSample(docs, "doc_id", "source", w, 100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === got.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("packSequences: exclusive prefix sum buckets, per group") {
    val docs = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L),
      ("b", 4L, 900L), ("b", 5L, 50L)).toDF("g", "id", "tokens")
    val packs = Curate.packSequences(docs, Seq("g"), Seq(col("id")),
      "tokens", 500L)
      .select("g", "id", "pack_id").as[(String, Long, Long)].collect()
      .map { case (g, id, p) => (g, id) -> p }.toMap
    // a: cum-excl 0,300,600 → packs 0,0,1 ; b: 0,900 → 0,1
    assert(packs === Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("b", 4L) -> 0L, ("b", 5L) -> 1L))
  }

  test("funnel counts each stage independently plus the intersection") {
    val df = Seq((1, 10, true), (2, 100, true), (3, 100, false), (4, 5, false))
      .toDF("id", "v", "flag").withColumn("g", lit("all"))
    val r = Curate.funnel(df, Seq("g"), Seq(
      "big" -> (col("v") >= 50), "flagged" -> col("flag"))).collect().head
    assert(r.getAs[Long]("n_total") === 4L)
    assert(r.getAs[Long]("n_big") === 2L)
    assert(r.getAs[Long]("n_flagged") === 2L)
    assert(r.getAs[Long]("n_all") === 1L) // only id=2
  }
}
