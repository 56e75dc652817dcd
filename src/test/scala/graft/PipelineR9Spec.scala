package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sketch}

/** Round-9 pins: hot-shingle cross-corpus completeness under the
  * shared rare-first prefix order (old-corpus df since round 10),
  * and the one-distinct KMV+exact path.
  */
class PipelineR9Spec extends SparkSpec {
  import spark.implicits._

  private def shingles(t: String): Set[String] = {
    val toks = t.split("\\s+").map(_.toLowerCase).toSeq
    if (toks.size < 3) Set(toks.mkString(" "))
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("crossCorpusDupes stays complete on a HOT-shingle corpus: a " +
    "shingle shared by every doc must not blind the prefix filter") {
    // every doc opens with the same 3 tokens → one shingle with df =
    // |corpus| on both sides. Rare-first ordering (old-corpus df)
    // pushes it to the END of every doc's sorted shingle array, so
    // prefixes hold
    // only the rare discriminating shingles; the r8 raw-hash order
    // could land it in every prefix (fat posting list) — and a BROKEN
    // order could push rare shingles out and lose pairs. Equality with
    // brute force proves candidates ⊇ exact pairs survived the reorder.
    val hot = "common prefix tokens"
    val newDocs = Seq(
      (1L, s"$hot a b c d e"),
      (3L, s"$hot a b c d f"),
      (5L, s"$hot x y z w v"),
      (7L, s"$hot completely distinct tail here")
    ).toDF("doc_id", "text")
    val oldDocs = Seq(
      (2L, s"$hot a b c d e"), // exact dup of 1
      (4L, s"$hot a b c q f"), // near 3
      (6L, s"$hot different material on this side"),
      (8L, s"$hot x y z w k") // near 5
    ).toDF("doc_id", "text")
    val tau = 0.5
    val got = Dedup.crossCorpusDupes(newDocs, oldDocs, "doc_id", "text",
      shingleN = 3, threshold = tau)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val nS = newDocs.as[(Long, String)].collect().map { case (i, t) => i -> shingles(t) }
    val oS = oldDocs.as[(Long, String)].collect().map { case (i, t) => i -> shingles(t) }
    val want = (for {
      (ia, sa) <- nS; (ib, sb) <- oS
      co = (sa & sb).size
      j = co.toDouble / (sa.size + sb.size - co) if j >= tau
    } yield (ia, ib) -> (math.round(j * 1e6) / 1e6)).toMap
    assert(want.nonEmpty && want.size >= 3)
    assert(got.keySet === want.keySet)
    want.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-9, k) }
  }

  test("kmvWithExact: n_exact equals countDistinct, estimate equals " +
    "kmvDistinct, and the distinct pass is registry-shared") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"v${i % 700}"))
      .toDF("g", "v")
    val hits0 = Dedup.registryHits
    val got = Sketch.kmvWithExact(df, Seq("g"), col("v"), 64)
      .orderBy(col("g"))
      .select(col("g"), col("n_exact"), col("distinct_est"), col("sketch_size"))
      .as[(String, Long, Double, Long)].collect()
    // exact side: distinct hashes == distinct values (no collisions at
    // this size, guaranteed here by construction)
    val want = df.distinct().groupBy(col("g")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (g, n, _, _) => assert(n === want(g), g) }
    // sketch side: bit-identical to the standalone kmvDistinct
    val solo = Sketch.kmvDistinct(df, Seq("g"), col("v"), 64)
      .select(col("g"), col("distinct_est"), col("sketch_size"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got.foreach { case (g, _, est, sz) => assert((est, sz) === solo(g), g) }
    // a REPEATED build resolves its distinct pass through the registry
    // (the q187-in-a-long-session shape): hits must accrue
    Sketch.kmvWithExact(df, Seq("g"), col("v"), 64).count()
    assert(Dedup.registryHits > hits0)
  }

  test("KmvAgg (bounded-buffer Aggregator) is bit-identical to the " +
    "plan-form kmvDistinct, partition-invariant, null-skipping") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      (s"g${i % 4}",
        if (i % 97 == 0) null else s"v${rnd.nextInt(if (i % 2 == 0) 40 else 4000)}")
    }
    val df = rows.toDF("g", "v") // g0/g2 stay under k=64; g1/g3 overflow
    val plan = Sketch.kmvDistinct(df.filter(col("v").isNotNull),
        Seq("g"), col("v"), 64)
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for (parts <- Seq(1, 7)) {
      val agg = df.repartition(parts).groupBy(col("g"))
        .agg(Sketch.kmvUdaf(64)(Dedup.portableHash64(col("v"))).as("s"))
        .select(col("g"), col("s.distinct_est"), col("s.sketch_size"))
        .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(agg === plan, s"parts=$parts")
    }
    // under-k groups report exactly their distinct count
    val exact = df.filter(col("v").isNotNull).select("g", "v").distinct()
      .groupBy("g").count().as[(String, Long)].collect().toMap
    plan.foreach { case (g, (est, sz)) =>
      if (sz < 64) assert(est === exact(g).toDouble && sz === exact(g), g)
    }
  }
}
