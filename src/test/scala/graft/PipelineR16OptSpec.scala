package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** Round-16 optimization pins: restructured operators must be
  * bit-identical to the originals they replace (the oracle gate has no
  * float tolerance, so "equivalent" means EQUAL).
  */
class PipelineR16OptSpec extends SparkSpec {
  import spark.implicits._

  test("histAndExactQuantiles == histQuantiles ⋈ exactQuantiles, bit for bit") {
    // mixed-sign, duplicate-heavy, skewed values + nulls — the shapes
    // that stress bin edges, ties, and the k1/k2 interpolation
    val xs = (1 to 4000).map(i => ((i * 2654435761L) % 9973).toDouble / 7.0 - 500.0) ++
      Seq.fill(500)(42.0) ++ (1 to 200).map(_.toDouble * 1e6)
    val df = (xs.map(Option(_)) ++ Seq.fill(30)(Option.empty[Double]))
      .toDF("x").repartition(7)
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val fused = Sketch.histAndExactQuantiles(df, col("x"), 256, qs)
      .select(col("q"), col("hist_est"), col("exact_val"))
      .orderBy(col("q")).as[(Double, Double, Double)].collect()
    val hist = Sketch.histQuantiles(df, col("x"), 256, qs)
    val exact = Sketch.exactQuantiles(df, col("x"), qs)
    val unfused = hist.join(exact, Seq("q"))
      .select(col("q"), col("hist_est"), col("exact_val"))
      .orderBy(col("q")).as[(Double, Double, Double)].collect()
    assert(fused.length === qs.length)
    assert(fused.toSeq === unfused.toSeq)
    // partition-invariance of the fused form (same pin the originals carry)
    val again = Sketch.histAndExactQuantiles(df.repartition(31), col("x"), 256, qs)
      .select(col("q"), col("hist_est"), col("exact_val"))
      .orderBy(col("q")).as[(Double, Double, Double)].collect()
    assert(again.toSeq === fused.toSeq)
  }

  test("issortedMulti == issorted per column, including boundary violations") {
    import graft.operators.Rolling
    // sorted-by-id frame where: a is globally sorted, b is sorted within
    // partitions but violates at a partition BOUNDARY (the stitch must
    // catch it), c has an in-partition violation
    val rows = (1 to 5000).map { i =>
      val a = i.toDouble
      val b = if (i <= 2500) i.toDouble else i.toDouble - 3000.0
      val c = if (i == 1234) 1e9 else i.toDouble
      (i.toLong, a, b, c)
    }
    val df = rows.toDF("id", "a", "b", "c")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    val multi = Rolling.issortedMulti(df, Seq("a", "b", "c"))
    val singles = Seq("a", "b", "c").map(Rolling.issorted(df, _))
    assert(multi === singles)
    assert(multi === Seq(true, false, false))
    // single-partition and empty-partition shapes
    val tiny = Seq((1L, 1.0, 2.0)).toDF("id", "a", "b").repartition(4)
    assert(Rolling.issortedMulti(tiny, Seq("a", "b")) === Seq(true, true))
  }

  test("projection shingleHashes == independent in-memory shingle builder") {
    import graft.operators.Dedup
    // shapes that stress the rewrite: short docs (< n tokens), empty
    // text, repeated shingles (dropDuplicates), multi-space runs
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b"), (3L, ""), (4L, "x"),
      (5L, "a b c a b c a b c"), (6L, "one  two   three four")
    ).toDF("doc_id", "text").repartition(3)
    val n = 3
    val got = Dedup.shingleHashes(docs, "doc_id", "text", n)
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("sh"))).as("shs"))
      .as[(Long, Seq[Long])].collect().toMap
    // brute force, sharing NO code with the operator: tokenize like
    // TextFns.tokens (trim, lowercase, whitespace split — empty text
    // yields the single empty token, as Spark's split does), join
    // n-grams with spaces, whole text when shorter than n, distinct
    def toks(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").toSeq
    val expected = Seq(
      1L -> "a b c d e", 2L -> "a b", 3L -> "", 4L -> "x",
      5L -> "a b c a b c a b c", 6L -> "one  two   three four"
    ).map { case (id, s) =>
      val t = toks(s)
      val grams =
        if (t.size < n) Seq(t.mkString(" "))
        else t.sliding(n).map(_.mkString(" ")).toSeq
      id -> grams.distinct
    }.toMap
    // compare via Spark's own xxhash64 so the hash definition is the
    // engine's, not re-implemented here
    val hashOf = expected.values.flatten.toSeq.distinct.toDF("g")
      .select(col("g"), xxhash64(col("g")).as("h"))
      .as[(String, Long)].collect().toMap
    for ((id, grams) <- expected)
      assert(got(id) === grams.map(hashOf).sorted, s"doc $id")
  }
}
