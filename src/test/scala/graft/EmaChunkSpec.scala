package graft

import org.apache.spark.sql.functions._
import graft.operators.Ema

/** Chunk-parallel EMA (r15): the linear-recurrence decomposition
  * ema_i = L_i + C·exp(−rate·(t_i − T_prev)) must match the sequential
  * mapPartitions scan to ≤ 1e-9 relative (the two differ only by FP
  * association: one exp of the total gap vs the product of per-step
  * exps), across chunk geometries, gappy keys, nulls, and ties; and at
  * rate = 0 the decomposition is an EXACT distributed cumsum.
  */
class EmaChunkSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // key 1: dense irregular tape straddling many width-10 chunks,
    // chunk 2 EMPTY (carry must bridge the gap with one long decay)
    (1L, 1L, 1L, 2.0), (1L, 2L, 4L, 1.0), (1L, 3L, 9L, 3.0),
    (1L, 4L, 11L, 5.0), (1L, 5L, 13L, 2.0), (1L, 6L, 19L, 1.0),
    (1L, 7L, 35L, 4.0), (1L, 8L, 36L, 1.0), (1L, 9L, 58L, 2.5),
    // key 2: single row
    (2L, 10L, 7L, 6.0),
    // key 3: near-adjacent rows crossing a width-10 boundary
    (3L, 11L, 5L, 1.0), (3L, 12L, 6L, 2.0), (3L, 13L, 25L, 3.0),
    // key 4: gappy single-row chunks
    (4L, 14L, 2L, 3.0), (4L, 15L, 31L, 7.0), (4L, 16L, 75L, 11.0),
    (4L, 17L, 120L, 13.0)
  )

  test("emaDecayChunked matches the sequential scan to 1e-9 relative " +
    "across chunk widths, empty chunks, ties, and null values") {
    val df = rows.toDF("k", "id", "t", "v")
      // planted null: contributes 0 but still decays state (both paths)
      .withColumn("v", when(col("id") === 6L, lit(null)).otherwise(col("v")))
    for (rate <- Seq(0.05, 1.0); w <- Seq(1L, 10L, 1000L)) {
      val got = Ema.emaDecayChunked(df, "k", "t", "id", "v", rate, "ema", w)
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      val want = Ema.ema(df.orderBy("id"), "k", "t", "v", rate, Ema.Decay, "ema")
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      assert(got.length === want.length)
      got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"rate=$rate w=$w row $i: chunked $g vs sequential $e")
      }
    }
  }

  test("same-timestamp ties break on the tie column consistently at " +
    "every chunk width (the sequential scan has no tie contract, so " +
    "ties are pinned chunked-vs-chunked)") {
    val df = Seq(
      (1L, 1L, 5L, 1.0), (1L, 2L, 5L, 2.0), (1L, 3L, 5L, 4.0),
      (1L, 4L, 12L, 8.0), (1L, 5L, 12L, 16.0)
    ).toDF("k", "id", "t", "v")
    val outs = Seq(1L, 10L, 1000L).map { w =>
      Ema.emaDecayChunked(df, "k", "t", "id", "v", 0.25, "ema", w)
        .orderBy("id").select("ema").as[Double].collect().toSeq
    }
    // width 1000 = one chunk = pure sequential window scan: the
    // reference ordering; every other width must agree to FP tolerance
    outs.foreach { o =>
      o.zip(outs.last).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"tie row $i: $g vs $e")
      }
    }
    // and the tie ORDER is the planted one: at t=5 the running ema
    // folds ids 1,2,3 in id order (1, then 1+2, then 3+4 — exp(0)=1)
    assert(outs.last.take(3) === Seq(1.0, 3.0, 7.0))
  }

  test("emaNormalChunked matches the sequential normal scan to 1e-9 " +
    "relative across chunk widths, empty chunks, and null values " +
    "(null: +0 to the numerator, +1 to the denominator)") {
    val df = rows.toDF("k", "id", "t", "v")
      .withColumn("v", when(col("id") === 6L, lit(null)).otherwise(col("v")))
    for (rate <- Seq(0.05, 1.0); w <- Seq(1L, 10L, 1000L)) {
      val got = Ema.emaNormalChunked(df, "k", "t", "id", "v", rate, "ema", w)
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      val want = Ema.ema(df.orderBy("id"), "k", "t", "v", rate, Ema.Normal, "ema")
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      assert(got.length === want.length)
      got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"rate=$rate w=$w row $i: chunked $g vs sequential $e")
      }
    }
  }

  test("pre-1970 tapes: negative timestamps with rate·|t| past the exp " +
    "overflow point must not poison the zero-carry seed (0·∞ = NaN)") {
    // epoch-us around −1e12 (1938); rate 0.001 → rate·|t| ≈ 1e9 ≫ 709,
    // so exp(−rate·(t − 0)) overflows to +∞ against the (e=0, t=0) seed
    // unless the exponent is clamped. The sequential scan seeds prevT
    // from the first row and is immune — it is the oracle here.
    val df = Seq(
      (1L, 1L, -1000000000000L, 2.0), (1L, 2L, -999999999900L, 1.0),
      (1L, 3L, -999999999800L, 3.0), (1L, 4L, -999999999650L, 5.0),
      (2L, 5L, -999999999990L, 7.0)
    ).toDF("k", "id", "t", "v")
    for (w <- Seq(100L, 250L)) {
      val got = Ema.emaDecayChunked(df, "k", "t", "id", "v", 0.001, "ema", w)
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      val want = Ema.ema(df.orderBy("id"), "k", "t", "v", 0.001, Ema.Decay, "ema")
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      assert(got.length === want.length)
      got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
        assert(!g.isNaN, s"w=$w row $i: chunked EMA is NaN on a pre-1970 tape")
        assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"w=$w row $i: chunked $g vs sequential $e")
      }
      // the normalized form shares the clamped seed — same immunity
      val gotN = Ema.emaNormalChunked(df, "k", "t", "id", "v", 0.001, "ema", w)
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      val wantN = Ema.ema(df.orderBy("id"), "k", "t", "v", 0.001,
        Ema.Normal, "ema")
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      gotN.zip(wantN).zipWithIndex.foreach { case ((g, e), i) =>
        assert(!g.isNaN, s"w=$w row $i: chunked normal EMA is NaN pre-1970")
        assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"w=$w row $i: chunked normal $g vs sequential $e")
      }
    }
  }

  test("filter=/reset= ride the chunked decomposition (r16): both forms " +
    "match the sequential filter/reset scan across chunk widths — " +
    "resets mid-chunk, at chunk starts, on filtered-OUT rows (ignored), " +
    "and with null flags") {
    val df = rows.toDF("k", "id", "t", "v")
      // filter: odd ids pass; id=8's flag is NULL (fails, like the scan);
      // v null on id=6 (contributes 0 either way)
      .withColumn("f", when(col("id") === 8L, lit(null).cast("boolean"))
        .otherwise(col("id") % 2 === 1))
      // resets: id=5 (mid-chunk, filtered-in), id=7 (chunk-start,
      // filtered-in), id=4 (filtered-OUT — must be IGNORED), id=15
      // (single-row chunk on gappy key 4), id=12's flag NULL (no reset)
      .withColumn("r", when(col("id") === 12L, lit(null).cast("boolean"))
        .otherwise(col("id").isin(4L, 5L, 7L, 15L)))
      .withColumn("v", when(col("id") === 6L, lit(null)).otherwise(col("v")))
    for (rate <- Seq(0.05, 1.0); w <- Seq(1L, 10L, 1000L)) {
      val got = Ema.emaDecayChunked(df, "k", "t", "id", "v", rate, "ema", w,
          filterCol = Some("f"), resetCol = Some("r"))
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      val want = Ema.ema(df.orderBy("id"), "k", "t", "v", rate, Ema.Decay,
          "ema", filterCol = Some("f"), resetCol = Some("r"))
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      assert(got.length === want.length)
      got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"decay rate=$rate w=$w row $i: chunked $g vs sequential $e")
      }
      val gotN = Ema.emaNormalChunked(df, "k", "t", "id", "v", rate, "ema", w,
          filterCol = Some("f"), resetCol = Some("r"))
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      val wantN = Ema.ema(df.orderBy("id"), "k", "t", "v", rate, Ema.Normal,
          "ema", filterCol = Some("f"), resetCol = Some("r"))
        .orderBy("k", "t", "id").select("ema").as[Double].collect()
      gotN.zip(wantN).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"normal rate=$rate w=$w row $i: chunked $g vs sequential $e")
      }
    }
  }

  test("filter WITHOUT reset needs no gates: the chunked plan carries " +
    "no reset-seen window column and still matches the scan") {
    val df = rows.toDF("k", "id", "t", "v")
      .withColumn("f", col("id") % 2 === 1)
    val got = Ema.emaDecayChunked(df, "k", "t", "id", "v", 0.3, "ema", 10L,
        filterCol = Some("f"))
      .orderBy("k", "t", "id").select("ema").as[Double].collect()
    val want = Ema.ema(df.orderBy("id"), "k", "t", "v", 0.3, Ema.Decay,
        "ema", filterCol = Some("f"))
      .orderBy("k", "t", "id").select("ema").as[Double].collect()
    got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"row $i: $g vs $e")
    }
  }

  test("emaDecayChunked at rate 0 is an exact distributed cumsum " +
    "(dyadic values: addition association-free)") {
    val df = rows.toDF("k", "id", "t", "v")
    val got = Ema.emaDecayChunked(df, "k", "t", "id", "v", 0.0, "ema", 10L)
      .orderBy("k", "t", "id").select("ema").as[Double].collect().toSeq
    val want = df
      .withColumn("ema", sum(col("v")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
          .orderBy(col("t"), col("id"))
          .rowsBetween(Long.MinValue, 0)))
      .orderBy("k", "t", "id").select("ema").as[Double].collect().toSeq
    assert(got === want)
  }

  test("q272 plan: the local EMA window partitions by (key, chunk) — " +
    "a hot group cannot serialize through one scan task") {
    val df = SparkEntry.queries("q272_ema_chunked")(spark,
      "/root/testdata/sf0.001")
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(user_id") &&
      plan.contains("__c"),
      s"chunked EMA lost its (key, chunk) window partitioning:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
