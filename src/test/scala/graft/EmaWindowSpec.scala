package graft

import org.apache.spark.sql.functions._
import graft.operators.Ema

/** The native Catalyst EmaDecay window function (graft.plans) must agree
  * exactly with the mapPartitions scan (graft.operators.Ema) — two
  * independent implementations of rt_fastarraynumba.py:507's recurrence.
  */
class EmaWindowSpec extends SparkSpec {
  import spark.implicits._

  test("rip_ema_decay window function is registered and matches Ema.ema") {
    val df = Seq(
      (1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 30L, 3.0), (1L, 31L, 0.5),
      (2L, 5L, 10.0), (2L, 6L, 20.0), (2L, 100L, 1.0)
    ).toDF("k", "t", "v")

    val win = df.withColumn("ema",
      expr("rip_ema_decay(v, t, 0.1) OVER (PARTITION BY k ORDER BY t " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .select("k", "t", "ema").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val scan = Ema.ema(df, "k", "t", "v", rate = 0.1, Ema.Decay, "ema")
      .select("k", "t", "ema").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    assert(win.keySet === scan.keySet)
    win.foreach { case (k, v) => assert(math.abs(v - scan(k)) < 1e-12, s"$k") }
  }

  test("rip_ema_normal matches the Ema.Normal scan") {
    val df = Seq(
      (1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 30L, 3.0),
      (2L, 5L, 10.0), (2L, 6L, 20.0)
    ).toDF("k", "t", "v")
    val win = df.withColumn("ema",
      expr("rip_ema_normal(v, t, 0.1) OVER (PARTITION BY k ORDER BY t " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .select("k", "t", "ema").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val scan = Ema.ema(df, "k", "t", "v", rate = 0.1, Ema.Normal, "ema")
      .select("k", "t", "ema").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(win.keySet === scan.keySet)
    win.foreach { case (k, v) => assert(math.abs(v - scan(k)) < 1e-12, s"$k") }
  }

  test("rip_ema_weighted matches the Ema.Weighted scan") {
    val df = Seq(
      (1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 30L, 3.0),
      (2L, 5L, 10.0), (2L, 6L, 20.0)
    ).toDF("k", "t", "v")
    val win = df.withColumn("ema",
      expr("rip_ema_weighted(v, 0.5) OVER (PARTITION BY k ORDER BY t " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .select("k", "t", "ema").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val scan = Ema.ema(df, "k", "t", "v", rate = 0.5, Ema.Weighted, "ema")
      .select("k", "t", "ema").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(win.keySet === scan.keySet)
    win.foreach { case (k, v) => assert(math.abs(v - scan(k)) < 1e-12, s"$k") }
  }

  test("filter/reset grids: window exprs match the Ema scan for all kinds") {
    // deterministic pseudo-random grid: 2 keys × 12 rows with filter and
    // reset masks exercising filtered-out resets (ignored), resets on
    // row 0, consecutive resets, and filtered runs
    val rows = for {
      k <- Seq(1L, 2L); i <- 0 until 12
    } yield {
      val h = (k * 31 + i * 7) % 13
      (k, i * 10L + (h % 3), (h % 7).toDouble,
        h % 3 != 0,           // filter: ~2/3 pass
        h % 5 == 0)           // reset: sparse
    }
    val df = rows.toDF("k", "t", "v", "f", "r")
    val over = "OVER (PARTITION BY k ORDER BY t " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    def collectMap(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "t", "ema").as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    for ((kind, sqlExpr) <- Seq(
      Ema.Decay -> s"rip_ema_decay(v, t, 0.07, f, r) $over",
      Ema.Normal -> s"rip_ema_normal(v, t, 0.07, f, r) $over",
      Ema.Weighted -> s"rip_ema_weighted(v, 0.07, f, r) $over")) {
      val win = collectMap(df.withColumn("ema", expr(sqlExpr)))
      val scan = collectMap(Ema.ema(df, "k", "t", "v", rate = 0.07, kind,
        "ema", filterCol = Some("f"), resetCol = Some("r")))
      assert(win.keySet === scan.keySet, s"$kind")
      win.foreach { case (key, v) =>
        assert(math.abs(v - scan(key)) < 1e-12, s"$kind at $key") }
    }
  }

  test("3-arg EMA window form still works (back-compat)") {
    val df = Seq((1L, 0L, 2.0), (1L, 5L, 4.0)).toDF("k", "t", "v")
    val out = df.withColumn("ema",
      expr("rip_ema_decay(v, t, 0.1) OVER (PARTITION BY k ORDER BY t " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .orderBy("t").select("ema").as[Double].collect()
    assert(out(0) === 2.0)
    assert(math.abs(out(1) - (4.0 + 2.0 * math.exp(-0.5))) < 1e-12)
  }

  test("null values carry decay without contributing (invalid semantics)") {
    val df = Seq[(Long, Long, java.lang.Double)](
      (1L, 0L, 10.0), (1L, 10L, null), (1L, 20L, 0.0)
    ).toDF("k", "t", "v")
    val out = df.withColumn("ema",
      expr("rip_ema_decay(v, t, 0.1) OVER (PARTITION BY k ORDER BY t " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .orderBy("t").select("ema").as[Double].collect()
    assert(out(0) === 10.0)
    assert(math.abs(out(1) - 10.0 * math.exp(-1.0)) < 1e-12)
    assert(math.abs(out(2) - 10.0 * math.exp(-2.0)) < 1e-12)
  }
}
