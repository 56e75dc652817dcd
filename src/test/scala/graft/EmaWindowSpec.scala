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
