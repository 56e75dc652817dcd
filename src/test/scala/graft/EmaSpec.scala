package graft

import org.apache.spark.sql.functions._
import graft.operators.Ema

/** EMA scan vs an in-memory reference of the riptable recurrences
  * (rt_fastarraynumba.py:507-561).
  */
class EmaSpec extends SparkSpec {
  import spark.implicits._

  private val data = Seq(
    (1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 30L, 3.0),
    (2L, 5L, 10.0), (2L, 6L, 20.0))

  private def refDecay(rate: Double): Map[(Long, Long), Double] = {
    data.groupBy(_._1).flatMap { case (k, rows) =>
      var acc = 0.0; var prevT = rows.head._2
      rows.sortBy(_._2).map { case (_, t, v) =>
        acc = v + acc * math.exp(-rate * (t - prevT)); prevT = t
        (k, t) -> acc
      }
    }
  }

  test("ema_decay matches reference recurrence") {
    val df = data.toDF("k", "t", "v")
    val out = Ema.ema(df, "k", "t", "v", rate = 0.1, Ema.Decay, "ema")
      .select("k", "t", "ema").as[(Long, Long, Double)].collect()
    val ref = refDecay(0.1)
    out.foreach { case (k, t, e) =>
      assert(math.abs(e - ref((k, t))) < 1e-12, s"key=$k t=$t")
    }
  }

  test("ema_weighted is fixed-alpha and time-independent") {
    val df = data.toDF("k", "t", "v")
    val out = Ema.ema(df, "k", "t", "v", rate = 0.5, Ema.Weighted, "ema")
      .filter($"k" === 2L).orderBy("t").select("ema").as[Double].collect()
    assert(out(0) === 10.0)
    assert(math.abs(out(1) - (0.5 * 20.0 + 0.5 * 10.0)) < 1e-12)
  }

  test("ema_normal equals plain value on first row of each key") {
    val df = data.toDF("k", "t", "v")
    val out = Ema.ema(df, "k", "t", "v", rate = 0.01, Ema.Normal, "ema")
      .orderBy("k", "t").select("k", "ema").as[(Long, Double)].collect()
    assert(out.head._2 === 1.0)   // first of k=1
    assert(out(3)._2 === 10.0)    // first of k=2
  }

  test("state resets across keys even in one partition") {
    val df = data.toDF("k", "t", "v").coalesce(1)
    val out = Ema.ema(df, "k", "t", "v", rate = 0.1, Ema.Decay, "ema")
      .filter($"k" === 2L).orderBy("t").select("ema").as[Double].collect()
    assert(out(0) === 10.0) // not contaminated by k=1's accumulator
  }
}
