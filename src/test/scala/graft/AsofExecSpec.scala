package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** The custom sort-merge AsofJoinExec must agree with the union+window
  * formulation — two independent implementations of merge_asof backward.
  */
class AsofExecSpec extends SparkSpec {
  import spark.implicits._

  private def l = Seq(
    (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), (2L, 15L, 4), (3L, 5L, 5)
  ).toDF("g", "t", "lid")
  private def r = Seq(
    (1L, 5L, 100.0), (1L, 20L, 200.0), (1L, 25L, 300.0), (2L, 50L, 400.0)
  ).toDF("g", "t", "rv")

  test("exec plan uses AsofJoinExec") {
    val out = AsofJoin.asofExec(l, r, "t", Seq("g"), Seq("rv"))
    assert(out.queryExecution.executedPlan.toString.contains("AsofJoin"))
  }

  test("exec matches window formulation on crafted data") {
    for (exact <- Seq(true, false); tol <- Seq(None, Some(4L))) {
      val exec = AsofJoin.asofExec(l, r, "t", Seq("g"), Seq("rv"),
        allowExactMatches = exact, tolerance = tol)
        .select("lid", "rv").as[(Int, Option[Double])].collect().toMap
      val win = AsofJoin.asof(l, r, "t", Seq("g"), Seq("rv"),
        direction = "backward", allowExactMatches = exact, tolerance = tol)
        .select("lid", "rv").as[(Int, Option[Double])].collect().toMap
      assert(exec === win, s"exact=$exact tol=$tol")
    }
  }

  test("exec forward direction matches window forward") {
    for (exact <- Seq(true, false)) {
      val exec = AsofJoin.asofExec(l, r, "t", Seq("g"), Seq("rv"),
        allowExactMatches = exact, direction = "forward")
        .select("lid", "rv").as[(Int, Option[Double])].collect().toMap
      val win = AsofJoin.asof(l, r, "t", Seq("g"), Seq("rv"),
        direction = "forward", allowExactMatches = exact)
        .select("lid", "rv").as[(Int, Option[Double])].collect().toMap
      assert(exec === win, s"exact=$exact")
    }
  }

  test("exec matches window formulation on sf0.001 events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("tsu", expr("ts div 1000"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"tsu", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"tsu", $"value".as("pv"))
    val exec = AsofJoin.asofExec(clicks, purchases, "tsu", Seq("user_id"), Seq("pv"))
      .select("event_id", "pv").as[(Long, Option[Double])].collect().toMap
    val win = AsofJoin.asof(clicks, purchases, "tsu", Seq("user_id"), Seq("pv"))
      .select("event_id", "pv").as[(Long, Option[Double])].collect().toMap
    assert(exec.keySet === win.keySet)
    assert(exec === win)
  }
}
