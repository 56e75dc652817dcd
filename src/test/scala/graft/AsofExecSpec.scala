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

  test("exec nearest matches window nearest (exact/tolerance grid)") {
    for (exact <- Seq(true, false); tol <- Seq(None, Some(4L))) {
      val exec = AsofJoin.asofExec(l, r, "t", Seq("g"), Seq("rv"),
        allowExactMatches = exact, tolerance = tol, direction = "nearest")
        .select("lid", "rv").as[(Int, Option[Double])].collect().toMap
      val win = AsofJoin.asof(l, r, "t", Seq("g"), Seq("rv"),
        direction = "nearest", allowExactMatches = exact, tolerance = tol)
        .select("lid", "rv").as[(Int, Option[Double])].collect().toMap
      assert(exec === win, s"exact=$exact tol=$tol")
    }
  }

  test("exec matched_on equals window matched_on across directions " +
    "(rt_merge.py:3572 matched_on parity)") {
    for (dir <- Seq("backward", "forward", "nearest");
         exact <- Seq(true, false); tol <- Seq(None, Some(4L))) {
      val exec = AsofJoin.asofExec(l, r, "t", Seq("g"), Seq("rv"),
        allowExactMatches = exact, tolerance = tol, direction = dir,
        matchedOn = true)
        .select("lid", "rv", "matched_on")
        .as[(Int, Option[Double], Option[Long])].collect()
        .map(x => x._1 -> (x._2, x._3)).toMap
      val win = AsofJoin.asof(l, r, "t", Seq("g"), Seq("rv"),
        direction = dir, allowExactMatches = exact, tolerance = tol,
        matchedOn = true)
        .select("lid", "rv", "matched_on")
        .as[(Int, Option[Double], Option[Long])].collect()
        .map(x => x._1 -> (x._2, x._3)).toMap
      assert(exec === win, s"dir=$dir exact=$exact tol=$tol")
      // unmatched rows must null matched_on too
      exec.foreach { case (lid, (rv, mo)) =>
        assert(rv.isDefined === mo.isDefined, s"lid=$lid dir=$dir") }
    }
  }

  test("exec nearest ties break backward; equal-time runs resolved") {
    // right has duplicate times straddling lids: t=20 twice, left t=20
    val rr = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 20L, 3.0), (1L, 30L, 4.0))
      .toDF("g", "t", "rv")
    val ll = Seq((1L, 20L, 1), (1L, 25L, 2)).toDF("g", "t", "lid")
    // allowExact: backward candidate is the LAST t=20 row (3.0)
    val withExact = AsofJoin.asofExec(ll, rr, "t", Seq("g"), Seq("rv"),
      direction = "nearest").select("lid", "rv")
      .as[(Int, Option[Double])].collect().toMap
    assert(withExact(1) === Some(3.0))
    assert(withExact(2) === Some(3.0)) // |25-20| == |30-25| → backward
    // !allowExact: t=20 ineligible for lid 1 → nearest is t=10 (d=10) vs
    // t=30 (d=10) → tie → backward (1.0)
    val noExact = AsofJoin.asofExec(ll, rr, "t", Seq("g"), Seq("rv"),
      direction = "nearest", allowExactMatches = false).select("lid", "rv")
      .as[(Int, Option[Double])].collect().toMap
    assert(noExact(1) === Some(1.0))
  }

  test("null by-keys and null times never match (rt_merge.py:2320)") {
    val ln = Seq[(java.lang.Long, java.lang.Long, Int)](
      (1L, 10L, 1), (null, 10L, 2), (1L, null, 3)
    ).toDF("g", "t", "lid")
    val rn = Seq[(java.lang.Long, java.lang.Long, Double)](
      (1L, 5L, 100.0), (null, 5L, 666.0), (1L, null, 667.0)
    ).toDF("g", "t", "rv")
    for (dir <- Seq("backward", "nearest")) {
      val out = AsofJoin.asofExec(ln, rn, "t", Seq("g"), Seq("rv"),
        direction = dir)
        .select("lid", "rv").as[(Int, Option[Double])].collect().toMap
      assert(out(1) === Some(100.0), dir) // valid row still matches
      assert(out(2) === None, s"null key matched ($dir)")
      assert(out(3) === None, s"null time matched ($dir)")
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
