package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** merge_asof semantics (rt_merge.py:3572, rt_merge_asof.py:1251):
  * directions, allow_exact_matches, tolerance, by-groups, matched_on.
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  // left: (grp, t, lid); right: (grp, t, rv)
  private def l = Seq(
    ("g1", 10L, 1), ("g1", 20L, 2), ("g1", 30L, 3),
    ("g2", 15L, 4)
  ).toDF("g", "t", "lid")

  private def r = Seq(
    ("g1", 5L, 100.0), ("g1", 20L, 200.0), ("g1", 25L, 300.0),
    ("g2", 50L, 400.0)
  ).toDF("g", "t", "rv")

  private def run(dir: String, exact: Boolean = true, tol: Option[Long] = None) =
    AsofJoin.asof(l, r, on = "t", by = Seq("g"), rightCols = Seq("rv"),
      direction = dir, allowExactMatches = exact, tolerance = tol)
      .select("lid", "rv").as[(Int, Option[Double])].collect().toMap

  test("backward picks latest at-or-before") {
    assert(run("backward") === Map(
      1 -> Some(100.0), 2 -> Some(200.0), 3 -> Some(300.0), 4 -> None))
  }

  test("backward without exact matches skips equal timestamps") {
    assert(run("backward", exact = false)(2) === Some(100.0))
  }

  test("forward picks earliest at-or-after") {
    assert(run("forward") === Map(
      1 -> Some(200.0), 2 -> Some(200.0), 3 -> None, 4 -> Some(400.0)))
  }

  test("nearest prefers smaller delta, backward on tie") {
    // lid=1 t=10: back=5 (d=5), fwd=20 (d=10) → back
    // lid=3 t=30: back=25 (d=5), fwd=none → back
    assert(run("nearest") === Map(
      1 -> Some(100.0), 2 -> Some(200.0), 3 -> Some(300.0), 4 -> Some(400.0)))
  }

  test("tolerance nulls out matches beyond the bound") {
    assert(run("backward", tol = Some(4L)) === Map(
      1 -> None, 2 -> Some(200.0), 3 -> None, 4 -> None))
  }

  test("matched_on reports the matched right timestamp") {
    val out = AsofJoin.asof(l, r, "t", Seq("g"), Seq("rv"),
      direction = "backward", matchedOn = true)
      .select("lid", "matched_on").as[(Int, Option[Long])].collect().toMap
    assert(out === Map(1 -> Some(5L), 2 -> Some(20L), 3 -> Some(25L), 4 -> None))
  }

  test("by-groups never cross-match") {
    val out = run("backward")
    assert(out(4) === None) // g2 right row is at t=50, after left t=15
  }
}
