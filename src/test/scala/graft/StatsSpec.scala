package graft

import org.apache.spark.sql.functions._
import graft.functions.Stats
import graft.operators.{GroupOps, Rolling}

/** polyFit2 / classError / rollup-cube — the round-4 stats additions. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("polyFit2 recovers an exact quadratic") {
    // y = 2 + 3x + 0.5x² sampled without noise — the LSQ solution is
    // exact, and the centered coefficients must re-expand to it:
    // c2 = 0.5, c1 = b + 2*c2*xbar = 3 + xbar, c0 = y(xbar).
    val xs = (1 to 41).map(_.toDouble)
    val df = xs.map(x => ("g", x, 2.0 + 3.0 * x + 0.5 * x * x)).toDF("g", "x", "y")
    val r = Stats.polyFit2(df, "y", "x", Seq("g")).collect().head
    val xbar = r.getAs[Double]("xbar")
    assert(math.abs(xbar - 21.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("c2") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("c1") - (3.0 + xbar)) < 1e-9)
    assert(math.abs(r.getAs[Double]("c0") - (2.0 + 3.0 * xbar + 0.5 * xbar * xbar)) < 1e-9)
    assert(r.getAs[Long]("n") === 41L)
  }

  test("polyFit general degree: deg-3 recovers an exact cubic, deg-2 " +
    "agrees with polyFit2, bad degrees rejected") {
    // exact cubic y = 1 − 2x + 0.25x² + 0.1x³: the centered-basis fit
    // must re-expand to it via Taylor at xbar
    val xs = (1 to 41).map(_.toDouble)
    val df = xs.map(x => ("g", x, 1.0 - 2.0 * x + 0.25 * x * x + 0.1 * x * x * x))
      .toDF("g", "x", "y")
    val r3 = Stats.polyFit(df, "y", "x", Seq("g"), degree = 3).collect().head
    val xb = r3.getAs[Double]("xbar")
    def yAt(x: Double) = 1.0 - 2.0 * x + 0.25 * x * x + 0.1 * x * x * x
    assert(math.abs(r3.getAs[Double]("c0") - yAt(xb)) < 1e-6)
    assert(math.abs(r3.getAs[Double]("c1") -
      (-2.0 + 0.5 * xb + 0.3 * xb * xb)) < 1e-6)
    assert(math.abs(r3.getAs[Double]("c2") - (0.25 + 0.3 * xb)) < 1e-6)
    assert(math.abs(r3.getAs[Double]("c3") - 0.1) < 1e-8)
    assert(r3.getAs[Long]("n") === 41L)
    // degree-2 path agrees with the specialized polyFit2 solve
    val q = xs.map(x => ("g", x, 2.0 + 3.0 * x + 0.5 * x * x)).toDF("g", "x", "y")
    val a = Stats.polyFit(q, "y", "x", Seq("g"), degree = 2).collect().head
    val b = Stats.polyFit2(q, "y", "x", Seq("g")).collect().head
    for (cn <- Seq("c0", "c1", "c2"))
      assert(math.abs(a.getAs[Double](cn) - b.getAs[Double](cn)) < 1e-6, cn)
    intercept[IllegalArgumentException](Stats.polyFit(q, "y", "x", Seq("g"), 0))
    intercept[IllegalArgumentException](Stats.polyFit(q, "y", "x", Seq("g"), 5))
  }

  test("polyFit2 degree-2 beats lm on curved data and is grouped") {
    val df = (1 to 30).flatMap { i =>
      val x = i.toDouble
      Seq(("a", x, x * x), ("b", x, 10.0 * x))
    }.toDF("g", "x", "y")
    val out = Stats.polyFit2(df, "y", "x", Seq("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("a").getAs[Double]("c2") - 1.0) < 1e-9) // pure quadratic
    assert(math.abs(out("b").getAs[Double]("c2")) < 1e-9)       // pure linear
  }

  test("linearSpline recovers a planted continuous piecewise function") {
    // y = 10 + 2x + 3·(x−20)+ − 4·(x−35)+ sampled exactly: LSQ is exact
    val xs = (1 to 50).map(_.toDouble)
    def f(x: Double) = 10.0 + 2.0 * x + 3.0 * math.max(0, x - 20) - 4.0 * math.max(0, x - 35)
    val df = xs.map(x => ("g", x, f(x))).toDF("g", "x", "y")
    val r = Stats.linearSpline(df, "y", "x", (20.0, 35.0), Seq("g")).collect().head
    assert(math.abs(r.getAs[Double]("c0") - 10.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("c1") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("c2") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("c3") - (-4.0)) < 1e-6)
    assert(r.getAs[Long]("n") === 50L)
  }

  test("classError counts rule disagreements per group") {
    val df = Seq(
      ("g1", "hi", "hi"), ("g1", "hi", "lo"), ("g1", "lo", "lo"), ("g1", "lo", "hi"),
      ("g2", "hi", "hi"), ("g2", "hi", "hi")).toDF("g", "truth", "pred")
    val m = Stats.classError(df, "truth", "pred", Seq("g")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("g1") === 0.5)
    assert(m("g2") === 0.0)
  }

  test("rollingCorr matches whole-group corr when the frame covers the group") {
    val df = (1 to 10).map(i => ("g", i, i.toDouble, i * 2.0 + (i % 3)))
      .toDF("g", "ord", "x", "y")
    val rolled = Rolling.rollingCorr(df, Seq("g"), Seq(col("ord")), 10, "x", "y", "c")
      .filter(col("ord") === 10).select("c").as[Double].head()
    val full = df.agg(corr(col("x"), col("y"))).as[Double].head()
    assert(math.abs(rolled - full) < 1e-12)
  }

  test("rollupAgg emits per-key rows, per-prefix subtotals, and a grand total") {
    val df = Seq(("r", "s1", 1.0), ("r", "s2", 2.0), ("q", "s1", 4.0))
      .toDF("a", "b", "v")
    val out = GroupOps.rollupAgg(df, Seq("a", "b"), "sv" -> sum(col("v")),
      "n" -> count(lit(1))).collect()
    assert(out.length === 6) // 3 leaves + 2 a-subtotals + 1 grand
    val grand = out.find(_.getAs[Long]("gid") == 3L).get
    assert(grand.getAs[Double]("sv") === 7.0)
    val aSub = out.filter(_.getAs[Long]("gid") == 1L)
      .map(r => r.getString(0) -> r.getAs[Double]("sv")).toMap
    assert(aSub === Map("r" -> 3.0, "q" -> 4.0))
    // leaf rows carry gid 0 and both keys
    assert(out.count(_.getAs[Long]("gid") == 0L) === 3)
  }

  test("rocAuc matches the hand-computed tie-aware AUC") {
    // scores: pos {3, 2, 2}, neg {1, 2, 0}; avg ranks over [0,1,2,2,2,3]
    // = [1, 2, 4, 4, 4, 6]; sum-rank(pos) = 6 + 4 + 4 = 14;
    // U = 14 - 3*4/2 = 8; AUC = 8 / (3*3) = 0.888889
    val df = Seq((3, 1), (2, 1), (2, 1), (1, 0), (2, 0), (0, 0))
      .toDF("s", "y")
    val r = Stats.rocAuc(df, col("s"), col("y")).head()
    assert(r.getAs[Double]("auc") === 0.888889)
    assert(r.getAs[Long]("n_pos") === 3L && r.getAs[Long]("n_neg") === 3L)
    // perfect separation → 1.0; anti-separation → 0.0
    val sep = Seq((10, 1), (9, 1), (2, 0), (1, 0)).toDF("s", "y")
    assert(Stats.rocAuc(sep, col("s"), col("y")).head().getDouble(0) === 1.0)
    assert(Stats.rocAuc(sep, -col("s"), col("y")).head().getDouble(0) === 0.0)
  }

  test("madOutliers finds the planted outlier and not the bulk") {
    // g1 = 100..109 plus one 500: med 105, MAD 3, only 500 beyond 3 MADs;
    // g2 is constant (MAD 0) so even a tiny wiggle flags
    val rows = (0 until 10).map(i => ("g1", 100 + i)) :+ (("g1", 500)) :+
      (("g2", 7)) :+ (("g2", 7)) :+ (("g2", 8))
    val out = Stats.madOutliers(rows.toDF("g", "v"), Seq("g"), "v", k = 3.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getAs[Long]("n_outliers") === 1L)
    assert(out("g1").getAs[Double]("med") === 105.0)
    assert(out("g2").getAs[Double]("mad") === 0.0)
    assert(out("g2").getAs[Long]("n_outliers") === 1L) // the 8 vs MAD 0
  }
}
