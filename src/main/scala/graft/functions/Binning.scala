package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binning — riptable cut / qcut / quantile.
  *
  * Reference: `riptable/rt_bin.py:412` (cut), `:155` (qcut), `:17`
  * (quantile); kernels `rc.BinsToCutsBSearch`. Riptable puts out-of-range
  * values in the reserved "Filtered" bin 0; we return null (SURVEY §2.8).
  * Bin codes are 1-based like riptable's.
  */
object Binning {

  /** cut with explicit edges; right-closed intervals (lo, hi] like the
    * reference default, `include_lowest` closes the first interval.
    * Pure expression → whole-stage codegen, no shuffle.
    */
  def cut(x: Column, edges: Seq[Double], includeLowest: Boolean = true): Column = {
    val first =
      if (includeLowest) when(x >= edges.head && x <= edges(1), 1)
      else when(x > edges.head && x <= edges(1), 1)
    edges.sliding(2).toSeq.zipWithIndex.tail.foldLeft(first) {
      case (acc, (Seq(lo, hi), i)) => acc.when(x > lo && x <= hi, i + 1)
      case (acc, _) => acc
    }
  }

  /** Equal-width cut over [lo, hi] into n bins — width_bucket, codegen'd. */
  def cutUniform(x: Column, lo: Double, hi: Double, n: Int): Column =
    when(x >= lo && x <= hi,
      least(width_bucket(x, lit(lo), lit(hi), lit(n)), lit(n)))

  /** qcut (rt_bin.py:155): quantile bins → ntile over a global order.
    * Exact equal-count semantics, but the global sort funnels through a
    * single task — so the exact path is SIZE-GUARDED: above
    * `maxExactRows` the call routes through `qcutBoundaries` (one
    * map-side-combined percentile aggregate, broadcast back; ties may
    * unbalance bins slightly, and `tiebreak` is moot) with a warning,
    * instead of handing a fact table to one window task.
    */
  def qcut(df: DataFrame, valueCol: String, tiebreak: String, q: Int,
           out: String = "bin", maxExactRows: Long = 1000000L): DataFrame = {
    val n = df.count()
    if (n > maxExactRows) {
      org.slf4j.LoggerFactory.getLogger("graft.functions.Binning")
        .warn(s"qcut: $n rows > maxExactRows=$maxExactRows — routing through " +
          "qcutBoundaries (boundary binning; exact equal-count needs a " +
          "single-task global sort)")
      qcutBoundaries(df, valueCol, q, out)
    } else {
      val w = Window.orderBy(col(valueCol), col(tiebreak))
      df.withColumn(out, ntile(q).over(w))
    }
  }

  /** searchsorted (rt_numpy.py:701, numpy semantics): insertion index of
    * each value into a small sorted boundary list. side="left" counts
    * boundaries strictly below the value, side="right" counts boundaries
    * at-or-below. Unrolled when-sum chain → whole-stage codegen, zero
    * shuffle; for boundary sets too large to inline, bin against a sorted
    * boundary table with AsofJoin instead.
    */
  def searchsorted(x: Column, sorted: Seq[Double], side: String = "left"): Column = {
    require(side == "left" || side == "right", s"side must be left|right, got $side")
    sorted.foldLeft(lit(0L)) { (acc, b) =>
      val below = if (side == "left") lit(b) < x else lit(b) <= x
      acc + when(below, 1L).otherwise(0L)
    }
  }

  /** Scale path for qcut: exact percentile boundaries from one aggregate
    * (map-side combined), broadcast back, bin by comparison. Bins can be
    * slightly uneven on ties (boundary values all land in one bin) but no
    * task ever sees more than its partition.
    */
  def qcutBoundaries(df: DataFrame, valueCol: String, q: Int,
                     out: String = "bin"): DataFrame = {
    val qs = (1 until q).map(_.toDouble / q)
    val bounds = df.agg(percentile(col(valueCol), array(qs.map(lit): _*)).as("__b"))
    df.crossJoin(broadcast(bounds))
      .withColumn(out,
        aggregate(col("__b"), lit(1),
          (acc, b) => acc + when(col(valueCol) > b, 1).otherwise(0)))
      .drop("__b")
  }
}
