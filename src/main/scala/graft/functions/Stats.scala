package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistics pack — riptable rt_stats / rt_mlutils.
  *
  * Reference: `riptable/rt_stats.py:40` (statx summary), `:83-230`
  * (lm / polyFit / r2 / mae regression helpers), winsorize;
  * `riptable/rt_mlutils.py:12,18` (normalize_zscore/minmax — see
  * graft.syntax). Everything maps onto Spark's built-in statistical
  * aggregates (`regr_*`, `corr`, `covar_samp`, percentile) — single
  * shuffle, map-side combined.
  */
object Stats {

  /** statx (rt_stats.py:40): the summary shape as one aggregate row. */
  def statx(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.agg(
      count(v).as("n"),
      avg(v).as("mean"),
      stddev_samp(v).as("std"),
      min(v).as("mn"),
      percentile(v, lit(0.01)).as("p01"),
      percentile(v, lit(0.1)).as("p10"),
      percentile(v, lit(0.5)).as("p50"),
      percentile(v, lit(0.9)).as("p90"),
      percentile(v, lit(0.99)).as("p99"),
      max(v).as("mx"))
  }

  /** lm (rt_stats.py:83): simple linear regression per group — slope,
    * intercept, r² from the regr_* aggregate family.
    */
  def lm(df: DataFrame, yCol: String, xCol: String, by: Seq[String]): DataFrame = {
    val (y, x) = (col(yCol), col(xCol))
    df.groupBy(by.map(col): _*).agg(
      regr_slope(y, x).as("slope"),
      regr_intercept(y, x).as("intercept"),
      regr_r2(y, x).as("r2"),
      corr(y, x).as("corr"),
      count(lit(1)).as("n"))
  }

  /** winsorize (rt_stats.py): clip values to the [lo, hi] percentile
    * band. Bounds are a one-row aggregate broadcast back — no second
    * shuffle of the fact table.
    */
  def winsorize(df: DataFrame, valueCol: String, lo: Double = 0.05,
                hi: Double = 0.95, out: String = "winsorized"): DataFrame = {
    val v = col(valueCol)
    val bounds = df.agg(
      percentile(v, lit(lo)).as("__lo"), percentile(v, lit(hi)).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(out, least(greatest(v, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** r2 of predictions (rt_stats.py): 1 − SSR/SST. The actual-mean is a
    * one-row aggregate broadcast back in.
    */
  def r2(df: DataFrame, actual: String, predicted: String): DataFrame = {
    val (a, p) = (col(actual), col(predicted))
    val m = df.agg(avg(a).as("__mean"))
    df.crossJoin(broadcast(m))
      .agg((lit(1.0) - sum(pow(a - p, 2)) / sum(pow(a - col("__mean"), 2))).as("r2"))
  }

  /** mae (rt_stats.py): mean absolute error. */
  def mae(df: DataFrame, actual: String, predicted: String): DataFrame =
    df.agg(avg(abs(col(actual) - col(predicted))).as("mae"))
}
