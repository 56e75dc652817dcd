package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Business-day calendar arithmetic — the `Calendar` the reference
  * declares but never implements (`riptable/rt_timezone.py:1321` raises
  * NotImplementedError; `rt_datetime.py:4422` "need to interact with the
  * business calendar class"), completing the Date surface
  * (`rt_datetime.py:2019` is_weekend / `:2056` is_weekday).
  *
  * Scale design: the classic warehouse shape — materialize the calendar
  * as a DIMENSION frame (one row per calendar day with business-day
  * index and roll-forward/backward anchors) and resolve every per-row
  * question with broadcast joins against it. A 30-year calendar is
  * ~11k rows, so the dimension always broadcasts; the fact table is
  * never shuffled, and the per-row work is hash-probe + arithmetic.
  * The dimension build uses global windows over the DICTIONARY-sized
  * day frame — deliberate (see GroupOps.ngroup); never over facts.
  */
object BizCal {

  /** True when `d` is a weekday and not in the (small, literal) holiday
    * set. Pure codegen'd expression — scan-speed, no shuffle.
    */
  def isBday(d: Column, holidays: Seq[String]): Column = {
    val weekday = !dayofweek(d).isin(1, 7) // Spark: 1=Sunday, 7=Saturday
    if (holidays.isEmpty) weekday
    else weekday && !d.isin(holidays.map(java.sql.Date.valueOf): _*)
  }

  /** Calendar dimension over [start, end]: one row per day with
    *  - is_bday
    *  - bday_index: count of business days on-or-before d (so equal for
    *    a non-business day and the business day before it)
    *  - next_bday / prev_bday: roll-forward / roll-backward anchors
    *    (on-or-after / on-or-before).
    */
  def calendarDim(spark: SparkSession, start: String, end: String,
                  holidays: Seq[String]): DataFrame = {
    val days = spark.range(1).select(explode(sequence(
      lit(start).cast("date"), lit(end).cast("date"),
      expr("interval 1 day"))).as("d"))
    val w = Window.orderBy(col("d"))
    val wF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wB = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val built = days.withColumn("is_bday", isBday(col("d"), holidays))
      .withColumn("bday_index",
        sum(when(col("is_bday"), 1L).otherwise(0L)).over(w))
      .withColumn("next_bday", min(when(col("is_bday"), col("d"))).over(wF))
      .withColumn("prev_bday", max(when(col("is_bday"), col("d"))).over(wB))
    // materialize to a LocalRelation: the dimension is tiny by
    // definition (a 30-year calendar is ~11k rows), every consumer
    // broadcast-joins it — often several times in one query — and
    // without this each join re-evaluates the window subtree above
    val rows = built.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), built.schema)
  }

  /** Roll-forward business-day index: for a business day its own index,
    * for a weekend/holiday the index of the NEXT business day — the
    * numpy `busday_offset(..., roll='forward')` convention.
    */
  private def rollFwdIdx: Column =
    col("bday_index") + when(col("is_bday"), 0L).otherwise(1L)

  /** Shift each date by `n` business days (roll-forward first when the
    * date itself is a weekend/holiday; n = 0 is "next business day
    * on-or-after"). Two broadcast hash joins against the dimension —
    * the fact side never shuffles.
    */
  def shiftBday(df: DataFrame, dateCol: String, n: Int, cal: DataFrame,
                out: String): DataFrame = {
    val base = cal.select(col("d").as("__bd"), rollFwdIdx.as("__base"))
    val target = cal.filter(col("is_bday"))
      .select(col("bday_index").as("__ti"), col("d").as(out))
    df.join(broadcast(base), col(dateCol) === col("__bd"), "left")
      .withColumn("__ti", col("__base") + n)
      .join(broadcast(target), Seq("__ti"), "left")
      .drop("__bd", "__base", "__ti")
  }

  /** Business days from `aCol` to `bCol` as the difference of
    * roll-forward indices (0 when both roll to the same business day;
    * positive when b is later). Null outside the calendar range.
    */
  def bdayDiff(df: DataFrame, aCol: String, bCol: String, cal: DataFrame,
               out: String): DataFrame = {
    val dimA = cal.select(col("d").as("__da"), rollFwdIdx.as("__ia"))
    val dimB = cal.select(col("d").as("__db"), rollFwdIdx.as("__ib"))
    df.join(broadcast(dimA), col(aCol) === col("__da"), "left")
      .join(broadcast(dimB), col(bCol) === col("__db"), "left")
      .withColumn(out, col("__ib") - col("__ia"))
      .drop("__da", "__ia", "__db", "__ib")
  }
}
