package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshape / cross-tabulation — riptable pivot, Accum2, AccumTable.
  *
  * Reference: `riptable/rt_dataset.py:7987` (pivot, no aggregation),
  * `riptable/rt_accum2.py:39` (Accum2 two-axis cross-tab with totals
  * footers), `riptable/rt_accumtable.py:722,1024` (accum_ratio/ratiop).
  * Spark: `groupBy(row).pivot(col).agg(...)`; margins via union with
  * rollup-style totals (riptable has no grouping sets — SURVEY §2.4 note —
  * so Accum2's footers are the only margin shape to reproduce).
  */
object Reshape {

  /** Accum2(rowKey, colKey).f(value) — cross-tab with optional margins.
    * `colValues` pins the pivot columns (avoids the extra distinct-scan
    * Spark otherwise runs, and keeps output schema stable at scale).
    */
  def accum2(df: DataFrame, rowKey: String, colKey: String,
             agg: Column, colValues: Seq[String] = Nil,
             totals: Boolean = false,
             showFilter: Boolean = false): DataFrame = {
    // riptable bin 0 = Filtered (invalid key) rows; showfilter toggles
    // whether that bin appears in the output (rt_accum2.py:39 /
    // rt_enum.py GB_FILTERED). Here: null row-key ↔ bin 0.
    val src =
      if (showFilter)
        df.withColumn(rowKey,
          coalesce(col(rowKey).cast("string"), lit("Filtered")))
      else df.filter(col(rowKey).isNotNull)
    val piv =
      if (colValues.nonEmpty) src.groupBy(col(rowKey)).pivot(colKey, colValues)
      else src.groupBy(col(rowKey)).pivot(colKey)
    val body = piv.agg(agg)
    if (!totals) body
    else {
      val withTotal = body.withColumn("Total",
        body.columns.filterNot(_ == rowKey).map(c => coalesce(col(c), lit(0))).reduce(_ + _))
      // footer row: column totals (Accum2 footer, rt_accum2.py:39)
      val footerCols = Seq(lit("Total").as(rowKey)) ++
        withTotal.columns.filterNot(_ == rowKey).map(c => sum(col(c)).as(c))
      val footer = withTotal.groupBy().agg(footerCols.head, footerCols.tail: _*)
      withTotal.unionByName(footer)
    }
  }

  /** Multi-level footer rows over an accum2/pivot body (AccumTable's
    * stacked footers, `rt_accumtable.py:235` footer_set_values usage):
    * each (label, aggregate-builder) adds one footer row computed over
    * every non-label column — e.g. Total via sum, Mean via avg. One
    * tiny grouped aggregate per footer over the (already small) pivot
    * output.
    */
  def withFooters(body: DataFrame, rowKey: String,
                  footers: Seq[(String, Column => Column)]): DataFrame =
    footers.foldLeft(body) { case (acc, (label, f)) =>
      val cols = Seq(lit(label).as(rowKey)) ++
        body.columns.filterNot(_ == rowKey).map(c => f(col(c)).as(c))
      acc.unionByName(body.groupBy().agg(cols.head, cols.tail: _*))
    }

  /** concat_columns (rt_dataset.py:6995): side-by-side positional
    * concatenation of frames — riptable zips arrays by row position.
    * Spark rows are unordered, so position must be DECLARED: each side
    * gets a row number under its `order` sort, then a full-outer join on
    * that index null-fills the shorter side (riptable's invalid-fill).
    * Positional alignment is inherently a global order — a single-
    * partition window — so this is a display/small-frame op at scale,
    * like transpose; keyed joins are the scalable path.
    */
  def concatColumns(left: DataFrame, right: DataFrame,
                    leftOrder: Seq[Column], rightOrder: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def indexed(df: DataFrame, ord: Seq[Column]) =
      df.withColumn("__rn", row_number().over(Window.orderBy(ord: _*)))
    indexed(left, leftOrder)
      .join(indexed(right, rightOrder), Seq("__rn"), "full_outer")
      .orderBy(col("__rn"))
      .drop("__rn")
  }

  /** Dataset.pivot (rt_dataset.py:7987): pivot WITHOUT aggregation —
    * errors on duplicate (label, column) pairs like the reference.
    */
  def pivotNoAgg(df: DataFrame, labelCol: String, columnCol: String,
                 valueCol: String, colValues: Seq[String]): DataFrame = {
    val dupes = df.groupBy(col(labelCol), col(columnCol)).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupes == 0, s"pivot: duplicate ($labelCol,$columnCol) entries")
    df.groupBy(col(labelCol)).pivot(columnCol, colValues).agg(first(col(valueCol)))
  }

  /** Dataset.transpose (rt_dataset.py:5891) — display-size frames only
    * (riptable's own is in-memory): melt to long, pivot back with the
    * label column as the new header. Errors above `maxRows` to keep the
    * footgun visible.
    */
  def transpose(df: DataFrame, labelCol: String, maxRows: Int = 1000): DataFrame = {
    require(df.count() <= maxRows, s"transpose is display-size only (> $maxRows rows)")
    val valueCols = df.columns.filterNot(_ == labelCol).toSeq
    val labels = df.select(col(labelCol).cast("string"))
      .collect().map(_.getString(0)).toSeq
    val long = df.select((col(labelCol).cast("string").as("__label") +:
      valueCols.map(c => col(c).cast("double").as(c))): _*)
      .unpivot(Array(col("__label")), valueCols.map(col).toArray, "column", "value")
    long.groupBy(col("column")).pivot("__label", labels).agg(first(col("value")))
  }

  /** AccumTable.accum_ratio (rt_accumtable.py:722): elementwise ratio of
    * two cross-tabs sharing axes.
    */
  def accumRatio(num: DataFrame, den: DataFrame, rowKey: String): DataFrame = {
    val d2 = den.columns.filterNot(_ == rowKey)
      .foldLeft(den)((d, c) => d.withColumnRenamed(c, c + "__d"))
    val j = num.join(d2, Seq(rowKey))
    j.select((col(rowKey) +:
      num.columns.filterNot(_ == rowKey).toIndexedSeq
        .map(c => (col(c) / col(c + "__d")).as(c))): _*)
  }

  /** AccumTable.accum_ratiop (rt_accumtable.py:1024): each cross-tab
    * cell as a PERCENT of the table grand total. The total is a one-row
    * aggregate broadcast back — no second pass over the fact table.
    */
  def accumRatioP(tab: DataFrame, rowKey: String): DataFrame = {
    val cells = tab.columns.filterNot(_ == rowKey).toIndexedSeq
    // coalesce at both layers: an all-null cell column must contribute 0
    // to the grand total (not null the whole table), and a null cell is
    // a 0-percent cell — matching the oracle's FILTER-count semantics
    val total = tab.agg(
      cells.map(c => coalesce(sum(col(c)), lit(0.0)).as(c + "__t")).head,
      cells.tail.map(c => coalesce(sum(col(c)), lit(0.0)).as(c + "__t")): _*)
      .select(cells.map(c => col(c + "__t")).reduce(_ + _).as("__grand"))
    tab.crossJoin(broadcast(total))
      .select((col(rowKey) +:
        cells.map(c => (coalesce(col(c), lit(0.0)) * 100.0 / col("__grand")).as(c))): _*)
  }
}
