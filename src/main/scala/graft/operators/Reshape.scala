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
    * like transpose, and carries the same hard `maxRows` guard: keyed
    * joins are the scalable path, and the error keeps the footgun
    * visible instead of funneling a fact table through one task.
    */
  def concatColumns(left: DataFrame, right: DataFrame,
                    leftOrder: Seq[Column], rightOrder: Seq[Column],
                    maxRows: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (nl, nr) = (left.count(), right.count())
    require(nl <= maxRows && nr <= maxRows,
      s"concatColumns is positional (single-task global sort) — " +
        s"sides have $nl/$nr rows, max $maxRows; join on a key instead")
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

  /** One measure column of an accum_cols table (rt_accumtable.py:1326).
    *  - plain:       func(value) per group            (val_list entry)
    *  - ratio:       func(num) / func(den) per group  ([num, den] entry)
    *  - pct:         func(value) · 100 / whole-table func ([v, "p"])
    * `func` ∈ sum | mean | min | max | count; `filter` is the entry's
    * per-measure filt_list mask.
    */
  case class AccumColSpec(name: String, num: Column,
                          den: Option[Column] = None, pct: Boolean = false,
                          func: String = "sum", filter: Option[Column] = None)

  /** accum_cols (rt_accumtable.py:1326): multi-measure grouped table
    * with a Total footer row. ONE shuffle: all measures decompose into
    * sum/count/min/max partials computed in a single groupBy over the
    * fact table; the Total row RECOMBINES those partials from the
    * (group-count-sized) result — never a second fact scan — which is
    * also why `mean` is carried as a sum+count pair internally. Percent
    * measures divide by the recombined whole-table value (broadcast,
    * one row).
    */
  def accumCols(df: DataFrame, by: String, specs: Seq[AccumColSpec],
                totalLabel: String = "Total"): DataFrame = {
    require(specs.nonEmpty, "accumCols needs at least one measure")
    val funcs = Set("sum", "mean", "min", "max", "count")
    specs.foreach(sp => require(funcs(sp.func), s"unsupported func ${sp.func}"))
    // partial aggregates per (spec, side): sum+count for sum/mean/count,
    // min/max for min/max — all recombinable group-frame-side
    def masked(c: Column, f: Option[Column]) = f.map(m => when(m, c)).getOrElse(c)
    val partials = specs.zipWithIndex.flatMap { case (sp, i) =>
      def parts(tag: String, c: Column) = sp.func match {
        case "min" => Seq(min(c).as(s"__${tag}_min_$i"))
        case "max" => Seq(max(c).as(s"__${tag}_max_$i"))
        case "count" => Seq(count(c).as(s"__${tag}_cnt_$i"))
        case _ => Seq(sum(c).as(s"__${tag}_sum_$i"), count(c).as(s"__${tag}_cnt_$i"))
      }
      parts("n", masked(sp.num, sp.filter)) ++
        sp.den.toSeq.flatMap(d => parts("d", masked(d, sp.filter)))
    }
    val grouped = df.groupBy(col(by).cast("string").as(by))
      .agg(partials.head, partials.tail: _*)
      .withColumn("__is_total", lit(false))
    // Total row: recombine partials (sum of sums/counts, min of mins …).
    // The footer is marked by `__is_total`, NOT by its group-key value,
    // so a genuine group named `totalLabel` can't collide with it.
    val recombine = grouped.columns
      .filterNot(c => c == by || c == "__is_total").map { c =>
        (if (c.contains("_min_")) min(col(c))
         else if (c.contains("_max_")) max(col(c)) else sum(col(c))).as(c)
      }.toSeq
    val total = grouped.groupBy().agg(recombine.head, recombine.tail: _*)
      .withColumn(by, lit(totalLabel))
      .withColumn("__is_total", lit(true))
    val all = grouped.unionByName(total)
    def eval(tag: String, i: Int, func: String): Column = func match {
      case "min" => col(s"__${tag}_min_$i")
      case "max" => col(s"__${tag}_max_$i")
      case "count" => col(s"__${tag}_cnt_$i").cast("double")
      case "mean" => col(s"__${tag}_sum_$i") / col(s"__${tag}_cnt_$i")
      case _ => col(s"__${tag}_sum_$i")
    }
    val withPct =
      if (!specs.exists(_.pct)) all
      else {
        // whole-table values for pct denominators ride the Total row;
        // broadcast it back as one row
        val tot = all.filter(col("__is_total"))
          .select(specs.zipWithIndex.collect { case (sp, i) if sp.pct =>
            eval("n", i, sp.func).as(s"__tot_$i")
          }: _*)
        all.crossJoin(broadcast(tot))
      }
    val measures = specs.zipWithIndex.map { case (sp, i) =>
      val v = eval("n", i, sp.func)
      (if (sp.pct) v * 100.0 / col(s"__tot_$i")
       else sp.den.map(_ => v / eval("d", i, sp.func)).getOrElse(v)).as(sp.name)
    }
    withPct.select((col(by) +: measures): _*)
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
