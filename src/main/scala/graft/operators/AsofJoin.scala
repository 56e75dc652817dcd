package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-key) join — riptable `merge_asof`.
  *
  * Reference: `riptable/rt_merge.py:3572` (merge_asof), core two-pointer
  * walk `alignmk` `riptable/rt_utils.py:503`, numba rewrite
  * `riptable/rt_merge_asof.py:1251` (`_merge_asof_backward:98`,
  * grouped forward `:565`, nearest combine `:746`).
  *
  * Spark has no built-in as-of join; this is the union+window formulation
  * (SURVEY §2.3 option a): tag both sides, union, and take the last
  * right-side row at-or-before each left row inside a
  * `PARTITION BY by ORDER BY on` running window. One shuffle on the `by`
  * keys, no O(n·m) range join, no per-group materialization — the window
  * is a streaming frame, so this scales to arbitrarily large groups.
  *
  * `on` must be a numeric (long) column on both sides — callers convert
  * timestamps with `unix_micros`. `tolerance` is in the same units.
  */
object AsofJoin {

  /** Native sort-merge as-of (backward/forward/nearest): plans through
    * the custom AsofJoinNode/AsofJoinExec (graft.plans) — one
    * co-partitioned two-pointer pass per task instead of the
    * union+window. Backward and nearest run natively; forward is
    * backward on negated time. Requires the GraftExtensions strategy on
    * the session. Cross-checked against the window formulation in
    * AsofExecSpec.
    */
  def asofExec(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String],
      rightCols: Seq[String],
      allowExactMatches: Boolean = true,
      tolerance: Option[Long] = None,
      direction: String = "backward",
      matchedOn: Boolean = false): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofExec supports backward/forward/nearest, got $direction")
    // forward == backward on negated time (latest -rt ≤ -lt ⇔ earliest rt ≥ lt)
    if (direction == "forward") {
      val ln = left.withColumn("__negt", -col(on))
      val rn = right.withColumn("__negt", -col(on)).drop(on)
      val neg = asofExec(ln.drop(on), rn, "__negt", by, rightCols,
        allowExactMatches, tolerance, matchedOn = matchedOn)
        .withColumn(on, -col("__negt")).drop("__negt")
      // the recursive call matched on negated time — undo for callers
      return if (matchedOn) neg.withColumn("matched_on", -col("matched_on"))
             else neg
    }
    import graft.plans.AsofJoinNode
    val spark = left.sparkSession
    // fresh exprIds on the right (self-joins share attribute ids)
    val rAliased = right.select(
      (by ++ Seq(on) ++ rightCols).map(c => col(c).as(s"__r_$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rAliased.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    // matched_on (rt_merge.py:3572) is just the right time column riding
    // the rightValues projection — the exec needs no special case
    val rightVals = rightCols.map(c => attr(rPlan, s"__r_$c")) ++
      (if (matchedOn) Seq(attr(rPlan, s"__r_$on")) else Nil)
    val node = AsofJoinNode(
      lPlan, rPlan,
      by.map(attr(lPlan, _)), by.map(b => attr(rPlan, s"__r_$b")),
      attr(lPlan, on), attr(rPlan, s"__r_$on"),
      rightVals,
      allowExactMatches, tolerance, nearest = direction == "nearest")
    val out0 = org.apache.spark.sql.GraftInternal.ofRows(spark, node)
    val out = if (matchedOn)
      out0.withColumnRenamed(s"__r_$on", "matched_on") else out0
    rightCols.foldLeft(out)((d, c) => d.withColumnRenamed(s"__r_$c", c))
  }

  def asof(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String],
      rightCols: Seq[String],
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      tolerance: Option[Long] = None,
      matchedOn: Boolean = false): DataFrame = {

    require(Seq("backward", "forward", "nearest").contains(direction),
      s"bad direction $direction")

    val leftPayload = left.columns.filterNot(c => by.contains(c) || c == on).toSeq

    def tagged(src: Int): DataFrame = {
      val base = if (src == 1) left else right
      val payload =
        if (src == 1) leftPayload.map(col)
        else Seq(struct((col(on).as("__r_on") +: rightCols.map(col)): _*).as("__rstruct"))
      base.select((by.map(col) :+ col(on)) ++ payload: _*)
    }

    val l2 = tagged(1).withColumn("__src", lit(1))
    val r2 = tagged(0).withColumn("__src", lit(0))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)

    // At equal `on`: right row sorts before left iff exact matches count.
    val srcOrd = if (allowExactMatches) col("__src").asc else col("__src").desc

    def pick(desc: Boolean): Column = {
      val ord: Seq[Column] =
        if (desc) Seq(col(on).desc, srcOrd) else Seq(col(on).asc, srcOrd)
      val w = Window.partitionBy(by.map(col): _*).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__rstruct"), ignoreNulls = true).over(w)
    }

    val withMatch = direction match {
      case "backward" => unioned.withColumn("__m", pick(desc = false))
      case "forward"  => unioned.withColumn("__m", pick(desc = true))
      case "nearest"  =>
        unioned
          .withColumn("__mb", pick(desc = false))
          .withColumn("__mf", pick(desc = true))
          .withColumn("__m",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(col(on) - col("__mb.__r_on") <= col("__mf.__r_on") - col(on), col("__mb"))
              .otherwise(col("__mf")))
          .drop("__mb", "__mf")
    }

    val tolOk: Column = tolerance match {
      case Some(t) => abs(col(on) - col("__m.__r_on")) <= lit(t)
      case None    => lit(true)
    }

    var out = withMatch
      .filter(col("__src") === 1)
      .withColumn("__m", when(tolOk, col("__m")))

    for (c <- rightCols) out = out.withColumn(c, col(s"__m.$c"))
    if (matchedOn) out = out.withColumn("matched_on", col("__m.__r_on"))
    out.drop("__m", "__src", "__rstruct")
      .select((by.map(col) :+ col(on)) ++ leftPayload.map(col) ++
        rightCols.map(col) ++ (if (matchedOn) Seq(col("matched_on")) else Nil): _*)
  }
}
