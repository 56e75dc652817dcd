package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DB-style joins reproducing riptable `merge2` / `merge_lookup`.
  *
  * Reference: `riptable/rt_merge.py:2293` (merge2), `:3229` (merge_lookup),
  * core `JoinIndices:1214` — a single-node hash join built on `ismember`
  * over each side's unique keys. On Spark the same semantics are declared
  * with `DataFrame.join` and Catalyst picks broadcast-hash / shuffled-hash /
  * sort-merge from stats + AQE; `broadcast()` is applied when the caller
  * marks the right side as a small lookup (merge_lookup's contract).
  *
  * Semantics preserved:
  *  - invalid keys never match (`rt_merge.py:2320`) — SQL null-key behavior;
  *  - `validate` 1:1/1:m/m:1 uniqueness checks (`rt_merge.py:2309`);
  *  - `keep` first/last per-side dedupe;
  *  - `suffixes` on colliding non-key columns;
  *  - `indicator` membership column;
  *  - left row-order preservation (riptable guarantee) is OPT-IN via
  *    `preserveOrder` — it costs a global sort at scale, so large pipelines
  *    should leave it off (Spark joins are unordered by contract).
  */
object Merge {

  final case class MergeValidationException(msg: String) extends RuntimeException(msg)

  /** merge2 (`riptable/rt_merge.py:2293`). */
  def merge2(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      how: String = "inner",
      suffixes: (String, String) = ("_x", "_y"),
      validate: Option[String] = None,
      keepLeft: Option[String] = None,
      keepRight: Option[String] = None,
      keepOrderCols: Seq[String] = Nil,
      indicator: Boolean = false,
      broadcastRight: Boolean = false,
      preserveOrder: Boolean = false): DataFrame = {

    validate.foreach(v => runValidate(left, right, on, v))

    var l = keepLeft.map(k => dedupeKeep(left, on, k, keepOrderCols)).getOrElse(left)
    var r = keepRight.map(k => dedupeKeep(right, on, k, keepOrderCols)).getOrElse(right)

    if (preserveOrder) l = l.withColumn("__rip_row", monotonically_increasing_id())

    // suffix colliding non-key columns (riptable renames both sides)
    val collide = (l.columns.toSet -- on).intersect(r.columns.toSet -- on)
    collide.foreach { c =>
      l = l.withColumnRenamed(c, c + suffixes._1)
      r = r.withColumnRenamed(c, c + suffixes._2)
    }

    if (indicator) {
      l = l.withColumn("__in_l", lit(true))
      r = r.withColumn("__in_r", lit(true))
    }

    val rSide = if (broadcastRight) broadcast(r) else r
    val sparkHow = how match {
      case "outer" => "full_outer"
      case h => h
    }
    var out = l.join(rSide, on, sparkHow)

    if (indicator) {
      out = out.withColumn("merge_indicator",
        when(col("__in_l").isNotNull && col("__in_r").isNotNull, "both")
          .when(col("__in_l").isNotNull, "left_only")
          .otherwise("right_only"))
        .drop("__in_l", "__in_r")
    }
    if (preserveOrder) out = out.orderBy(col("__rip_row")).drop("__rip_row")
    out
  }

  /** merge_lookup (`riptable/rt_merge.py:3229`): left join against a
    * (usually small) lookup table with unique keys; `keep` resolves dupes.
    * The lookup side is broadcast — the 100 TB path: no shuffle of the
    * fact table at all.
    */
  def mergeLookup(
      left: DataFrame,
      lookup: DataFrame,
      on: Seq[String],
      keep: String = "first",
      orderCol: Option[String] = None): DataFrame = {
    // order by ALL non-key columns when unspecified: ordering by the
    // first column (often the join key itself) makes keep= pick an
    // arbitrary row among duplicates — run-to-run nondeterminism.
    val uniq = dedupeKeep(lookup, on, keep, orderCol.toSeq)
    left.join(broadcast(uniq), on, "left")
  }

  /** ismember(a, b) (`riptable/rt_numpy.py:1186`): membership mask of a's
    * keys in b — relationally, a left-semi-join flag.
    *
    * No broadcast hint: riptable's `high_card` flag acknowledges b's keys
    * can be huge, and an unconditional broadcast would OOM the driver
    * there. AQE still broadcasts genuinely small key sets from runtime
    * stats; high-cardinality sides get a shuffled join.
    */
  def ismember(a: DataFrame, b: DataFrame, on: Seq[String]): DataFrame = {
    val bKeys = b.select(on.map(col): _*).dropDuplicates(on)
      .withColumn("__ismember", lit(true))
    a.join(bKeys, on, "left")
      .withColumn("ismember", coalesce(col("__ismember"), lit(false)))
      .drop("__ismember")
  }

  /** ismember with the MATLAB-style second output (`rt_numpy.py:1186`
    * returns (mask, index)): the 0-based position of each key's FIRST
    * occurrence in b. Positional semantics need a total order on b —
    * riptable uses array position, the caller declares `bOrder`.
    *
    * Global numbering WITHOUT a single-partition window: sort b on
    * `bOrder` (a normal distributed range-partitioned sort), then
    * `zipWithIndex` stamps contiguous global positions per partition
    * (one extra count job for the offsets) — every stage stays
    * parallel, so b may be fact-table sized.
    */
  def ismemberIndex(a: DataFrame, b: DataFrame, on: Seq[String],
                    bOrder: Seq[Column]): DataFrame = {
    val spark = b.sparkSession
    // keep all of b's columns through the sort: bOrder may reference
    // non-key columns (positions come from the full-row order)
    val sorted = b.orderBy(bOrder: _*)
    val schema = sorted.schema.add("__pos", org.apache.spark.sql.types.LongType)
    val withPos = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
    val idx = withPos
      .groupBy(on.map(col): _*)
      .agg(min(col("__pos")).as("ismember_index"))
    a.join(idx, on, "left")
      .withColumn("ismember", col("ismember_index").isNotNull)
  }

  /** merge_indices (`riptable/rt_merge.py:2080`): the join PLAN as data
    * — instead of materializing merged columns, return one row per
    * output row of the equivalent merge2 carrying the source ROW
    * POSITIONS (0-based under each side's declared total order; null
    * where a side doesn't participate, like JoinIndices' invalid
    * entries). Row positions use the same distributed
    * sort + zipWithIndex shape as ismemberIndex — no single-partition
    * window, both sides may be fact-sized.
    */
  def mergeIndices(left: DataFrame, right: DataFrame, on: Seq[String],
                   how: String = "left",
                   leftOrder: Seq[Column], rightOrder: Seq[Column]): DataFrame = {
    require(Seq("left", "right", "inner", "outer").contains(how),
      s"merge_indices: how must be left|right|inner|outer, got $how")
    def positions(df: DataFrame, ord: Seq[Column], out: String): DataFrame = {
      val spark = df.sparkSession
      val sorted = df.orderBy(ord: _*)
      val schema = sorted.schema.add(out, org.apache.spark.sql.types.LongType)
      spark.createDataFrame(
        sorted.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        }, schema)
    }
    val li = positions(left, leftOrder, "left_index")
      .select((on.map(col) :+ col("left_index")): _*)
    val ri = positions(right, rightOrder, "right_index")
      .select((on.map(col) :+ col("right_index")): _*)
    li.join(ri, on, how match {
      case "outer" => "full_outer"
      case h => h
    }).select(col("left_index"), col("right_index"))
  }

  private def dedupeKeep(df: DataFrame, on: Seq[String], keep: String,
                         orderCols: Seq[String] = Nil): DataFrame = {
    val nonKey = df.columns.filterNot(on.contains).toSeq
    val ords = if (orderCols.nonEmpty) orderCols
               else if (nonKey.nonEmpty) nonKey
               else on // keys-only frame: duplicate rows are identical
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(ords.map(c => if (keep == "last") col(c).desc else col(c).asc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def runValidate(left: DataFrame, right: DataFrame, on: Seq[String], v: String): Unit = {
    def unique(df: DataFrame): Boolean =
      df.groupBy(on.map(col): _*).count().filter(col("count") > 1).isEmpty
    val (needL, needR) = v match {
      case "1:1" => (true, true)
      case "1:m" => (true, false)
      case "m:1" => (false, true)
      case "m:m" => (false, false)
      case other => throw MergeValidationException(s"bad validate spec: $other")
    }
    if (needL && !unique(left)) throw MergeValidationException(s"left keys not unique for validate=$v")
    if (needR && !unique(right)) throw MergeValidationException(s"right keys not unique for validate=$v")
  }
}
