package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Implicit DataFrame verbs reproducing riptable's Struct/Dataset surface.
  *
  * Riptable `Struct`/`Dataset` expose a dynamic, mutable column container
  * (`riptable/rt_struct.py:77`; col_rename `rt_struct.py:3421`, col_move
  * `:3133`, prefixes `:3341,3381`; Dataset filter `rt_dataset.py:861`,
  * fillna `:2163`, putmask `:1541`, drop_duplicates `:3631`, one_hot_encode
  * `:2888`). Here every verb is a pure plan transformation — Catalyst keeps
  * the immutability while the API keeps the riptable feel.
  *
  * NA model: riptable uses per-dtype sentinels (`riptable/rt_enum.py:88`);
  * we use SQL nulls throughout (SURVEY §1.2 mapping).
  */
object syntax {

  implicit class RipDataFrameOps(val df: DataFrame) extends AnyVal {

    // ---- Struct col_* surface (rt_struct.py:3133-3421) ----

    def colRename(pairs: (String, String)*): DataFrame =
      pairs.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

    def colRemove(names: String*): DataFrame = df.drop(names: _*)

    /** col_move_to_front (`rt_struct.py:3133`). */
    def colMoveToFront(names: String*): DataFrame = {
      val rest = df.columns.filterNot(names.contains)
      df.select((names ++ rest).toIndexedSeq.map(col): _*)
    }

    def colMoveToBack(names: String*): DataFrame = {
      val rest = df.columns.filterNot(names.contains)
      df.select((rest ++ names).toIndexedSeq.map(col): _*)
    }

    /** col_add_prefix (`rt_struct.py:3341`). */
    def colAddPrefix(prefix: String): DataFrame =
      df.select(df.columns.toIndexedSeq.map(c => col(c).as(prefix + c)): _*)

    /** col_add_suffix (`rt_struct.py:3381`). */
    def colAddSuffix(suffix: String): DataFrame =
      df.select(df.columns.toIndexedSeq.map(c => col(c).as(c + suffix)): _*)

    // ---- row ops (rt_dataset.py) ----

    /** Dataset.filter (`rt_dataset.py:861`) — boolean-mask row keep. */
    def filterRows(cond: Column): DataFrame = df.filter(cond)

    /** putmask (`rt_numpy.py:4684`, `rt_dataset.py:1541`): masked assign. */
    def putmask(colName: String, mask: Column, value: Column): DataFrame =
      df.withColumn(colName, when(mask, value).otherwise(col(colName)))

    /** where(cond, x, y) (`rt_numpy.py:2917`). */
    def whereCol(name: String, cond: Column, x: Column, y: Column): DataFrame =
      df.withColumn(name, when(cond, x).otherwise(y))

    /** fillna with a constant (`rt_fastarray.py:4413`, `rt_dataset.py:2163`). */
    def fillnaValue(value: Any, cols: Seq[String] = Nil): DataFrame = {
      val target = if (cols.isEmpty) df.columns.toSeq else cols
      value match {
        case d: Double => df.na.fill(d, target)
        case l: Long   => df.na.fill(l, target)
        case i: Int    => df.na.fill(i.toLong, target)
        case s: String => df.na.fill(s, target)
        case b: Boolean => df.na.fill(b, target)
        case _ => df
      }
    }

    /** fill_forward (`riptable/rt_fastarraynumba.py:149`; grouped variant
      * `riptable/rt_groupbynumba.py:312`): last non-null at-or-before this
      * row, per partition keys, ordered by `order`.
      */
    def fillForward(valueCol: String, partitionBy: Seq[String], order: Seq[String],
                    limit: Option[Int] = None): DataFrame =
      fillDirected(valueCol, partitionBy, order.map(col(_)), limit)

    /** fill_backward (`riptable/rt_fastarraynumba.py:241`). */
    def fillBackward(valueCol: String, partitionBy: Seq[String], order: Seq[String],
                     limit: Option[Int] = None): DataFrame =
      fillDirected(valueCol, partitionBy, order.map(col(_).desc), limit)

    /** Shared ffill/bfill body. `limit` (the numba kernels' `limit`
      * kwarg) caps how many consecutive rows a value propagates: the
      * gap to the last non-null row rides the SAME window partitioning
      * (row_number minus the last non-null row_number) — no extra
      * shuffle.
      */
    private def fillDirected(valueCol: String, partitionBy: Seq[String],
                             ord: Seq[Column], limit: Option[Int]): DataFrame = {
      val w0 = Window.partitionBy(partitionBy.map(col): _*).orderBy(ord: _*)
      val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val filled = last(col(valueCol), ignoreNulls = true).over(w)
      limit match {
        case None => df.withColumn(valueCol, filled)
        case Some(l) =>
          // row number materializes first (windows can't nest), then the
          // gap check rides the same partitioning
          val d1 = df.withColumn("__rn", row_number().over(w0))
          val lastNn = last(when(col(valueCol).isNotNull, col("__rn")),
            ignoreNulls = true).over(w)
          d1.withColumn(valueCol,
              when(col(valueCol).isNotNull, col(valueCol))
                .when(col("__rn") - lastNn <= l, filled))
            .drop("__rn")
      }
    }

    /** astype (`rt_fastarray.py:1375`, `rt_dataset.py:2783`). */
    def astype(casts: (String, String)*): DataFrame =
      casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }

    /** duplicated (`rt_dataset.py:3557`): marks rows whose key-subset has
      * been seen before (keep='first' semantics → first occurrence false).
      */
    def duplicated(subset: Seq[String], orderCol: String): DataFrame = {
      val w = Window.partitionBy(subset.map(col): _*).orderBy(col(orderCol))
      df.withColumn("duplicated", row_number().over(w) > 1)
    }

    /** drop_duplicates(keep=first|last|none) (`rt_dataset.py:3631`).
      * keep needs a total order; `orderCol` must be a unique tiebreaker.
      */
    def dropDuplicatesKeep(subset: Seq[String], keep: String, orderCols: Seq[String]): DataFrame = {
      val ord = keep match {
        case "last" => orderCols.map(c => col(c).desc)
        case _      => orderCols.map(c => col(c).asc)
      }
      val w = Window.partitionBy(subset.map(col): _*).orderBy(ord: _*)
      keep match {
        case "none" =>
          val wc = Window.partitionBy(subset.map(col): _*)
          df.withColumn("__n", count(lit(1)).over(wc)).filter(col("__n") === 1).drop("__n")
        case _ =>
          df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      }
    }

    /** one_hot_encode (`rt_dataset.py:2888`, `rt_categorical.py:3047`). */
    def oneHotEncode(colName: String, categories: Seq[String]): DataFrame =
      categories.foldLeft(df) { (d, cat) =>
        d.withColumn(s"${colName}_$cat", when(col(colName) === lit(cat), 1).otherwise(0))
      }

    // ---- reshape (§2.7) ----

    /** hstack / Dataset.concat_rows (`riptable/rt_hstack.py:15`,
      * `rt_dataset.py:6867`): row concat filling missing columns with
      * invalid → here null (`_hstack_dataset` gap logic `rt_hstack.py:562`).
      */
    def hstack(others: DataFrame*): DataFrame =
      others.foldLeft(df)((a, b) => a.unionByName(b, allowMissingColumns = true))

    /** imatrix (`rt_dataset.py:1792`, rt_imatrix.py): the dataset's
      * numeric columns as one row-wise vector column — riptable
      * materializes a 2-D matrix; the columnar analog is an
      * `array<double>` built per row (zero shuffle, codegen'd), which
      * feeds the same downstream uses (row reductions, ANN, normalize).
      */
    def imatrix(out: String = "imatrix", cols: Seq[String] = Nil): DataFrame = {
      import org.apache.spark.sql.types.NumericType
      val numeric =
        if (cols.nonEmpty) cols
        else df.schema.fields.toIndexedSeq
          .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
      require(numeric.nonEmpty, "imatrix: no numeric columns")
      df.withColumn(out, array(numeric.map(c => col(c).cast("double")): _*))
    }

    /** Struct.flatten / Multiset.flatten (`riptable/rt_struct.py:2170`,
      * `riptable/rt_multiset.py:631`): recursively expand nested struct
      * columns to top level with `parent<sep>child` names.
      */
    def flattenNested(sep: String = "_"): DataFrame = {
      import org.apache.spark.sql.types.StructType
      def expand(prefix: String, field: org.apache.spark.sql.types.StructField): Seq[(String, String)] =
        field.dataType match {
          case st: StructType =>
            st.fields.toSeq.flatMap(f => expand(s"$prefix.${f.name}", f))
              .map { case (path, name) => (path, s"${field.name}$sep$name") }
          case _ => Seq((prefix, field.name))
        }
      val cols = df.schema.fields.toSeq.flatMap { f =>
        expand(f.name, f).map { case (path, name) =>
          if (path == name) col(path) else col(path).as(name)
        }
      }
      df.select(cols: _*)
    }

    /** Struct.flatten_undo (`riptable/rt_struct.py:2247`): re-nest
      * `parent<sep>child` columns back into struct columns — the
      * inverse of flattenNested. Riptable records the original tree in
      * a metastring it stashes on the flattened Struct; the relational
      * analog derives the tree from the naming convention alone, so
      * the round-trip is the identity exactly when leaf names do not
      * themselves contain `sep` (riptable's default sep "/" relies on
      * the same property for member names). Columns without `sep`
      * stay top-level; member order and column order are preserved.
      * Pure projection — zero shuffle, codegen'd.
      */
    def flattenUndo(sep: String = "_"): DataFrame = {
      import scala.collection.mutable
      def build(items: Seq[(String, Column)]): Seq[Column] = {
        val groups =
          mutable.LinkedHashMap[String, mutable.ArrayBuffer[(String, Column)]]()
        val out = mutable.ArrayBuffer[Either[Column, String]]()
        items.foreach { case (name, c) =>
          val i = name.indexOf(sep)
          if (i < 0) out += Left(c.as(name))
          else {
            val (p, rest) = (name.substring(0, i), name.substring(i + sep.length))
            if (!groups.contains(p)) {
              groups(p) = mutable.ArrayBuffer(); out += Right(p)
            }
            groups(p) += ((rest, c))
          }
        }
        out.toSeq.map {
          case Left(c) => c
          case Right(p) => struct(build(groups(p).toSeq): _*).as(p)
        }
      }
      df.select(build(df.columns.toSeq.map(n => (n, col(n)))): _*)
    }

    /** Dataset.melt (`rt_dataset.py:6781`) — wide→long. */
    def melt(ids: Seq[String], values: Seq[String],
             varName: String = "variable", valName: String = "value"): DataFrame =
      df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valName)

    /** normalize_zscore (`riptable/rt_mlutils.py:12`). The global stats
      * are a one-row aggregate broadcast back in — NOT an empty-partition
      * window, which would funnel the whole table through one task.
      */
    def normalizeZscore(colName: String, out: String): DataFrame = {
      val stats = df.agg(avg(col(colName)).as("__m"),
        stddev_samp(col(colName)).as("__s"))
      df.crossJoin(broadcast(stats))
        .withColumn(out, (col(colName) - col("__m")) / col("__s"))
        .drop("__m", "__s")
    }

    /** normalize_minmax (`riptable/rt_mlutils.py:18`); same broadcast shape. */
    def normalizeMinmax(colName: String, out: String): DataFrame = {
      val stats = df.agg(min(col(colName)).as("__mn"), max(col(colName)).as("__mx"))
      df.crossJoin(broadcast(stats))
        .withColumn(out, (col(colName) - col("__mn")) / (col("__mx") - col("__mn")))
        .drop("__mn", "__mx")
    }
  }

  /** Mask combinators (`riptable/rt_numpy.py:5502-5526`). */
  def maskOr(ms: Column*): Column = ms.reduce(_ || _)
  def maskAnd(ms: Column*): Column = ms.reduce(_ && _)
  def maskXor(ms: Column*): Column = ms.reduce(_ =!= _)
  def maskAndNot(a: Column, b: Column): Column = a && !b

  /** bool_to_fancy (`riptable/rt_numpy.py:5449`): the row POSITIONS (in
    * a declared total order) where a mask is true — the fancy-index
    * bridge for the rare op that genuinely needs array positions.
    * Distributed: range-partitioned sort + `zipWithIndex` (per-partition
    * contiguous numbering, one count job for offsets) — no
    * single-partition window; the mask filter applies AFTER numbering so
    * positions refer to the full frame, like numpy's.
    */
  def boolToFancy(df: DataFrame, mask: Column, order: Seq[Column],
                  out: String = "position"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.withColumn("__mask", mask).orderBy(order: _*)
    val schema = sorted.schema.add(out, org.apache.spark.sql.types.LongType)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
      .filter(col("__mask")).drop("__mask")
  }

  /** partition2 (`rt_fastarray.py:2707`, np.partition semantics): split
    * the frame at the k-th order statistic of (`valueCol`, `tiebreak`) —
    * WHICH rows fall in the bottom k, not their order. Distributed as
    * one TakeOrderedAndProject top-k whose k rows are immediately
    * re-aggregated to `max(struct(value, tiebreak))`, so exactly ONE
    * pivot row reaches the driver regardless of k — never a global sort
    * of the frame and never a k-row transfer. The pivot then drives a
    * codegen'd comparison flag. With a unique tiebreak, exactly
    * min(k, n) rows flag true.
    *
    * Nulls: ordered FIRST (Spark's ascending default, and the same
    * ordering `max(struct)` uses for null fields), so null values count
    * toward the bottom k deterministically; the flag uses null-safe
    * comparisons so no row ever gets a null flag.
    */
  def partition2(df: DataFrame, valueCol: String, tiebreak: String, k: Int,
                 out: String = "in_bottom_k"): DataFrame = {
    require(k > 0, s"partition2: k must be positive, got $k")
    // strictly-below-pivot under nulls-first ordering; never null-valued
    def ltNF(c: Column, v: Any): Column =
      if (v == null) lit(false) // nothing sorts strictly below null
      else c.isNull || (c < lit(v))
    def eqNS(c: Column, v: Any): Column =
      if (v == null) c.isNull else c <=> lit(v)
    val r = df
      .select(struct(col(valueCol).as("__v"), col(tiebreak).as("__t")).as("__p"))
      .orderBy(col("__p.__v").asc_nulls_first, col("__p.__t").asc_nulls_first)
      .limit(k)
      .agg(count(lit(1)).as("__n"), max(col("__p")).as("__kth"))
      .head()
    if (r.getLong(0) < k) df.withColumn(out, lit(true)) // frame smaller than k
    else {
      val pivot = r.getStruct(1)
      val (pv, pt) = (pivot.get(0), pivot.get(1))
      df.withColumn(out,
        ltNF(col(valueCol), pv) ||
          (eqNS(col(valueCol), pv) &&
            (ltNF(col(tiebreak), pt) || eqNS(col(tiebreak), pt))))
    }
  }

  /** argpartition2 (`rt_fastarray.py:2716`): positions (under the
    * declared total `order`, like bool_to_fancy) of the bottom-k rows —
    * partition2's flag piped through the same distributed numbering.
    */
  def argpartition2(df: DataFrame, valueCol: String, tiebreak: String, k: Int,
                    order: Seq[Column], out: String = "position"): DataFrame = {
    val flagged = partition2(df, valueCol, tiebreak, k, "__bk")
    boolToFancy(flagged, col("__bk"), order, out).drop("__bk")
  }
}
