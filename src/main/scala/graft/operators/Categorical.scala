package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The riptable Categorical layer, expressed relationally.
  *
  * Reference: `riptable/rt_categorical.py:1284` — a dictionary-encoded
  * array (int codes + unique categories) that doubles as the groupby
  * handle; codes are base-1 with code 0 reserved for "Filtered" rows;
  * `Categories` helper `rt_categorical.py:226`; CategoryMode enum
  * `riptable/rt_enum.py:848`.
  *
  * Spark stores dictionary encoding transparently (parquet/Arrow), so the
  * value of this layer is the *semantics*: stable code assignment, the
  * filtered→0 convention (here: code 0 ↔ filtered-out/null key),
  * category-level ops (isin at dictionary level, shrink to observed,
  * mapping codes→labels), and shift_cat.
  *
  * Scale: the dictionary is distinct-key-sized, so every op here builds a
  * small `categories` frame and broadcast-joins it back — the fact table
  * never shuffles on encode/decode.
  */
object Categorical {

  /** Dictionary-size contract: the global un-partitioned `row_number`
    * windows below funnel the DISTINCT key set through ONE task — fine
    * for dictionaries (the whole point of a Categorical), silently
    * pathological if someone categorizes a unique-ish key at corpus
    * scale (VERDICT r12 #6). The guard is IN-PLAN (`raise_error` fires
    * on the first code past the cap during the same window evaluation)
    * so it costs nothing when under the cap and needs no eager count.
    * Tune with -Dgraft.categorical.maxCategories.
    */
  // read per call (dictionary builds are rare) so tests and sessions
  // can retune the cap without a JVM restart
  private[operators] def maxCategories: Long =
    try sys.props.getOrElse("graft.categorical.maxCategories",
      (1L << 22).toString).toLong
    catch { case _: NumberFormatException => 1L << 22 }

  private def guardedCode(codeCol: Column): Column =
    when(codeCol > maxCategories, raise_error(lit(
      s"Categorical dictionary exceeds $maxCategories distinct keys " +
        "(graft.categorical.maxCategories) — a dictionary this large " +
        "funnels one task; group directly on the key instead"))
      .cast("int"))
      .otherwise(codeCol)

  /** The category dictionary: sorted unique values with 1-based codes
    * (riptable sorts string categories; code 0 is reserved for Filtered).
    * The window runs over the already-distinct (small) key set — see
    * the [[maxCategories]] contract.
    */
  def categories(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol)).filter(col(keyCol).isNotNull).distinct()
      .withColumn("code",
        guardedCode(row_number().over(Window.orderBy(col(keyCol)))))

  /** Encode: attach the 1-based code; null/filtered keys get code 0. */
  def encode(df: DataFrame, keyCol: String, out: String = "code",
             filter: Option[Column] = None): DataFrame = {
    val cats = categories(df, keyCol).withColumnRenamed("code", "__cat_code")
    val joined = df.join(broadcast(cats), Seq(keyCol), "left")
    val base = coalesce(col("__cat_code"), lit(0))
    val coded = filter match {
      case Some(f) => when(f, base).otherwise(lit(0)) // filtered → bin 0
      case None    => base
    }
    joined.withColumn(out, coded).drop("__cat_code")
  }

  /** Decode codes back to labels via the dictionary. */
  def decode(coded: DataFrame, cats: DataFrame, codeCol: String,
             labelCol: String): DataFrame = {
    val d = cats.select(col(cats.columns.head).as(labelCol), col("code").as(codeCol))
    coded.join(broadcast(d), Seq(codeCol), "left")
  }

  /** IntEnum / Dictionary-mode construction (`rt_categorical.py:226`,
    * `rt_enum.py:848`; CategoryMode.IntEnum/Dictionary): attach labels
    * to PRE-ASSIGNED base-1 codes under a USER-SUPPLIED dictionary —
    * the migrating-user path for enum-coded columns where the mapping
    * exists outside the data. Honors the reference's conventions:
    * code 0 = Filtered (null label), and any code outside [1, |dict|]
    * is invalid → normalized to 0/Filtered rather than erroring
    * (riptable's invalid→Filtered fill). The dictionary rides as ONE
    * array literal resolved with `element_at` — a pure projection,
    * zero join, zero shuffle at any fact-table size.
    */
  def fromCodes(df: DataFrame, codeCol: String, dict: Seq[String],
                out: String = "label"): DataFrame = {
    require(dict.nonEmpty, "fromCodes needs a non-empty dictionary")
    val d = typedlit(dict)
    val c = col(codeCol).cast("int")
    val valid = c.isNotNull && c >= 1 && c <= dict.size
    df.withColumn(out, when(valid, element_at(d, c)))
      .withColumn(codeCol, when(valid, c).otherwise(lit(0)))
  }

  /** Categorical.isin at dictionary level (rt_categorical.py:4171):
    * membership test against the (small) category set, not the rows.
    */
  def isinCategories(df: DataFrame, keyCol: String, values: Seq[String],
                     out: String = "isin"): DataFrame =
    df.withColumn(out, col(keyCol).isin(values: _*))

  /** shrink to observed categories after a filter (rt_categorical.py
    * category trimming): recompute the dictionary over the kept rows.
    */
  def shrink(df: DataFrame, keyCol: String, keep: Column): DataFrame =
    categories(df.filter(keep), keyCol)

  /** Multi-key categorical (CategoryMode.MultiKey): the dictionary is the
    * distinct key tuple set; encode via the same broadcast pattern.
    */
  def multiKeyCategories(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.select(keyCols.map(col): _*).na.drop().distinct()
      .withColumn("code",
        guardedCode(row_number().over(Window.orderBy(keyCols.map(col): _*))))

  /** merge_cats (`riptable/rt_grouping.py:136`): hstack Categoricals
    * that carry DIFFERENT dictionaries — e.g. slices of a stacked
    * multi-file load where file 1 saw categories (A, C) and file 2 saw
    * (B, C, D). Builds the unified dictionary (sorted distinct union of
    * the slice dictionaries, 1-based; 0 stays the Filtered code) and
    * remaps every slice's codes through old-code → label → new-code.
    *
    * Input: (codedFrame, dictionary) pairs, the dictionary as produced
    * by `categories` (label column first, then `code`). Returns the
    * unified dictionary and the remapped, name-aligned union of the
    * slices (missing columns null-filled, riptable's invalid-fill).
    * All dictionary joins broadcast — the fact slices never shuffle.
    */
  def mergeCats(slices: Seq[(DataFrame, DataFrame)],
                codeCol: String = "code"): (DataFrame, DataFrame) = {
    require(slices.nonEmpty, "mergeCats needs at least one slice")
    val labelCols = slices.map(_._2.columns.head)
    val unified = slices.map { case (_, d) =>
      d.select(col(d.columns.head).as("__label"))
    }.reduce(_ unionByName _).distinct()
      .withColumn(codeCol,
        guardedCode(row_number().over(Window.orderBy(col("__label")))))
    val remapped = slices.zip(labelCols).map { case ((df, dict), labelCol) =>
      val old = dict.select(col(labelCol).as("__label"),
        col(codeCol).as("__old"))
      val newd = unified.select(col("__label"), col(codeCol).as("__new"))
      df.withColumnRenamed(codeCol, "__old")
        .join(broadcast(old), Seq("__old"), "left")
        .join(broadcast(newd), Seq("__label"), "left")
        .withColumn(codeCol, coalesce(col("__new"), lit(0))) // 0 = Filtered
        .drop("__old", "__label", "__new")
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    (unified.withColumnRenamed("__label", labelCols.head), remapped)
  }

  /** shift_cat (rt_categorical.py:3336): lag the key column per group. */
  def shiftCat(df: DataFrame, keyCol: String, by: Seq[String],
               order: Seq[Column], n: Int = 1, out: String = "shifted"): DataFrame =
    df.withColumn(out,
      lag(col(keyCol), n).over(Window.partitionBy(by.map(col): _*).orderBy(order: _*)))
}
