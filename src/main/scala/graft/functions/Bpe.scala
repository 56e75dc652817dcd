package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic BPE merge learning over a corpus — the tokenizer-
  * training step of a training-data pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public algorithm). Each round merges the globally most frequent
  * adjacent symbol pair; ties break lexicographically, so the learned
  * merge table is a pure function of the corpus.
  *
  * Scale shape (the part that matters at 100 TB): BPE statistics are a
  * function of the WORD-FREQUENCY table, not the corpus — ONE corpus
  * scan builds `(word, count)` (map-side combined; the riptable-side
  * analogue of this collapse is the Grouping dictionary,
  * `riptable/rt_grouping.py`), and every merge round runs over that
  * vocabulary-sized frame: pair counting is a codegen'd array
  * transform + one hash aggregate, the argmax is a one-row collect
  * (dictionary-sized driver state, same legitimacy class as the IVF
  * centroids), and applying a merge is one string `replace` — a
  * narrow projection, no shuffle. Driver loop depth = `rounds`, each
  * round touching only the vocab frame.
  *
  * Representation: a word's segmentation is its symbols joined AND
  * bracketed by U+0001 (words are whitespace-split and filtered to
  * ASCII-printable, so the separator cannot occur in a symbol). The
  * bracketing makes `replace(sym, SEP+a+SEP+b+SEP, SEP+ab+SEP)` match
  * exactly at symbol boundaries — a bare `a SEP b` pattern could match
  * the TAIL of a longer first symbol (`xa SEP b`) and corrupt it — and
  * both engines' `replace` scan left-to-right non-overlapping, so
  * `a a a` merges to `[aa, a]` identically (the classic leftmost BPE
  * application). The ASCII-printable restriction is the documented
  * training slice: byte/codepoint splitting differs across engines for
  * multi-byte text, and production byte-level BPE sidesteps the issue
  * the same way — by working on bytes.
  */
object Bpe {

  private val Sep = "\u0001"

  private val outSchema = StructType(Seq(
    StructField("round", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Learn `rounds` BPE merges from the corpus' word-frequency table.
    * Returns `(round, lhs, rhs, merged, cnt)`, one row per learned
    * merge in application order (fewer rows iff the vocabulary runs
    * out of repeated pairs first).
    */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && col("w").rlike("^[ -~]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val symInit = concat(lit(Sep), concat_ws(Sep,
      filter(split(col("w"), ""), x => x =!= lit(""))), lit(Sep))
    // vocab-sized; every round's pair count re-reads it with the
    // accumulated replaces stacked as one codegen'd projection
    val base = words.select(symInit.as("sym"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cur = base
      val merges = scala.collection.mutable.ArrayBuffer[Row]()
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val best = cur
          .select(col("cnt"), split(trim(col("sym"), Sep), Sep).as("t"))
          .select(col("cnt"), explode(expr(
            "transform(slice(t, 1, size(t) - 1), " +
              "(x, i) -> struct(x AS l, element_at(t, i + 2) AS r))"))
            .as("p"))
          .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("c"))
          .filter(col("c") >= 2) // a pair seen once yields no compression
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (l, rr, c) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          merges += Row(r, l, rr, l + rr, c)
          cur = cur.withColumn("sym", call_function("replace", col("sym"),
            lit(Sep + l + Sep + rr + Sep), lit(Sep + l + rr + Sep)))
          r += 1
        }
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(merges.toSeq, 1), outSchema)
    } finally base.unpersist(blocking = false)
  }

  /** Apply a learned merge table to segment text into subword tokens:
    * one `(token, n)` row per distinct subword with its corpus count —
    * the vocabulary histogram under the learned merges. Map-only over
    * the word-frequency frame (the same one-scan collapse as
    * training); the merge list rides into the plan as a chain of
    * `replace` projections in learned order, which IS the BPE apply
    * rule (merges applied in priority order).
    */
  def bpeSegmentCounts(docs: DataFrame, textCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && col("w").rlike("^[ -~]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val symInit = concat(lit(Sep), concat_ws(Sep,
      filter(split(col("w"), ""), x => x =!= lit(""))), lit(Sep))
    val sym = merges.foldLeft(symInit) { case (s, (l, rr)) =>
      call_function("replace", s,
        lit(Sep + l + Sep + rr + Sep), lit(Sep + l + rr + Sep))
    }
    words.select(col("cnt"), explode(split(trim(sym, Sep), Sep)).as("token"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("n"))
  }
}
