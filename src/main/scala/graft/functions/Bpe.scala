package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * round touching only the vocab frame. The word frame rides the
  * shared LRU persist registry, so training and application (and
  * repeated calls) reuse ONE corpus scan.
  *
  * Representation: a word's segmentation is its symbols joined and
  * bracketed by DOUBLE U+0001 separators (`⟂⟂a⟂⟂b⟂⟂` for [a, b];
  * words are whitespace-split and filtered to ASCII-printable, so the
  * separator cannot occur in a symbol). Merging (a, b) is
  * `replace(sym, ⟂a⟂⟂b⟂, ⟂ab⟂)` — the pattern takes only the INNER
  * separator of each double boundary, leaving the outer one for the
  * neighboring occurrence, so one left-to-right non-overlapping
  * `replace` sweep merges every symbol-boundary occurrence exactly
  * like the sequential leftmost BPE rule (with a SINGLE separator the
  * shared boundary character is consumed and `abab` mis-segments to
  * [ab, a, b] — BpeSpec pins the [ab, ab] behavior). Equality with
  * sequential BPE holds because a merge can never create a new
  * occurrence of its own pair (the merged symbol is strictly longer
  * than either side), and truly overlapping self-pair runs (`aaaa`)
  * resolve left-to-right in both. The ASCII-printable restriction is
  * the documented training slice: byte/codepoint splitting differs
  * across engines for multi-byte text, and production byte-level BPE
  * sidesteps the issue the same way — by working on bytes.
  */
object Bpe {

  private val S = "\u0001"

  private val outSchema = StructType(Seq(
    StructField("round", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** The shared training slice: ASCII-printable word frequencies with
    * the initial character segmentation, persisted via the dedup LRU
    * registry so every consumer (training rounds, application, and
    * repeated calls over one corpus) shares a single corpus scan.
    */
  private def wordSyms(docs: DataFrame, textCol: String): DataFrame = {
    val symInit = concat(lit(S + S), concat_ws(S + S,
      filter(split(col("w"), ""), x => x =!= lit(""))), lit(S + S))
    graft.operators.Dedup.registryPersist(docs
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && col("w").rlike("^[ -~]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(symInit.as("sym"), col("cnt")))
  }

  /** `⟂l⟂⟂r⟂ → ⟂lr⟂` on the double-separator representation. */
  private def applyMerge(sym: Column, l: String, r: String): Column =
    call_function("replace", sym, lit(S + l + S + S + r + S), lit(S + l + r + S))

  /** Symbol list of a bracketed segmentation string. */
  private def symbols(sym: Column): Column = split(trim(sym, S), S + S)

  /** Learn `rounds` BPE merges from the corpus' word-frequency table.
    * Returns `(round, lhs, rhs, merged, cnt)`, one row per learned
    * merge in application order (fewer rows iff the vocabulary runs
    * out of repeated pairs first).
    */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    var cur = wordSyms(docs, textCol)
    val merges = scala.collection.mutable.ArrayBuffer[Row]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = cur
        .select(col("cnt"), symbols(col("sym")).as("t"))
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
        cur = cur.withColumn("sym", applyMerge(col("sym"), l, rr))
        r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), outSchema)
  }

  /** Apply a learned merge table to segment text into subword tokens:
    * one `(token, n)` row per distinct subword with its corpus count —
    * the vocabulary histogram under the learned merges. Map-only over
    * the word-frequency frame (shared with training through the
    * persist registry — one corpus scan for the whole train+apply
    * pipeline); the merge list rides into the plan as a chain of
    * `replace` projections in learned order, which IS the BPE apply
    * rule (merges applied in priority order).
    */
  def bpeSegmentCounts(docs: DataFrame, textCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val sym = merges.foldLeft(col("sym")) { case (s, (l, r)) =>
      applyMerge(s, l, r)
    }
    wordSyms(docs, textCol)
      .select(col("cnt"), explode(symbols(sym)).as("token"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("n"))
  }
}
