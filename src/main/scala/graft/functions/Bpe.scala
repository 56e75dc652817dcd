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
  * transform + one hash aggregate, the argmax is a small top-k collect
  * (dictionary-sized driver state, same legitimacy class as the IVF
  * centroids), and applying a merge is one string `replace` — a
  * narrow projection, no shuffle. The word frame rides the shared LRU
  * persist registry, so training and application (and repeated calls)
  * reuse ONE corpus scan.
  *
  * Driver-loop depth — the 100 TB concern: a naive loop runs ONE Spark
  * job per learned merge, so a production 32k-merge vocabulary would
  * mean 32k jobs. Two mitigations here:
  *  - `bpeMerges` (exact) learns a SAFE PREFIX of merges per round —
  *    the provably-sequential-equal leading run of the stale pair
  *    table (see `safePrefix` for the argument). Output is
  *    bit-identical to one-merge-per-job sequential BPE (BpeSpec fuzz
  *    pins this against a textbook reference), typically 2-10 merges
  *    per job on natural text.
  *  - `bpeMergesBatched` (fastBPE-style approximation) greedily takes
  *    up to `batchCap` symbol-disjoint merges from each round's table,
  *    SKIPPING conflicts instead of stopping — tens-to-hundreds of
  *    merges per job (BpeSpec: 1k merges in ≤20 jobs), at the cost of
  *    exact sequential-order equality. Every emitted list is still a
  *    valid BPE merge table (apply in row order); this is the standard
  *    batching trade-off production BPE trainers make.
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

  /** The stale pair-frequency table of a segmentation frame, viable
    * pairs only (a pair seen once yields no compression), in BPE
    * priority order (count desc, then lexicographic).
    */
  private def pairTable(cur: DataFrame): DataFrame = cur
    .select(col("cnt"), symbols(col("sym")).as("t"))
    .select(col("cnt"), explode(expr(
      "transform(slice(t, 1, size(t) - 1), " +
        "(x, i) -> struct(x AS l, element_at(t, i + 2) AS r))"))
      .as("p"))
    .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("c"))
    .filter(col("c") >= 2)
    .orderBy(col("c").desc, col("l"), col("r"))

  /** The provably-sequential-equal leading run of a stale pair table.
    *
    * `rows` is the top of the table in priority order (count desc,
    * lex); `nextCount` bounds the count of every pair NOT in `rows`
    * (the (B+1)-th row's count, or 0 if the table fit entirely).
    * `mergedBefore` is every merged-symbol string learned in earlier
    * rounds (initial symbols are single characters, merged strings are
    * length ≥ 2, so this set is exactly the multi-char alphabet).
    *
    * Why the selected prefix equals sequential BPE, merge by merge:
    * walk rows in order, stopping at the first CONFLICT — a pair that
    * (a) shares a symbol with an already-selected pair, or (b) whose
    * merged string `l+r` already exists as a symbol (∈ mergedBefore).
    * Everything before the stop is mutually symbol-disjoint, so
    * applying any of them leaves the others' counts untouched. The
    * only pairs whose counts can RISE after applying selected merges
    * are pairs adjacent to a new merged symbol m_i: each such
    * occurrence (x, m_i) consumes an occurrence of the old pair
    * (x, l_i), which shares l_i with the selected p_i — i.e. it is a
    * conflicting pair, hence positioned at/after the stop row, hence
    * count ≤ stopCount (or < 2 and filtered, when the whole table was
    * conflict-free). Guard (b) covers the boost variant where l+r
    * collides with an existing symbol so (x, l+r) already had mass.
    * Trimming the selection to counts STRICTLY above the stop bound
    * removes the remaining hazard — a risen pair tying a selected
    * count and winning the lexicographic break. What survives is, step
    * by step, exactly the argmax sequential BPE would take. BpeSpec's
    * fuzz test pins this against a textbook sequential reference.
    */
  private def safePrefix(rows: Seq[(String, String, Long)], nextCount: Long,
                         mergedBefore: Set[String])
  : Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set[String]()
    val picked = Seq.newBuilder[(String, String, Long)]
    var bound = nextCount
    var stopped = false
    val it = rows.iterator
    while (!stopped && it.hasNext) {
      val p @ (l, r, c) = it.next()
      if (used(l) || used(r) || mergedBefore(l + r)) {
        bound = math.max(bound, c); stopped = true
      } else { picked += p; used += l; used += r }
    }
    val safe = picked.result().takeWhile(_._3 > bound)
    if (safe.nonEmpty) safe else rows.take(1)
  }

  /** Learn `rounds` BPE merges from the corpus' word-frequency table.
    * Returns `(round, lhs, rhs, merged, cnt)`, one row per learned
    * merge in application order (fewer rows iff the vocabulary runs
    * out of repeated pairs first). Exact — identical to one-merge-at-
    * a-time sequential BPE — but each driver round learns the provable
    * `safePrefix` of the round's table, so the job count is typically
    * a small fraction of `rounds`.
    */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int,
                lookahead: Int = 64): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(lookahead >= 1, s"lookahead must be >= 1, got $lookahead")
    val spark = docs.sparkSession
    val src = wordSyms(docs, textCol)
    // Session memo (kmeans/classifier-memo contract): the merge table
    // is a pure function of (word-frequency slice, rounds, lookahead)
    // and training is a DRIVER-SEQUENCED job chain — the expensive
    // part no registry frame can absorb. Consumers that re-train per
    // call (q226 segments, q243 fertility) pay it once per session;
    // the bench cold lane clears this so the build cost stays
    // measured, and Models.ensureBpeMerges remains the cross-SESSION
    // warm path. Deterministic plans only (the kmMemo rule).
    val memoKey = (spark, src.queryExecution.analyzed.canonicalized,
      rounds, lookahead)
    val memoizable = !graft.operators.GraftPlanUtil.nondeterministic(
      docs.queryExecution.analyzed)
    // single-lock read: containsKey + get under separate locks raced
    // with a concurrent put+LRU-evict in between (ADVICE r13 — the get
    // could return null and parallelize(null) would NPE)
    val cached =
      if (memoizable) mergesMemo.synchronized(Option(mergesMemo.get(memoKey)))
      else None
    cached.foreach { rows =>
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), outSchema)
    }
    var cur = src
    val merges = scala.collection.mutable.ArrayBuffer[Row]()
    val mergedSet = scala.collection.mutable.Set[String]()
    var sinceCheckpoint = 0
    var exhausted = false
    while (merges.size < rounds && !exhausted) {
      val top = pairTable(cur).limit(lookahead + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      if (top.isEmpty) exhausted = true
      else {
        val nextCount = if (top.size > lookahead) top.last._3 else 0L
        val selected = safePrefix(top.take(lookahead), nextCount,
          mergedSet.toSet).take(rounds - merges.size)
        selected.foreach { case (l, r, c) =>
          merges += Row(merges.size + 1, l, r, l + r, c)
          mergedSet += (l + r)
        }
        cur = cur.withColumn("sym", selected.foldLeft(col("sym")) {
          case (s, (l, r, _)) => applyMerge(s, l, r)
        })
        // Bound plan/expression depth for deep vocabularies: the merge
        // chain is one nested `replace` per learned merge, so truncate
        // lineage every few rounds. Lazy — materializes inside the
        // next round's collect, adding no extra job. (Single-JVM
        // caveat: localCheckpoint blocks don't survive executor loss;
        // on a long-lived cluster trainer prefer reliable checkpoints.)
        sinceCheckpoint += 1
        if (sinceCheckpoint >= 8 && merges.size < rounds) {
          cur = cur.localCheckpoint(false); sinceCheckpoint = 0
        }
      }
    }
    if (memoizable) mergesMemo.synchronized {
      mergesMemo.put(memoKey, merges.toSeq)
      while (mergesMemo.size > 32)
        mergesMemo.remove(mergesMemo.keySet.iterator.next())
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), outSchema)
  }

  /** Learned-merge memo for [[bpeMerges]] — (session, canonicalized
    * word-frequency plan, rounds, lookahead), deterministic plans
    * only, LRU-capped. */
  private val mergesMemo =
    new java.util.LinkedHashMap[Any, Seq[Row]](16, 0.75f, true)

  /** Drop every memoized merge table — the bench cold lane uses this
    * so the BPE family pays the full driver-sequenced training cost,
    * measuring what a first-call production user pays. */
  def clearMergesMemo(): Unit = mergesMemo.synchronized(mergesMemo.clear())

  /** Batched (approximate) BPE merge learning — the 32k-vocab scale
    * path. Each driver round collects the top `lookahead` viable pairs
    * once and greedily takes up to `batchCap` of them that are
    * mutually symbol-disjoint (and whose merged strings are fresh),
    * SKIPPING conflicting pairs rather than stopping at them. One
    * Spark job learns tens-to-hundreds of merges, so a 32k vocabulary
    * is a few hundred jobs instead of 32k.
    *
    * NOT guaranteed order-identical to sequential BPE (a skipped
    * pair's post-merge count may have overtaken a selected one —
    * exactly the approximation fastBPE-style trainers accept); every
    * output is still a valid merge table applied in row order, and
    * `batchCap = 1` degenerates to exact sequential BPE. BpeSpec pins
    * the validity laws (disjointness per round, character
    * conservation, batchCap=1 ≡ bpeMerges) and the job bound.
    */
  def bpeMergesBatched(docs: DataFrame, textCol: String, rounds: Int,
                       batchCap: Int = 128, lookahead: Int = 1024): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(batchCap >= 1, s"batchCap must be >= 1, got $batchCap")
    val spark = docs.sparkSession
    // AQE materializes every exchange as its own job — pure overhead on
    // the vocabulary-sized loop frames (3-4 jobs per round instead of
    // 1); the training loop runs with it off and restores the PRIOR
    // state on exit — including "unset", so a session that never set
    // the key gets it back unset, not pinned to a literal. (The flip is
    // session-global while the loop runs: a concurrent query on the
    // same SparkSession would also run without AQE for those seconds —
    // acceptable for a driver-sequenced trainer, noted for callers that
    // share the session.)
    val aqeWas = spark.conf.getOption("spark.sql.adaptive.enabled")
    var cur = wordSyms(docs, textCol)
    val merges = scala.collection.mutable.ArrayBuffer[Row]()
    val mergedSet = scala.collection.mutable.Set[String]()
    var exhausted = false
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    while (merges.size < rounds && !exhausted) {
      val top = pairTable(cur).limit(lookahead).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set[String]()
        val selected = top.iterator.filter { case (l, r, _) =>
          val ok = !used(l) && !used(r) && !mergedSet(l + r)
          if (ok) { used += l; used += r }
          ok
        }.take(math.min(batchCap, rounds - merges.size)).toSeq
        // every visible pair can collide with an already-merged string
        // (a re-formed adjacency whose concatenation was learned from a
        // different split) — stop rather than loop or emit duplicates
        if (selected.isEmpty) exhausted = true
        selected.foreach { case (l, r, c) =>
          merges += Row(merges.size + 1, l, r, l + r, c)
          mergedSet += (l + r)
        }
        cur = cur.withColumn("sym", selected.foldLeft(col("sym")) {
          case (s, (l, r, _)) => applyMerge(s, l, r)
        }).localCheckpoint(false) // lazy: rides the next round's job
      }
    }
    } finally aqeWas match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
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

  /** Tokenizer FERTILITY per group — the standard "how well does this
    * vocabulary fit each domain" diagnostic (subwords per word and
    * chars per subword; a fertility spike on one source means the
    * learned vocabulary under-serves it). Same training slice as
    * [[bpeMerges]] (whitespace words, ASCII-printable).
    *
    * Scale shape: one corpus scan builds the per-group word-frequency
    * frame; the merge chain is applied to the DISTINCT-word frame only
    * (vocabulary-sized, map-only — each corpus word is segmented once,
    * not once per occurrence), which then joins back by word. Per-group
    * sums are map-side combined; the two ratios divide exact integer
    * sums, so both engines produce identical doubles (rounded 6 dp).
    */
  def bpeFertilityBy(docs: DataFrame, byCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val sw = docs
      .select(col(byCol), explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && col("w").rlike("^[ -~]+$"))
      .groupBy(col(byCol), col("w")).agg(count(lit(1)).as("cnt"))
    val symInit = concat(lit(S + S), concat_ws(S + S,
      filter(split(col("w"), ""), x => x =!= lit(""))), lit(S + S))
    val sym = merges.foldLeft(symInit) { case (s, (l, r)) =>
      applyMerge(s, l, r)
    }
    val seg = sw.select(col("w")).distinct()
      .select(col("w"), size(symbols(sym)).cast("long").as("__nsub"))
    sw.join(seg, Seq("w"))
      .groupBy(col(byCol))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("__nsub")).as("n_subwords"),
        sum(col("cnt") * length(col("w")).cast("long")).as("n_chars"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_words"), 6))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_subwords"), 6))
  }
}
