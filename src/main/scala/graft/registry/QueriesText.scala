package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.functions._
import graft.syntax._

/** Query registry — text analysis: tokens, lang-ID, quality, TF-IDF/BM25, cross-entropy, BPE, PII, strings.
  * One entry per SURVEY §2 operator family member; names pair 1:1 with
  * `OraclesText.m` (driver contract: SparkEntry.queries/oracleSql).
  */
private[graft] object QueriesText {
  import QueryShared._

  def m: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q18_strings" -> ((s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).cast("long").as("name_len"),
          col("p_type").contains("BRASS").as("is_brass"),
          col("p_name").startsWith("a").as("starts_a"),
          substring(col("p_brand"), 1, 5).as("brand5"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_first"))
        .orderBy(col("p_partkey"))),

    // ---- text analysis / dedup / similarity (LLM-pipeline pack) ----

    "q26_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextFns.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    "q32_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextFns.langScore(col("text"), "en").cast("long").as("en_score"),
          TextFns.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    "q67_strings2" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          locate("a", col("p_name")).as("pos_a"),
          reverse(col("p_name")).as("rev"),
          rtrim(col("p_name")).as("rtrimmed"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_word1"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          concat(col("p_name"), lit("_sfx")).as("appended"),
          lower(col("p_name")).as("lowered"),
          ltrim(col("p_name")).as("ltrimmed"))
        .orderBy(col("p_partkey"))),

    "q116_json_props" -> ((s, dir) =>
      // semi-structured payloads (events.props is JSON): scan-side
      // extraction with get_json_object — codegen'd, no UDFs, the
      // training-pipeline path for metadata-bearing event streams
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          (get_json_object(col("props"), "$.k").cast("long") > 90).as("is_high"))
        .orderBy(col("event_id"))),

    "q115_repetition" -> ((s, dir) => {
      // repeated-ngram quality signal (Gopher-style filter): fraction of
      // non-distinct 3-gram shingles per doc; distinct counts ride the
      // existing shingle-hash machinery, totals are token arithmetic
      val docs = t(s, dir, "documents")
      val tot = docs.select(col("doc_id"),
        greatest(TextFns.tokenCount(col("text")) - 2, lit(1)).cast("long")
          .as("n_total"))
      val dis = Dedup.shingleHashes(docs, "doc_id", "text", 3)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_distinct"))
      tot.join(dis, Seq("doc_id"))
        .withColumn("rep_ratio",
          round(lit(1.0) - col("n_distinct") / col("n_total"), 6))
        .orderBy(col("doc_id"))
    }),

    "q111_bpe_tokens" -> ((s, dir) =>
      // BPE-ish subword count (brief: token counting beyond whitespace)
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFns.tokenCountBpeIsh(col("text")).cast("long").as("n_subwords"),
          TextFns.tokenCount(col("text")).cast("long").as("n_words"))
        .orderBy(col("doc_id"))),

    // Per-doc top-3 TF-IDF terms — keyword extraction for corpus
    // curation; rounded-score ranking keeps the order engine-stable
    "q130_tfidf" -> ((s, dir) =>
      TextFns.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy(col("doc_id"), col("rk"))),

    // FAString.extract multi-group → columns (rt_str.py:1030): one regex
    // evaluation shape per group, codegen'd, scan-only
    "q137_regex_extract" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_type"), "^(\\w+)\\s+(\\w+)\\s+(\\w+)", 1).as("t1"),
          regexp_extract(col("p_type"), "^(\\w+)\\s+(\\w+)\\s+(\\w+)", 2).as("t2"),
          regexp_extract(col("p_type"), "^(\\w+)\\s+(\\w+)\\s+(\\w+)", 3).as("t3"),
          regexp_extract(col("p_brand"), "([0-9]+)$", 1).as("brand_num"))
        .orderBy(col("p_partkey"))),

    // Unigram cross-entropy quality score — the LM-perplexity filter
    // proxy: avg −ln p(token) under the corpus unigram distribution
    "q141_unigram_xent" -> ((s, dir) =>
      TextFns.unigramCrossEntropy(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Corpus vocabulary stats: top-20 tokens by frequency with dense
    // Zipf rank — the vocabulary health check before tokenizer training
    "q142_vocab_stats" -> ((s, dir) => {
      val freqs = t(s, dir, "documents")
        .select(explode(TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      freqs
        .orderBy(col("tf").desc, col("term"))
        .limit(20)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("tf").desc, col("term"))).cast("long"))
    }),

    "q171_bigram_xent" -> ((s, dir) =>
      // CCNet-style fluency score: cross-entropy under a smoothed
      // conditional bigram LM trained on the corpus itself
      TextFns.bigramCrossEntropy(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "q172_dsir_weights" -> ((s, dir) =>
      // DSIR domain selection: importance weight of each doc toward the
      // English subset as the target domain, hashed-bigram features
      operators.Curate.dsirLogWeights(t(s, dir, "documents"), "doc_id",
        "text", col("lang") === "en", buckets = 1024)
        .orderBy(col("doc_id"))),

    "q173_repetition" -> ((s, dir) =>
      // Gopher-style within-doc repetition: top/duplicate 2- and 3-gram
      // fractions per document
      TextFns.repetitionStats(t(s, dir, "documents"), "doc_id", "text",
        ns = Seq(2, 3))
        .orderBy(col("doc_id"))),

    // PII scrubbing: the corpus text is synthetic word-soup with no
    // natural PII, so the query EMBEDS deterministic emails/IPs/phones/
    // SSNs keyed off doc_id (both engines build the identical string —
    // the q157 synthesized-input pattern), then counts and redacts.
    "q179_pii_scrub" -> ((s, dir) => {
      val id = col("doc_id")
      def n(c: Column): Column = c.cast("string")
      def m(c: Column, d: Int): Column = pmod(c, lit(d))
      val synth = concat(col("text"),
        when(m(id, 3) === 0, concat(lit(" contact u"), n(id),
          lit("@ex"), n(m(id, 7)), lit(".com"))).otherwise(""),
        when(m(id, 4) === 0, concat(lit(" from 10."), n(m(id, 256)),
          lit("."), n(m(id * 7, 256)), lit("."),
          n(m(id * 13, 256)))).otherwise(""),
        when(m(id, 5) === 0, concat(lit(" call "), n(m(id, 700) + 200),
          lit("-"), n(m(id * 3, 900) + 100), lit("-"),
          n(m(id * 7, 9000) + 1000))).otherwise(""),
        when(m(id, 7) === 0, concat(lit(" ssn "), n(m(id, 900) + 100),
          lit("-"), n(m(id, 90) + 10), lit("-"),
          n(m(id * 11, 9000) + 1000))).otherwise(""))
      t(s, dir, "documents")
        .select(col("source"), synth.as("__s"))
        .select(col("source"),
          TextFns.piiCount(col("__s"), TextFns.Pii.email).as("__e"),
          TextFns.piiCount(col("__s"), TextFns.Pii.ipv4).as("__i"),
          TextFns.piiCount(col("__s"), TextFns.Pii.phone).as("__p"),
          TextFns.piiCount(col("__s"), TextFns.Pii.ssn).as("__n"),
          length(TextFns.redactPii(col("__s"))).as("__len"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__e")).as("emails"),
          sum(col("__i")).as("ips"), sum(col("__p")).as("phones"),
          sum(col("__n")).as("ssns"),
          sum(col("__len")).as("redacted_chars"))
        .orderBy(col("source"))
    }),

    // Unicode NFC at ingest: even docs get a decomposed suffix
    // (e + U+0301), odd docs the precomposed form (U+00E9); after
    // rip_nfc both collapse to identical bytes — cp counts and change
    // flags verify the normalization itself.
    "q188_nfc_normalize" -> ((s, dir) => {
      val id = col("doc_id")
      val synth = concat(col("text"),
        when(pmod(id, lit(2)) === 0,
          lit(" café résumé"))
          .otherwise(lit(" café résumé")))
      t(s, dir, "documents")
        .select(col("source"), synth.as("__s"))
        .select(col("source"), col("__s"), TextFns.nfc(col("__s")).as("__n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__n") =!= col("__s"), 1L).otherwise(0L))
            .as("n_changed"),
          sum(length(col("__s"))).as("cp_raw"),
          sum(length(col("__n"))).as("cp_nfc"),
          countDistinct(md5(col("__n"))).as("n_distinct_nfc"))
        .orderBy(col("source"))
    }),

    // BM25 keyword retrieval: top-10 docs for a 4-term query (Lucene
    // idf form, k1=1.2, b=0.75) — the lexical baseline beside ANN.
    "q189_bm25" -> ((s, dir) =>
      TextFns.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "merge", "window", "stream"), 10)),

    // One-scan column profiler over orders (timestamp column excluded:
    // fractional-second string rendering is engine-dependent); the KMV
    // estimate makes even the cardinality column exactly checkable.
    // min/max/count + set-based KMV are all partition-invariant; the
    // floor fans the one-scan wide aggregate (incl. the per-partition
    // KMV buffers) across cores instead of one task (r16)
    "q191_profile" -> ((s, dir) =>
      Stats.profile(Tables.floored(s, dir, "orders", "o_orderkey"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))
        .orderBy(col("colname"))),

    // Reciprocal-rank fusion of two BM25 rankings (two query
    // formulations) — the hybrid-retrieval combiner, score-free.
    "q190_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def ranked(terms: Seq[String]) = {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))
        TextFns.bm25TopK(docs, "doc_id", "text", terms, 20)
          .withColumn("rank", row_number().over(w))
      }
      TextFns.rrfFuse(Seq(
        ranked(Seq("spark", "merge", "window", "stream")),
        ranked(Seq("filter", "join", "sort", "hash"))),
        "doc_id", "rank", 10)
    }),

    // Hashing-trick linear scorer (fastText-shaped quality filter):
    // integer-unit weights keep per-doc scores EXACT, so pass/fail
    // decisions can't drift with summation order; min/max per source
    // are order-independent selections.
    "q193_hashed_scorer" -> ((s, dir) =>
      Curate.hashedLinearScore(t(s, dir, "documents"), "doc_id", "text",
        buckets = 4096, carryCols = Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score_units") > 0, 1L).otherwise(0L)).as("n_pos"),
          sum(col("score_units")).as("units_sum"),
          min(col("score")).as("score_min"),
          max(col("score")).as("score_max"))
        .orderBy(col("source"))),

    // FAString niche byte-ops (rt_str.py:621,642,1232,1278): char /
    // index_any_of (strpbrk) / substr_char_stop both flavors — pure
    // codegen'd Column expressions, one scan-speed projection
    "q231_fastring" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFns.charAt(col("text"), lit(0)).as("c0"),
        TextFns.charAt(col("text"), lit(-1)).as("clast"),
        TextFns.charAt(col("text"), lit(9999)).as("coob"),
        TextFns.indexAnyOf(col("text"), "aeiou").cast("long").as("vowel_idx"),
        TextFns.indexAnyOf(col("text"), "zq!").cast("long").as("rare_idx"),
        TextFns.substrCharStop(col("text"), " ").as("first_word"),
        TextFns.substrCharStop(col("text"), " ", inclusive = true)
          .as("first_word_sp"))
        .orderBy(col("doc_id"))),

    // BPE merge learning (Sennrich 2016): 10 rounds of most-frequent-
    // pair merges over the word-frequency table — ONE corpus scan,
    // then every round is vocab-sized. The oracle replays the full
    // merge cascade as 10 unrolled CTE rounds.
    "q225_bpe_merges" -> ((s, dir) =>
      Bpe.bpeMerges(t(s, dir, "documents"), "text", rounds = 10)
        .orderBy(col("round"))),

    // Applying the learned merges: the corpus' subword-vocabulary
    // histogram under the 10-round merge table — proves the APPLY
    // path (priority-ordered replace chain) end to end.
    "q226_bpe_segments" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val learned = Bpe.bpeMerges(docs, "text", rounds = 10)
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.bpeSegmentCounts(docs, "text", learned).orderBy(col("token"))
    }),

    // Tokenizer fertility per source under the learned 10-round merge
    // table — subwords/word and chars/subword (the "does this
    // vocabulary fit each domain" diagnostic); segmentation is applied
    // to the DISTINCT-word frame only, so the corpus tokenizes once
    // per vocabulary entry, not once per occurrence
    "q243_bpe_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val learned = Bpe.bpeMerges(docs, "text", rounds = 10)
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.bpeFertilityBy(docs, "source", "text", learned)
        .orderBy(col("source"))
    }),

    // BPE merge-table ARTIFACT round trip (q253/q254's twin for the
    // tokenizer family): the 10-round merge list persists as a
    // content-addressed parquet artifact (Models.ensureBpeMerges —
    // order-preserving, since applies are a priority chain) and the
    // segmentation runs under the ARTIFACT merges. Identical rounds +
    // corpus ⇒ identical vocabulary histogram (q226's oracle); any
    // later session pays one tiny read instead of 10 driver-sequenced
    // training jobs — BPE has no session memo, so this is its ONLY
    // warm path.
    "q255_bpe_artifact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val learned = Models.ensureBpeMerges(docs, "text", rounds = 10)
      Bpe.bpeSegmentCounts(docs, "text", learned).orderBy(col("token"))
    }),

    // Corpus-level n-gram diversity per source: distinct-gram ratio for
    // n = 1..3 — the template-spam / mode-collapse screen (q173's
    // within-doc repetition, lifted to the whole source)
    "q245_ngram_diversity" -> ((s, dir) =>
      TextFns.ngramDiversity(t(s, dir, "documents"), "source", "text",
        ns = Seq(1, 2, 3))
        .orderBy(col("source"), col("n"))),

    // Character-distribution entropy per source (compression-ratio
    // proxy): one char explode → map-side-combined counts, entropy
    // fold over the alphabet-sized frame only
    "q246_char_entropy" -> ((s, dir) =>
      TextFns.charEntropyBy(t(s, dir, "documents"), "source", "text")
        .orderBy(col("source")))
  )
}
