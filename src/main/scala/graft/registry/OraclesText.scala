package graft

/** DuckDB oracle SQL paired 1:1 with `QueriesText.m` — text analysis: tokens, lang-ID, quality, TF-IDF/BM25, cross-entropy, BPE, PII, strings.
  * Column names/types mirror the Spark side exactly (driver hash gate).
  */
private[graft] object OraclesText {
  import OracleSqlHelpers._

  def m: Map[String, String] = Map(

    "q18_strings" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  contains(p_type, 'BRASS') AS is_brass,
        |  starts_with(p_name, 'a') AS starts_a,
        |  substring(p_brand, 1, 5) AS brand5,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_first
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q26_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_tokens,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q32_langid" ->
      """SELECT doc_id, lang,
        |  len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    t -> t IN ('the','and','of','to','a','in','is','it'))) AS en_score,
        |  round((
        |    CASE WHEN length(text) >= 200 AND length(text) <= 10000 THEN 1.0
        |      WHEN length(text) < 200 THEN length(text) / 200.0
        |      ELSE 10000.0 / length(text) END
        |    + CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - least(p / greatest(n, 1.0), 1.0) END
        |    + CASE WHEN n = 0 THEN 0.0 ELSE least(st * 4.0 / greatest(n, 1.0), 1.0) END
        |  ) / 3.0, 6) AS quality
        |FROM (SELECT doc_id, lang, text,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) AS n,
        |  CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS p,
        |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    t -> t IN ('the','and','of','to','a','in','is','it'))) AS DOUBLE) AS st
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q67_strings2" ->
      """SELECT p_partkey,
        |  CAST(instr(p_name, 'a') AS INTEGER) AS pos_a,
        |  reverse(p_name) AS rev,
        |  rtrim(p_name) AS rtrimmed,
        |  split_part(p_type, ' ', 1) AS type_word1,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  p_name || '_sfx' AS appended,
        |  lower(p_name) AS lowered,
        |  ltrim(p_name) AS ltrimmed
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q116_json_props" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract(props, '$.k') AS BIGINT) > 90 AS is_high
        |FROM events ORDER BY event_id""".stripMargin,

    "q115_repetition" ->
      """WITH toks AS (SELECT doc_id, text,
        |    string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(t) END AS ntok,
        |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |      ELSE list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS sh
        |  FROM toks)
        |SELECT doc_id,
        |  CAST(greatest(ntok - 2, 1) AS BIGINT) AS n_total,
        |  CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
        |  round(1.0 - len(list_distinct(sh)) / greatest(ntok - 2, 1), 6)
        |    AS rep_ratio
        |FROM c ORDER BY doc_id""".stripMargin,

    "q111_bpe_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
        |    AS n_subwords,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(lower(trim(text)), '\s+')) END
        |    AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q130_tfidf" ->
      """WITH terms AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS n FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(n) AS len FROM tf GROUP BY 1),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term,
        |    round((CAST(tf.n AS DOUBLE) / dl.len) * ln(nd.nd / df.df), 6)
        |      AS tfidf
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term), nd),
        |rk AS (SELECT doc_id, term, tfidf, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, term, tfidf, rk FROM rk WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    "q137_regex_extract" ->
      """SELECT p_partkey,
        |  coalesce(regexp_extract(p_type, '^(\w+)\s+(\w+)\s+(\w+)', 1), '') AS t1,
        |  coalesce(regexp_extract(p_type, '^(\w+)\s+(\w+)\s+(\w+)', 2), '') AS t2,
        |  coalesce(regexp_extract(p_type, '^(\w+)\s+(\w+)\s+(\w+)', 3), '') AS t3,
        |  coalesce(regexp_extract(p_brand, '([0-9]+)$', 1), '') AS brand_num
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q141_unigram_xent" ->
      """WITH terms AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |f AS (SELECT term, count(*) AS tf FROM terms GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS tot FROM f)
        |SELECT doc_id, round(avg(-ln(CAST(tf AS DOUBLE) / tot)), 6) AS xent,
        |  count(*) AS n_tokens
        |FROM terms JOIN f USING (term), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q142_vocab_stats" ->
      """WITH terms AS (SELECT
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |f AS (SELECT term, count(*) AS tf FROM terms GROUP BY 1),
        |top AS (SELECT term, tf FROM f ORDER BY tf DESC, term LIMIT 20)
        |SELECT term, tf, row_number() OVER (ORDER BY tf DESC, term) AS rnk
        |FROM top ORDER BY rnk""".stripMargin,

    "q171_bigram_xent" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |bgs AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
        |  FROM toks WHERE len(t) >= 2),
        |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bgs),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM c2)
        |SELECT doc_id,
        |  round(avg(-ln((CAST(c2 AS DOUBLE) + 1) / (CAST(c1 AS DOUBLE) + v))),
        |    6) AS xent2,
        |  count(*) AS n_bigrams
        |FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q172_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS tgt,
        |    string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |uni AS (SELECT doc_id, tgt, unnest(t) AS g FROM toks),
        |bi AS (SELECT doc_id, tgt, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS g
        |  FROM toks WHERE len(t) >= 2),
        |gr AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        |hb AS (SELECT doc_id, tgt, CAST(list_sum(list_transform(range(1, 16),
        |  i -> CAST(strpos('0123456789abcdef', md5(g)[i]) - 1 AS BIGINT)
        |    << (4 * (15 - i)))) AS BIGINT) % 1024 AS b FROM gr),
        |cr AS (SELECT b, count(*) AS cr FROM hb GROUP BY 1),
        |ct AS (SELECT b, count(*) AS ct FROM hb WHERE tgt GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nr,
        |  CAST(count(*) FILTER (WHERE tgt) AS DOUBLE) AS nt FROM hb),
        |model AS (SELECT b,
        |  ln((CAST(COALESCE(ct, 0) AS DOUBLE) + 1) / (nt + 1024)) -
        |  ln((CAST(cr AS DOUBLE) + 1) / (nr + 1024)) AS lw
        |  FROM cr LEFT JOIN ct USING (b), tot)
        |SELECT doc_id, round(sum(lw), 6) AS log_weight,
        |  count(*) AS n_grams
        |FROM hb JOIN model USING (b)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q173_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> array_to_string(t[i:i+1], ' '))) AS g FROM toks),
        |g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS g FROM toks),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |d2 AS (SELECT doc_id,
        |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
        |    AS top2_frac,
        |  round(CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
        |    AS dup2_frac FROM c2 GROUP BY 1),
        |d3 AS (SELECT doc_id,
        |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
        |    AS top3_frac,
        |  round(CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
        |    AS dup3_frac FROM c3 GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(top2_frac, 0) AS top2_frac,
        |  COALESCE(dup2_frac, 0) AS dup2_frac,
        |  COALESCE(top3_frac, 0) AS top3_frac,
        |  COALESCE(dup3_frac, 0) AS dup3_frac
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN d2 USING (doc_id) LEFT JOIN d3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // identical synthesized PII text (keyed off doc_id), identical
    // pattern strings (Java-regex ∩ RE2 subset), identical replace
    // order; DuckDB needs the 'g' flag for replace-ALL (Spark's
    // regexp_replace is global by default)
    "q179_pii_scrub" ->
      """WITH synth AS (SELECT source, text
        |  || CASE WHEN doc_id % 3 = 0 THEN ' contact u' || doc_id
        |       || '@ex' || (doc_id % 7) || '.com' ELSE '' END
        |  || CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || (doc_id % 256)
        |       || '.' || ((doc_id*7) % 256) || '.' || ((doc_id*13) % 256)
        |     ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN ' call ' || (doc_id % 700 + 200)
        |       || '-' || ((doc_id*3) % 900 + 100) || '-'
        |       || ((doc_id*7) % 9000 + 1000) ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0 THEN ' ssn ' || (doc_id % 900 + 100)
        |       || '-' || (doc_id % 90 + 10) || '-'
        |       || ((doc_id*11) % 9000 + 1000) ELSE '' END AS s
        |  FROM documents),
        |red AS (SELECT source,
        |  len(regexp_extract_all(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
        |  len(regexp_extract_all(s,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS i,
        |  len(regexp_extract_all(s, '\b\d{3}-\d{3}-\d{4}\b')) AS p,
        |  len(regexp_extract_all(s, '\b\d{3}-\d{2}-\d{4}\b')) AS n,
        |  length(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(s,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g')) AS rlen
        |  FROM synth)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(e) AS BIGINT) AS emails, CAST(sum(i) AS BIGINT) AS ips,
        |  CAST(sum(p) AS BIGINT) AS phones, CAST(sum(n) AS BIGINT) AS ssns,
        |  CAST(sum(rlen) AS BIGINT) AS redacted_chars
        |FROM red GROUP BY 1 ORDER BY 1""".stripMargin,

    // suffixes built from chr() so the byte sequences are unambiguous:
    // chr(769) = U+0301 combining acute, chr(233) = precomposed é;
    // nfc_normalize implements the same Unicode NFC as rip_nfc
    "q188_nfc_normalize" ->
      """WITH synth AS (SELECT source,
        |  text || CASE WHEN doc_id % 2 = 0
        |    THEN ' cafe' || chr(769) || ' re' || chr(769) || 'sume'
        |      || chr(769)
        |    ELSE ' caf' || chr(233) || ' r' || chr(233) || 'sum'
        |      || chr(233) END AS s
        |  FROM documents),
        |nn AS (SELECT source, s, nfc_normalize(s) AS n FROM synth)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN n <> s THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changed,
        |  CAST(sum(length(s)) AS BIGINT) AS cp_raw,
        |  CAST(sum(length(n)) AS BIGINT) AS cp_nfc,
        |  count(DISTINCT md5(n)) AS n_distinct_nfc
        |FROM nn GROUP BY 1 ORDER BY 1""".stripMargin,

    // Lucene-idf BM25 mirror; score rounded to 6dp BEFORE the ranking
    // order on both sides, id tiebreak
    "q189_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |st AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
        |ft AS (SELECT doc_id, dl, term, count(*) AS tf FROM st
        |  WHERE term IN ('spark', 'merge', 'window', 'stream')
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM st
        |  WHERE term IN ('spark', 'merge', 'window', 'stream')
        |  GROUP BY 1),
        |corpus AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM toks),
        |sc AS (SELECT doc_id,
        |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
        |    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
        |  FROM ft JOIN dfq USING (term), corpus GROUP BY 1)
        |SELECT doc_id, score FROM sc
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // per-column UNION ALL long table, then the q187 KMV mirror keyed
    // by colname; TRY_CAST mirrors ANSI-off cast-to-null
    "q191_profile" -> {
      val colsP = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority")
      val union = colsP.map(c =>
        s"SELECT '$c' AS colname, CAST($c AS VARCHAR) AS v FROM orders")
        .mkString("\n  UNION ALL ")
      s"""WITH longt AS ($union),
         |base AS (SELECT colname, count(*) AS n,
         |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  min(v) AS min_str, max(v) AS max_str,
         |  round(min(TRY_CAST(v AS DOUBLE)), 6) AS min_num,
         |  round(max(TRY_CAST(v AS DOUBLE)), 6) AS max_num
         |  FROM longt GROUP BY 1),
         |hh AS (SELECT DISTINCT colname,
         |  CAST(list_sum(list_transform(range(1, 16),
         |    i -> CAST(strpos('0123456789abcdef', md5(v)[i]) - 1 AS BIGINT)
         |      << (4 * (15 - i)))) AS BIGINT) AS h
         |  FROM longt WHERE v IS NOT NULL),
         |rk AS (SELECT colname, h,
         |  row_number() OVER (PARTITION BY colname ORDER BY h) AS rn
         |  FROM hh),
         |kk AS (SELECT colname, count(*) AS cnt, max(h) AS hk
         |  FROM rk WHERE rn <= 64 GROUP BY 1),
         |est AS (SELECT colname,
         |  CASE WHEN cnt < 64 THEN CAST(cnt AS DOUBLE)
         |    ELSE round(63.0 * CAST(1152921504606846976 AS DOUBLE)
         |      / CAST(hk AS DOUBLE), 4) END AS distinct_est,
         |  CAST(cnt AS BIGINT) AS sketch_size FROM kk)
         |SELECT base.colname, n, n_null, min_str, max_str, min_num,
         |  max_num, distinct_est, sketch_size
         |FROM base JOIN est USING (colname) ORDER BY colname""".stripMargin
    },

    // two BM25 top-20 rankings (same CTE body, different term sets)
    // fused by 1/(60+rank); rank + fused score both on 6-dp-rounded
    // values with id tiebreaks on both sides
    "q190_hybrid_rrf" -> {
      def bmCte(sfx: String, terms: String): String =
        s"""ft$sfx AS (SELECT doc_id, dl, term, count(*) AS tf FROM st
           |  WHERE term IN ($terms) GROUP BY 1, 2, 3),
           |dfq$sfx AS (SELECT term, count(DISTINCT doc_id) AS df FROM st
           |  WHERE term IN ($terms) GROUP BY 1),
           |sc$sfx AS (SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
           |    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
           |  FROM ft$sfx JOIN dfq$sfx USING (term), corpus GROUP BY 1),
           |rk$sfx AS (SELECT doc_id,
           |  row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
           |  FROM (SELECT doc_id, score FROM sc$sfx
           |    ORDER BY score DESC, doc_id LIMIT 20))""".stripMargin
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |st AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
         |corpus AS (SELECT count(*) AS n, avg(len(t)) AS avgdl FROM toks),
         |${bmCte("a", "'spark', 'merge', 'window', 'stream'")},
         |${bmCte("b", "'filter', 'join', 'sort', 'hash'")},
         |u AS (SELECT doc_id, 1.0 / (rnk + 60) AS c FROM rka
         |  UNION ALL SELECT doc_id, 1.0 / (rnk + 60) FROM rkb)
         |SELECT doc_id, round(sum(c), 6) AS rrf_score,
         |  count(*) AS n_lists
         |FROM u GROUP BY 1
         |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin
    },

    // hashed linear scorer mirror: integer-unit weights from the same
    // affine-modular generator; per-doc LONG sums, ONE division at the
    // end — bit-stable on both engines
    "q193_hashed_scorer" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
         |    '\\s+')) AS tk FROM documents),
         |w AS (SELECT j AS b, (j * 2654435761 + 104729) % 19997 - 9998
         |    AS wt FROM (SELECT unnest(range(4096)) AS j)),
         |tb AS (SELECT doc_id, ${hash60Sql("tk")} % 4096 AS b FROM toks),
         |ds AS (SELECT doc_id, count(*) AS n_tokens, sum(wt) AS units
         |  FROM tb JOIN w USING (b) GROUP BY 1),
         |j AS (SELECT d.source, ds.units, ds.n_tokens
         |  FROM ds JOIN documents d USING (doc_id))
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN units > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pos,
         |  CAST(sum(units) AS BIGINT) AS units_sum,
         |  min(round(CAST(units AS DOUBLE) / (9998.0 * n_tokens), 6))
         |    AS score_min,
         |  max(round(CAST(units AS DOUBLE) / (9998.0 * n_tokens), 6))
         |    AS score_max
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // FAString niche byte-ops: char as bounded substr, index_any_of as
    // the length of the leading non-matching run, substr_char_stop via
    // instr — all 0/-1 conventions mirror rt_str.py
    "q231_fastring" ->
      """SELECT doc_id,
        |  substr(text, 1, 1) AS c0,
        |  CASE WHEN length(text) >= 1
        |    THEN substr(text, length(text), 1) ELSE '' END AS clast,
        |  CASE WHEN length(text) > 9999
        |    THEN substr(text, 10000, 1) ELSE '' END AS coob,
        |  CAST(CASE WHEN length(regexp_extract(text, '^[^aeiou]*'))
        |      = length(text) THEN -1
        |    ELSE length(regexp_extract(text, '^[^aeiou]*'))
        |    END AS BIGINT) AS vowel_idx,
        |  CAST(CASE WHEN length(regexp_extract(text, '^[^zq!]*'))
        |      = length(text) THEN -1
        |    ELSE length(regexp_extract(text, '^[^zq!]*'))
        |    END AS BIGINT) AS rare_idx,
        |  CASE WHEN instr(text, ' ') = 0 THEN text
        |    ELSE substr(text, 1, instr(text, ' ') - 1) END AS first_word,
        |  CASE WHEN instr(text, ' ') = 0 THEN text
        |    ELSE substr(text, 1, instr(text, ' ')) END AS first_word_sp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // full BPE replay: the same 10 merge rounds unrolled as chained
    // CTEs — per round, pair counts over the symbol lists, the
    // (count desc, pair asc) argmax, and the boundary-bracketed
    // replace that IS the merge application
    "q225_bpe_merges" ->
      s"""WITH ${bpeCtes(10)}
         |SELECT * FROM (${(1 to 10).map(r =>
             s"SELECT $r AS round, l AS lhs, r AS rhs, l || r AS merged, " +
               s"c AS cnt FROM b$r").mkString("\n  UNION ALL ")})
         |ORDER BY round""".stripMargin,

    // subword histogram under the learned cascade: unnest the final
    // round's segmentations, weight by word count. (Assumes ≥10 viable
    // merge rounds — true of every driver corpus; on an exhausted
    // corpus w10 would be empty while the engine still segments with
    // the k<10 learned merges. BpeSpec covers exhaustion directly.)
    "q226_bpe_segments" -> bpeSegmentsOracle,

    // q255 segments under the Models merge-table ARTIFACT (same corpus,
    // same 10 rounds — the string pairs round-trip parquet verbatim and
    // order-preserved), so the identical replay oracle checks both.
    "q255_bpe_artifact" -> bpeSegmentsOracle,

    // fertility mirror: the same 10-round merge replay; each DISTINCT
    // word's final segmentation (w10) yields its subword count (the
    // word itself is the sym with separators stripped), joined back to
    // the per-source word-frequency frame
    "q243_bpe_fertility" ->
      s"""WITH ${bpeCtes(10)},
         |seg AS MATERIALIZED (SELECT replace(sym, chr(1), '') AS w,
         |    len(string_split(trim(sym, chr(1)), chr(1) || chr(1)))
         |      AS n_sub
         |  FROM w10),
         |sw AS MATERIALIZED (SELECT source, w, count(*) AS cnt FROM (
         |    SELECT source,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
         |    FROM documents)
         |  WHERE len(w) > 0 AND regexp_matches(w, '^[ -~]+$$')
         |  GROUP BY 1, 2)
         |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_words,
         |  CAST(sum(cnt * n_sub) AS BIGINT) AS n_subwords,
         |  CAST(sum(cnt * len(w)) AS BIGINT) AS n_chars,
         |  round(CAST(sum(cnt * n_sub) AS DOUBLE)
         |    / CAST(sum(cnt) AS DOUBLE), 6) AS fertility,
         |  round(CAST(sum(cnt * len(w)) AS DOUBLE)
         |    / CAST(sum(cnt * n_sub) AS DOUBLE), 6) AS chars_per_token
         |FROM sw JOIN seg USING (w)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // corpus n-gram diversity mirror: the same in-row gram windows per
    // n ∈ {1,2,3} over the non-empty token list, then per (source, n)
    // total and distinct gram counts
    "q245_ngram_diversity" ->
      """WITH tk AS (SELECT source,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents),
        |g AS (SELECT source, n, unnest(CASE WHEN len(t) >= n THEN
        |      list_transform(range(1, len(t) - n + 2),
        |        i -> array_to_string(list_slice(t, i, i + n - 1), ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS gram
        |  FROM tk, (SELECT unnest([1, 2, 3]) AS n))
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  count(*) AS total_grams,
        |  count(DISTINCT gram) AS distinct_grams,
        |  round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6)
        |    AS diversity
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // char-entropy mirror: per-source char counts, then the same
    // −p·ln p fold over the alphabet-sized frame
    "q246_char_entropy" ->
      """WITH ch AS (SELECT source, c, count(*) AS n FROM (
        |    SELECT source, unnest(list_filter(string_split(text, ''),
        |      x -> x <> '')) AS c
        |    FROM documents) GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nn
        |  FROM ch GROUP BY 1)
        |SELECT ch.source, max(tot.nn) AS n_chars,
        |  count(*) AS n_distinct_chars,
        |  round(sum(-(CAST(n AS DOUBLE) / nn)
        |    * ln(CAST(n AS DOUBLE) / nn)), 6) AS entropy_nats
        |FROM ch JOIN tot USING (source)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** 10-round BPE replay → subword-vocabulary histogram, shared by
    * q226 (in-session train) and q255 (artifact-served merges). */
  private lazy val bpeSegmentsOracle: String =
    s"""WITH ${bpeCtes(10)}
       |SELECT token, CAST(sum(cnt) AS BIGINT) AS n FROM (
       |  SELECT unnest(string_split(trim(sym, chr(1)),
       |    chr(1) || chr(1))) AS token, cnt FROM w10)
       |GROUP BY 1 ORDER BY token""".stripMargin
}
