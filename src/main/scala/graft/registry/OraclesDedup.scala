package graft

/** DuckDB oracle SQL paired 1:1 with `QueriesDedup.m` — deduplication: exact, MinHash/SimHash/LSH, n-gram jaccard, containment, spans, artifacts.
  * Column names/types mirror the Spark side exactly (driver hash gate).
  */
private[graft] object OraclesDedup {
  import OracleSqlHelpers._

  def m: Map[String, String] = Map(

    "q27_exact_dedup" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents
        |  WHERE ${hash60Sql("text")} % 5 = 0)
        |SELECT count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM d
        |GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        |HAVING count(*) > 1 ORDER BY keep_id""".stripMargin,

    "q28_jaccard" -> jaccardOracle("0.5"),

    "q29_minhash" -> jaccardOracle("0.8"),

    "q30_simhash" ->
      s"""$simhashCte
         |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin,

    "q47_simhash_near" ->
      s"""$simhashCte,
         |b AS (SELECT doc_id, simhash, band,
         |  (simhash >> (16 * band)) & 65535 AS bandval
         |  FROM sig, range(4) t(band)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         |  bit_count(xor(a.simhash, b2.simhash)) AS hamming
         |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bandval = b2.bandval
         |    AND a.doc_id < b2.doc_id)
         |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
         |FROM cand WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    "q91_simhash_verified" ->
      s"""$simhashCte,
         |cand AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM sig a JOIN sig b2 ON a.doc_id < b2.doc_id
         |  AND bit_count(xor(a.simhash, b2.simhash)) <= 3),
         |${jaccardBody("0.5")}
         |SELECT j.id_a, j.id_b, j.jaccard FROM jpairs j
         |JOIN cand c ON j.id_a = c.id_a AND j.id_b = c.id_b
         |ORDER BY j.id_a, j.id_b""".stripMargin,

    // connected components over the exact jaccard pair set: recursive
    // transitive closure (fine at oracle scale; the Spark side never
    // materializes the closure — min-label propagation instead)
    "q119_dup_clusters" ->
      s"""WITH RECURSIVE ${jaccardBody("0.5")},
         |edges AS (SELECT id_a AS a, id_b AS b FROM jpairs
         |  UNION ALL SELECT id_b, id_a FROM jpairs),
         |verts AS (SELECT DISTINCT a AS id FROM edges),
         |reach AS (SELECT id, id AS r FROM verts
         |  UNION
         |  SELECT reach.id, e.b AS r FROM reach JOIN edges e ON e.a = reach.r)
         |SELECT id, min(r) AS cluster_id FROM reach
         |GROUP BY id ORDER BY id""".stripMargin,

    "q120_boilerplate" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
        |    THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
        |  FROM toks),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN df.df >= 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  round(CAST(sum(CASE WHEN df.df >= 10 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS boiler_ratio
        |FROM sh JOIN df USING (s) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q121_decontam" ->
      """WITH toks AS (SELECT doc_id, source,
        |    string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, source, unnest(list_distinct(CASE WHEN len(t) < 5
        |    THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 3),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
        |           t[i+3] || ' ' || t[i+4]) END)) AS s
        |  FROM toks),
        |ev AS (SELECT DISTINCT s FROM sh WHERE source = 'src0')
        |SELECT doc_id, count(*) AS n_shared
        |FROM sh JOIN ev USING (s)
        |WHERE source <> 'src0'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // dedup survivors: min-id representative + size per component of
    // the exact jaccard pair graph (same recursive closure as q119)
    "q122_dedup_keep" ->
      s"""WITH RECURSIVE ${jaccardBody("0.5")},
         |edges AS (SELECT id_a AS a, id_b AS b FROM jpairs
         |  UNION ALL SELECT id_b, id_a FROM jpairs),
         |verts AS (SELECT DISTINCT a AS id FROM edges),
         |reach AS (SELECT id, id AS r FROM verts
         |  UNION
         |  SELECT reach.id, e.b AS r FROM reach JOIN edges e ON e.a = reach.r),
         |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
         |SELECT cluster_id AS keep_id, count(*) AS n_docs
         |FROM comp GROUP BY 1 ORDER BY keep_id""".stripMargin,

    // the Spark side's PassJoin blocking is COMPLETE for dist ≤ 5, so
    // the oracle is the plain padded-prefix predicate over all pairs
    "q128_edit_distance" ->
      """WITH d AS (SELECT doc_id,
        |    rpad(substr(text, 1, 80), 80, chr(1)) AS p FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.p, b.p) AS INTEGER) AS dist
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.p, b.p) <= 5
        |ORDER BY id_a, id_b""".stripMargin,

    "q169_substring_dup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 6),
        |    i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 16))) AS g
        |  FROM toks WHERE len(t) >= 8),
        |dg AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY 1, 2),
        |nd AS (SELECT g, count(*) AS nd FROM dg GROUP BY 1)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN nd > 1 THEN cnt ELSE 0 END) AS BIGINT)
        |    AS dup_grams,
        |  round(CAST(sum(CASE WHEN nd > 1 THEN cnt ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(cnt) AS DOUBLE), 6) AS dup_frac
        |FROM dg JOIN nd USING (g) GROUP BY 1 ORDER BY 1""".stripMargin,

    // quality-argmax survivor per jaccard near-dup cluster; quality is
    // the q32 formula (rounded to 6dp BEFORE the argmax on both sides,
    // so the comparison is on identical values)
    "q176_cluster_rep_quality" ->
      s"""WITH RECURSIVE ${jaccardBody("0.5")},
         |edges AS (SELECT id_a AS a, id_b AS b FROM jpairs
         |  UNION ALL SELECT id_b, id_a FROM jpairs),
         |verts AS (SELECT DISTINCT a AS id FROM edges),
         |reach AS (SELECT id, id AS r FROM verts
         |  UNION
         |  SELECT reach.id, e.b AS r FROM reach JOIN edges e ON e.a = reach.r),
         |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |qual AS (SELECT doc_id, round((
         |    CASE WHEN length(text) >= 200 AND length(text) <= 10000 THEN 1.0
         |      WHEN length(text) < 200 THEN length(text) / 200.0
         |      ELSE 10000.0 / length(text) END
         |    + CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - least(p / greatest(n, 1.0), 1.0) END
         |    + CASE WHEN n = 0 THEN 0.0 ELSE least(st * 4.0 / greatest(n, 1.0), 1.0) END
         |  ) / 3.0, 6) AS quality
         |  FROM (SELECT doc_id, text,
         |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS n,
         |    CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS p,
         |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |      t -> t IN ('the','and','of','to','a','in','is','it'))) AS DOUBLE) AS st
         |    FROM documents)),
         |ranked AS (SELECT cc.cluster_id, cc.id, qual.quality,
         |    row_number() OVER (PARTITION BY cc.cluster_id
         |      ORDER BY qual.quality DESC, cc.id) AS rn,
         |    count(*) OVER (PARTITION BY cc.cluster_id) AS n_docs
         |  FROM cc JOIN qual ON cc.id = qual.doc_id)
         |SELECT cluster_id, id AS rep_id, n_docs, quality
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    // winnowing mirror: identical normalize → char-8-gram md5-prefix
    // hash → window-4 STRING-min selection (lexicographic min over
    // fixed-width hex is engine-independent); both sides clamp short
    // texts to one gram / one window. fp is referenced twice (df and
    // the scoring join) and carries the md5-per-char-gram work — AS
    // MATERIALIZED so inlining can't re-run it (5.2 s → ~half at
    // sf0.001; the same class of fix as the q232/BPE chains)
    "q177_winnowing" ->
      """WITH s AS MATERIALIZED (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS sx
        |  FROM documents),
        |g AS MATERIALIZED (SELECT doc_id, list_transform(
        |    range(1, greatest(length(sx) - 7, 1) + 1),
        |    i -> substring(md5(substring(sx, i, 8)), 1, 16)) AS hs
        |  FROM s),
        |fp AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(hs) - 3, 1) + 1),
        |    j -> list_min(hs[j:j+3])))) AS f
        |  FROM g),
        |df AS (SELECT f, count(*) AS nd FROM fp GROUP BY 1)
        |SELECT doc_id, count(*) AS n_fp,
        |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared_fp,
        |  round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS shared_frac
        |FROM fp JOIN df USING (f)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // blocking-free ground truth: full shingle co-occurrence, ordered
    // pairs, containment = co / |Sa| (the engine's prefix filter is a
    // complete candidate generator at τ, so the sets coincide)
    "q180_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
        |    THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS co
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(co AS DOUBLE) / sa.sz, 6) AS containment
        |FROM co JOIN sizes sa ON co.id_a = sa.doc_id
        |WHERE CAST(co AS DOUBLE) / sa.sz >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,

    // first-occurrence attribution over distinct 3-gram shingles
    "q184_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
        |    THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
        |  FROM toks),
        |fs AS (SELECT s, min(doc_id) AS first_id FROM sh GROUP BY 1)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN fs.first_id < sh.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_seen,
        |  round(1.0 - CAST(sum(CASE WHEN fs.first_id < sh.doc_id
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
        |FROM sh JOIN fs USING (s) GROUP BY 1 ORDER BY 1""".stripMargin,

    // blocking-free cross-split ground truth (the engine's band+prefix
    // candidates achieve full recall at τ, so the sets coincide)
    "q185_incremental_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
        |    THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |co AS (SELECT a.doc_id AS id_new, b.doc_id AS id_old,
        |    count(*) AS co
        |  FROM sh a JOIN sh b ON a.s = b.s
        |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |  GROUP BY 1, 2)
        |SELECT id_new, id_old,
        |  round(CAST(co AS DOUBLE) / (sa.sz + sb.sz - co), 6) AS jaccard
        |FROM co JOIN sizes sa ON co.id_new = sa.doc_id
        |  JOIN sizes sb ON co.id_old = sb.doc_id
        |WHERE CAST(co AS DOUBLE) / (sa.sz + sb.sz - co) >= 0.5
        |ORDER BY id_new, id_old""".stripMargin,

    // dup-span mirror: zipped unnest gives (position, gram-hash); spans
    // of cross-doc grams merge via the same gaps-and-islands windows
    "q194_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id,
        |  unnest(range(1, len(t) - 6)) AS i,
        |  unnest(list_transform(range(1, len(t) - 6),
        |    i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 16))) AS gh
        |  FROM toks WHERE len(t) >= 8),
        |dup AS (SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM g)
        |  GROUP BY gh HAVING count(*) > 1),
        |sp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
        |  CAST(i + 7 AS BIGINT) AS e FROM g JOIN dup USING (gh)),
        |fl AS (SELECT doc_id, s, e,
        |  CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |    OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS nw FROM sp),
        |isl AS (SELECT doc_id, s, e,
        |  sum(nw) OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM fl),
        |per AS (SELECT doc_id, isl, min(s) AS i0, max(e) AS i1
        |  FROM isl GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*) AS n_spans,
        |  sum(i1 - i0) AS covered FROM per GROUP BY 1)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(a.covered, 0) AS BIGINT) AS covered_tokens,
        |  round(CAST(coalesce(a.covered, 0) AS DOUBLE) / len(t.t), 6)
        |    AS covered_frac
        |FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    // removal mirror: union of covered POSITIONS anti-joined away,
    // remainder re-joined in position order — md5 checks exact content
    "q195_dedup_clean" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id,
        |  unnest(range(1, len(t) - 6)) AS i,
        |  unnest(list_transform(range(1, len(t) - 6),
        |    i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 16))) AS gh
        |  FROM toks WHERE len(t) >= 8),
        |dup AS (SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM g)
        |  GROUP BY gh HAVING count(*) > 1),
        |sp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
        |  CAST(i + 7 AS BIGINT) AS e FROM g JOIN dup USING (gh)),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(s, e)) AS pos
        |  FROM sp),
        |tokpos AS (SELECT doc_id,
        |  CAST(unnest(range(0, len(t))) AS BIGINT) AS pos,
        |  unnest(t) AS tok FROM toks),
        |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
        |  ANTI JOIN cov c ON tp.doc_id = c.doc_id AND tp.pos = c.pos),
        |agg AS (SELECT doc_id, count(*) AS kept_tokens,
        |  string_agg(tok, ' ' ORDER BY pos) AS cleaned
        |  FROM kept GROUP BY 1)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(a.kept_tokens, 0) AS BIGINT) AS kept_tokens,
        |  md5(coalesce(a.cleaned, '')) AS cleaned_md5
        |FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    // surgical-decontamination mirror: q195's cut geometry, spans keyed
    // by the EVAL slice's distinct gram set instead of corpus dup count
    "q252_decontam_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents WHERE doc_id % 4 <> 0),
        |g AS (SELECT doc_id,
        |  unnest(range(1, len(t) - 6)) AS i,
        |  unnest(list_transform(range(1, len(t) - 6),
        |    i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 16))) AS gh
        |  FROM toks WHERE len(t) >= 8),
        |ev AS (SELECT DISTINCT gh FROM (
        |  SELECT unnest(list_transform(range(1, len(t) - 6),
        |    i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 16))) AS gh
        |  FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS t
        |    FROM documents WHERE doc_id % 4 = 0)
        |  WHERE len(t) >= 8)),
        |sp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
        |  CAST(i + 7 AS BIGINT) AS e FROM g JOIN ev USING (gh)),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(s, e)) AS pos
        |  FROM sp),
        |tokpos AS (SELECT doc_id,
        |  CAST(unnest(range(0, len(t))) AS BIGINT) AS pos,
        |  unnest(t) AS tok FROM toks),
        |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
        |  ANTI JOIN cov c ON tp.doc_id = c.doc_id AND tp.pos = c.pos),
        |agg AS (SELECT doc_id, count(*) AS kept_tokens,
        |  string_agg(tok, ' ' ORDER BY pos) AS cleaned
        |  FROM kept GROUP BY 1)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(a.kept_tokens, 0) AS BIGINT) AS kept_tokens,
        |  md5(coalesce(a.cleaned, '')) AS cleaned_md5
        |FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,

    // cross-corpus containment ground truth: |S_eval ∩ S_doc| / |S_eval|
    // over exact shingle sets, eval slice vs the rest
    "q220_decontamination" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
        |    THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |co AS (SELECT e.doc_id AS id_eval, c.doc_id AS id_doc,
        |    count(*) AS co
        |  FROM sh e JOIN sh c ON e.s = c.s
        |  WHERE e.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
        |  GROUP BY 1, 2)
        |SELECT id_eval, id_doc,
        |  round(CAST(co AS DOUBLE) / se.sz, 6) AS containment
        |FROM co JOIN sizes se ON co.id_eval = se.doc_id
        |WHERE CAST(co AS DOUBLE) / se.sz >= 0.8
        |ORDER BY id_eval, id_doc""".stripMargin,

    // S-curve mirror: q47's banded-simhash candidate CTE (portable md5
    // simhash, 4×16-bit bands) left-joined under the exact τ=0.3
    // jaccard pair set, binned by ⌊10·J⌋
    "q259_lsh_scurve" ->
      s"""$simhashCte,
         |b AS (SELECT doc_id, (simhash >> (16 * band)) & 65535 AS bandval,
         |    band
         |  FROM sig, range(4) t(band)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM b a JOIN b b2 ON a.band = b2.band
         |    AND a.bandval = b2.bandval AND a.doc_id < b2.doc_id),
         |${jaccardBody("0.3")}
         |SELECT CAST(floor(jaccard * 10) AS INT) AS j_bin,
         |  count(*) AS n_pairs,
         |  CAST(sum(CASE WHEN cand.id_a IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_caught,
         |  round(CAST(sum(CASE WHEN cand.id_a IS NOT NULL THEN 1 ELSE 0
         |    END) AS DOUBLE) / count(*), 6) AS recall
         |FROM jpairs LEFT JOIN cand USING (id_a, id_b)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // bloom-prefiltered gate ground truth = the EXACT containment gate
    // at τ=0.7 (no bloom on the oracle side — no-false-negative build/
    // probe symmetry plus the exact verify make the engine's bloom
    // path an identity on the result set)
    "q256_bloom_decontam" -> bloomGateOracle,

    // artifact-served bloom gate: same params, same exact ground truth
    // — the persisted bitmap must change nothing
    "q260_bloom_artifact" -> bloomGateOracle,

    // cross-modal report mirror: the exact containment gate folded to
    // per-train-doc max, the q251 banded-LSH + exact-cosine audit keyed
    // by the TRAIN side (%10 slices on the shared id space), one full
    // outer join
    "q262_contamination_report" -> {
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
         |    THEN [array_to_string(t, ' ')]
         |    ELSE list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
         |  FROM toks),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |co AS (SELECT e.doc_id AS id_eval, c.doc_id AS id_doc,
         |    count(*) AS co
         |  FROM sh e JOIN sh c ON e.s = c.s
         |  WHERE e.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
         |  GROUP BY 1, 2),
         |ng AS (SELECT id_doc,
         |    max(round(CAST(co AS DOUBLE) / se.sz, 6)) AS max_containment
         |  FROM co JOIN sizes se ON co.id_eval = se.doc_id
         |  WHERE CAST(co AS DOUBLE) / se.sz >= 0.7 GROUP BY 1),
         |ev AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 10 = 0),
         |tr AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 10 <> 0
         |  UNION ALL
         |  ${twinsSql("ev", "vec_id", "embedding")}),
         |${lshSigCte("evs", "ev", "vec_id", "embedding")},
         |${lshSigCte("trs", "tr", "vec_id", "embedding")},
         |evb AS (SELECT vec_id, unnest([b0, b1, b2, b3]) AS bandval,
         |  unnest([0, 1, 2, 3]) AS band FROM evs),
         |trb AS (SELECT vec_id, unnest([b0, b1, b2, b3]) AS bandval,
         |  unnest([0, 1, 2, 3]) AS band FROM trs),
         |cand AS (SELECT DISTINCT t.vec_id AS id_doc, e.vec_id AS id_ev
         |  FROM evb e JOIN trb t
         |  ON e.band = t.band AND e.bandval = t.bandval),
         |scored AS (SELECT id_doc,
         |  ${cosineSql("et.embedding", "ee.embedding")} AS cos
         |  FROM cand JOIN evs ee ON cand.id_ev = ee.vec_id
         |  JOIN trs et ON cand.id_doc = et.vec_id
         |  WHERE ${dotSql("ee.embedding", "ee.embedding")} > 0
         |    AND ${dotSql("et.embedding", "et.embedding")} > 0),
         |sem AS (SELECT id_doc, count(*) AS n_sem_leaks,
         |    round(max(cos), 6) AS max_sem_cosine
         |  FROM scored WHERE cos >= 0.9 GROUP BY 1)
         |SELECT id_doc,
         |  coalesce(max_containment, 0.0) AS max_containment,
         |  CAST(coalesce(n_sem_leaks, 0) AS BIGINT) AS n_sem_leaks,
         |  coalesce(max_sem_cosine, 0.0) AS max_sem_cosine
         |FROM ng FULL OUTER JOIN sem USING (id_doc)
         |ORDER BY id_doc""".stripMargin
    },

    // per-doc dup-degree over the exact τ=0.5 pair set — the engine
    // side reads it from the bucketed artifact, which must equal
    // computing it fresh
    "q210_pair_artifact" ->
      s"""WITH ${jaccardBody("0.5")}
         |SELECT id_a, count(*) AS n_dups,
         |  CAST(sum(id_b) AS BIGINT) AS partner_id_sum,
         |  max(jaccard) AS j_max
         |FROM jpairs GROUP BY 1 ORDER BY id_a""".stripMargin,

    // snapshot-diff mirror: the same synthesized old/new slices, the
    // same normalized-content fingerprint, one full-outer key join;
    // presence via explicit TRUE markers (not fingerprint nullness) and
    // null-safe fingerprint equality, matching Dedup.snapshotDiff
    "q247_snapshot_diff" ->
      s"""WITH o AS (SELECT doc_id AS k, source AS go,
        |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fo,
        |    TRUE AS po
        |  FROM documents WHERE doc_id % 3 <> 0),
        |n AS (SELECT doc_id AS k, source AS gn,
        |    md5(regexp_replace(lower(trim(CASE WHEN ${hash60Sql("text")} % 5 = 0
        |        THEN text || ' rev2' ELSE text END)), '\\s+', ' ', 'g'))
        |      AS fn,
        |    TRUE AS pn
        |  FROM documents WHERE doc_id % 2 = 0),
        |j AS (SELECT coalesce(gn, go) AS source,
        |    CASE WHEN po IS NULL THEN 'added'
        |      WHEN pn IS NULL THEN 'removed'
        |      WHEN fo IS NOT DISTINCT FROM fn THEN 'unchanged'
        |      ELSE 'changed' END AS s
        |  FROM o FULL OUTER JOIN n USING (k))
        |SELECT source,
        |  CAST(sum(CASE WHEN s = 'added' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(sum(CASE WHEN s = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(sum(CASE WHEN s = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changed,
        |  CAST(sum(CASE WHEN s = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unchanged
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** Exact τ=0.7 containment over the %10 eval slice — ground truth
    * shared by q256 (in-session bloom) and q260 (artifact-served
    * bloom): both bloom paths are result-set identities on it.
    */
  private lazy val bloomGateOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
      |    THEN [array_to_string(t, ' ')]
      |    ELSE list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
      |  FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |co AS (SELECT e.doc_id AS id_eval, c.doc_id AS id_doc,
      |    count(*) AS co
      |  FROM sh e JOIN sh c ON e.s = c.s
      |  WHERE e.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
      |  GROUP BY 1, 2)
      |SELECT id_eval, id_doc,
      |  round(CAST(co AS DOUBLE) / se.sz, 6) AS containment
      |FROM co JOIN sizes se ON co.id_eval = se.doc_id
      |WHERE CAST(co AS DOUBLE) / se.sz >= 0.7
      |ORDER BY id_eval, id_doc""".stripMargin
}
