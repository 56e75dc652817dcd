package graft

/** DuckDB oracle SQL paired 1:1 with `QueriesCurate.m` — curation at scale: mixing, splits, sketches, quantiles, drift, packing, funnels.
  * Column names/types mirror the Spark side exactly (driver hash gate).
  */
private[graft] object OraclesCurate {
  import OracleSqlHelpers._

  /** The classifier-training CTE chain shared by q232 (per-doc scores)
    * and q234 (funnel + AUC gate): T unrolled GD rounds over hashed
    * token buckets, every CTE AS MATERIALIZED — DuckDB inlines plain
    * CTEs, and because each w_i references w_{i-1} twice (directly and
    * via g_i → r_i → z_i) inlining expands the reference graph
    * ~2^depth; the un-materialized form never finished at sf0.01
    * (>55 CPU-min) and zeroed the round-9 correctness run.
    * Materialized: ~1.4 s at sf0.1 (DuckDB ≥0.10; harness ships 1.0.0).
    * Ends with z{iters+1}: the final margins under the trained w.
    */
  private def classifierTrainCtesSql(bk: Int, iters: Int, lrn: Long,
                                     lrd: Long): String = {
    def zCte(i: Int, w: String) =
      s"""z$i AS MATERIALIZED (SELECT x.doc_id,
         |    CAST(sum(x.cnt * $w.wl[x.b + 1])
         |    AS BIGINT) AS z FROM x, $w GROUP BY 1)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""${zCte(i, s"w${i - 1}")},
         |r$i AS MATERIALIZED (SELECT y.doc_id,
         |    LEAST(GREATEST(COALESCE(z, 0) + 2000000, 0), 4000000)
         |      - 4000000 * y.y AS r
         |  FROM y LEFT JOIN z$i USING (doc_id)),
         |g$i AS MATERIALIZED (SELECT b, CAST(sum(cnt * r) AS BIGINT) AS g
         |  FROM x JOIN r$i USING (doc_id) GROUP BY 1),
         |w$i AS MATERIALIZED (SELECT list(wn ORDER BY j) AS wl FROM (
         |  SELECT t.j AS j, w.wl[t.j + 1] - CAST((a - (((a % m) + m) % m))
         |      / m AS BIGINT) AS wn
         |  FROM (SELECT t.j, $lrn * COALESCE(g.g, 0) AS a,
         |      4 * nn.n * $lrd AS m
         |    FROM range($bk) t(j) LEFT JOIN g$i g ON t.j = g.b, nn) t,
         |    w${i - 1} w) s)""".stripMargin
    }.mkString(",\n")
    s"""toks AS MATERIALIZED (SELECT doc_id, unnest(string_split_regex(
       |    lower(trim(text)), '\\s+')) AS tk FROM documents),
       |x AS MATERIALIZED (SELECT doc_id, ${hash60Sql("tk")} % $bk AS b,
       |  count(*) AS cnt FROM toks GROUP BY 1, 2),
       |y AS MATERIALIZED (SELECT doc_id,
       |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END
       |  AS y FROM documents),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
       |w0 AS MATERIALIZED (SELECT list_transform(range($bk),
       |  j -> CAST(0 AS BIGINT)) AS wl),
       |$steps,
       |${zCte(iters + 1, s"w$iters")}""".stripMargin
  }

  /** Unrolled simplified-PageRank recursion shared by q278/q279: one
    * MATERIALIZED CTE per iteration (the q232 lesson — a plain CTE
    * chain re-expands ~2^depth under DuckDB inlining). Edge synthesis,
    * damping arithmetic, and the leak variant (no dangling-mass
    * redistribution) mirror Graph.pageRank exactly; CASTs pin every
    * literal to DOUBLE so both engines run the identical double ops.
    */
  private val pageRankCtesSql: String = {
    // base term mirrors the engine's personalized-capable form
    // (1−d)·p(v) with uniform p = 1/n — the MULTIPLY, not a fused
    // division, so both engines run the identical double ops
    val steps = (1 to 5).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT d.doc_id AS id,
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |      * (CAST(1.0 AS DOUBLE) / (SELECT n FROM nn))
         |    + CAST(0.85 AS DOUBLE) * coalesce(m.s, 0) AS r
         |  FROM documents d LEFT JOIN (
         |    SELECT e.dst, sum(p.r / od.c) AS s
         |    FROM e JOIN r${k - 1} p ON e.src = p.id
         |      JOIN od ON e.src = od.src
         |    GROUP BY e.dst) m ON d.doc_id = m.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n,
       |    count(*) AS ni FROM documents),
       |e AS MATERIALIZED (
       |  SELECT d.doc_id AS src,
       |    (d.doc_id * (t.j + 2) + 17 * t.j) % (SELECT ni FROM nn) AS dst
       |  FROM documents d, range(1, 4) t(j)
       |  WHERE t.j <= d.doc_id % 4
       |    AND (d.doc_id * (t.j + 2) + 17 * t.j) % (SELECT ni FROM nn)
       |      <> d.doc_id),
       |od AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS c
       |  FROM e GROUP BY src),
       |r0 AS MATERIALIZED (SELECT doc_id AS id,
       |  CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS r FROM documents),
       |$steps""".stripMargin
  }

  /** q280's personalized weighted twin of [[pageRankCtesSql]]: teleport
    * vector uniform over the 'src0' seed docs (0 elsewhere, r0 = p),
    * edge weight 1 + (src+dst) % 3, contribution r·w/W(u) with W(u)
    * the out-weight sum — operand order and CASTs mirror the engine.
    */
  private val focusedPageRankCtesSql: String = {
    val dstE = "(d.doc_id * (t.j + 2) + 17 * t.j) % (SELECT ni FROM nn)"
    val steps = (1 to 5).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT p.id,
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * p.p
         |    + CAST(0.85 AS DOUBLE) * coalesce(m.s, 0) AS r
         |  FROM p LEFT JOIN (
         |    SELECT e.dst, sum(q.r * e.w / od.c) AS s
         |    FROM e JOIN r${k - 1} q ON e.src = q.id
         |      JOIN od ON e.src = od.src
         |    GROUP BY e.dst) m ON p.id = m.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS MATERIALIZED (SELECT count(*) AS ni FROM documents),
       |sn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS ns
       |  FROM documents WHERE source = 'src0'),
       |p AS MATERIALIZED (SELECT doc_id AS id,
       |    CASE WHEN source = 'src0'
       |      THEN CAST(1.0 AS DOUBLE) / (SELECT ns FROM sn)
       |      ELSE CAST(0.0 AS DOUBLE) END AS p
       |  FROM documents),
       |e AS MATERIALIZED (
       |  SELECT d.doc_id AS src, $dstE AS dst,
       |    1 + (d.doc_id + ($dstE)) % 3 AS w
       |  FROM documents d, range(1, 4) t(j)
       |  WHERE t.j <= d.doc_id % 4 AND $dstE <> d.doc_id),
       |od AS MATERIALIZED (SELECT src, CAST(sum(w) AS DOUBLE) AS c
       |  FROM e GROUP BY src),
       |r0 AS MATERIALIZED (SELECT id, p AS r FROM p),
       |$steps""".stripMargin
  }

  def m: Map[String, String] = Map(

    "q280_focused_pagerank" ->
      s"""$focusedPageRankCtesSql
         |SELECT id AS doc_id, round(r, 9) AS rank
         |FROM r5 ORDER BY doc_id""".stripMargin,

    "q278_pagerank" ->
      s"""$pageRankCtesSql
         |SELECT id AS doc_id, round(r, 9) AS rank
         |FROM r5 ORDER BY doc_id""".stripMargin,

    "q279_source_authority" ->
      s"""$pageRankCtesSql
         |SELECT d.source, count(*) AS n_docs,
         |  round(sum(r.r), 9) AS total_rank,
         |  round(avg(r.r), 9) AS mean_rank
         |FROM documents d JOIN r5 r ON d.doc_id = r.id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q114_hash_sample" ->
      """WITH hh AS (SELECT event_type, event_id,
        |  CAST(list_sum(list_transform(range(1, 16),
        |    i -> CAST(strpos('0123456789abcdef',
        |      md5(CAST(event_id AS VARCHAR))[i]) - 1 AS BIGINT)
        |      << (4 * (15 - i)))) AS BIGINT) AS h
        |  FROM events),
        |rk AS (SELECT event_type, event_id, row_number() OVER
        |    (PARTITION BY event_type ORDER BY h, event_id) AS rn FROM hh)
        |SELECT event_type, event_id FROM rk WHERE rn <= 5
        |ORDER BY event_type, event_id""".stripMargin,

    // portableHash64 (md5 → 60-bit int) reproduced in SQL, so the split
    // ASSIGNMENT itself is verified, not just the counts
    "q113_hash_split" ->
      """WITH hx AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hex
        |  FROM documents),
        |hh AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 16),
        |  i -> CAST(strpos('0123456789abcdef', hex[i]) - 1 AS BIGINT)
        |    << (4 * (15 - i)))) AS BIGINT) AS h FROM hx),
        |lab AS (SELECT doc_id,
        |  CASE WHEN h % 100 < 80 THEN 'train' ELSE 'test' END AS split
        |  FROM hh)
        |SELECT split, count(*) AS n, min(doc_id) AS min_id,
        |  max(doc_id) AS max_id
        |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,

    "q129_weighted_sample" ->
      """WITH hh AS (SELECT doc_id, n_chars,
        |  CAST(list_sum(list_transform(range(1, 16),
        |    i -> CAST(strpos('0123456789abcdef',
        |      md5(CAST(doc_id AS VARCHAR))[i]) - 1 AS BIGINT)
        |      << (4 * (15 - i)))) AS BIGINT) AS h FROM documents),
        |keyed AS (SELECT doc_id, n_chars,
        |  round(-ln(((h % 1073741824) + 1) / 1073741825.0) / n_chars, 9) AS k
        |  FROM hh),
        |rk AS (SELECT doc_id, n_chars,
        |  row_number() OVER (ORDER BY k, doc_id) AS rn FROM keyed)
        |SELECT doc_id, n_chars FROM rk WHERE rn <= 50
        |ORDER BY doc_id""".stripMargin,

    "q131_corpus_mix" ->
      """WITH hh AS (SELECT doc_id, source,
        |  CAST(list_sum(list_transform(range(1, 16),
        |    i -> CAST(strpos('0123456789abcdef',
        |      md5(CAST(doc_id AS VARCHAR))[i]) - 1 AS BIGINT)
        |      << (4 * (15 - i)))) AS BIGINT) AS h FROM documents),
        |rk AS (SELECT doc_id, source, row_number() OVER
        |    (PARTITION BY source ORDER BY h, doc_id) AS rn FROM hh),
        |kept AS (SELECT * FROM rk WHERE rn <= CASE source
        |  WHEN 'src0' THEN floor(100 * 0.3)
        |  WHEN 'src1' THEN floor(100 * 0.2)
        |  ELSE floor(100 * (0.5 / 18)) END)
        |SELECT source, count(*) AS n, min(doc_id) AS min_id,
        |  max(doc_id) AS max_id
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,

    "q132_seq_pack" ->
      """WITH d AS (SELECT source, doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE
        |      len(string_split_regex(lower(trim(text)), '\s+')) END
        |      ::BIGINT AS tokens
        |  FROM documents),
        |c AS (SELECT source, doc_id, tokens,
        |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT source, CAST(floor((cum - tokens) / 500) AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS tot_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q133_curation_funnel" ->
      """WITH q AS (SELECT source, n_chars,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) AS n,
        |  CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS p,
        |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    t -> t IN ('the','and','of','to','a','in','is','it'))) AS DOUBLE) AS st,
        |  length(text) AS lc FROM documents),
        |f AS (SELECT source,
        |  (n_chars BETWEEN 50 AND 10000) AS pass_len,
        |  round((
        |    CASE WHEN lc >= 200 AND lc <= 10000 THEN 1.0
        |      WHEN lc < 200 THEN lc / 200.0 ELSE 10000.0 / lc END
        |    + CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - least(p / greatest(n, 1.0), 1.0) END
        |    + CASE WHEN n = 0 THEN 0.0 ELSE least(st * 4.0 / greatest(n, 1.0), 1.0) END
        |  ) / 3.0, 6) >= 0.5 AS pass_quality,
        |  (st >= 1) AS pass_en FROM q)
        |SELECT source, count(*) AS n_total,
        |  CAST(sum(CASE WHEN pass_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
        |  CAST(sum(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  CAST(sum(CASE WHEN pass_en THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |  CAST(sum(CASE WHEN pass_len AND pass_quality AND pass_en THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_all
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // α-sampling mirror: w_s = n^α/Σn^α, budget rounded to 6dp BEFORE
    // floor (pow-drift guard), selection by the portableHash64 mirror
    // (md5 → 60-bit int) — verifies the actual kept SET via id_sum
    "q182_temperature_mix" ->
      """WITH counts AS (SELECT source, count(*) AS n FROM documents
        |  GROUP BY 1),
        |tot AS (SELECT sum(n) AS nn, sum(pow(n, 0.5)) AS w FROM counts),
        |budgets AS (SELECT source,
        |  least(n, CAST(floor(round(0.3 * nn * pow(n, 0.5) / w, 6))
        |    AS BIGINT)) AS b
        |  FROM counts, tot),
        |hh AS (SELECT doc_id, source,
        |  CAST(list_sum(list_transform(range(1, 16),
        |    i -> CAST(strpos('0123456789abcdef',
        |      md5(CAST(doc_id AS VARCHAR))[i]) - 1 AS BIGINT)
        |      << (4 * (15 - i)))) AS BIGINT) AS h
        |  FROM documents),
        |rk AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
        |  FROM hh),
        |kept AS (SELECT rk.doc_id, rk.source
        |  FROM rk JOIN budgets USING (source) WHERE rn <= b)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,

    // n_chunks = max(1, ceil((L − 50)/150)) in integer-exact form;
    // substr/length/md5 agree byte-for-byte on ASCII corpus text
    "q183_chunking" ->
      """WITH ch AS (SELECT doc_id, text,
        |  unnest(range(0, greatest(1, CAST(floor(
        |    (length(text) - 50 + 149) / 150) AS BIGINT)))) AS chunk_id
        |  FROM documents)
        |SELECT doc_id, chunk_id,
        |  CAST(length(substr(text, CAST(chunk_id * 150 + 1 AS INT), 200))
        |    AS INT) AS chunk_len,
        |  md5(substr(text, CAST(chunk_id * 150 + 1 AS INT), 200))
        |    AS chunk_md5
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

    // recursive-CTE connected components over the exact jaccard pairs
    // (q176's CC body), singleton docs self-clustered, then the q113
    // portableHash64 mirror applied to cluster_id
    "q186_leakage_split" ->
      s"""WITH RECURSIVE ${jaccardBody("0.5")},
         |edges AS (SELECT id_a AS a, id_b AS b FROM jpairs
         |  UNION ALL SELECT id_b, id_a FROM jpairs),
         |verts AS (SELECT DISTINCT a AS id FROM edges),
         |reach AS (SELECT id, id AS r FROM verts
         |  UNION
         |  SELECT reach.id, e.b AS r FROM reach JOIN edges e ON e.a = reach.r),
         |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |lab AS (SELECT d.doc_id,
         |    coalesce(cc.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id),
         |hh AS (SELECT doc_id, cluster_id,
         |  CAST(list_sum(list_transform(range(1, 16),
         |    i -> CAST(strpos('0123456789abcdef',
         |      md5(CAST(cluster_id AS VARCHAR))[i]) - 1 AS BIGINT)
         |      << (4 * (15 - i)))) AS BIGINT) AS h
         |  FROM lab),
         |sp AS (SELECT doc_id, cluster_id,
         |  CASE WHEN h % 100 < 80 THEN 'train' ELSE 'test' END AS split
         |  FROM hh)
         |SELECT split, count(*) AS n_docs,
         |  count(DISTINCT cluster_id) AS n_clusters,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,

    // KMV mirror: distinct (source, hash60(shingle)) → 64 smallest per
    // source → (k−1)·2⁶⁰/h_k, exact when the group holds < k values
    "q187_kmv_distinct" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT d.source, unnest(list_distinct(CASE WHEN len(tk.t) < 3
        |    THEN [array_to_string(tk.t, ' ')]
        |    ELSE list_transform(range(1, len(tk.t) - 1),
        |      i -> tk.t[i] || ' ' || tk.t[i+1] || ' ' || tk.t[i+2]) END)) AS s
        |  FROM toks tk JOIN documents d USING (doc_id)),
        |ex AS (SELECT source, count(DISTINCT s) AS n_exact FROM sh
        |  GROUP BY 1),
        |hh AS (SELECT DISTINCT source,
        |  CAST(list_sum(list_transform(range(1, 16),
        |    i -> CAST(strpos('0123456789abcdef', md5(s)[i]) - 1 AS BIGINT)
        |      << (4 * (15 - i)))) AS BIGINT) AS h
        |  FROM sh),
        |rk AS (SELECT source, h,
        |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
        |kk AS (SELECT source, count(*) AS cnt, max(h) AS hk
        |  FROM rk WHERE rn <= 64 GROUP BY 1)
        |SELECT kk.source, ex.n_exact,
        |  CASE WHEN cnt < 64 THEN CAST(cnt AS DOUBLE)
        |    ELSE round(63.0 * CAST(1152921504606846976 AS DOUBLE)
        |      / CAST(hk AS DOUBLE), 4) END AS distinct_est,
        |  CAST(cnt AS BIGINT) AS sketch_size
        |FROM kk JOIN ex USING (source) ORDER BY source""".stripMargin,

    // Count–Min mirror: additive d×w counters over hash60("j:token"),
    // estimate = min over the d rows, checked against the exact count
    "q192_countmin_hh" ->
      s"""WITH toks AS (
         |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
         |    AS v FROM documents),
         |counts AS (SELECT v, count(*) AS n FROM toks GROUP BY 1),
         |b AS (SELECT v, n, j,
         |  ${hash60Sql("CAST(j AS VARCHAR) || ':' || v")} % 1024 AS bkt
         |  FROM counts CROSS JOIN (SELECT unnest(range(4)) AS j) r),
         |cm AS (SELECT j, bkt, sum(n) AS c FROM b GROUP BY 1, 2),
         |top AS (SELECT v, n,
         |  row_number() OVER (ORDER BY n DESC, v) AS rk
         |  FROM counts QUALIFY rk <= 10),
         |est AS (SELECT t.rk, t.v, t.n, min(cm.c) AS cm_est
         |  FROM top t JOIN b USING (v)
         |  JOIN cm ON cm.j = b.j AND cm.bkt = b.bkt
         |  GROUP BY 1, 2, 3)
         |SELECT rk AS rank, v AS value, CAST(n AS BIGINT) AS n_exact,
         |  CAST(cm_est AS BIGINT) AS cm_est,
         |  CAST(cm_est - n AS BIGINT) AS overcount
         |FROM est ORDER BY rank""".stripMargin,

    // histogram-quantile mirror: same equi-width binning arithmetic
    // (division-then-multiply order matters for bit-equality), same
    // crossing-bin interpolation; exact side is quantile_cont
    "q196_hist_quantiles" ->
      """WITH s AS (SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
        |  max(CAST(l_extendedprice AS DOUBLE)) AS hi,
        |  count(l_extendedprice) AS n FROM lineitem),
        |b AS (SELECT CASE WHEN hi = lo THEN 0
        |    ELSE CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - lo)
        |      / (hi - lo) * 256), 255) AS BIGINT) END AS bin,
        |    count(*) AS c
        |  FROM lineitem, s WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |cum AS (SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum FROM b),
        |qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99])
        |  AS DOUBLE) AS q),
        |cr AS (SELECT q, lo, hi, bin, c, cum,
        |    greatest(ceil(q * n), 1) AS target,
        |    row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
        |  FROM qs, s, cum WHERE cum >= greatest(ceil(q * n), 1)),
        |ex AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99])
        |    AS DOUBLE) AS q,
        |  unnest(quantile_cont(l_extendedprice,
        |    [0.25, 0.5, 0.75, 0.9, 0.99])) AS ev FROM lineitem)
        |SELECT cr.q,
        |  round(lo + (hi - lo) / 256 * (bin + (target - (cum - c)) / c), 6)
        |    AS hist_est,
        |  round(ex.ev, 6) AS exact_val
        |FROM cr JOIN ex ON cr.q = ex.q WHERE rn = 1
        |ORDER BY cr.q""".stripMargin,

    // per-source CM mirror: q192's sketch partitioned by source
    "q199_countmin_by_source" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(string_split_regex(lower(trim(text)),
         |    '\\s+')) AS v FROM documents),
         |counts AS (SELECT source, v, count(*) AS n FROM toks
         |  GROUP BY 1, 2),
         |b AS (SELECT source, v, n, j,
         |  ${hash60Sql("CAST(j AS VARCHAR) || ':' || v")} % 1024 AS bkt
         |  FROM counts CROSS JOIN (SELECT unnest(range(4)) AS j) r),
         |cm AS (SELECT source, j, bkt, sum(n) AS c FROM b
         |  GROUP BY 1, 2, 3),
         |top AS (SELECT source, v, n, row_number() OVER (
         |    PARTITION BY source ORDER BY n DESC, v) AS rk
         |  FROM counts QUALIFY rk <= 5),
         |est AS (SELECT t.source, t.rk, t.v, t.n, min(cm.c) AS cm_est
         |  FROM top t JOIN b ON b.source = t.source AND b.v = t.v
         |  JOIN cm ON cm.source = b.source AND cm.j = b.j
         |    AND cm.bkt = b.bkt
         |  GROUP BY 1, 2, 3, 4)
         |SELECT source, rk AS rank, v AS value, CAST(n AS BIGINT)
         |    AS n_exact,
         |  CAST(cm_est AS BIGINT) AS cm_est,
         |  CAST(cm_est - n AS BIGINT) AS overcount
         |FROM est ORDER BY source, rank""".stripMargin,

    // e2e funnel mirror: every stage re-expressed from the fragments
    // already proven (q188 nfc, q193 scorer, q24 keep-first, q182
    // hash-rank selection), joined into one per-source funnel row
    "q200_curation_e2e" ->
      s"""WITH ${scorerCtesSql},
         |d1 AS (SELECT * FROM d0 WHERE lang = 'en'),
         |d2 AS (SELECT d1.* FROM d1 JOIN us USING (doc_id)
         |  WHERE units > 0),
         |d3 AS (SELECT * FROM (SELECT d2.*, row_number() OVER (
         |    PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM d2)
         |  WHERE rn = 1),
         |bud AS (SELECT source, least(20, count(*)) AS b FROM d3
         |  GROUP BY 1),
         |hh AS (SELECT doc_id, source,
         |  ${hash60Sql("CAST(doc_id AS VARCHAR)")} AS h FROM d3),
         |rk AS (SELECT doc_id, source, row_number() OVER (
         |    PARTITION BY source ORDER BY h, doc_id) AS rn FROM hh),
         |d4 AS (SELECT rk.doc_id, rk.source FROM rk JOIN bud
         |  USING (source) WHERE rn <= b),
         |c0 AS (SELECT source, count(*) AS n_raw FROM d0 GROUP BY 1),
         |c1 AS (SELECT source, count(*) AS n_en FROM d1 GROUP BY 1),
         |c2 AS (SELECT source, count(*) AS n_quality FROM d2 GROUP BY 1),
         |c3 AS (SELECT source, count(*) AS n_dedup FROM d3 GROUP BY 1),
         |c4 AS (SELECT source, count(*) AS n_final,
         |  sum(doc_id) AS id_sum FROM d4 GROUP BY 1)
         |SELECT c0.source, c0.n_raw,
         |  CAST(coalesce(n_en, 0) AS BIGINT) AS n_en,
         |  CAST(coalesce(n_quality, 0) AS BIGINT) AS n_quality,
         |  CAST(coalesce(n_dedup, 0) AS BIGINT) AS n_dedup,
         |  CAST(coalesce(n_final, 0) AS BIGINT) AS n_final,
         |  CAST(coalesce(id_sum, 0) AS BIGINT) AS id_sum
         |FROM c0 LEFT JOIN c1 USING (source) LEFT JOIN c2 USING (source)
         |LEFT JOIN c3 USING (source) LEFT JOIN c4 USING (source)
         |ORDER BY source""".stripMargin,

    // layout-invariance mirror: the same predicate + aggregate over the
    // ORIGINAL table — the z-ordered sink must change nothing
    "q201_zorder_scan" ->
      """SELECT count(*) AS n, round(sum(value), 6) AS sum_v,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events
        |WHERE user_id BETWEEN 100 AND 300
        |  AND value BETWEEN 10.0 AND 60.0""".stripMargin,

    // per-source histogram mirror: q196's estimator with every frame
    // keyed by source; exact side is grouped quantile_cont
    "q202_hist_quantiles_by" ->
      """WITH s AS (SELECT source, min(CAST(n_chars AS DOUBLE)) AS lo,
        |  max(CAST(n_chars AS DOUBLE)) AS hi, count(n_chars) AS n
        |  FROM documents GROUP BY 1),
        |b AS (SELECT d.source, CASE WHEN hi = lo THEN 0
        |    ELSE CAST(least(floor((CAST(n_chars AS DOUBLE) - lo)
        |      / (hi - lo) * 64), 63) AS BIGINT) END AS bin,
        |    count(*) AS c
        |  FROM documents d JOIN s ON d.source = s.source
        |  WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |cum AS (SELECT source, bin, c,
        |  sum(c) OVER (PARTITION BY source ORDER BY bin) AS cum FROM b),
        |qs AS (SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS q),
        |cr AS (SELECT s.source, q, lo, hi, bin, c, cum,
        |    greatest(ceil(q * n), 1) AS target,
        |    row_number() OVER (PARTITION BY s.source, q ORDER BY bin)
        |      AS rn
        |  FROM qs, s JOIN cum ON cum.source = s.source
        |  WHERE cum >= greatest(ceil(q * n), 1)),
        |ex0 AS (SELECT source, quantile_cont(n_chars, [0.5, 0.9]) AS evs
        |  FROM documents GROUP BY 1),
        |ex AS (SELECT source, CAST(unnest([0.5, 0.9]) AS DOUBLE) AS q,
        |  unnest(evs) AS ev FROM ex0)
        |SELECT cr.source, cr.q,
        |  round(lo + (hi - lo) / 64 * (bin + (target - (cum - c)) / c), 6)
        |    AS hist_est,
        |  round(ex.ev, 6) AS exact_val
        |FROM cr JOIN ex ON cr.source = ex.source AND cr.q = ex.q
        |WHERE rn = 1 ORDER BY cr.source, cr.q""".stripMargin,

    // Mann-Whitney U with average ranks over the DISTINCT-score frame —
    // the same tie-exact formulation as Stats.rocAuc
    "q203_roc_auc" ->
      """WITH per AS (SELECT n_chars AS s, count(*) AS n,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS npos
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL GROUP BY 1),
        |r AS (SELECT s, n, npos,
        |  coalesce(sum(n) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cum_below
        |  FROM per)
        |SELECT round((sum(npos * (cum_below + (n + 1) / 2.0))
        |    - sum(npos) * (sum(npos) + 1) / 2.0)
        |    / (sum(npos) * sum(n - npos)), 6) AS auc,
        |  CAST(sum(npos) AS BIGINT) AS n_pos,
        |  CAST(sum(n - npos) AS BIGINT) AS n_neg
        |FROM r""".stripMargin,

    // water-filling closed form of the UniMax sequential allocation:
    // level t solves sum(min(cap, t)) = B; allocations are exact
    // integer-valued doubles so the window sums carry no float drift
    "q204_unimax_mix" ->
      """WITH c AS (SELECT source,
        |  CAST(sum(n_chars) AS DOUBLE) AS tokens,
        |  CAST(sum(n_chars) AS DOUBLE) * 2.0 AS cap
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT sum(tokens) * 0.4 AS B, count(*) AS k FROM c),
        |st AS (SELECT source, tokens, cap, B, k,
        |  coalesce(sum(cap) OVER (ORDER BY cap, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cum_prev,
        |  row_number() OVER (ORDER BY cap, source) AS j
        |  FROM c, tot),
        |lv AS (SELECT max(CASE WHEN (B - cum_prev) / (k - j + 1) <= cap
        |  THEN (B - cum_prev) / (k - j + 1) END) AS level FROM st)
        |SELECT source, tokens, cap,
        |  round(least(cap, coalesce(level, cap)), 6) AS alloc
        |FROM st, lv ORDER BY source""".stripMargin,

    // per-source median + MAD via quantile_cont (same linear
    // interpolation as Spark's exact percentile), 3-MAD outlier count
    "q205_mad_outliers" ->
      """WITH med AS (SELECT source,
        |  quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
        |  FROM documents GROUP BY 1),
        |mad AS (SELECT d.source,
        |  quantile_cont(abs(CAST(n_chars AS DOUBLE) - med), 0.5) AS mad
        |  FROM documents d JOIN med USING (source) GROUP BY 1)
        |SELECT d.source, count(*) AS n,
        |  round(min(m.med), 6) AS med, round(min(a.mad), 6) AS mad,
        |  CAST(sum(CASE WHEN abs(CAST(n_chars AS DOUBLE) - m.med)
        |    > 3.0 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM documents d JOIN med m USING (source)
        |  JOIN mad a ON d.source = a.source
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // lower weighted quantile: smallest value whose cumulative weight
    // (over distinct values ascending) reaches q·W — integer-valued
    // weights make every cumulative sum exact in double
    "q209_weighted_quantiles" ->
      """WITH base AS (SELECT source, CAST(n_chars AS DOUBLE) AS v,
        |    CAST(n_chars AS DOUBLE) AS w
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |dv AS (SELECT source, v, sum(w) AS w FROM base GROUP BY 1, 2),
        |cum AS (SELECT source, v,
        |  sum(w) OVER (PARTITION BY source ORDER BY v) AS cw FROM dv),
        |tot AS (SELECT source, sum(w) AS W FROM base GROUP BY 1),
        |qs AS (SELECT CAST(unnest([0.25, 0.5, 0.9]) AS DOUBLE) AS q)
        |SELECT c.source, q, round(min(v), 6) AS wq
        |FROM cum c JOIN tot USING (source), qs
        |WHERE cw >= q * W
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // seeded-sample mirror: the same md5-derived hash with the seed
    // folded in; mod 2^30 under 0.25 ⇔ mod < 268435456 (exact)
    "q212_seeded_sample" ->
      s"""SELECT doc_id FROM documents
         |WHERE ${hash60Sql("'42:' || CAST(doc_id AS VARCHAR)")}
         |  % 1073741824 < 268435456
         |ORDER BY doc_id""".stripMargin,

    // the one-window reference formulation of the skew-safe calibration
    "q208_score_calibration" ->
      """SELECT doc_id, source,
        |  round(percent_rank() OVER (PARTITION BY source
        |    ORDER BY n_chars), 6) AS calibrated
        |FROM documents ORDER BY doc_id""".stripMargin,

    // grouped continuous quantiles — the refinement path must land on
    // quantile_cont's exact interpolation per group
    "q207_exact_quantiles_by" ->
      """WITH ex0 AS (SELECT source,
        |  quantile_cont(CAST(n_chars AS DOUBLE), [0.5, 0.95]) AS evs
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1)
        |SELECT source, CAST(unnest([0.5, 0.95]) AS DOUBLE) AS q,
        |  round(unnest(evs), 6) AS exact_val
        |FROM ex0 ORDER BY source, q""".stripMargin,

    // token-distribution drift mirror: same union-support JS, both-
    // sides-only PSI, and TVD on exact count ratios (ln on identical
    // doubles — the q130/q141 discipline)
    "q222_drift_metrics" ->
      """WITH terms AS (SELECT source,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |c AS (SELECT term,
        |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
        |  FROM terms GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
        |    CAST(sum(cb) AS DOUBLE) AS nb FROM c),
        |f AS (SELECT CAST(ca AS DOUBLE) / na AS p,
        |    CAST(cb AS DOUBLE) / nb AS q, ca, cb FROM c, tot)
        |SELECT
        |  round(sum(
        |    (CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2)) / 2
        |      ELSE 0 END) +
        |    (CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2)) / 2
        |      ELSE 0 END)), 6) AS js_nats,
        |  round(sum(CASE WHEN ca > 0 AND cb > 0
        |    THEN (p - q) * ln(p / q) ELSE 0 END), 6) AS psi,
        |  round(sum(abs(p - q)) / 2, 6) AS tvd,
        |  count(*) AS n_cats
        |FROM f""".stripMargin,

    // two-sample KS mirror: cumulative counts over the distinct length
    // frame; single division per value, then max |F_a − F_b|
    "q223_ks_lengths" ->
      """WITH c AS (SELECT n_chars AS v,
        |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
        |  FROM documents
        |  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |cum AS (SELECT
        |    CAST(sum(ca) OVER (ORDER BY v) AS DOUBLE) / na AS fa,
        |    CAST(sum(cb) OVER (ORDER BY v) AS DOUBLE) / nb AS fb,
        |    na, nb FROM c, tot)
        |SELECT round(max(abs(fa - fb)), 6) AS ks_d,
        |  max(na) AS n_a, max(nb) AS n_b, count(*) AS n_values
        |FROM cum""".stripMargin,

    // shard publication mirror: the same md5-derived hash with the
    // seed folded in, mod 8; seq = hash rank within the shard
    "q224_publish_shards" ->
      s"""WITH h AS (SELECT doc_id,
         |    ${hash60Sql("'7:' || CAST(doc_id AS VARCHAR)")} AS hv
         |  FROM documents)
         |SELECT CAST(hv % 8 AS INT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY hv % 8
         |    ORDER BY hv, doc_id) AS INT) AS seq,
         |  doc_id
         |FROM h ORDER BY shard, seq""".stripMargin,

    // drift-matrix mirror: the same shared-support decomposition
    // (category equi-join + per-source totals; disjoint-pair extremes
    // from the all-pairs left join)
    "q227_drift_matrix" ->
      """WITH terms AS (SELECT source AS src,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS cat
        |  FROM documents WHERE source IS NOT NULL),
        |c AS (SELECT src, cat, count(*) AS cc FROM terms GROUP BY 1, 2),
        |tot AS (SELECT src, CAST(sum(cc) AS BIGINT) AS n FROM c GROUP BY 1),
        |f AS (SELECT c.src, c.cat, CAST(c.cc AS DOUBLE) / t.n AS p
        |  FROM c JOIN tot t ON c.src = t.src),
        |sh AS (SELECT a.src AS src_a, b.src AS src_b,
        |    sum(a.p * ln(a.p / ((a.p + b.p) / 2)) / 2 +
        |        b.p * ln(b.p / ((a.p + b.p) / 2)) / 2) AS jsS,
        |    sum((a.p - b.p) * ln(a.p / b.p)) AS psi0,
        |    sum(abs(a.p - b.p)) AS tvdS,
        |    sum(a.p) AS sp, sum(b.p) AS sq, count(*) AS ns
        |  FROM f a JOIN f b ON a.cat = b.cat AND a.src < b.src
        |  GROUP BY 1, 2),
        |ap AS (SELECT ta.src AS src_a, tb.src AS src_b
        |  FROM tot ta, tot tb WHERE ta.src < tb.src),
        |om AS (SELECT src_a, src_b, jsS, psi0, tvdS, ns,
        |    greatest(0, 2 - coalesce(sp, 0) - coalesce(sq, 0)) AS only_m
        |  FROM ap LEFT JOIN sh USING (src_a, src_b))
        |SELECT src_a, src_b,
        |  round(coalesce(jsS, 0) + only_m * ln(2) / 2, 6) AS js_nats,
        |  round(coalesce(psi0, 0), 6) AS psi,
        |  round((coalesce(tvdS, 0) + only_m) / 2, 6) AS tvd,
        |  CAST(coalesce(ns, 0) AS BIGINT) AS n_shared
        |FROM om ORDER BY src_a, src_b""".stripMargin,

    // binned-PSI mirror: the same CASE bins, then the q222 metric SQL
    "q228_binned_psi" ->
      """WITH b AS (SELECT CASE
        |    WHEN n_chars >= 0 AND n_chars <= 100 THEN 1
        |    WHEN n_chars > 100 AND n_chars <= 200 THEN 2
        |    WHEN n_chars > 200 AND n_chars <= 300 THEN 3
        |    WHEN n_chars > 300 AND n_chars <= 400 THEN 4
        |    WHEN n_chars > 400 AND n_chars <= 500 THEN 5
        |    WHEN n_chars > 500 AND n_chars <= 600 THEN 6 END AS bin,
        |    source FROM documents WHERE source IN ('src0', 'src1')),
        |c AS (SELECT bin,
        |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
        |  FROM b WHERE bin IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
        |    CAST(sum(cb) AS DOUBLE) AS nb FROM c),
        |f AS (SELECT CAST(ca AS DOUBLE) / na AS p,
        |    CAST(cb AS DOUBLE) / nb AS q, ca, cb FROM c, tot)
        |SELECT
        |  round(sum(
        |    (CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2)) / 2
        |      ELSE 0 END) +
        |    (CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2)) / 2
        |      ELSE 0 END)), 6) AS js_nats,
        |  round(sum(CASE WHEN ca > 0 AND cb > 0
        |    THEN (p - q) * ln(p / q) ELSE 0 END), 6) AS psi,
        |  round(sum(abs(p - q)) / 2, 6) AS tvd,
        |  count(*) AS n_cats
        |FROM f""".stripMargin,

    // KS-matrix mirror: the same densified grid + per-source ECDF
    "q229_ks_matrix" ->
      """WITH c AS (SELECT source AS src, n_chars AS v, count(*) AS cc
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT src, CAST(sum(cc) AS BIGINT) AS n FROM c GROUP BY 1),
        |grid AS (SELECT v, src, n FROM (SELECT DISTINCT v FROM c), tot),
        |dense AS (SELECT g.src, g.v, g.n, coalesce(c.cc, 0) AS cc
        |  FROM grid g LEFT JOIN c ON c.src = g.src AND c.v = g.v),
        |ecdf AS (SELECT src, v, n,
        |    CAST(sum(cc) OVER (PARTITION BY src ORDER BY v) AS DOUBLE) / n
        |      AS f
        |  FROM dense)
        |SELECT a.src AS src_a, b.src AS src_b,
        |  round(max(abs(a.f - b.f)), 6) AS ks_d,
        |  CAST(max(a.n) AS BIGINT) AS n_a, CAST(max(b.n) AS BIGINT) AS n_b
        |FROM ecdf a JOIN ecdf b ON a.v = b.v AND a.src < b.src
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // rejection-attribution mirror: the q200 scoring blocks (hash
    // buckets + weight table), dedup rank over ALL docs (gates are
    // flagged independently; attribution order is the CASE chain)
    "q230_rejection_reasons" ->
      s"""WITH ${scorerCtesSql},
         |fp AS (SELECT d0.doc_id, d0.source, d0.lang, us.units,
         |    row_number() OVER (PARTITION BY md5(d0.text),
         |      (d0.lang = 'en' AND coalesce(us.units > 0, FALSE))
         |      ORDER BY d0.doc_id) AS rn
         |  FROM d0 LEFT JOIN us USING (doc_id))
         |SELECT source,
         |  CASE WHEN NOT coalesce(lang = 'en', FALSE) THEN 'lang'
         |    WHEN NOT coalesce(units > 0, FALSE) THEN 'quality'
         |    WHEN NOT coalesce(rn = 1, FALSE) THEN 'duplicate'
         |    ELSE 'kept' END AS reason,
         |  count(*) AS n
         |FROM fp GROUP BY 1, 2 ORDER BY source, reason""".stripMargin,

    // classifier-training mirror: the T GD rounds unroll as chained
    // CTEs (w0 → w1 → … — no recursion, no correlation); margins and
    // gradients are exact BIGINT sums, the hard-sigmoid link is a
    // clamp (no exp → no libm divergence), and the weight update uses
    // the mod-adjusted floor quotient to match the engine's floorDiv.
    // The CTE chain (all MATERIALIZED — see classifierTrainCtesSql)
    // is shared with q234's gate oracle.
    "q232_train_classifier" -> classifierScoredOracle,

    // q254 serves the SAME scoring from the Models weights artifact
    // (Curate.scoreTextWith under q232's exact hyperparams) — integer
    // weight units round-trip parquet bit-for-bit, so one oracle
    // checks both the trained and the artifact-served path.
    "q254_classifier_artifact" -> classifierScoredOracle,

    // the trained classifier EXERCISED as a curation gate: the same
    // training chain, then (a) per-source funnel counts under the
    // pred>0 filter (the q200-style stage) and (b) the tie-aware
    // ROC-AUC of the margin against the label (the q203 gate) riding
    // every row as the model's quality certificate
    "q234_classifier_gate" ->
      s"""WITH ${classifierTrainCtesSql(256, 12, 1L, 16L)},
         |sc AS MATERIALIZED (SELECT y.doc_id, COALESCE(z, 0) AS z, y.y
         |  FROM y LEFT JOIN z13 USING (doc_id)),
         |per AS (SELECT d.source,
         |    count(*) AS n_docs,
         |    CAST(sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_kept,
         |    CAST(sum(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_correct,
         |    CAST(sum(CASE WHEN z > 0 THEN sc.doc_id ELSE 0 END)
         |      AS BIGINT) AS id_sum_kept
         |  FROM documents d JOIN sc USING (doc_id) GROUP BY 1),
         |pg AS (SELECT z AS s, count(*) AS n, sum(y) AS npos
         |  FROM sc GROUP BY 1),
         |r AS (SELECT s, n, npos,
         |  coalesce(sum(n) OVER (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS cum_below
         |  FROM pg),
         |auc AS (SELECT round((sum(npos * (cum_below + (n + 1) / 2.0))
         |    - sum(npos) * (sum(npos) + 1) / 2.0)
         |    / (sum(npos) * sum(n - npos)), 6) AS auc FROM r)
         |SELECT source, n_docs, n_kept, n_correct, id_sum_kept, auc
         |FROM per, auc ORDER BY source""".stripMargin,

    // Gopher rules mirror: the same integer cross-product predicates in
    // the same first-failing order (word count, mean word length,
    // symbol ratio, alpha fraction, stopwords), counted per source
    // DSIR mirror: hashed-unigram bucket histograms for target (lang
    // 'en') and raw pools, +1-smoothed per-bucket log-ratio quantized
    // to integer micro-units (the ONLY ln sites — one pair per bucket
    // on exact integer counts, identical double division order as the
    // engine), exact long per-doc sums, top-40 under the (units, id)
    // total order
    "q257_dsir_select" -> dsirOracle,

    // artifact-served DSIR: same pools, same dictionary recipe — the
    // persisted units and the literal-fold scorer must change nothing
    "q261_dsir_artifact" -> dsirOracle,

    "q244_gopher_rules" ->
      """WITH s AS (SELECT source, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents),
        |m AS (SELECT source,
        |    CAST(len(t) AS BIGINT) AS nw,
        |    CAST(coalesce(list_sum(list_transform(t, x -> len(x))), 0)
        |      AS BIGINT) AS sl,
        |    CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
        |      + CAST(floor((len(text) - len(replace(text, '...', '')))
        |          / 3.0) AS BIGINT) AS nsym,
        |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
        |      AS BIGINT) AS na,
        |    CAST(len(list_intersect(t, ['the','be','to','of',
        |      'and','that','have','with'])) AS BIGINT) AS ns
        |  FROM s),
        |r AS (SELECT source, CASE
        |    WHEN NOT coalesce(nw >= 50 AND nw <= 100000, FALSE)
        |      THEN 'word_count'
        |    WHEN NOT coalesce(sl >= 3 * nw AND sl <= 10 * nw, FALSE)
        |      THEN 'mean_word_len'
        |    WHEN NOT coalesce(10 * nsym <= nw, FALSE) THEN 'symbol_ratio'
        |    WHEN NOT coalesce(5 * na >= 4 * nw, FALSE) THEN 'alpha_frac'
        |    WHEN NOT coalesce(ns >= 2, FALSE) THEN 'stopwords'
        |    ELSE 'kept' END AS reason
        |  FROM m)
        |SELECT source, reason, count(*) AS n
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // release-gate mirror: the four audits replayed with their own
    // oracles' machinery (q256 exact containment, q251 banded LSH +
    // exact cosine with planted twins, q222 JS divergence, q230
    // first-failing-gate attribution), each folded to one row, then a
    // 4-row UNION. CTE names are prefixed per branch (scorerCtesSql
    // owns toks/d0/wt/tb/us).
    "q264_release_gate" -> {
      s"""WITH ${scorerCtesSql},
         |ntoks AS (SELECT doc_id,
         |    string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |nsh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
         |    THEN [array_to_string(t, ' ')]
         |    ELSE list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
         |  FROM ntoks),
         |nsizes AS (SELECT doc_id, count(*) AS sz FROM nsh GROUP BY 1),
         |nco AS (SELECT e.doc_id AS id_eval, c.doc_id AS id_doc,
         |    count(*) AS co
         |  FROM nsh e JOIN nsh c ON e.s = c.s
         |  WHERE e.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
         |  GROUP BY 1, 2),
         |ngr AS (SELECT count(DISTINCT id_doc) AS n,
         |    coalesce(max(round(CAST(co AS DOUBLE) / se.sz, 6)), 0.0) AS w
         |  FROM nco JOIN nsizes se ON nco.id_eval = se.doc_id
         |  WHERE CAST(co AS DOUBLE) / se.sz >= 0.7),
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
         |scand AS (SELECT DISTINCT e.vec_id AS id_eval,
         |    t.vec_id AS id_train
         |  FROM evb e JOIN trb t
         |  ON e.band = t.band AND e.bandval = t.bandval),
         |sscored AS (SELECT id_eval,
         |  ${cosineSql("ee.embedding", "et.embedding")} AS cos
         |  FROM scand JOIN evs ee ON scand.id_eval = ee.vec_id
         |  JOIN trs et ON scand.id_train = et.vec_id
         |  WHERE ${dotSql("ee.embedding", "ee.embedding")} > 0
         |    AND ${dotSql("et.embedding", "et.embedding")} > 0),
         |perq AS (SELECT id_eval, round(max(cos), 6) AS mc
         |  FROM sscored WHERE cos >= 0.9 GROUP BY 1),
         |semr AS (SELECT count(*) AS n, coalesce(max(mc), 0.0) AS w
         |  FROM perq),
         |dterms AS (SELECT source,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |  FROM documents WHERE source IN ('src0', 'src1')),
         |dc AS (SELECT term,
         |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
         |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
         |  FROM dterms GROUP BY 1),
         |dtot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
         |    CAST(sum(cb) AS DOUBLE) AS nb FROM dc),
         |df2 AS (SELECT CAST(ca AS DOUBLE) / na AS p,
         |    CAST(cb AS DOUBLE) / nb AS q, ca, cb FROM dc, dtot),
         |dft AS (SELECT round(sum(
         |    (CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2)) / 2
         |      ELSE 0 END) +
         |    (CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2)) / 2
         |      ELSE 0 END)), 6) AS js, count(*) AS n FROM df2),
         |fp AS (SELECT d0.doc_id, d0.lang, us.units,
         |    row_number() OVER (PARTITION BY md5(d0.text),
         |      (d0.lang = 'en' AND coalesce(us.units > 0, FALSE))
         |      ORDER BY d0.doc_id) AS rn
         |  FROM d0 LEFT JOIN us USING (doc_id)),
         |fr AS (SELECT CASE
         |    WHEN NOT coalesce(lang = 'en', FALSE) THEN 'lang'
         |    WHEN NOT coalesce(units > 0, FALSE) THEN 'quality'
         |    WHEN NOT coalesce(rn = 1, FALSE) THEN 'duplicate'
         |    ELSE 'kept' END AS reason
         |  FROM fp),
         |funr AS (SELECT
         |    CAST(sum(CASE WHEN reason <> 'kept' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n,
         |    count(*) AS tot FROM fr)
         |SELECT * FROM (
         |  SELECT 'ngram_contamination' AS "check",
         |    CAST(n AS BIGINT) AS n_flagged, w AS worst, n = 0 AS pass
         |  FROM ngr
         |  UNION ALL
         |  SELECT 'semantic_leakage', CAST(n AS BIGINT), w, n = 0 FROM semr
         |  UNION ALL
         |  SELECT 'token_drift', CAST(n AS BIGINT), js, js <= 0.5 FROM dft
         |  UNION ALL
         |  SELECT 'quality_funnel', n,
         |    round(CAST(n AS DOUBLE) / tot, 6),
         |    CAST(n AS DOUBLE) / tot <= 0.95 FROM funr)
         |ORDER BY "check"""".stripMargin
    },

    // crawl-over-crawl ops mirror: q247's snapshot construction +
    // q185's exact-jaccard incremental gate (fresh slice only) +
    // q222's JS formula between the snapshots + q224's hash-sharded
    // publication of the accepted set — every stage folded to
    // accounting rows. AS MATERIALIZED on every reused CTE (DuckDB
    // inlines plain CTEs ~2^depth otherwise).
    "q265_crawl_ops" -> {
      s"""WITH prevs AS MATERIALIZED (
         |  SELECT doc_id, source, text,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |  FROM documents WHERE doc_id % 3 <> 0),
         |nexts AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    CASE WHEN ${OracleSqlHelpers.hash60Sql("text")} % 5 = 0
         |      THEN text || ' rev2' ELSE text END AS text
         |  FROM documents WHERE doc_id % 2 = 0),
         |nextf AS MATERIALIZED (SELECT doc_id, source, text,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |  FROM nexts),
         |dj AS MATERIALIZED (SELECT coalesce(n.source, o.source) AS source,
         |    CASE WHEN o.doc_id IS NULL THEN 'added'
         |      WHEN n.doc_id IS NULL THEN 'removed'
         |      WHEN o.f IS NOT DISTINCT FROM n.f THEN 'unchanged'
         |      ELSE 'changed' END AS s
         |  FROM prevs o FULL OUTER JOIN nextf n USING (doc_id)),
         |dcnt AS MATERIALIZED (SELECT source, s, count(*) AS n
         |  FROM dj GROUP BY 1, 2),
         |states AS (SELECT unnest(
         |  ['added', 'removed', 'changed', 'unchanged']) AS s),
         |srcs AS (SELECT DISTINCT source FROM dj),
         |diffrows AS (SELECT 'diff_' || st.s AS stage, sc.source AS key,
         |    CAST(coalesce(d.n, 0) AS BIGINT) AS n,
         |    CAST(0 AS BIGINT) AS id_sum, CAST(0.0 AS DOUBLE) AS metric
         |  FROM srcs sc CROSS JOIN states st
         |  LEFT JOIN dcnt d ON d.source = sc.source AND d.s = st.s),
         |fresh AS MATERIALIZED (SELECT n.doc_id, n.source, n.text
         |  FROM nextf n LEFT JOIN prevs o USING (doc_id)
         |  WHERE o.f IS NULL OR o.f <> n.f),
         |tko AS MATERIALIZED (SELECT doc_id,
         |    string_split_regex(lower(trim(text)), '\\s+') AS t FROM prevs),
         |sho AS MATERIALIZED (SELECT doc_id,
         |    unnest(list_distinct(CASE WHEN len(t) < 3
         |      THEN [array_to_string(t, ' ')]
         |      ELSE list_transform(range(1, len(t) - 1),
         |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS sgl
         |  FROM tko),
         |tkn AS MATERIALIZED (SELECT doc_id,
         |    string_split_regex(lower(trim(text)), '\\s+') AS t FROM fresh),
         |shn AS MATERIALIZED (SELECT doc_id,
         |    unnest(list_distinct(CASE WHEN len(t) < 3
         |      THEN [array_to_string(t, ' ')]
         |      ELSE list_transform(range(1, len(t) - 1),
         |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS sgl
         |  FROM tkn),
         |szo AS MATERIALIZED (SELECT doc_id, count(*) AS sz
         |  FROM sho GROUP BY 1),
         |szn AS MATERIALIZED (SELECT doc_id, count(*) AS sz
         |  FROM shn GROUP BY 1),
         |co AS MATERIALIZED (SELECT a.doc_id AS id_new, b.doc_id AS id_old,
         |    count(*) AS co
         |  FROM shn a JOIN sho b ON a.sgl = b.sgl GROUP BY 1, 2),
         |pairs AS MATERIALIZED (SELECT id_new,
         |    round(CAST(co AS DOUBLE) / (sa.sz + sb.sz - co), 6) AS j
         |  FROM co JOIN szn sa ON co.id_new = sa.doc_id
         |    JOIN szo sb ON co.id_old = sb.doc_id
         |  WHERE CAST(co AS DOUBLE) / (sa.sz + sb.sz - co) >= 0.5),
         |dmax AS MATERIALIZED (SELECT id_new, max(j) AS j
         |  FROM pairs GROUP BY 1),
         |duprows AS (SELECT 'dup_new' AS stage, n.source AS key,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(d.id_new) AS BIGINT) AS id_sum,
         |    round(max(d.j), 6) AS metric
         |  FROM dmax d JOIN nexts n ON n.doc_id = d.id_new GROUP BY 2),
         |terms AS MATERIALIZED (
         |  SELECT 'prev' AS snap, unnest(string_split_regex(
         |    lower(trim(text)), '\\s+')) AS term FROM prevs
         |  UNION ALL
         |  SELECT 'next', unnest(string_split_regex(
         |    lower(trim(text)), '\\s+')) FROM nexts),
         |c AS MATERIALIZED (SELECT term,
         |    sum(CASE WHEN snap = 'prev' THEN 1 ELSE 0 END) AS ca,
         |    sum(CASE WHEN snap = 'next' THEN 1 ELSE 0 END) AS cb
         |  FROM terms GROUP BY 1),
         |tot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
         |    CAST(sum(cb) AS DOUBLE) AS nb FROM c),
         |fr AS (SELECT CAST(ca AS DOUBLE) / na AS p,
         |    CAST(cb AS DOUBLE) / nb AS q, ca, cb FROM c, tot),
         |driftrow AS (SELECT 'drift' AS stage, 'prev_vs_next' AS key,
         |    CAST(count(*) AS BIGINT) AS n, CAST(0 AS BIGINT) AS id_sum,
         |    round(sum(
         |      (CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2)) / 2
         |        ELSE 0 END) +
         |      (CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2)) / 2
         |        ELSE 0 END)), 6) AS metric
         |  FROM fr),
         |acc AS MATERIALIZED (SELECT doc_id FROM nexts
         |  WHERE doc_id NOT IN (SELECT id_new FROM dmax)),
         |hs AS MATERIALIZED (SELECT doc_id,
         |    ${OracleSqlHelpers.hash60Sql("'7:' || CAST(doc_id AS VARCHAR)")}
         |    AS hv FROM acc),
         |sh2 AS MATERIALIZED (SELECT CAST(hv % 8 AS INT) AS shard,
         |    row_number() OVER (PARTITION BY hv % 8
         |      ORDER BY hv, doc_id) AS seq, doc_id
         |  FROM hs),
         |shardrows AS (SELECT 'shard' AS stage,
         |    CAST(shard AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |    CAST(max(seq) AS DOUBLE) AS metric
         |  FROM sh2 GROUP BY 2)
         |SELECT * FROM (
         |  SELECT * FROM diffrows UNION ALL
         |  SELECT * FROM duprows UNION ALL
         |  SELECT * FROM driftrow UNION ALL
         |  SELECT * FROM shardrows)
         |ORDER BY stage, key""".stripMargin
    }
  )

  /** Full GD-replay + scoring mirror shared by q232 (in-session train)
    * and q254 (artifact-served scoring under identical hyperparams):
    * integer-unit gradient/margin arithmetic, piecewise-linear sigmoid
    * clamp (no exp → no libm divergence), mod-adjusted floor-quotient
    * weight updates — see classifierTrainCtesSql.
    */
  /** DSIR mirror shared by q257 (trained, join-based) and q261
    * (artifact-served literal fold): hashed-unigram bucket histograms
    * for target (lang 'en') and raw pools, +1-smoothed per-bucket
    * log-ratio quantized to integer micro-units (the ONLY ln sites —
    * one pair per bucket on exact integer counts, identical double
    * division order as the engine), exact long per-doc sums, top-40
    * under the (units, id) total order.
    */
  private lazy val dsirOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
       |    '\\s+')) AS tk FROM documents),
       |tb AS (SELECT doc_id, ${OracleSqlHelpers.hash60Sql("tk")} % 2048
       |  AS b FROM toks),
       |tgt AS (SELECT b, count(*) AS t FROM tb
       |  JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
       |rawc AS (SELECT b, count(*) AS r FROM tb GROUP BY 1),
       |tot AS (SELECT (SELECT sum(t) FROM tgt) AS tt,
       |  (SELECT sum(r) FROM rawc) AS rt),
       |dict AS (SELECT j AS b,
       |    CAST(round((ln(CAST(coalesce(t, 0) + 1 AS DOUBLE)
       |        / CAST(tt + 2048 AS DOUBLE))
       |      - ln(CAST(coalesce(r, 0) + 1 AS DOUBLE)
       |        / CAST(rt + 2048 AS DOUBLE))) * 1e6) AS BIGINT) AS llr
       |  FROM (SELECT unnest(range(2048)) AS j)
       |  LEFT JOIN tgt ON j = tgt.b
       |  LEFT JOIN rawc ON j = rawc.b, tot)
       |SELECT doc_id, CAST(sum(llr) AS BIGINT) AS score_units
       |FROM tb JOIN dict USING (b) GROUP BY 1
       |ORDER BY score_units DESC, doc_id LIMIT 40""".stripMargin

  private lazy val classifierScoredOracle: String =
    s"""WITH ${classifierTrainCtesSql(256, 12, 1L, 16L)}
       |SELECT y.doc_id, COALESCE(z, 0) AS z_units,
       |  round(CAST(COALESCE(z, 0) AS DOUBLE) / 1000000.0, 6) + 0.0
       |    AS margin,
       |  COALESCE(z, 0) > 0 AS pred, y.y = 1 AS label,
       |  (COALESCE(z, 0) > 0) = (y.y = 1) AS correct
       |FROM y LEFT JOIN z13 USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
