package graft

/** Shared DuckDB SQL fragments for the per-family oracle registries. */
private[graft] object OracleSqlHelpers {


  /** Exact n-gram-jaccard pair set over `documents` at a threshold —
    * ground truth for q28 (direct) and the verified LSH pipelines
    * q29/q47 (whose banded candidates achieve full recall at their τ).
    */
  def jaccardBody(tau: String): String =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) < 3
       |    THEN [array_to_string(t, ' ')]
       |    ELSE list_transform(range(1, len(t) - 1),
       |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
       |  FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS co
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jpairs AS (SELECT id_a, id_b,
       |  round(CAST(co AS DOUBLE) / (sa.sz + sb.sz - co), 6) AS jaccard
       |FROM co JOIN sizes sa ON co.id_a = sa.doc_id
       |  JOIN sizes sb ON co.id_b = sb.doc_id
       |WHERE CAST(co AS DOUBLE) / (sa.sz + sb.sz - co) >= $tau)""".stripMargin

  def jaccardOracle(tau: String): String =
    s"""WITH ${jaccardBody(tau)}
       |SELECT id_a, id_b, jaccard FROM jpairs ORDER BY id_a, id_b""".stripMargin

  /** DuckDB mirror of `Dedup.portableHash64`: the first 15 hex digits
    * of md5 parsed as an integer (60-bit, non-negative). Same
    * expression the q187 KMV oracle inlines.
    */
  /** Shared DuckDB CTE block for the q200/q230 mirrors: NFC'd
    * documents (d0) + the hashed-linear scorer tables (toks/wt/tb/us).
    * ONE copy so the weight generator can never diverge between the
    * funnel and attribution oracles (the Scala side shares
    * `Curate.hashedWeight` the same way). Scoring runs over ALL docs —
    * the weights are a pure hash, so per-doc units are independent of
    * which other docs are scored.
    */
  def scorerCtesSql: String =
    s"""d0 AS (SELECT doc_id, source, lang,
       |  nfc_normalize(text) AS text FROM documents),
       |toks AS (SELECT doc_id, unnest(string_split_regex(
       |  lower(trim(text)), '\\s+')) AS tk FROM d0),
       |wt AS (SELECT j AS b, (j * 2654435761 + 104729) % 19997 - 9998
       |    AS wt FROM (SELECT unnest(range(4096)) AS j)),
       |tb AS (SELECT doc_id, ${hash60Sql("tk")} % 4096 AS b FROM toks),
       |us AS (SELECT doc_id, sum(wt) AS units FROM tb JOIN wt USING (b)
       |  GROUP BY 1)""".stripMargin

  def hash60Sql(s: String): String =
    s"CAST(list_sum(list_transform(range(1, 16), " +
      s"i -> CAST(strpos('0123456789abcdef', md5($s)[i]) - 1 AS BIGINT) " +
      s"<< (4 * (15 - i)))) AS BIGINT)"

  /** Double-precision dot product of two FLOAT[] columns — mirrors
    * Similarity.dot's element order and double casts bit-for-bit. */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Table-driven reflected CRC-32 over part names, parameterized by
    * polynomial — oracle for q94 (IEEE) and q112 (Castagnoli).
    */
  def crcOracle(poly: Long): String =
    s"""WITH RECURSIVE
       |tab0 AS (SELECT n, 0 AS k, CAST(n AS BIGINT) AS c FROM range(256) t(n)
       |  UNION ALL SELECT n, k + 1,
       |    CASE WHEN c & 1 = 1 THEN xor(c >> 1, $poly) ELSE c >> 1 END
       |  FROM tab0 WHERE k < 8),
       |tab AS (SELECT n, c FROM tab0 WHERE k = 8),
       |s AS (SELECT p_partkey, p_name AS str, length(p_name) AS len FROM part),
       |f AS (
       |  SELECT p_partkey, 0 AS pos, CAST(4294967295 AS BIGINT) AS crc FROM s
       |  UNION ALL
       |  SELECT f.p_partkey, f.pos + 1, xor(f.crc >> 8, tab.c)
       |  FROM f JOIN s ON f.p_partkey = s.p_partkey AND f.pos < s.len
       |  JOIN tab ON tab.n = xor(f.crc, ord(substr(s.str, f.pos + 1, 1))) & 255)
       |SELECT s.p_partkey, xor(f.crc, 4294967295) AS crc
       |FROM f JOIN s ON f.p_partkey = s.p_partkey AND f.pos = s.len
       |ORDER BY s.p_partkey""".stripMargin

  /** Nearest as-of with tolerance + matched_on — oracle for q77 (window
    * formulation) and q92 (native sort-merge exec): DuckDB ASOF covers
    * backward/forward; nearest combines them with the backward tie-break.
    */
  def nearestAsofOracle: String =
    """WITH c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id
      |    FROM events WHERE event_type = 'click'),
      |  p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value
      |    FROM events WHERE event_type = 'purchase'),
      |  bk AS (SELECT c.event_id, c.user_id, c.tsu, p.tsu AS t0, p.value AS v0
      |    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsu >= p.tsu),
      |  fw AS (SELECT c.event_id, p.tsu AS t1, p.value AS v1
      |    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsu <= p.tsu),
      |  pick AS (SELECT bk.event_id, bk.user_id, bk.tsu,
      |    CASE WHEN t0 IS NULL THEN t1
      |      WHEN t1 IS NULL THEN t0
      |      WHEN bk.tsu - t0 <= t1 - bk.tsu THEN t0 ELSE t1 END AS mt,
      |    CASE WHEN t0 IS NULL THEN v1
      |      WHEN t1 IS NULL THEN v0
      |      WHEN bk.tsu - t0 <= t1 - bk.tsu THEN v0 ELSE v1 END AS mv
      |    FROM bk JOIN fw ON bk.event_id = fw.event_id)
      |SELECT event_id, user_id,
      |  round(CASE WHEN abs(tsu - mt) <= 3600000000 THEN mv END, 6) AS pv,
      |  CASE WHEN abs(tsu - mt) <= 3600000000 THEN mt END AS matched_on
      |FROM pick ORDER BY event_id""".stripMargin

  /** Brute-force cosine top-k over `embeddings` — oracle for q31 directly
    * and for q82 (IVF with nprobe = nCentroids degenerates to brute force).
    */
  def annBruteOracle: String =
    s"""WITH c AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv
       |  FROM embeddings WHERE vec_id < 3),
       |scored AS (
       |  SELECT q.qid, c.vec_id,
       |    ${cosineSql("c.embedding", "q.qv")} AS cosine
       |  FROM c, q WHERE c.vec_id <> q.qid),
       |ranked AS (SELECT qid, vec_id, cosine,
       |  row_number() OVER (PARTITION BY qid
       |    ORDER BY cosine DESC, vec_id) AS rnk FROM scored)
       |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
       |  vec_id AS neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin

  /** Quadratic-mix hyperplane projection for plane `p` — mirrors
    * Similarity.lshSignature's w(p,d) integer formula exactly:
    * s = 131p + d; w = ((s² mod 1000003)·2654435761 + s·40503 + 12345)
    * mod 2001 − 1000. All terms non-negative i64, so plain `%` matches
    * floorMod/pmod. */
  def lshProjSql(vec: String, p: Int): String = {
    val s = s"(CAST(${131 * p} AS BIGINT) + (i-1))"
    s"list_sum(list_transform(range(1, len($vec)+1), " +
      s"i -> CAST($vec[i] AS DOUBLE) * CAST((($s * $s % 1000003) * " +
      s"CAST(2654435761 AS BIGINT) + $s * 40503 + 12345) % 2001 - 1000 " +
      s"AS DOUBLE)))"
  }

  /** Band value b of a w-planes-per-band LCG signature:
    * Σ_j 2^j · [proj(b·w + j) > 0]. Equals
    * `shiftright(rip_lsh_sig(vec, bits), b·w) & (2^w − 1)` because the
    * bands cover DISJOINT bit ranges; summing per band avoids forming
    * the 64-bit total in SQL (plane 63's 2^63 addend overflows BIGINT).
    */
  def lshBandValSql(vec: String, band: Int, w: Int): String =
    (0 until w).map(j =>
      s"(CASE WHEN ${lshProjSql(vec, band * w + j)} > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Signature CTE for the DEFAULT cosineNearDupPairs geometry (64
    * planes, 4×16-bit bands): b0..b3 columns over `rel(idCol, vec)`.
    * MATERIALIZED — referenced by the band explode AND twice by the
    * verify join; a plain CTE re-inlines the 64 projections each time
    * (see the verify skill's CTE-inlining gotcha).
    */
  def lshSigCte(name: String, rel: String, idCol: String, vec: String): String =
    s"""$name AS MATERIALIZED (SELECT $idCol, $vec,
       |  ${(0 until 4).map(b => s"${lshBandValSql(vec, b, 16)} AS b$b")
            .mkString(", ")}
       |  FROM $rel)""".stripMargin

  /** Planted near-dup twins — mirrors QueryShared.plantTwins exactly:
    * ×2-scaled copies of ids ≡ 1 (mod 9) at +100000 (doubling is exact
    * in float32 and the LSH signature is scale-invariant → recall 1 by
    * construction) and dim-0-negated copies of ids ≡ 4 (mod 9) at
    * +200000 (sign flip exact; exercises the banding S-curve).
    */
  def twinsSql(src: String, idCol: String, vec: String): String =
    s"""SELECT $idCol + 100000 AS $idCol,
       |    list_transform($vec, x -> CAST(x + x AS FLOAT)) AS $vec
       |  FROM $src WHERE $idCol % 9 = 1
       |  UNION ALL
       |  SELECT $idCol + 200000 AS $idCol,
       |    list_transform(range(1, len($vec)+1),
       |      i -> CASE WHEN i = 1 THEN CAST(-$vec[1] AS FLOAT)
       |           ELSE $vec[i] END) AS $vec
       |  FROM $src WHERE $idCol % 9 = 4""".stripMargin

  /** Per-doc simhash over Dedup.portableHash64 token hashes — mirrors
    * Dedup.simhashDf bit-for-bit: md5-hex→60-bit int, 64 signed bit
    * votes, sign bits OR'd into one BIGINT. Ends with `FROM votes`;
    * callers add the final SELECT.
    */
  def simhashCte: String = {
    val votes = (0 until 64).map(j =>
      s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS v$j")
      .mkString(", ")
    val bits = (0 until 64).map(j =>
      s"CASE WHEN v$j > 0 THEN CAST(1 AS BIGINT) << $j ELSE CAST(0 AS BIGINT) END")
      .mkString(" | ")
    s"""WITH tk AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents),
       |hx AS (SELECT doc_id, md5(tok) AS hex FROM tk),
       |hh AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 16),
       |  i -> CAST(strpos('0123456789abcdef', hex[i]) - 1 AS BIGINT)
       |    << (4 * (15 - i)))) AS BIGINT) AS h FROM hx),
       |votes AS (SELECT doc_id, $votes FROM hh GROUP BY doc_id),
       |sig AS (SELECT doc_id, ($bits) AS simhash FROM votes)""".stripMargin
  }


  /** DuckDB replay of `Bpe.bpeMerges`' driver loop, unrolled: `w0` is
    * the U+0001-bracketed character segmentation of the ASCII-printable
    * word-frequency table; each round r computes pair counts `p{r}`,
    * the deterministic argmax `b{r}` (≥2 occurrences, ties to the
    * lexicographically least pair), and the merged table `w{r}`. An
    * exhausted round leaves `b{r}` empty, which empties every later
    * `w`/`b` — exactly the Scala loop's early stop.
    */
  def bpeCtes(rounds: Int): String = {
    // DOUBLE chr(1) separators (ss below): the merge pattern takes only
    // the INNER separator of each boundary, leaving the outer one for
    // the adjacent occurrence — one non-overlapping replace sweep ≡
    // sequential leftmost BPE (see Bpe.scala's representation note).
    // Every CTE is AS MATERIALIZED: each round references w_{r-1} TWICE
    // (p_r and w_r), so DuckDB's plain-CTE inlining re-expands the
    // chain ~2^rounds (the q232 lesson — 10 rounds re-evaluated the
    // corpus tokenization ~1000×, 17 s at sf0.01; materialized it is
    // linear in rounds).
    val head =
      s"""wf AS MATERIALIZED (SELECT w, count(*) AS cnt FROM (
         |    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
         |    FROM documents)
         |  WHERE len(w) > 0 AND regexp_matches(w, '^[ -~]+$$') GROUP BY 1),
         |w0 AS MATERIALIZED (SELECT chr(1) || chr(1) || array_to_string(
         |    list_filter(string_split(w, ''), x -> x <> ''),
         |    chr(1) || chr(1)) || chr(1) || chr(1) AS sym, cnt
         |  FROM wf)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT pr.l AS l, pr.r AS r,
         |    CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT unnest(list_transform(range(1, len(t)),
         |      i -> struct_pack(l := t[i], r := t[i+1]))) AS pr, cnt
         |    FROM (SELECT string_split(trim(sym, chr(1)),
         |        chr(1) || chr(1)) AS t, cnt FROM w${r - 1}))
         |  GROUP BY 1, 2 HAVING sum(cnt) >= 2),
         |b$r AS MATERIALIZED (SELECT l, r, c FROM p$r
         |  ORDER BY c DESC, l, r LIMIT 1),
         |w$r AS MATERIALIZED (SELECT replace(sym,
         |    chr(1) || l || chr(1) || chr(1) || r || chr(1),
         |    chr(1) || l || r || chr(1)) AS sym, cnt FROM w${r - 1}, b$r)"""
        .stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** DuckDB replay of the PQ pipeline (hash-sampled codebooks → argmin
    * codes → s-ordered ADC fold → per-query top-5) — shared by q206
    * (pqTopK) and q213 (ivfPqTopK at full probe, where the IVF routing
    * is semantically the identity). */
  def pqAnnOracle: String =
      s"""WITH hv AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         |    ${hash60Sql("CAST(vec_id AS VARCHAR)")} AS hh
         |  FROM embeddings),
         |cb AS (SELECT CAST(row_number() OVER (ORDER BY hh, vec_id) - 1
         |    AS INT) AS w, v AS cv
         |  FROM hv ORDER BY hh, vec_id LIMIT 16),
         |sd AS (SELECT CAST(s AS BIGINT) AS s FROM range(4) t(s)),
         |d2 AS (SELECT hv.vec_id, s, w,
         |    list_sum(list_transform(range(1, 17), i ->
         |      (v[s * 16 + i] - cv[s * 16 + i])
         |        * (v[s * 16 + i] - cv[s * 16 + i]))) AS d
         |  FROM hv, sd, cb),
         |enc AS (SELECT vec_id, s, w FROM (
         |    SELECT vec_id, s, w, row_number() OVER (
         |      PARTITION BY vec_id, s ORDER BY d, w) AS rn FROM d2)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv FROM hv WHERE vec_id < 3),
         |part AS (SELECT q.qid, e.vec_id, e.s,
         |    list_sum(list_transform(range(1, 17), i ->
         |      (qv[e.s * 16 + i] - cv[e.s * 16 + i])
         |        * (qv[e.s * 16 + i] - cv[e.s * 16 + i]))) AS ds
         |  FROM q, enc e JOIN cb ON e.w = cb.w
         |  WHERE e.vec_id <> q.qid),
         |dist AS (SELECT qid, vec_id,
         |    list_sum(list(ds ORDER BY s)) AS d
         |  FROM part GROUP BY qid, vec_id),
         |rk AS (SELECT qid, vec_id, d, row_number() OVER (
         |    PARTITION BY qid ORDER BY d, vec_id) AS rnk FROM dist)
         |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
         |  vec_id AS neighbor_id, round(d, 6) AS approx_dist
         |FROM rk WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin
}
