package graft

/** DuckDB oracle SQL paired 1:1 with `QueriesSim.m` — embedding similarity: ANN (brute/LSH/IVF/SQ8/PQ), near-dup, covariance/PCA.
  * Column names/types mirror the Spark side exactly (driver hash gate).
  */
private[graft] object OraclesSim {
  import OracleSqlHelpers._

  def m: Map[String, String] = Map(

    "q31_ann_brute" -> annBruteOracle,

    // IVF probing ALL centroids (nprobe = nCentroids = 8, q82) considers
    // every corpus vector, so its output is exactly the brute-force top-k:
    // the same oracle verifies the whole IVF pipeline (assignment, probe
    // routing, inverted-list join) end to end. Pruned-probe recall
    // (nprobe < nCentroids) is covered separately by ScaleSpec.
    "q82_ann_ivf" -> annBruteOracle,

    "q48_ann_lsh" ->
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    (CASE WHEN ${lshProjSql("embedding", 0)} > 0 THEN 1 ELSE 0 END
         |     + CASE WHEN ${lshProjSql("embedding", 1)} > 0 THEN 2 ELSE 0 END
         |     + CASE WHEN ${lshProjSql("embedding", 2)} > 0 THEN 4 ELSE 0 END
         |     + CASE WHEN ${lshProjSql("embedding", 3)} > 0 THEN 8 ELSE 0 END)
         |    AS bucket
         |  FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id,
         |    ${cosineSql("c.embedding", "q.embedding")} AS cosine
         |  FROM sig c JOIN sig q ON c.bucket = q.bucket
         |  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT qid, vec_id, cosine,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, vec_id) AS rnk FROM scored)
         |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
         |  vec_id AS neighbor_id, round(cosine, 6) AS cosine
         |FROM ranked WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin,

    // 64-bit/4-band production geometry over the twin-planted corpus:
    // the oracle replays the plant, every hyperplane projection, the
    // band split, the blocking join, and the exact-cosine verify
    "q108_embed_neardup" -> {
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings),
         |twins AS (${twinsSql("base", "vec_id", "embedding")}),
         |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
         |${lshSigCte("sig", "corpus", "vec_id", "embedding")},
         |bands AS (SELECT vec_id, unnest([b0, b1, b2, b3]) AS bandval,
         |  unnest([0, 1, 2, 3]) AS band FROM sig),
         |cand AS (SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bandval = b.bandval AND a.vec_id < b.vec_id),
         |scored AS (SELECT ia, ib,
         |  ${cosineSql("ea.embedding", "eb.embedding")} AS cos
         |  FROM cand JOIN sig ea ON cand.ia = ea.vec_id
         |  JOIN sig eb ON cand.ib = eb.vec_id)
         |SELECT ia AS id_a, ib AS id_b, round(cos, 6) AS cosine
         |FROM scored WHERE cos >= 0.9 ORDER BY id_a, id_b""".stripMargin
    },

    "q140_ann_multiprobe" -> {
      val bits = 6
      val bucket = (0 until bits).map(p =>
        s"CASE WHEN ${lshProjSql("embedding", p)} > 0 THEN ${1 << p} ELSE 0 END")
        .mkString("(", " + ", ")")
      val probeSet = (0L +: (0 until bits).map(i => 1L << i)).mkString(", ")
      s"""WITH sig AS (
         |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id,
         |    ${cosineSql("c.embedding", "q.embedding")} AS cosine
         |  FROM sig c JOIN sig q
         |    ON xor(CAST(c.bucket AS BIGINT), CAST(q.bucket AS BIGINT))
         |       IN ($probeSet)
         |  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT qid, vec_id, cosine,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, vec_id) AS rnk FROM scored)
         |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
         |  vec_id AS neighbor_id, round(cosine, 6) AS cosine
         |FROM ranked WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin
    },

    "q170_prototype_prune" ->
      s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
        |d AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |  unnest(embedding) AS v FROM e),
        |c AS (SELECT label, i, avg(CAST(v AS DOUBLE)) AS m
        |  FROM d GROUP BY 1, 2),
        |cent AS (SELECT label, list(m ORDER BY i) AS cvec FROM c GROUP BY 1),
        |s AS (SELECT vec_id, e.label AS label,
        |  ${cosineSql("e.embedding", "cent.cvec")} AS cos
        |  FROM e JOIN cent ON e.label = cent.label),
        |r AS (SELECT vec_id, label, cos,
        |  row_number() OVER (PARTITION BY label ORDER BY cos DESC, vec_id)
        |    AS rk,
        |  count(*) OVER (PARTITION BY label) AS n FROM s)
        |SELECT vec_id, label, round(cos, 6) AS cos_centroid,
        |  rk <= floor(n * 0.25) AS prunable
        |FROM r ORDER BY vec_id""".stripMargin,

    "q174_semdedup" ->
      s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
         |dup AS (SELECT DISTINCT b.vec_id
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.35)
         |SELECT e.vec_id, e.label, dup.vec_id IS NOT NULL AS sem_dup
         |FROM e LEFT JOIN dup ON e.vec_id = dup.vec_id
         |ORDER BY e.vec_id""".stripMargin,

    // SQ8 mirror: identical grid learn → quantize → reconstruct → cosine
    // arithmetic in the same element order; codes are exact integers on
    // both engines, so the ranking reproduces bit-for-bit.
    "q175_sq8_ann" ->
      s"""WITH st AS (
         |  SELECT i, min(CAST(v AS DOUBLE)) AS mn, max(CAST(v AS DOUBLE)) AS mx
         |  FROM (SELECT unnest(range(1, len(embedding) + 1)) AS i,
         |          unnest(embedding) AS v FROM embeddings)
         |  GROUP BY i),
         |mm AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
         |  FROM st),
         |rec AS (
         |  SELECT vec_id, list_transform(range(1, len(embedding) + 1), i ->
         |    CASE WHEN mxs[i] > mns[i] THEN
         |      mns[i] + (LEAST(GREATEST(floor(
         |        (CAST(embedding[i] AS DOUBLE) - mns[i]) / (mxs[i] - mns[i])
         |          * 255 + 0.5), 0), 255) / 255) * (mxs[i] - mns[i])
         |    ELSE mns[i] END) AS rv
         |  FROM embeddings, mm),
         |q AS (SELECT vec_id AS qid, rv AS qv FROM rec WHERE vec_id < 3),
         |scored AS (
         |  SELECT q.qid, c.vec_id, ${cosineSql("c.rv", "q.qv")} AS cosine
         |  FROM rec c, q WHERE c.vec_id <> q.qid),
         |ranked AS (SELECT qid, vec_id, cosine,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, vec_id) AS rnk FROM scored)
         |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
         |  vec_id AS neighbor_id, round(cosine, 6) AS approx_cosine
         |FROM ranked WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin,

    "q178_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS ql
         |  FROM embeddings WHERE vec_id < 3),
         |scored AS (
         |  SELECT q.qid, c.vec_id, c.label,
         |    ${cosineSql("c.embedding", "q.qv")} AS cosine
         |  FROM embeddings c, q WHERE c.label <> q.ql),
         |ranked AS (SELECT qid, vec_id, label, cosine,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, vec_id) AS rnk FROM scored)
         |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
         |  vec_id AS negative_id, label AS negative_label,
         |  round(cosine, 6) AS cosine
         |FROM ranked WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin,

    // q175's SQ8 body widened to a 20-deep shortlist, then re-ranked by
    // EXACT double cosine on the raw float vectors (mirrors
    // Similarity.cosine's element order and casts)
    "q181_sq8_rerank" ->
      s"""WITH st AS (
         |  SELECT i, min(CAST(v AS DOUBLE)) AS mn, max(CAST(v AS DOUBLE)) AS mx
         |  FROM (SELECT unnest(range(1, len(embedding) + 1)) AS i,
         |          unnest(embedding) AS v FROM embeddings)
         |  GROUP BY i),
         |mm AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
         |  FROM st),
         |rec AS (
         |  SELECT vec_id, list_transform(range(1, len(embedding) + 1), i ->
         |    CASE WHEN mxs[i] > mns[i] THEN
         |      mns[i] + (LEAST(GREATEST(floor(
         |        (CAST(embedding[i] AS DOUBLE) - mns[i]) / (mxs[i] - mns[i])
         |          * 255 + 0.5), 0), 255) / 255) * (mxs[i] - mns[i])
         |    ELSE mns[i] END) AS rv
         |  FROM embeddings, mm),
         |q AS (SELECT vec_id AS qid, rv AS qv FROM rec WHERE vec_id < 3),
         |scored AS (
         |  SELECT q.qid, c.vec_id, ${cosineSql("c.rv", "q.qv")} AS ac
         |  FROM rec c, q WHERE c.vec_id <> q.qid),
         |ranked AS (SELECT qid, vec_id,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY ac DESC, vec_id) AS rnk FROM scored),
         |short AS (SELECT qid, vec_id FROM ranked WHERE rnk <= 20),
         |ex AS (SELECT s.qid, s.vec_id,
         |    ${cosineSql("c.embedding", "qe.embedding")} AS cosine
         |  FROM short s JOIN embeddings c ON c.vec_id = s.vec_id
         |  JOIN embeddings qe ON qe.vec_id = s.qid),
         |rr AS (SELECT qid, vec_id, cosine,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY cosine DESC, vec_id) AS rnk FROM ex)
         |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
         |  vec_id AS neighbor_id, round(cosine, 6) AS cosine
         |FROM rr WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin,

    // covariance mirror in covMoments' INTEGER units: each per-row
    // term floored to 1e-9 units and summed as exact integers (long
    // sums are associative — both engines reduce to the SAME integers
    // regardless of partition order), then the identical divide shape
    // (x/1e9)/n. round(6) then sees bit-identical doubles on both
    // sides, so the hash compare is exact, not "usually within ulp".
    "q197_cov_matrix" ->
      """WITH d AS (SELECT vec_id,
        |  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
        |  CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |m AS (SELECT i, sum(CAST(floor(v * 1e9) AS BIGINT)) AS s,
        |  count(*) AS n FROM d GROUP BY 1),
        |p AS (SELECT a.i AS i, b.i AS j,
        |  sum(CAST(floor(a.v * b.v * 1e9) AS BIGINT)) AS sp,
        |  count(*) AS n FROM d a JOIN d b USING (vec_id) GROUP BY 1, 2)
        |SELECT p.i, p.j,
        |  round((sp / 1e9) / p.n
        |    - ((ma.s / 1e9) / ma.n) * ((mb.s / 1e9) / mb.n), 6) + 0.0 AS cov
        |FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
        |ORDER BY p.i, p.j""".stripMargin,

    // PCA mirror: the SAME 6-dp-rounded covariance, then the identical
    // fixed-iteration recurrence w ← C·w as a recursive CTE (list_sum
    // sums in list order = the driver loop's ascending-j order, so the
    // iterate is bit-reproducible), one normalization at the end, and
    // the dotSql-ordered projection. dim = 64 (testdata contract; the
    // SchemaDriftSpec tripwire pins it).
    "q198_pca_project" ->
      """WITH RECURSIVE d AS (SELECT vec_id,
        |  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
        |  CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |m AS (SELECT i, sum(CAST(floor(v * 1e9) AS BIGINT)) AS s,
        |  count(*) AS n FROM d GROUP BY 1),
        |p AS (SELECT a.i AS i, b.i AS j,
        |  sum(CAST(floor(a.v * b.v * 1e9) AS BIGINT)) AS sp,
        |  count(*) AS n FROM d a JOIN d b USING (vec_id) GROUP BY 1, 2),
        |cov AS (SELECT p.i, p.j,
        |  round((sp / 1e9) / p.n
        |    - ((ma.s / 1e9) / ma.n) * ((mb.s / 1e9) / mb.n), 6) + 0.0 AS c
        |  FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j),
        |crow AS (SELECT i, list(c ORDER BY j) AS row FROM cov GROUP BY 1),
        |cmat AS (SELECT list(row ORDER BY i) AS mm FROM crow),
        |it AS (
        |  SELECT 0 AS t,
        |    list_transform(range(1, 65), x -> 1.0 / sqrt(64.0)) AS w
        |  UNION ALL
        |  SELECT t + 1,
        |    list_transform(range(1, 65), i ->
        |      list_sum(list_transform(range(1, 65), j -> mm[i][j] * w[j])))
        |  FROM it, cmat WHERE t < 20),
        |wf AS (SELECT w FROM it WHERE t = 20),
        |wn AS (SELECT list_transform(w, x ->
        |  x / sqrt(list_sum(list_transform(w, y -> y * y)))) AS w FROM wf)
        |SELECT vec_id,
        |  round(list_sum(list_transform(range(1, 65), i ->
        |    CAST(embedding[i] AS DOUBLE) * w[i])), 6) + 0.0 AS pc1
        |FROM embeddings, wn ORDER BY vec_id""".stripMargin,

    // embedding-drift mirror: quantize → per-(label, dim) exact long
    // sums → floorDiv means (mod-adjusted quotient) → pairwise exact
    // squared distances
    "q241_embedding_drift" ->
      """WITH u AS MATERIALIZED (SELECT label,
        |    list_transform(embedding, x -> CAST(floor(
        |      CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS u
        |  FROM embeddings WHERE label IS NOT NULL),
        |dd AS MATERIALIZED (SELECT unnest(range(1,
        |  (SELECT min(len(u)) + 1 FROM u))) AS i),
        |s AS MATERIALIZED (SELECT label, t.i,
        |    CAST(sum(u[t.i]) AS BIGINT) AS s, count(*) AS n
        |  FROM u, dd t GROUP BY 1, 2),
        |m AS MATERIALIZED (SELECT label,
        |    list(CAST((s - (((s % n) + n) % n)) / n AS BIGINT)
        |      ORDER BY i) AS m,
        |    CAST(max(n) AS BIGINT) AS n FROM s GROUP BY 1)
        |SELECT a.label AS key_a, b.label AS key_b,
        |  a.n AS n_a, b.n AS n_b,
        |  CAST(list_sum(list_transform(range(1, len(a.m) + 1),
        |    i -> (a.m[i] - b.m[i]) * (a.m[i] - b.m[i]))) AS BIGINT)
        |    AS dist2_units
        |FROM m a JOIN m b ON a.label < b.label
        |ORDER BY 1, 2""".stripMargin,

    // PCA-2 mirror: q198's rounded-covariance power iteration, then
    // Hotelling deflation C ← round6(C − λ·w·wᵀ) with λ = wᵀCw
    // (inner-j / outer-i ascending — the engine's loop order), then a
    // second power iteration; both axes and both projections replay
    // bit-for-bit
    "q240_pca2_project" -> {
      def itBlock(name: String, mat: String) =
        s"""$name AS (
           |  SELECT 0 AS t,
           |    list_transform(range(1, 65), x -> 1.0 / sqrt(64.0)) AS w
           |  UNION ALL
           |  SELECT t + 1,
           |    list_transform(range(1, 65), i ->
           |      list_sum(list_transform(range(1, 65), j -> mm[i][j] * w[j])))
           |  FROM $name, $mat WHERE t < 20)""".stripMargin
      def normBlock(name: String, it: String) =
        s"""$name AS MATERIALIZED (SELECT list_transform(w, x ->
           |  x / sqrt(list_sum(list_transform(w, y -> y * y)))) AS w
           |  FROM $it WHERE t = 20)""".stripMargin
      s"""WITH RECURSIVE d AS MATERIALIZED (SELECT vec_id,
         |  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
         |  CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
         |m AS MATERIALIZED (SELECT i, sum(CAST(floor(v * 1e9) AS BIGINT)) AS s,
         |  count(*) AS n FROM d GROUP BY 1),
         |p AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
         |  sum(CAST(floor(a.v * b.v * 1e9) AS BIGINT)) AS sp,
         |  count(*) AS n FROM d a JOIN d b USING (vec_id) GROUP BY 1, 2),
         |cov AS MATERIALIZED (SELECT p.i, p.j,
         |  round((sp / 1e9) / p.n
         |    - ((ma.s / 1e9) / ma.n) * ((mb.s / 1e9) / mb.n), 6) + 0.0 AS c
         |  FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j),
         |crow AS MATERIALIZED (SELECT i, list(c ORDER BY j) AS row FROM cov GROUP BY 1),
         |cmat AS MATERIALIZED (SELECT list(row ORDER BY i) AS mm FROM crow),
         |${itBlock("it1", "cmat")},
         |${normBlock("wn1", "it1")},
         |lam AS MATERIALIZED (SELECT list_sum(list_transform(range(1, 65), i ->
         |    w[i] * list_sum(list_transform(range(1, 65), j ->
         |      mm[i][j] * w[j])))) AS lam
         |  FROM wn1, cmat),
         |cm2 AS MATERIALIZED (SELECT list_transform(range(1, 65), i ->
         |    list_transform(range(1, 65), j ->
         |      round(mm[i][j] - lam * w[i] * w[j], 6) + 0.0)) AS mm
         |  FROM cmat, wn1, lam),
         |${itBlock("it2", "cm2")},
         |${normBlock("wn2", "it2")}
         |SELECT vec_id,
         |  round(list_sum(list_transform(range(1, 65), i ->
         |    CAST(embedding[i] AS DOUBLE) * wn1.w[i])), 6) + 0.0 AS pc1,
         |  round(list_sum(list_transform(range(1, 65), i ->
         |    CAST(embedding[i] AS DOUBLE) * wn2.w[i])), 6) + 0.0 AS pc2
         |FROM embeddings, wn1, wn2 ORDER BY vec_id""".stripMargin
    },

    // full PQ replay: hash-ranked codebook sample → per-subspace argmin
    // encode (ties to the lowest codeword) → ADC distance as an
    // s-ordered list_sum, mirroring pqTopK's fold order bit-for-bit
    "q206_pq_ann" -> pqAnnOracle,

    // IVF-PQ with nprobe = nCentroids: routing prunes nothing, so the
    // composed index must reproduce the pure-PQ ADC ranking exactly —
    // one oracle checks codebooks, codes, routing join, and ADC
    "q213_ivfpq_ann" -> pqAnnOracle,

    // integer-unit Lloyd replay: quantize once (floor 1e6 units),
    // hash-ranked seeds, per round argmin over exact long distances
    // (ties → lowest cid) + floor-div centroid means (mod-adjusted
    // quotient ≡ floorDiv), empty clusters keep their centroid. Every
    // CTE MATERIALIZED — each round references its predecessor twice
    // (assignment + update), the exponential-inlining shape
    "q237_kmeans" ->
      s"""WITH ${kmeansCtesSql(8, 3)}
         |SELECT vec_id, cid, d2 AS dist2_units
         |FROM km ORDER BY vec_id""".stripMargin,

    // cluster-balanced sampling mirror: the same Lloyd chain, then per
    // cluster the LEAST(cap, n) smallest (portable hash, id) rows —
    // the q200 budget-selection rule keyed by cid instead of source
    "q238_cluster_balanced_sample" ->
      s"""WITH ${kmeansCtesSql(8, 3)},
         |bud AS (SELECT cid, count(*) AS n,
         |  LEAST(50, count(*)) AS b FROM km GROUP BY 1),
         |rk AS (SELECT km.cid, km.vec_id,
         |    row_number() OVER (PARTITION BY km.cid ORDER BY
         |      ${hash60Sql("CAST(km.vec_id AS VARCHAR)")}, km.vec_id)
         |      AS rn
         |  FROM km),
         |kept AS (SELECT rk.cid, rk.vec_id FROM rk
         |  JOIN bud USING (cid) WHERE rk.rn <= bud.b)
         |SELECT bud.cid AS cid, CAST(bud.n AS BIGINT) AS n_total,
         |  count(*) AS n_kept,
         |  CAST(sum(kept.vec_id) AS BIGINT) AS id_sum
         |FROM kept JOIN bud ON kept.cid = bud.cid
         |GROUP BY bud.cid, bud.n ORDER BY 1""".stripMargin,

    // trained-IVF mirror: the shared Lloyd chain gives lists (km) AND
    // the trained centroids (c3); probe routing replays the exact
    // integer-unit d2 ranking (ties to the lowest cid), then cosine
    // top-5 within the probed lists — the whole pruned search is
    // bit-reproducible, so one oracle checks train, route, and search
    "q242_ivf_trained" ->
      s"""WITH ${kmeansCtesSql(8, 3)},
         |qy AS MATERIALIZED (SELECT vec_id AS query_id, u AS qu
         |  FROM u WHERE vec_id < 3),
         |pr AS MATERIALIZED (SELECT query_id, cid FROM (
         |  SELECT qy.query_id, c.cid, row_number() OVER (
         |      PARTITION BY qy.query_id ORDER BY
         |      CAST(list_sum(list_transform(range(1, len(qy.qu) + 1),
         |        i -> (qy.qu[i] - c.cu[i]) * (qy.qu[i] - c.cu[i])))
         |        AS BIGINT), c.cid) AS rn
         |  FROM qy, c3 c) WHERE rn <= 3),
         |cand AS MATERIALIZED (SELECT pr.query_id, km.vec_id
         |  FROM pr JOIN km USING (cid) WHERE km.vec_id <> pr.query_id),
         |scored AS (SELECT cand.query_id, cand.vec_id,
         |    ${cosineSql("eb.embedding", "ea.embedding")} AS cosine
         |  FROM cand JOIN embeddings ea ON ea.vec_id = cand.query_id
         |    JOIN embeddings eb ON eb.vec_id = cand.vec_id),
         |ranked AS (SELECT query_id, vec_id, cosine, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, CAST(rnk AS INT) AS "rank",
         |  vec_id AS neighbor_id, round(cosine, 6) AS cosine
         |FROM ranked WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin,

    // SemDeDup-over-k-means mirror: the shared Lloyd chain, then the
    // q174 keep-lowest-id cosine rule keyed by cid, aggregated to
    // per-cluster prune accounting
    "q239_semdedup_kmeans" ->
      s"""WITH ${kmeansCtesSql(8, 3)},
         |e AS MATERIALIZED (SELECT km.vec_id, km.cid, emb.embedding
         |  FROM km JOIN embeddings emb USING (vec_id)),
         |dup AS MATERIALIZED (SELECT DISTINCT b.vec_id
         |  FROM e a JOIN e b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.35)
         |SELECT e.cid, count(*) AS n,
         |  CAST(sum(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dups,
         |  CAST(sum(CASE WHEN dup.vec_id IS NULL THEN e.vec_id ELSE 0 END)
         |    AS BIGINT) AS id_sum_kept
         |FROM e LEFT JOIN dup ON e.vec_id = dup.vec_id
         |GROUP BY 1 ORDER BY e.cid""".stripMargin,

    // trained-PQ mirror: per-subspace Lloyd codebooks (shared hash-
    // ranked seed rows), double codewords (units/1e6), argmin encode
    // (ties → lowest codeword), s-ordered ADC fold, per-query top-5 —
    // the q206 search SQL under q237's training discipline
    "q249_pq_trained" ->
      s"""WITH ${pqTrainedCtesSql(2, 4, 2, 32)},
         |hv AS MATERIALIZED (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |d2 AS (SELECT hv.vec_id, cw.s, cw.w,
         |    list_sum(list_transform(range(1, 33), i ->
         |      (v[cw.s * 32 + i] - cwv[i])
         |        * (v[cw.s * 32 + i] - cwv[i]))) AS d
         |  FROM hv, cw),
         |enc AS MATERIALIZED (SELECT vec_id, s, w FROM (
         |    SELECT vec_id, s, w, row_number() OVER (
         |      PARTITION BY vec_id, s ORDER BY d, w) AS rn FROM d2)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv FROM hv WHERE vec_id < 3),
         |part AS (SELECT q.qid, e.vec_id, e.s,
         |    list_sum(list_transform(range(1, 33), i ->
         |      (qv[e.s * 32 + i] - cw.cwv[i])
         |        * (qv[e.s * 32 + i] - cw.cwv[i]))) AS ds
         |  FROM q, enc e JOIN cw ON e.s = cw.s AND e.w = cw.w
         |  WHERE e.vec_id <> q.qid),
         |dist AS (SELECT qid, vec_id,
         |    list_sum(list(ds ORDER BY s)) AS d
         |  FROM part GROUP BY qid, vec_id),
         |rk AS (SELECT qid, vec_id, d, row_number() OVER (
         |    PARTITION BY qid ORDER BY d, vec_id) AS rnk FROM dist)
         |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
         |  vec_id AS neighbor_id, round(d, 6) AS approx_dist
         |FROM rk WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin,

    "q250_ivfpq_trained" -> ivfPqTrainedOracle,

    // recall@5 audit: q250's pruned search vs exact same-metric top-5
    "q258_ann_recall" -> annRecallOracle,

    // q253 serves from the Models parquet artifacts under q250's exact
    // hyperparams — longs and exact doubles round-trip parquet
    // bit-for-bit, so the artifact path must equal the in-session
    // trained path, and the SAME replay oracle checks both.
    "q253_model_artifact" -> ivfPqTrainedOracle,

    // cross-split semantic-leakage mirror at the 64-bit/4-band
    // production geometry: split eval (vec_id % 5 = 0) vs train + the
    // planted paraphrase twins of the eval slice, banded blocking,
    // exact-cosine verify at 0.9, per-eval leak accounting
    "q251_semantic_leakage" -> {
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings),
         |ev AS (SELECT vec_id, embedding FROM base WHERE vec_id % 5 = 0),
         |tr AS (SELECT vec_id, embedding FROM base WHERE vec_id % 5 <> 0
         |  UNION ALL
         |  ${twinsSql("ev", "vec_id", "embedding")}),
         |${lshSigCte("evs", "ev", "vec_id", "embedding")},
         |${lshSigCte("trs", "tr", "vec_id", "embedding")},
         |evb AS (SELECT vec_id, unnest([b0, b1, b2, b3]) AS bandval,
         |  unnest([0, 1, 2, 3]) AS band FROM evs),
         |trb AS (SELECT vec_id, unnest([b0, b1, b2, b3]) AS bandval,
         |  unnest([0, 1, 2, 3]) AS band FROM trs),
         |cand AS (SELECT DISTINCT e.vec_id AS id_eval, t.vec_id AS id_train
         |  FROM evb e JOIN trb t
         |  ON e.band = t.band AND e.bandval = t.bandval),
         |scored AS (SELECT id_eval, id_train,
         |  ${cosineSql("ee.embedding", "et.embedding")} AS cos
         |  FROM cand JOIN evs ee ON cand.id_eval = ee.vec_id
         |  JOIN trs et ON cand.id_train = et.vec_id
         |  WHERE ${dotSql("ee.embedding", "ee.embedding")} > 0
         |    AND ${dotSql("et.embedding", "et.embedding")} > 0)
         |SELECT id_eval, count(*) AS n_leaks,
         |  CAST(sum(id_train) AS BIGINT) AS train_id_sum,
         |  round(max(cos), 6) AS max_cosine
         |FROM scored WHERE cos >= 0.9
         |GROUP BY 1 ORDER BY id_eval""".stripMargin
    }
  )

  /** fully-trained IVF-PQ mirror (q250; q253 serves the identical
    * search from parquet model artifacts): q237's coarse Lloyd chain
    * (lists = km, centroids = c2), q242's integer-unit probe ranking
    * (nprobe 3), q249's per-subspace codebook chains + encode, then ADC
    * restricted to the probed candidate lists — the whole composed
    * index in one replay.
    */
  private lazy val ivfPqTrainedOracle: String =
    s"""WITH $ivfPqTrainedBody
       |SELECT qid AS query_id, CAST(rnk AS INT) AS "rank",
       |  vec_id AS neighbor_id, round(d, 6) AS approx_dist
       |FROM rk WHERE rnk <= 5 ORDER BY query_id, "rank"""".stripMargin

  /** The full q250 replay up to `rk` (per-query ADC ranking),
    * parameterized on the two search-quality knobs. (q258's recall
    * audit deliberately does NOT use the PQ path: on this near-uniform
    * synthetic corpus ADC ties thousands of vectors per code pair and
    * recall reads 0 at every ksub/nprobe — the IVF-Flat routing audit
    * is the one that measures something.)
    */
  private lazy val ivfPqTrainedBody: String = ivfPqBody(ksub = 4, nprobe = 3)

  private def ivfPqBody(ksub: Int, nprobe: Int): String =
    s"""${kmeansCtesSql(8, 2)},
       |${pqTrainedCtesSql(2, ksub, 2, 32)},
       |hv AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |d2p AS (SELECT hv.vec_id, cw.s, cw.w,
       |    list_sum(list_transform(range(1, 33), i ->
       |      (v[cw.s * 32 + i] - cwv[i])
       |        * (v[cw.s * 32 + i] - cwv[i]))) AS d
       |  FROM hv, cw),
       |enc AS MATERIALIZED (SELECT vec_id, s, w FROM (
       |    SELECT vec_id, s, w, row_number() OVER (
       |      PARTITION BY vec_id, s ORDER BY d, w) AS rn FROM d2p)
       |  WHERE rn = 1),
       |qy AS MATERIALIZED (SELECT vec_id AS qid, u AS qu
       |  FROM u WHERE vec_id < 3),
       |pr AS MATERIALIZED (SELECT qid, cid FROM (
       |  SELECT qy.qid, c.cid, row_number() OVER (
       |      PARTITION BY qy.qid ORDER BY
       |      CAST(list_sum(list_transform(range(1, len(qy.qu) + 1),
       |        i -> (qy.qu[i] - c.cu[i]) * (qy.qu[i] - c.cu[i])))
       |        AS BIGINT), c.cid) AS rn
       |  FROM qy, c2 c) WHERE rn <= $nprobe),
       |cand AS MATERIALIZED (SELECT pr.qid, km.vec_id
       |  FROM pr JOIN km USING (cid) WHERE km.vec_id <> pr.qid),
       |q AS (SELECT vec_id AS qid, v AS qv FROM hv WHERE vec_id < 3),
       |part AS (SELECT cand.qid, cand.vec_id, e.s,
       |    list_sum(list_transform(range(1, 33), i ->
       |      (qv[e.s * 32 + i] - cw.cwv[i])
       |        * (qv[e.s * 32 + i] - cw.cwv[i]))) AS ds
       |  FROM cand JOIN q USING (qid)
       |    JOIN enc e ON e.vec_id = cand.vec_id
       |    JOIN cw ON e.s = cw.s AND e.w = cw.w),
       |dist AS (SELECT qid, vec_id,
       |    list_sum(list(ds ORDER BY s)) AS d
       |  FROM part GROUP BY qid, vec_id),
       |rk AS (SELECT qid, vec_id, d, row_number() OVER (
       |    PARTITION BY qid ORDER BY d, vec_id) AS rnk FROM dist)""".stripMargin

  /** Recall@5 of the q242 pruned IVF-Flat search against exact brute
    * cosine (self excluded): the approx side is the q242 replay
    * verbatim (routing loss only — in-cell cosines are exact), the
    * exact side ranks all pairs; recall = matched/5 per query.
    */
  private lazy val annRecallOracle: String =
    s"""WITH ${kmeansCtesSql(8, 3)},
       |qy AS MATERIALIZED (SELECT vec_id AS query_id, u AS qu
       |  FROM u WHERE vec_id < 3),
       |pr AS MATERIALIZED (SELECT query_id, cid FROM (
       |  SELECT qy.query_id, c.cid, row_number() OVER (
       |      PARTITION BY qy.query_id ORDER BY
       |      CAST(list_sum(list_transform(range(1, len(qy.qu) + 1),
       |        i -> (qy.qu[i] - c.cu[i]) * (qy.qu[i] - c.cu[i])))
       |        AS BIGINT), c.cid) AS rn
       |  FROM qy, c3 c) WHERE rn <= 3),
       |cand AS MATERIALIZED (SELECT pr.query_id, km.vec_id
       |  FROM pr JOIN km USING (cid) WHERE km.vec_id <> pr.query_id),
       |scored AS (SELECT cand.query_id, cand.vec_id,
       |    ${cosineSql("eb.embedding", "ea.embedding")} AS cosine
       |  FROM cand JOIN embeddings ea ON ea.vec_id = cand.query_id
       |    JOIN embeddings eb ON eb.vec_id = cand.vec_id),
       |ap AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
       |    FROM scored) WHERE rnk <= 5),
       |exs AS (SELECT q.vec_id AS query_id, e.vec_id,
       |    ${cosineSql("e.embedding", "q.embedding")} AS cosine
       |  FROM embeddings q, embeddings e
       |  WHERE q.vec_id < 3 AND e.vec_id <> q.vec_id),
       |ex AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
       |    FROM exs) WHERE rn <= 5)
       |SELECT ex.query_id,
       |  CAST(count(ap.vec_id) AS BIGINT) AS hits,
       |  round(count(ap.vec_id) / 5.0, 6) AS recall
       |FROM ex LEFT JOIN ap ON ex.query_id = ap.query_id
       |  AND ex.vec_id = ap.vec_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-subspace trained-PQ replay (q249): for each of the m
    * subspaces, quantize the SUBVECTOR slice to integer units and run
    * the same Lloyd chain as [[kmeansCtesSql]] (hash-ranked shared
    * seeds, exact long d², ties → lowest cid, floorDiv means, empty
    * clusters keep their centroid); ends with `cw` = (s, w, cwv) — the
    * per-subspace codeword vectors as exact doubles (units / 1e6,
    * mirroring the engine's `_.toDouble / 1e6`).
    */
  private def pqTrainedCtesSql(m: Int, ksub: Int, iters: Int,
                               subdim: Int): String = {
    def chain(s: Int): String = {
      val p = s"s${s}_"
      val lo = s * subdim + 1
      val hi = (s + 1) * subdim
      val rounds = (1 to iters).map { t =>
        s"""${p}a$t AS MATERIALIZED (SELECT vec_id, u, cid, d2 FROM (
           |  SELECT vec_id, u, cid, d2, row_number() OVER (
           |      PARTITION BY vec_id ORDER BY d2, cid) AS rn
           |  FROM (SELECT x.vec_id, x.u, c.cid,
           |      CAST(list_sum(list_transform(range(1, ${subdim + 1}),
           |        i -> (x.u[i] - c.cu[i]) * (x.u[i] - c.cu[i])))
           |        AS BIGINT) AS d2
           |    FROM ${p}u x, ${p}c${t - 1} c))
           |  WHERE rn = 1),
           |${p}m$t AS MATERIALIZED (SELECT a.cid, t.i,
           |    CAST(sum(a.u[t.i]) AS BIGINT) AS s, count(*) AS n
           |  FROM ${p}a$t a, sdd t GROUP BY 1, 2),
           |${p}c$t AS MATERIALIZED (SELECT p.cid, coalesce(mm.cu, p.cu) AS cu
           |  FROM ${p}c${t - 1} p LEFT JOIN (
           |    SELECT cid, list(CAST((s - (((s % n) + n) % n)) / n
           |        AS BIGINT) ORDER BY i) AS cu
           |    FROM ${p}m$t GROUP BY cid) mm USING (cid))""".stripMargin
      }.mkString(",\n")
      s"""${p}u AS MATERIALIZED (SELECT vec_id,
         |    list_transform(embedding[$lo:$hi], x -> CAST(floor(
         |      CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS u
         |  FROM embeddings),
         |${p}c0 AS MATERIALIZED (SELECT sder.cid, u.u AS cu
         |  FROM sder JOIN ${p}u u USING (vec_id)),
         |$rounds""".stripMargin
    }
    val cwUnion = (0 until m).map(s =>
      s"""SELECT $s AS s, cid AS w, list_transform(cu,
         |  u -> CAST(u AS DOUBLE) / 1000000.0) AS cwv
         |FROM s${s}_c$iters""".stripMargin).mkString("\nUNION ALL\n")
    s"""sdd AS MATERIALIZED (SELECT unnest(range(1, ${subdim + 1})) AS i),
       |sder AS MATERIALIZED (SELECT CAST(row_number() OVER
       |    (ORDER BY h, vec_id) - 1 AS INT) AS cid, vec_id
       |  FROM (SELECT vec_id,
       |      ${hash60Sql("CAST(vec_id AS VARCHAR)")} AS h FROM embeddings)
       |  ORDER BY h, vec_id LIMIT $ksub),
       |${(0 until m).map(chain).mkString(",\n")},
       |cw AS MATERIALIZED ($cwUnion)""".stripMargin
  }

  /** The integer-unit Lloyd CTE chain shared by q237 (assignments),
    * q238 (cluster-balanced sampling), and q239 (SemDeDup over k-means
    * clusters); ends with `km` = the final (vec_id, u, cid, d2)
    * assignment under the trained centroids.
    */
  private def kmeansCtesSql(k: Int, iters: Int): String = {
    def aCte(t: Int, name: String) =
      s"""$name AS MATERIALIZED (SELECT vec_id, u, cid, d2 FROM (
         |  SELECT vec_id, u, cid, d2, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |  FROM (SELECT x.vec_id, x.u, c.cid,
         |      CAST(list_sum(list_transform(range(1, len(x.u) + 1),
         |        i -> (x.u[i] - c.cu[i]) * (x.u[i] - c.cu[i])))
         |        AS BIGINT) AS d2
         |    FROM u x, c${t - 1} c))
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""${aCte(t, s"a$t")},
         |m$t AS MATERIALIZED (SELECT a.cid, t.i,
         |    CAST(sum(a.u[t.i]) AS BIGINT) AS s, count(*) AS n
         |  FROM a$t a, dd t GROUP BY 1, 2),
         |c$t AS MATERIALIZED (SELECT p.cid, coalesce(mm.cu, p.cu) AS cu
         |  FROM c${t - 1} p LEFT JOIN (
         |    SELECT cid, list(CAST((s - (((s % n) + n) % n)) / n
         |        AS BIGINT) ORDER BY i) AS cu
         |    FROM m$t GROUP BY cid) mm USING (cid))""".stripMargin
    }.mkString(",\n")
    s"""u AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(
       |      CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS u
       |  FROM embeddings),
       |dd AS MATERIALIZED (SELECT unnest(range(1,
       |  (SELECT min(len(u)) + 1 FROM u))) AS i),
       |c0 AS MATERIALIZED (SELECT CAST(row_number() OVER
       |    (ORDER BY h, vec_id) - 1 AS INT) AS cid, u AS cu
       |  FROM (SELECT vec_id, u,
       |      ${hash60Sql("CAST(vec_id AS VARCHAR)")} AS h FROM u)
       |  ORDER BY h, vec_id LIMIT $k),
       |$rounds,
       |${aCte(iters + 1, "km")}""".stripMargin
  }
}
