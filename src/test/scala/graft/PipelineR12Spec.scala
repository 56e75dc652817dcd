package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Drift, Similarity}

/** Round-12 pins (VERDICT r11 #4 and #6):
  *  - planted-GROUND-TRUTH twins for the two remaining replay-only
  *    oracles: q241's embedding-drift matrix (a known mean-vector
  *    offset ⇒ the distance matrix is known a priori) and q251's
  *    semantic-leakage audit (planted paraphrase pairs ⇒ the leak set
  *    is known; recall must be 1 on the plant, not just SQL-parity);
  *  - executed-plan shape pins for the round-11 flagships q250/q251/
  *    q252 (no cartesian, broadcast-only model/gram literals, encode
  *    scan with zero Exchange) so a refactor that sneaks a shuffle into
  *    the encode path fails CI.
  */
class PipelineR12Spec extends SparkSpec {
  import spark.implicits._

  // ---- planted truth: q241 embeddingDriftMatrix ----------------------

  test("embeddingDriftMatrix recovers a PLANTED mean offset exactly " +
    "(q241 ground-truth twin)") {
    // All components are multiples of 1/64 — exact in float32, double,
    // and the ⌊x·1e6⌋ quantizer — so every mean and distance below is
    // knowable on paper before the engine runs.
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val muA = Seq(0.25, -0.5, 3.0 / 64, 0.0)
    val delta = Seq(0.5, -0.25, 0.0, 0.125) // planted offset A→B
    val muB = muA.zip(delta).map { case (a, d) => a + d }
    val e1 = Seq(1.0 / 64, 1.0 / 32, -1.0 / 64, 0.5) // zero-sum noise A
    val e2 = Seq(1.0 / 32, 0.0, 1.0 / 64, -0.25)     // zero-sum noise B
    def plus(a: Seq[Double], b: Seq[Double], s: Double) =
      v(a.zip(b).map { case (x, y) => x + s * y }: _*)
    val rows = Seq(
      ("a", plus(muA, e1, 1.0)), ("a", plus(muA, e1, -1.0)),
      ("b", plus(muB, e2, 1.0)), ("b", plus(muB, e2, -1.0)),
      ("b", v(muB: _*)))
    val df = rows.toDF("label", "embedding")
    val out = Drift.embeddingDriftMatrix(df, col("label"), col("embedding"))
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.length === 1)
    val (ka, kb, na, nb, d2) = out.head
    assert((ka, kb, na, nb) === ("a", "b", 2L, 3L))
    // ground truth: the noise cancels exactly (±e in exact arithmetic),
    // so mean distance = Σ (δ_i · 1e6)²
    val expected = delta.map(d => { val u = math.round(d * 1e6); u * u }).sum
    assert(d2 === expected, s"dist2_units $d2 != planted $expected")
  }

  // ---- planted truth: q251 crossSplitSemanticLeakage -----------------

  test("crossSplitSemanticLeakage: recall 1 on planted paraphrase " +
    "pairs, clean evals silent, zero vectors guarded (q251 twin)") {
    // train: 8 well-separated base vectors. Planted paraphrases: eval
    // row = 2× a train vector (cosine exactly 1, and the LCG-hyperplane
    // LSH signature is scale-invariant, so banding CANNOT miss it —
    // recall on the plant must be 1 by construction, not by luck).
    val dim = 8
    def base(i: Int): Array[Float] =
      Array.tabulate(dim)(d => if (d == i % dim) 1f else 0.125f * ((i + d) % 3))
    val train = ((0 until 8).map(i => (i.toLong, base(i))) :+
      (50L, Array.fill(dim)(0f))) // zero-norm train row: must never leak
      .toDF("vec_id", "embedding")
    val leakyEvals = Seq(100L -> 0, 101L -> 3, 102L -> 7) // twins of 0,3,7
    val evalRows = leakyEvals.map { case (id, src) =>
      (id, base(src).map(_ * 2f)) } ++ Seq(
      // clean eval: orthogonal-ish to everything (negative spike) —
      // cosine to every train vector is far below the 0.95 threshold
      (200L, Array.tabulate(dim)(d => if (d == 0) -1f else 0f)),
      (201L, Array.fill(dim)(0f))) // zero-norm eval: guarded, silent
    val eval = evalRows.toDF("vec_id", "embedding")
    val out = Similarity.crossSplitSemanticLeakage(train, eval,
        "vec_id", "embedding", threshold = 0.95)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // recall = 1: every planted paraphrase is reported...
    leakyEvals.foreach { case (id, src) =>
      val r = out.getOrElse(id, fail(s"planted leak $id missing"))
      assert(r._2 >= 1L, s"eval $id: no leaks counted")
      assert(r._4 === 1.0, s"eval $id: max_cosine ${r._4} != 1.0")
      // ...and the known twin is inside the reported train-id mass
      // (single-leak rows pin it exactly)
      if (r._2 == 1L) assert(r._3 === src.toLong)
    }
    // precision on the plant: the clean eval and both zero vectors are
    // absent (the zero-norm guard keeps NaN cosines out of the audit)
    assert(!out.contains(200L), "clean eval reported as leaking")
    assert(!out.contains(201L), "zero-norm eval must be guarded out")
    assert(out.values.forall(_._3 != 50L || out.values.exists(_._2 > 1)),
      "zero-norm train row leaked into train_id_sum")
  }

  // ---- plan pins: q250 / q251 / q252 ---------------------------------

  private val sf = "/root/testdata/sf0.001"

  test("q250 plan: encode scan has ZERO Exchange; search has no cartesian") {
    val emb = QueryShared.t(spark, sf, "embeddings")
    val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
    val cb = Similarity.pqTrainedCodebook(emb, "vec_id", "embedding", 2, 4, 2)
    // the add/encode half is a pure projection — centroids + codebook
    // ride as literals, so ANY Exchange here is a scale defect
    val encode = Similarity.pqIndexRowsWith(emb, "vec_id", "embedding",
      cent, cb, m = 2)
    val encodePlan = encode.queryExecution.executedPlan.toString
    // the ONLY allowed exchange is the load-boundary parallelism floor
    // (Tables.table REPARTITION_BY_NUM, r16) — the encode OPERATOR
    // itself must add none: no hash/range exchange beyond the floor
    val nonFloor = encodePlan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("REPARTITION_BY_NUM"))
      .toSeq
    assert(nonFloor.isEmpty,
      s"encode path must be shuffle-free beyond the load floor:\n$encodePlan")
    val full = SparkEntry.queries("q250_ivfpq_trained")(spark, sf)
    full.collect()
    val plan = full.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q251 plan: banded equi-join only — no cartesian, no nested loop") {
    val df = SparkEntry.queries("q251_semantic_leakage")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q252 plan: eval gram set reaches the span join as a BROADCAST; " +
    "no cartesian") {
    val df = SparkEntry.queries("q252_decontam_spans")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // ---- planted truth: q257 DSIR importance weights --------------------

  test("dsirWeights ranks every target-looking doc above every junk doc " +
    "(q257 ground-truth twin)") {
    // target vocabulary is disjoint from the junk vocabulary AND the
    // target corpus is large enough that each target token is strictly
    // likelier under the smoothed target distribution than under raw
    // (raw contains the target-speak docs too — a sparse target corpus
    // would lose to the +1 smoothing, a self-penalty this fixture's
    // first draft demonstrated). With that, every target-token
    // log-ratio is positive and every junk-token one negative, so the
    // ranking below is knowable on paper (bucket layout checked
    // disjoint below — collisions only merge counts within a side).
    val phrase = Array.fill(10)("alpha beta gamma").mkString(" ")
    val target = Seq((100L, phrase), (101L, phrase))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma"),       // pure target-speak
      (2L, "alpha beta junkone"),     // mixed
      (3L, "junkone junktwo junque"), // pure junk
      (4L, "gamma gamma gamma"),      // pure target-speak, repetitive
      (5L, "junktwo junque junkone junktwo")).toDF("doc_id", "text")
    // precondition: the two vocabularies occupy disjoint buckets
    val bucketOf = (t: String) => spark.sql(
      s"SELECT pmod(cast(conv(substring(md5('$t'), 1, 15), 16, 10) " +
        "as bigint), 2048)").head().getLong(0)
    val tgtB = Seq("alpha", "beta", "gamma").map(bucketOf).toSet
    val junkB = Seq("junkone", "junktwo", "junque").map(bucketOf).toSet
    assert(tgtB.intersect(junkB).isEmpty, s"fixture collision: $tgtB $junkB")

    val scores = graft.operators.Curate
      .dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // pure target docs beat the mixed doc, which beats pure junk
    assert(scores(1L) > scores(2L), scores.toString)
    assert(scores(4L) > scores(2L), scores.toString)
    assert(scores(2L) > scores(3L), scores.toString)
    assert(scores(2L) > scores(5L), scores.toString)
    // and signs match the disjoint-vocabulary construction
    assert(scores(1L) > 0 && scores(4L) > 0, scores.toString)
    assert(scores(3L) < 0 && scores(5L) < 0, scores.toString)
  }

  // ---- planted truth: ANN recall audit pieces -------------------------

  test("bruteForceTopKL2 recovers planted nearest neighbors in metric " +
    "order with self excluded") {
    // axis-aligned points: L2 distances knowable on paper
    def v(x: Double): Array[Float] = Array(x.toFloat, 0f, 0f)
    val corpus = Seq((0L, v(0.0)), (1L, v(1.0)), (2L, v(3.0)),
      (3L, v(6.0)), (4L, v(10.0))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopKL2(corpus,
        corpus.filter(col("vec_id") === 0L), "vec_id", "embedding",
        "vec_id", 3)
      .orderBy("rank")
      .select("neighbor_id", "dist").as[(Long, Double)].collect().toSeq
    assert(out === Seq((1L, 1.0), (2L, 9.0), (3L, 36.0)))
  }

  test("q258 recall audit: full-probe IVF-Flat has recall 1 by " +
    "construction (routing loss is the ONLY loss)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 3)
    val model = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    val approx = Similarity.ivfTrainedTopK(emb, qs, "vec_id", "embedding",
        "vec_id", k = 5, model, nprobe = 8)
      .select(col("query_id"), col("neighbor_id"))
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding",
        "vec_id", 5)
      .select(col("query_id"), col("neighbor_id"))
    assert(exact.exceptAll(approx).count() === 0L,
      "full probe must equal brute force")
  }

  // ---- q259 LSH S-curve pieces ----------------------------------------

  test("simhashBandCandidates is a superset of simhashPairs' survivors " +
    "and catches hamming<=maxHamming pairs completely (pigeonhole)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(120)
    val cand = Dedup.simhashBandCandidates(docs, "doc_id", "text",
      maxHamming = 3, hashFn = Dedup.portableHash64)
    val within = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, hashFn = Dedup.portableHash64)
      .select("id_a", "id_b")
    assert(within.exceptAll(cand.select("id_a", "id_b")).count() === 0L)
    // identical texts (hamming 0) are always candidates: clone a doc
    val pair = Seq((1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "completely different words entirely")).toDF("doc_id", "text")
    val got = Dedup.simhashBandCandidates(pair, "doc_id", "text",
        maxHamming = 3, hashFn = Dedup.portableHash64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
  }

  test("lshSCurve: an identical-clone pair lands in the top bin with " +
    "recall 1 there") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // J = 1.0 with doc 1
      (3L, "one two three four five six seven"),
      (4L, "unrelated text goes here okay then")).toDF("doc_id", "text")
    val out = Dedup.lshSCurve(docs, "doc_id", "text", shingleN = 3,
        tauFloor = 0.3, maxHamming = 3, hashFn = Dedup.portableHash64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    // the clone pair: J=1.0 → bin 10, caught (identical simhash)
    assert(out.contains((10, 1L, 1L)), out.toString)
  }

  test("q256 bloom path plan: corpus gram prune is a literal-bitmap " +
    "FILTER before any join; no cartesian") {
    val df = SparkEntry.queries("q256_bloom_decontam")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q262 report composition: ngram-only, semantic-only, both, and " +
    "clean docs each land in exactly the right row shape") {
    // doc/vec ids share one space; eval = {10}, train = {1,2,3,4}
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (10L, evalText),                                   // eval item
      (1L, s"intro $evalText outro closing words"),      // verbatim quote
      (2L, "totally different prose with no overlap at all here"),
      (3L, s"prefix $evalText suffix"),                  // verbatim quote
      (4L, "also clean of any quoted benchmark content entirely")
    ).toDF("doc_id", "text")
    def v(x: Double, y: Double) =
      Array.tabulate(8)(i => (if (i == 0) x else if (i == 1) y else 0.1).toFloat)
    val emb = Seq(
      (10L, v(1.0, 0.0)),   // eval vector
      (1L, v(-1.0, 0.3)),   // far from eval
      (2L, v(1.0, 0.01)),   // paraphrase twin (cosine ~1)
      (3L, v(0.99, 0.0)),   // paraphrase twin
      (4L, v(-0.5, -1.0))   // far
    ).toDF("vec_id", "embedding")
    val ng = Dedup.crossContainmentBloom(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", shingleN = 3, threshold = 0.7)
      .groupBy(col("id_doc"))
      .agg(max(col("containment")).as("max_containment"))
    val sem = Similarity.crossSplitSemanticLeakage(
        emb.filter(pmod(col("vec_id"), lit(10)) === 0),
        emb.filter(pmod(col("vec_id"), lit(10)) =!= 0),
        "vec_id", "embedding", threshold = 0.9)
      .select(col("id_eval").as("id_doc"),
        col("n_leaks").as("n_sem_leaks"), col("max_cosine"))
    val rep = ng.join(sem, Seq("id_doc"), "full_outer")
      .select(col("id_doc"),
        coalesce(col("max_containment"), lit(0.0)).as("mc"),
        coalesce(col("n_sem_leaks"), lit(0L)).as("ns"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(rep.keySet === Set(1L, 2L, 3L), s"doc 4 is clean: $rep")
    assert(rep(1L)._1 >= 0.7 && rep(1L)._2 === 0L, s"1 = ngram only: $rep")
    assert(rep(2L)._1 === 0.0 && rep(2L)._2 === 1L, s"2 = semantic only: $rep")
    assert(rep(3L)._1 >= 0.7 && rep(3L)._2 === 1L, s"3 = both: $rep")
  }

  test("q257 plan: the llr dictionary reaches the token stream as a " +
    "BROADCAST; selection is TakeOrdered, never a global sort") {
    val df = SparkEntry.queries("q257_dsir_select")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q261 plan: artifact serve is join-FREE — one literal fold per " +
    "doc, TakeOrdered on top (zero joins, zero aggregates)") {
    val df = SparkEntry.queries("q261_dsir_artifact")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Join"), s"serve path must not join: $plan")
    assert(!plan.contains("HashAggregate"),
      s"serve path must not aggregate: $plan")
  }
}
