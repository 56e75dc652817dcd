package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-8 fixes: cross-corpus prefix×prefix completeness, the
  * materialized dedup-pair artifact, and the integer-unit covariance
  * determinism contract.
  */
class PipelineR8Spec extends SparkSpec {
  import spark.implicits._

  /** word-3-shingle sets mirroring shingleHashes semantics (distinct,
    * short docs collapse to one whole-text shingle). */
  private def shingles(t: String): Set[String] = {
    val toks = t.split("\\s+").map(_.toLowerCase).toSeq
    if (toks.size < 3) Set(toks.mkString(" "))
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("crossCorpusDupes(fullRecall) equals brute-force cross-corpus " +
    "jaccard — df ranks differ per corpus, so only a SHARED order is sound") {
    // engineered so each corpus's own df-rank order differs: shingles
    // common in the new side are rare in the old side and vice versa.
    // A prefix filter built on per-corpus rare-first ordering could
    // miss pairs; the shared (old-corpus-df) order must not.
    val newDocs = Seq(
      (1L, "a b c d e f g h"),
      (3L, "a b c d e f x y"),
      (5L, "p q r s t u v w"),
      (7L, "m n o p q r"),
      (9L, "zz yy xx ww vv uu"),
      (11L, "a b c a b c a b c") // repeated-shingle degenerate
    ).toDF("doc_id", "text")
    val oldDocs = Seq(
      (2L, "a b c d e f g h"), // exact dup of 1
      (4L, "a b c d e f x z"), // near 3 (and borderline 1: J = 0.5)
      (6L, "p q r s t u v k"), // near 5
      (8L, "totally different content here"),
      (10L, "m n o p q r") // exact dup of 7
    ).toDF("doc_id", "text")
    val tau = 0.5
    val got = Dedup.crossCorpusDupes(newDocs, oldDocs, "doc_id", "text",
      shingleN = 3, threshold = tau)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val nS = newDocs.as[(Long, String)].collect().map { case (i, t) =>
      i -> shingles(t) }
    val oS = oldDocs.as[(Long, String)].collect().map { case (i, t) =>
      i -> shingles(t) }
    val want = (for {
      (ia, sa) <- nS; (ib, sb) <- oS
      co = (sa & sb).size
      j = co.toDouble / (sa.size + sb.size - co) if j >= tau
    } yield (ia, ib) -> (math.round(j * 1e6) / 1e6)).toMap
    assert(want.nonEmpty && want.size >= 5) // incl. the J = 0.5 boundary
    assert(got.keySet === want.keySet)
    want.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-9, k) }
  }

  test("crossCorpusDupes banded path (fullRecall=false) recalls exact dups") {
    val newDocs = Seq((1L, "m n o p q r s t u v w x"),
      (3L, "completely unrelated words here now ok")).toDF("doc_id", "text")
    val oldDocs = Seq((2L, "m n o p q r s t u v w x")).toDF("doc_id", "text")
    // identical docs ⇒ identical signatures ⇒ every band collides
    val got = Dedup.crossCorpusDupes(newDocs, oldDocs, "doc_id", "text",
      shingleN = 3, threshold = 0.9, fullRecall = false)
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("pair artifact: bucketed warm scan, zero-Exchange groupBy, " +
    "no re-shingling, ensurePairs skips the rebuild") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "a b c d e f g h i k"),
      (4L, "other words entirely different over here"),
      (5L, "other words entirely different over here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val table = "graft_pairs_spec"
    Dedup.writePairs(pairs, table, buckets = 4)
    val warm = Dedup.readPairs(spark, table)
    // round trip: artifact content equals the live pair set
    assert(warm.as[(Long, Long, Double)].collect().toSet ===
      pairs.as[(Long, Long, Double)].collect().toSet)
    // warm consumer plan: the bucketed scan already hash-distributes on
    // id_a, so the per-doc aggregate needs NO shuffle — and nothing in
    // the plan re-tokenizes/re-hashes the corpus
    val agg = warm.groupBy(col("id_a")).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("xxhash64"), plan)
    // the same aggregate over the UNBUCKETED pair frame does shuffle —
    // the comparison proves the bucket metadata (not AQE luck) removed it
    val cold = pairs.groupBy(col("id_a")).agg(count(lit(1)).as("n"))
    assert(cold.queryExecution.executedPlan.toString.contains("Exchange"))
    // ensurePairs warm gate: the build thunk must not run again
    var built = 0
    Dedup.ensurePairs(spark, table) { built += 1; pairs }.count()
    assert(built === 0)
    // fingerprint gate: a matching fingerprint stays warm; a CHANGED
    // fingerprint (regenerated corpus under a surviving table) rebuilds
    Dedup.ensurePairs(spark, table, fingerprint = Some("fpA")) {
      built += 1; pairs }.count()
    assert(built === 1, "first fingerprinted call must stamp the table")
    Dedup.ensurePairs(spark, table, fingerprint = Some("fpA")) {
      built += 1; pairs }.count()
    assert(built === 1, "same fingerprint must stay warm")
    Dedup.ensurePairs(spark, table, fingerprint = Some("fpB")) {
      built += 1; pairs }.count()
    assert(built === 2, "changed fingerprint must rebuild")
    // sourceFingerprint is stable per directory state and
    // distinguishes absent paths
    val f1 = Dedup.sourceFingerprint(spark, "/root/testdata/sf0.001")
    assert(f1 === Dedup.sourceFingerprint(spark, "/root/testdata/sf0.001"))
    assert(f1 !== Dedup.sourceFingerprint(spark, "/root/testdata/sf0.01"))
    assert(f1 !== Dedup.sourceFingerprint(spark, "/no/such/dir"))
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
  }

  test("crossContainment equals brute-force cross-corpus containment") {
    val evalDocs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // quoted whole in 1
      (20L, "one two three four five six seven"), // partially in 2
      (30L, "never seen anywhere in the corpus at all")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words alpha beta gamma delta epsilon zeta outro more"),
      (2L, "one two three four nine ten eleven twelve"),
      (3L, "completely unrelated content right here")
    ).toDF("doc_id", "text")
    val tau = 0.8
    val got = Dedup.crossContainment(evalDocs, corpus, "doc_id", "text",
      shingleN = 3, threshold = tau)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val eS = evalDocs.as[(Long, String)].collect().map { case (i, t) =>
      i -> shingles(t) }
    val cS = corpus.as[(Long, String)].collect().map { case (i, t) =>
      i -> shingles(t) }
    val want = (for {
      (ie, se) <- eS; (ic, sc) <- cS
      c = (se & sc).size.toDouble / se.size if c >= tau
    } yield (ie, ic) -> (math.round(c * 1e6) / 1e6)).toMap
    assert(want.nonEmpty && want.keySet.contains((10L, 1L)))
    assert(got.keySet === want.keySet)
    want.foreach { case (k, c) => assert(math.abs(got(k) - c) < 1e-9, k) }
  }

  test("ivfPqTopK: full probe equals pqTopK exactly; pruned probe only " +
    "degrades distances rank-wise") {
    import graft.operators.Similarity
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.cos(i * 13 + j * 5).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 2)
    val full = Similarity.ivfPqTopK(vecs, qs, "vec_id", "embedding",
      "vec_id", k = 5, nCentroids = 4, nprobe = 4, iters = 1, m = 4, ksub = 8)
      .as[(Long, Int, Long, Double)].collect().toSet
    val pq = Similarity.pqTopK(vecs, qs, "vec_id", "embedding", "vec_id",
      k = 5, m = 4, ksub = 8)
      .as[(Long, Int, Long, Double)].collect().toSet
    // nprobe = nCentroids ⇒ routing prunes nothing ⇒ identical output
    assert(full === pq)
    // nprobe = 1: a SUBSET of candidates per query, so at every rank
    // the ADC distance can only be equal or worse — never better
    val pruned = Similarity.ivfPqTopK(vecs, qs, "vec_id", "embedding",
      "vec_id", k = 5, nCentroids = 4, nprobe = 1, iters = 1, m = 4, ksub = 8)
      .as[(Long, Int, Long, Double)].collect()
    assert(pruned.nonEmpty)
    val fullByRank = full.map(r => (r._1, r._2) -> r._4).toMap
    pruned.foreach { case (q, rank, _, d) =>
      assert(d >= fullByRank((q, rank)) - 1e-9,
        s"pruned probe beat the full probe at ($q, $rank)")
    }
    // array<double> corpora must behave identically (regression: a
    // typed getSeq[Float] at the centroid collect crashed on double
    // input; float→double cast is exact so the results must be equal)
    val vecsD = vecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val qsD = vecsD.filter(col("vec_id") < 2)
    val fullD = Similarity.ivfPqTopK(vecsD, qsD, "vec_id", "embedding",
      "vec_id", k = 5, nCentroids = 4, nprobe = 4, iters = 1, m = 4, ksub = 8)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(fullD === full)
    val ivfF = Similarity.ivfTopK(vecs, qs, "vec_id", "embedding",
      "vec_id", k = 3, nCentroids = 4, nprobe = 4, iters = 1)
      .as[(Long, Int, Long, Double)].collect().toSet
    val ivfD = Similarity.ivfTopK(vecsD, qsD, "vec_id", "embedding",
      "vec_id", k = 3, nCentroids = 4, nprobe = 4, iters = 1)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(ivfD === ivfF)
  }

  test("rip_pq_codes / rip_pq_adc equal their interpreted HOF twins " +
    "bit for bit") {
    import graft.operators.Similarity
    val m = 4; val dim = 16; val subdim = dim / m
    val cb = (0 until 8).map(w =>
      (w, Seq.tabulate(dim)(j => math.sin(w * 17 + j))))
    val cbLit = typedlit(cb)
    val vecs = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(dim)(j => math.cos(i * 3 + j).toFloat))
    }.toDF("id", "v")
    val vecD = col("v").cast("array<double>")
    val codesBoth = vecs.select(
      call_function("rip_pq_codes", vecD, cbLit, lit(m)).as("native"),
      Similarity.pqCodesColHof(vecD, cbLit, m, subdim).as("hof"))
      .as[(Seq[Int], Seq[Int])].collect()
    codesBoth.foreach { case (n, h) => assert(n === h) }
    val q = vecs.filter(col("id") === 0).select(vecD.as("qv"))
    val adcBoth = vecs
      .select(col("id"),
        call_function("rip_pq_codes", vecD, cbLit, lit(m)).as("codes"))
      .crossJoin(broadcast(q))
      .select(
        call_function("rip_pq_adc", col("qv"), col("codes"), cbLit, lit(m))
          .as("native"),
        Similarity.pqAdcDistHof(col("qv"), col("codes"), cbLit, m, subdim)
          .as("hof"))
      .as[(Double, Double)].collect()
    assert(adcBoth.nonEmpty)
    // EXACT double equality — same IEEE op order by construction
    adcBoth.foreach { case (n, h) =>
      assert(java.lang.Double.compare(n, h) === 0, s"$n != $h") }
  }

  test("rip_pq_codes rejects malformed codebooks with named errors, " +
    "not CCE/AIOOBE/NPE") {
    val one = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    // float inner array → clean analysis-time failure (the kernel
    // decodes doubles; a float codebook used to CCE at first eval)
    val exF = intercept[Exception] {
      one.select(call_function("rip_pq_codes", col("v"),
        expr("array(struct(0, array(cast(1.0 as float), cast(2.0 as float))))"),
        lit(1))).collect()
    }
    assert(exF.getMessage.contains("rip_pq_codes"))
    // out-of-range codeword id → named runtime error (was AIOOBE)
    def run(cbSql: String, m: Int = 1): Throwable = intercept[Throwable] {
      one.select(call_function("rip_pq_codes", col("v"),
        expr(cbSql), lit(m))).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && c != c.getCause) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    assert(rootMsg(run("array(struct(5, array(1.0d, 2.0d)))"))
      .contains("pq codebook"))
    // duplicate codeword ids (0,0) → named error (was silent null slot → NPE)
    assert(rootMsg(run(
      "array(struct(0, array(1.0d, 2.0d)), struct(0, array(3.0d, 4.0d)))"))
      .contains("pq codebook"))
    // ragged vectors → named error
    assert(rootMsg(run(
      "array(struct(0, array(1.0d, 2.0d)), struct(1, array(3.0d)))"))
      .contains("pq codebook"))
    // m that does not divide the dim → named error (was silent
    // truncation); vector length must reach the codebook dim or the
    // too-short guard nulls out before m is ever validated
    val three = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val exM = intercept[Throwable] {
      three.select(call_function("rip_pq_codes", col("v"),
        expr("array(struct(0, array(1.0d, 2.0d, 3.0d)))"), lit(2))).collect()
    }
    assert(rootMsg(exM).contains("positive divisor"))
    // and the well-formed case still works
    val ok = one.select(call_function("rip_pq_codes", col("v"),
      expr("array(struct(0, array(1.0d, 2.0d)), struct(1, array(9.0d, 9.0d)))"),
      lit(1))).as[Seq[Int]].collect()
    assert(ok.head === Seq(0))
  }

  test("covMoments integer-unit accumulation is partition-order invariant " +
    "bit for bit") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val a = operators.Similarity.covarianceMatrix(vecs, "embedding")
      .as[(Int, Int, Double)].collect().toSet
    val b = operators.Similarity.covarianceMatrix(
      vecs.repartition(13), "embedding")
      .as[(Int, Int, Double)].collect().toSet
    // EXACT equality (no tolerance): long sums are associative, so any
    // partitioning reduces to the same integers
    assert(a === b)
    assert(a.size === 64)
  }
  test("q230 'kept' counts equal q200's n_dedup per source (the " +
    "attribution is the funnel's complement)") {
    val dir = "/root/testdata/sf0.001"
    val kept = SparkEntry.queries("q230_rejection_reasons")(spark, dir)
      .filter($"reason" === "kept")
      .select($"source", $"n").as[(String, Long)].collect().toMap
    val funnel = SparkEntry.queries("q200_curation_e2e")(spark, dir)
      .select($"source", $"n_dedup").as[(String, Long)].collect().toMap
    assert(kept === funnel.filter(_._2 > 0))
  }
}
