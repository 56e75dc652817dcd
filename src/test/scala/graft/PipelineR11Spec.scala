package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup}
import graft.functions.Bpe

/** Round-11 planted-ground-truth pins (VERDICT r10 #4): the q243 and
  * q232 DuckDB oracles REPLAY the engine's own recurrence (merge chain,
  * GD loop), so a shared algorithmic bug would pass both sides. These
  * tests pin each family to truths derived OUTSIDE the recurrence —
  * a corpus whose BPE merge table and fertility are hand-computable,
  * and a linearly-separable label plant whose trained sign pattern is
  * known a priori.
  */
class PipelineR11Spec extends SparkSpec {
  import spark.implicits._

  test("bpeFertilityBy on a hand-derivable corpus: merge table and both " +
    "fertility ratios match paper arithmetic (q243's planted truth)") {
    // srcA: the word "aa" ×8 — the ONLY viable pair is (a,a), count 8.
    // srcB: "uvw" and "xyz" once each — every srcB pair has count 1,
    // below the c >= 2 viability floor, so NO merge can come from srcB.
    // Hence the learned table must be exactly [(a,a) -> aa], and:
    //   srcA: each "aa" segments to [aa]      -> 8 words, 8 subwords,
    //         16 chars -> fertility 1.0, chars_per_token 2.0
    //   srcB: merges don't apply, chars stay  -> 2 words, 6 subwords,
    //         6 chars  -> fertility 3.0, chars_per_token 1.0
    // The vocabulary trained on the A-dominant corpus under-serves B —
    // the exact diagnostic the operator exists to surface.
    val docs = Seq(
      (1L, "srcA", "aa aa aa aa"),
      (2L, "srcA", "aa aa aa aa"),
      (3L, "srcB", "uvw xyz")).toDF("doc_id", "source", "text")
    val learned = Bpe.bpeMerges(docs, "text", rounds = 3)
      .orderBy(col("round"))
      .select("lhs", "rhs").as[(String, String)].collect().toSeq
    assert(learned === Seq(("a", "a")),
      s"planted corpus admits exactly one merge, got $learned")
    val got = Bpe.bpeFertilityBy(docs, "source", "text", learned)
      .orderBy(col("source"))
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("srcA", 8L, 8L, 16L, 1.0, 2.0),
      ("srcB", 2L, 6L, 6L, 3.0, 1.0)))
  }

  test("trainTextClassifier on linearly separable classes: every doc " +
    "correct, margins signed with the label, weights signed per class " +
    "vocabulary (q232's planted truth)") {
    // class-1 docs use only {alpha, beta}; class-0 only {delta, zeta}.
    // Verified-disjoint feature buckets (precondition below) make the
    // problem exactly separable, so any correct GD must end with every
    // training doc classified right, positive margins on class 1, and
    // w > 0 on class-1 buckets / w < 0 on class-0 buckets.
    val B = 64
    val posToks = Seq("alpha", "beta")
    val negToks = Seq("delta", "zeta")
    val bucketOf = (posToks ++ negToks).map { tk =>
      tk -> Seq(tk).toDF("t")
        .select(pmod(Dedup.portableHash64(col("t")), lit(B.toLong)))
        .as[Long].head()
    }.toMap
    assert(bucketOf.values.toSet.size === 4,
      s"planted tokens collide under B=$B buckets: $bucketOf — widen B")
    val docs = Seq(
      (1L, "alpha beta alpha", 1), (2L, "beta beta", 1),
      (3L, "alpha", 1), (4L, "beta alpha beta", 1),
      (5L, "zeta delta", 0), (6L, "delta delta zeta", 0),
      (7L, "zeta", 0), (8L, "delta", 0)).toDF("doc_id", "text", "y")
    val scored = Curate.trainTextClassifier(docs, "doc_id", "text",
        col("y") === 1, buckets = B, iters = 8, lrNum = 1L, lrDen = 4L)
      .orderBy(col("doc_id"))
      .select("doc_id", "margin", "pred", "label", "correct")
      .as[(Long, Double, Boolean, Boolean, Boolean)].collect()
    assert(scored.forall(_._5), s"separable plant must train to 100%: ${
      scored.filterNot(_._5).mkString(", ")}")
    assert(scored.forall(r => (r._2 > 0) == r._4),
      "margin sign must match the label on a separable plant")
    val w = Curate.trainTextClassifierWeights(docs, "doc_id", "text",
      col("y") === 1, buckets = B, iters = 8, lrNum = 1L, lrDen = 4L)
    posToks.foreach(tk => assert(w(bucketOf(tk).toInt) > 0L,
      s"weight for class-1 token '$tk' must be positive"))
    negToks.foreach(tk => assert(w(bucketOf(tk).toInt) < 0L,
      s"weight for class-0 token '$tk' must be negative"))
  }

  test("pqTrainedCodebook recovers planted per-subspace blob structure " +
    "exactly, and a blob twin ranks first at ADC distance 0 (q249's " +
    "planted truth)") {
    import graft.operators.Similarity
    // 8 vectors, dim 4, m=2 subspaces of 2 dims. Each subspace has two
    // blobs of IDENTICAL points; Lloyd's seeds are the two lowest-hash
    // ids, so place the lowest in blob (A, C) and the second in (B, D):
    // iteration 1 assigns every point to its own blob's seed exactly
    // (d² = 0) and the floorDiv means reproduce the blob coordinates —
    // the trained codebook must equal the plant bit-for-bit. All four
    // blob combinations get 2 members, so every vector has a twin at
    // ADC distance exactly 0.
    val ids = (1L to 8L).toSeq
    val hashed = ids.toDF("vec_id")
      .withColumn("h", Dedup.portableHash64(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).select("vec_id")
      .as[Long].collect().toSeq
    val inA = Set(hashed(0), hashed(2), hashed(4), hashed(6)) // s0 blob A
    val inC = Set(hashed(0), hashed(3), hashed(4), hashed(7)) // s1 blob C
    def vec(id: Long): Array[Float] = {
      val s0 = if (inA(id)) Array(0.0f, 0.25f) else Array(1.0f, 0.75f)
      val s1 = if (inC(id)) Array(0.5f, 0.0f) else Array(0.0f, 0.5f)
      s0 ++ s1
    }
    val df = ids.map(id => (id, vec(id))).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrainedCodebook(df, "vec_id", "embedding",
      m = 2, ksub = 2, iters = 2)
    assert(cb === Seq(
      0 -> Seq(0.0, 0.25, 0.5, 0.0),   // seed hashed(0)'s blobs (A, C)
      1 -> Seq(1.0, 0.75, 0.0, 0.5))) // seed hashed(1)'s blobs (B, D)
    // twin check: the query's same-combo twin is the unique vector at
    // ADC distance 0 (identical codes in both subspaces)
    val q = hashed(0)
    val twin = ids.filter(i => i != q && inA(i) == inA(q) &&
      inC(i) == inC(q)).head
    val top = Similarity.pqTrainedTopK(df, df.filter(col("vec_id") === q),
        "vec_id", "embedding", "vec_id", k = 1, m = 2, ksub = 2, iters = 2)
      .select("neighbor_id", "approx_dist").as[(Long, Double)].head()
    assert(top === ((twin, 0.0)))
  }

  test("removeEvalSpans cuts exactly the quoted eval span (plus its " +
    "k-gram bleed) and leaves clean docs byte-identical") {
    // eval doc = an 8-token "benchmark item". Train doc 1 quotes it
    // verbatim between its own prose; doc 2 shares nothing. With k = 8
    // every 8-gram fully inside the quote (plus windows straddling the
    // boundary ONLY if they match an eval gram — they don't, eval has
    // exactly one 8-gram) marks exactly tokens 3..10 for deletion.
    val evalDocs = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "intro words here alpha beta gamma delta epsilon zeta eta " +
        "theta closing words"),
      (2L, "completely unrelated content with enough tokens to pass " +
        "the gram floor easily")).toDF("doc_id", "text")
    val got = Dedup.removeEvalSpans(train, evalDocs, "doc_id", "text",
        k = 8)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 13L, 5L, "intro words here closing words"),
      (2L, 12L, 12L, "completely unrelated content with enough tokens " +
        "to pass the gram floor easily")))
  }

  test("fully-trained IVF-PQ at FULL probe equals trained PQ exactly " +
    "(routing prunes nothing — the q250 composition identity)") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.table(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 3)
    val full = Similarity.ivfPqTrainedTopK(emb, q, "vec_id", "embedding",
        "vec_id", k = 5, coarseK = 4, nprobe = 4, m = 2, ksub = 4,
        iters = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val pq = Similarity.pqTrainedTopK(emb, q, "vec_id", "embedding",
        "vec_id", k = 5, m = 2, ksub = 4, iters = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(full === pq)
  }
}
