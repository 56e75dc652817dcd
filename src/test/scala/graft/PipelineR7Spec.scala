package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Curate, Dedup, Similarity, Sketch, Split}

/** Round-7 pipeline operators: PII scrubbing, containment dedup,
  * SQ8+exact re-rank retrieval, temperature source mixing.
  */
class PipelineR7Spec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces every PII class and leaves clean text alone") {
    val df = Seq(
      ("mail bob.smith+x@corp.example.org end",
        "mail <EMAIL> end"),
      ("srv 192.168.0.17 and 10.0.0.1 up",
        "srv <IP> and <IP> up"),
      ("call 415-555-0199 or ssn 078-05-1120",
        "call <PHONE> or ssn <SSN>"),
      ("no pii here 12.5 and a-b", "no pii here 12.5 and a-b")
    ).toDF("s", "want")
    val got = df.select(TextFns.redactPii(col("s")).as("got"), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g === w) }
  }

  test("piiCount counts each class; phone/ssn patterns are disjoint") {
    val s = "a@b.co c@d.io 1.2.3.4 415-555-0199 078-05-1120"
    val df = Seq(s).toDF("s")
    val got = df.select(
      TextFns.piiCount(col("s"), TextFns.Pii.email),
      TextFns.piiCount(col("s"), TextFns.Pii.ipv4),
      TextFns.piiCount(col("s"), TextFns.Pii.phone),
      TextFns.piiCount(col("s"), TextFns.Pii.ssn))
      .as[(Int, Int, Int, Int)].head()
    assert(got === ((2, 1, 1, 1)))
  }

  test("containmentPairs equals brute-force containment on all pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // base
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma"), // contains 1
      (3L, "completely different words entirely here now"),
      (4L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (5L, "one two three")
    ).toDF("doc_id", "text")
    val tau = 0.6
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, tau)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // brute force on word-3-shingle sets
    def shingles(t: String): Set[Seq[String]] = {
      val toks = t.split("\\s+").map(_.toLowerCase).toSeq
      if (toks.size < 3) Set(toks) else toks.sliding(3).map(_.toSeq).toSet
    }
    val all = docs.as[(Long, String)].collect().map { case (i, t) =>
      i -> shingles(t) }
    val want = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia != ib
      c = sa.intersect(sb).size.toDouble / sa.size if c >= tau
    } yield (ia, ib) -> BigDecimal(c).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(got === want)
    // the asymmetry the operator exists for: 1 ⊂ 2 but not 2 ⊂ 1
    assert(got.contains((1L, 2L)) && !got.contains((2L, 1L)))
    assert(got((1L, 4L)) === 1.0 && got((4L, 1L)) === 1.0)
  }

  test("sq8RerankTopK with full-corpus shortlist equals exact brute force") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") < 2)
    val n = emb.count().toInt
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
      "vec_id", 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val rr = Similarity.sq8RerankTopK(emb, q, "vec_id", "embedding",
      "vec_id", 5, shortlist = n)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(rr === exact)
  }

  test("winnowFingerprintsDf equals the Column reference form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the  QUICK   brown fox"), // normalization collapses/lowers
      (3L, "tiny"),                   // < k chars: whole-text gram
      (4L, "exactly8"),               // == k chars: one gram
      (5L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
    val ref = docs.select(col("doc_id"),
      explode(TextFns.winnowFingerprints(col("text"), 8, 4)).as("fp"))
      .as[(Long, String)].collect().toSet
    val fast = Dedup.winnowFingerprintsDf(docs, "doc_id", "text", 8, 4)
      .as[(Long, String)].collect().toSet
    assert(fast === ref)
  }

  test("temperatureBudgets: α=1 is proportional, α=0 is uniform-ish") {
    val docs = (1L to 1000L).map { i =>
      (i, if (i <= 800) "big" else if (i <= 950) "mid" else "small")
    }.toDF("doc_id", "source")
    val prop = Curate.temperatureBudgets(docs, "source", 1.0, 0.5)
      .select("source", "budget").as[(String, Long)].collect().toMap
    assert(prop === Map("big" -> 400L, "mid" -> 75L, "small" -> 25L))
    val flat = Curate.temperatureBudgets(docs, "source", 0.0, 0.3)
      .select("source", "budget").as[(String, Long)].collect().toMap
    // α=0: equal weights → 100 docs per source (small capped at 50)
    assert(flat === Map("big" -> 100L, "mid" -> 100L, "small" -> 50L))
  }

  test("chunkDocs covers the text with the right chunk grid") {
    val docs = Seq(
      (1L, "a" * 80),    // short: one whole-text chunk
      (2L, "b" * 200),   // exactly size: one chunk
      (3L, "c" * 201),   // one past: two chunks (second is 51 chars)
      (4L, "d" * 350),   // exactly size+step: two chunks
      (5L, "e" * 351)    // three chunks, last 51 chars
    ).toDF("doc_id", "text")
    val got = Curate.chunkDocs(docs, "doc_id", "text", 200, 50)
      .select(col("doc_id"), col("chunk_id"), length(col("chunk")))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(got === Seq((1L, 0L, 80), (2L, 0L, 200), (3L, 0L, 200),
      (3L, 1L, 51), (4L, 0L, 200), (4L, 1L, 200), (5L, 0L, 200),
      (5L, 1L, 200), (5L, 2L, 51)))
    // reconstruction: stripping the overlap from chunk i>0 re-yields text
    val chunks = Curate.chunkDocs(docs, "doc_id", "text", 200, 50)
      .as[(Long, Long, String)].collect().sorted
    val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
      id -> cs.sortBy(_._2).zipWithIndex.map { case ((_, _, c), i) =>
        if (i == 0) c else c.drop(50) }.mkString
    }
    docs.as[(Long, String)].collect().foreach { case (id, t) =>
      assert(rebuilt(id) === t)
    }
  }

  test("noveltyStats matches brute-force first-occurrence attribution") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),            // full dup of 1
      (3L, "zeta eta theta iota kappa lambda"),          // all new
      (4L, "alpha beta gamma zeta eta theta new words here")
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyStats(docs, "doc_id", "text", 3)
      .select("doc_id", "n_shingles", "n_seen")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    def sh(t: String): Set[Seq[String]] =
      t.split("\\s+").toSeq.sliding(3).map(_.toSeq).toSet
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val want = all.map { case (id, t) =>
      val mine = sh(t)
      val before = all.filter(_._1 < id).flatMap(x => sh(x._2)).toSet
      (id, mine.size.toLong, mine.count(before.contains).toLong)
    }.toSeq
    assert(got === want)
  }

  test("bm25TopK matches in-memory brute force") {
    val docs = Seq(
      (1L, "spark merge window spark spark"),
      (2L, "merge merge merge stream"),
      (3L, "window"),
      (4L, "nothing relevant here at all whatsoever"),
      (5L, "spark stream window merge all four terms present")
    ).toDF("doc_id", "text")
    val q = Seq("spark", "merge", "window", "stream")
    val (k1, b) = (1.2, 0.75)
    val got = TextFns.bm25TopK(docs, "doc_id", "text", q, 5)
      .as[(Long, Double)].collect().toSeq
    // brute force
    val toks = docs.as[(Long, String)].collect()
      .map { case (i, t) => i -> t.split("\\s+").toSeq }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    val dfm = q.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    val want = toks.map { case (i, ts) =>
      val s = q.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          tf * (k1 + 1) / (tf + k1 * (1 - b + b * ts.size / avgdl))
      }.sum
      i -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.filter(_._2 > 0).sortBy { case (i, s) => (-s, i) }.take(5)
    assert(got === want)
    assert(!got.map(_._1).contains(4L)) // no-match doc never surfaces
  }

  test("rrfFuse: reciprocal-rank sums, missing items contribute nothing") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val got = TextFns.rrfFuse(Seq(a, b), "id", "rank", 10)
      .as[(Long, Double, Long)].collect().toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(
      (10L, r6(1.0 / 61 + 1.0 / 62), 2L),
      (20L, r6(1.0 / 62 + 1.0 / 61), 2L),
      (30L, r6(1.0 / 63), 1L),
      (40L, r6(1.0 / 63), 1L))
      .sortBy { case (i, s, _) => (-s, i) }
    assert(got === want)
    // 10 and 20 tie exactly (symmetric ranks) → id ordering
    assert(got.take(2).map(_._1) === Seq(10L, 20L))
  }

  test("rip_nfc composes decomposed sequences; ASCII is a fixed point") {
    val dec = "café résumé"
    val pre = "café résumé"
    val df = Seq((1L, dec), (2L, pre), (3L, "plain ascii text"))
      .toDF("id", "s")
    val got = df.select(col("id"), TextFns.nfc(col("s")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === pre) // decomposed → precomposed
    assert(got(2L) === pre) // already NFC: unchanged
    assert(got(3L) === "plain ascii text")
    // idempotent + null-safe
    val twice = df.select(TextFns.nfc(TextFns.nfc(col("s"))))
      .as[String].collect().toSet
    assert(twice === Set(pre, "plain ascii text"))
    val nulls = Seq[(Long, String)]((1L, null)).toDF("id", "s")
      .select(TextFns.nfc(col("s"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("kmvDistinct: exact below k, bounded error above, " +
    "partition-invariant") {
    val df = (1L to 30000L).map { i =>
      (if (i <= 20000) "big" else "small",
        if (i <= 20000) s"v${i % 5000}" else s"w${i % 40}")
    }.toDF("g", "v")
    val got = Sketch.kmvDistinct(df, Seq("g"), col("v"), 64)
      .select("g", "distinct_est", "sketch_size")
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    // small group: 40 < k=64 distinct values → exact, sketch holds all
    assert(got("small") === ((40.0, 40L)))
    // big group: 5000 distinct, KMV rel-err ~ 1/sqrt(62) ≈ 13%; allow 4σ
    val (est, sz) = got("big")
    assert(sz === 64L)
    assert(math.abs(est - 5000) / 5000 < 0.5, s"est=$est")
    // the estimate is a pure function of the data — any partitioning
    // yields the identical sketch
    val again = Sketch.kmvDistinct(df.repartition(13), Seq("g"),
      col("v"), 64)
      .select("g", "distinct_est").as[(String, Double)].collect().toMap
    assert(again("big") === est)
    assert(again("small") === 40.0)
  }

  test("leakageSafeSplit keeps near-dup pairs on the same side") {
    // pair (2k, 2k+1): identical text (J=1); ACROSS pairs only the
    // 6-token base is shared → J = 4/16 = 0.25 < τ, distinct clusters
    val base = "alpha beta gamma delta epsilon zeta"
    val docs = ((2L to 41L).map { i =>
      val k = i / 2
      (i, base + s" t$k u$k v$k w$k x$k y$k")
    } ++ Seq((100L, "solo document with completely different words here"),
      (101L, "another standalone text nothing shared at all okay"))
    ).toDF("doc_id", "text")
    val got = Split.leakageSafeSplit(docs, "doc_id", "text", 80, 3, 0.5)
    // every cluster lands wholly in one split
    val spans = got.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(spans === 0L)
    // dup partners co-located; pairs really are separate clusters
    val rows = got.select("doc_id", "split", "cluster_id")
      .as[(Long, String, Long)].collect()
    val bySide = rows.map(r => r._1 -> r._2).toMap
    val byCluster = rows.map(r => r._1 -> r._3).toMap
    (2L to 40L by 2).foreach { i =>
      assert(bySide(i) === bySide(i + 1), s"pair ($i,${i + 1}) split apart")
      assert(byCluster(i) === byCluster(i + 1))
    }
    assert(rows.map(_._3).distinct.length === 22) // 20 pairs + 2 solos
    assert(got.count() === 42)
  }

  test("crossCorpusDupes equals brute-force cross-split jaccard") {
    val mk = (i: Long, t: String) => (i, t)
    val oldDocs = Seq(
      mk(2L, "alpha beta gamma delta epsilon zeta eta"),
      mk(4L, "one two three four five six seven eight"),
      mk(6L, "totally unrelated content lives here now")
    ).toDF("doc_id", "text")
    val newDocs = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta"),      // dup of 2
      mk(3L, "one two three four five six seven nine"),       // near 4
      mk(5L, "fresh words never seen before at all")
    ).toDF("doc_id", "text")
    val tau = 0.5
    val got = Dedup.crossCorpusDupes(newDocs, oldDocs, "doc_id", "text",
      shingleN = 3, threshold = tau)
      .select("id_new", "id_old", "jaccard")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    def sh(t: String): Set[Seq[String]] =
      t.split("\\s+").map(_.toLowerCase).toSeq.sliding(3).map(_.toSeq).toSet
    val want = (for {
      (in, tn) <- newDocs.as[(Long, String)].collect()
      (io, to) <- oldDocs.as[(Long, String)].collect()
      j = sh(tn).intersect(sh(to)).size.toDouble /
        sh(tn).union(sh(to)).size if j >= tau
    } yield (in, io) -> BigDecimal(j).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(got === want)
    assert(got.contains((1L, 2L)))   // exact dup found
    assert(got.contains((3L, 4L)))   // near dup found
    assert(!got.keys.exists(_._1 == 5L)) // fresh doc clean
  }

  test("selectSmallestByHash equals the naive full-window selection " +
    "and survives a forced fallback") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 2000L).map(i =>
      (i, if (i % 10 == 0) "tail" else "head")).toDF("doc_id", "source")
    val budgets = Seq(("head", 300L, 1800L), ("tail", 150L, 200L))
      .toDF("source", "__budget", "__n")
    def naive = {
      val h = Dedup.portableHash64(col("doc_id").cast("string"))
      val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
      docs.join(broadcast(budgets), Seq("source"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= col("__budget"))
        .select("doc_id").as[Long].collect().sorted.toSeq
    }
    val fast = Curate.selectSmallestByHash(docs, "doc_id", "source", budgets)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fast === naive)
    // negative slack guarantees the filter undershoots → every key
    // takes the exact fallback path; output must not change
    val forced = Curate.selectSmallestByHash(docs, "doc_id", "source",
      budgets, slack = -0.9999)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(forced === naive)
    // budget larger than n: whole key comes back
    val over = Seq(("head", 5000L, 1800L), ("tail", 0L, 200L))
      .toDF("source", "__budget", "__n")
    val all = Curate.selectSmallestByHash(docs, "doc_id", "source", over)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(all === Map("head" -> 1800L))
  }

  test("temperatureSample α=0.5 upsamples the tail share and is " +
    "deterministic under repartitioning") {
    val docs = (1L to 1000L).map { i =>
      (i, if (i <= 900) "head" else "tail")
    }.toDF("doc_id", "source")
    val kept = Curate.temperatureSample(docs, "doc_id", "source", 0.5, 0.4)
    val counts = kept.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    val headShare = counts("head").toDouble / counts.values.sum
    assert(headShare < 0.9 && headShare > 0.5) // flattened, not inverted
    val again = Curate.temperatureSample(docs.repartition(7), "doc_id",
      "source", 0.5, 0.4).select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === kept.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("countMinTopK: never undercounts, exact without collisions, " +
    "partition-invariant") {
    // zipfy stream: token t_i appears 1000/i times, i = 1..50
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val df = rows.toDF("tok")
    val got = Sketch.countMinTopK(df, col("tok"), d = 4, w = 1024,
      topK = 10)
      .select("rank", "value", "n_exact", "cm_est", "overcount")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === (1 to 10).map(i => s"t$i"))
    assert(got.map(_._3).toSeq === (1 to 10).map(i => (1000 / i).toLong))
    // CM property: est >= exact always
    got.foreach { r => assert(r._4 >= r._3 && r._5 === r._4 - r._3) }
    // 50 tokens into 4×1024 buckets: no collisions → estimates exact
    assert(got.forall(_._5 === 0L))
    // tight table (w=4) forces collisions: still never undercounts
    val tight = Sketch.countMinTopK(df, col("tok"), d = 2, w = 4,
      topK = 10).select("n_exact", "cm_est")
      .as[(Long, Long)].collect()
    assert(tight.forall { case (n, e) => e >= n })
    assert(tight.exists { case (n, e) => e > n }) // collisions observed
    // additive counters are a pure function of the data
    val again = Sketch.countMinTopK(df.repartition(13), col("tok"),
      d = 4, w = 1024, topK = 10)
      .select("rank", "value", "cm_est")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(again.map(r => (r._1, r._2, r._3)).toSeq ===
      got.map(r => (r._1, r._2, r._4)).toSeq)
  }

  test("hashedLinearScore: integer-exact, text-deterministic, " +
    "repartition-stable") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // identical text → identical score
      (3L, "epsilon zeta eta theta iota kappa"),
      (4L, "single")
    ).toDF("doc_id", "text")
    val got = Curate.hashedLinearScore(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "score_units", "score")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(4L, 4L, 6L, 1L))
    assert(got(0)._3 === got(1)._3 && got(0)._4 === got(1)._4)
    got.foreach { r =>
      // one division, then round — recomputable from the integer units
      val want = BigDecimal(r._3.toDouble / (9998d * r._2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r._4 === want)
      assert(r._3.abs <= 9998L * r._2) // weights bounded in [-9998, 9998]
    }
    val again = Curate.hashedLinearScore(docs.repartition(5), "doc_id",
      "text").select("doc_id", "score_units")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(again.map(_._2).toSeq === got.map(_._3).toSeq)
  }

  test("dupSpanStats merges overlapping dup spans into islands") {
    // d1/d2 share the 3-gram prefix (a b c d → grams @0,@1) and suffix
    // (e f g h → grams @7,@8); middles are unique. Expected per doc:
    // islands [0,4) and [7,11) → 2 spans, 8 of 11 tokens covered.
    val docs = Seq(
      (1L, "a b c d z1 z2 z3 e f g h"),
      (2L, "a b c d q1 q2 q3 e f g h"),
      (3L, "totally different words only here nothing shared at all")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, "doc_id", "text", k = 3)
      .select("doc_id", "n_tokens", "n_spans", "covered_tokens",
        "covered_frac")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 11L, 2L, 8L, 0.727273)))
    assert(got(1) === ((2L, 11L, 2L, 8L, 0.727273)))
    assert(got(2) === ((3L, 9L, 0L, 0L, 0.0)))
    // a doc whose dup grams CHAIN (every gram shared) → ONE island
    val chain = Seq(
      (1L, "p q r s t"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val full = Dedup.dupSpanStats(chain, "doc_id", "text", k = 3)
      .select("doc_id", "n_spans", "covered_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(full(0) === ((1L, 1L, 5L))) // [0,5): whole doc one island
    assert(full(1) === ((2L, 1L, 5L))) // [0,5) of 6 tokens
  }

  test("removeDupSpans cuts exactly the island tokens and keeps order") {
    val docs = Seq(
      (1L, "a b c d z1 z2 z3 e f g h"),
      (2L, "a b c d q1 q2 q3 e f g h"),
      (3L, "totally different words only here nothing shared at all")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "n_tokens", "kept_tokens", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // islands [0,4) and [7,11) cut → middle survives in order
    assert(got(0) === ((1L, 11L, 3L, "z1 z2 z3")))
    assert(got(1) === ((2L, 11L, 3L, "q1 q2 q3")))
    assert(got(2) === ((3L, 9L, 9L,
      "totally different words only here nothing shared at all")))
    // removal is consistent with the stats accounting
    val stats = Dedup.dupSpanStats(docs, "doc_id", "text", k = 3)
      .select("doc_id", "covered_tokens").as[(Long, Long)]
      .collect().toMap
    got.foreach { r => assert(r._2 - r._3 === stats(r._1)) }
    // a fully-duplicated doc comes back empty
    val twin = Seq((1L, "p q r s t"), (2L, "p q r s t"))
      .toDF("doc_id", "text")
    val wiped = Dedup.removeDupSpans(twin, "doc_id", "text", k = 3)
      .select("kept_tokens", "cleaned_text")
      .as[(Long, String)].collect()
    wiped.foreach { r => assert(r === ((0L, ""))) }
  }

  test("histQuantiles: within one bin width of exact, exact on " +
    "uniform grid, partition-invariant") {
    val df = (1 to 10000).map(_.toDouble).toDF("x")
    val qs = Seq(0.25, 0.5, 0.9)
    val got = Sketch.histQuantiles(df, col("x"), 256, qs)
      .as[(Double, Double)].collect().toMap
    val binW = (10000.0 - 1.0) / 256
    qs.foreach { q =>
      val exact = 1 + q * 9999 // continuous quantile of the uniform grid
      assert(math.abs(got(q) - exact) <= binW + 1e-6,
        s"q=$q est=${got(q)} exact=$exact")
    }
    val again = Sketch.histQuantiles(df.repartition(17), col("x"), 256, qs)
      .as[(Double, Double)].collect().toMap
    assert(again === got)
    // nulls ignored; single-value column degenerates to that value
    val deg = Sketch.histQuantiles(
      Seq[java.lang.Double](5.0, null, 5.0).toDF("x"), col("x"), 16,
      Seq(0.5)).as[(Double, Double)].collect()
    assert(deg.toSeq === Seq((0.5, 5.0)))
    // grouped form: per-group error bound on groups with different
    // ranges; a constant group degenerates to its value
    val gdf = ((1 to 1000).map(i => ("a", i.toDouble)) ++
      (1 to 400).map(i => ("b", 10.0 * i)) ++
      Seq(("c", 7.0), ("c", 7.0))).toDF("g", "x")
    val gq = Sketch.histQuantilesBy(gdf, Seq("g"), col("x"), 64, Seq(0.5))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(gq("a") - (1 + 0.5 * 999)) <= 999.0 / 64 + 1e-6)
    assert(math.abs(gq("b") - (10 + 0.5 * 3990)) <= 3990.0 / 64 + 1e-6)
    assert(gq("c") === 7.0)
  }

  test("exactQuantiles equals Spark's exact percentile bit-for-bit") {
    // heavy ties + a skewed tail + negative values, awkward n
    val rng = new scala.util.Random(11)
    val data = (1 to 5003).map(_ =>
      if (rng.nextBoolean()) rng.nextInt(20).toDouble - 5
      else math.exp(rng.nextDouble() * 8) - 100)
    val df = data.toDF("x")
    val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)
    val got = Sketch.exactQuantiles(df, col("x"), qs)
      .as[(Double, Double)].collect().toMap
    val want = df.agg(percentile(col("x"), array(qs.map(lit): _*)))
      .as[Seq[Double]].head()
    qs.zip(want).foreach { case (q, w) =>
      assert(got(q) === w, s"q=$q") // EXACT double equality
    }
    // partition invariance (the single-reducer percentile can't drift
    // either, but the refinement path must not depend on layout)
    val again = Sketch.exactQuantiles(df.repartition(13), col("x"), qs)
      .as[(Double, Double)].collect().toMap
    assert(again === got)
    // integral positions (n-1 divisible): no interpolation, and the
    // degenerate constant column collapses to one crowded bin but
    // still answers exactly
    val grid = (1 to 101).map(_.toDouble).toDF("x")
    val g = Sketch.exactQuantiles(grid, col("x"), Seq(0.25, 0.5), bins = 4)
      .as[(Double, Double)].collect().toMap
    assert(g(0.25) === 26.0 && g(0.5) === 51.0)
    val const = Seq.fill(100)(3.14).toDF("x")
    assert(Sketch.exactQuantiles(const, col("x"), Seq(0.5))
      .as[(Double, Double)].head()._2 === 3.14)
  }

  test("exactQuantilesBy equals grouped percentile, including a skewed giant group") {
    val rng = new scala.util.Random(23)
    // group a: 90% of rows (the skew case the operator exists for)
    val rows = (1 to 9000).map(_ => ("a", rng.nextGaussian() * 50)) ++
      (1 to 900).map(_ => ("b", rng.nextInt(10).toDouble)) ++
      Seq(("c", 42.0)) // 1-row group
    val df = rows.toDF("g", "x")
    val qs = Seq(0.1, 0.5, 0.9)
    val got = Sketch.exactQuantilesBy(df, Seq("g"), col("x"), qs, bins = 32)
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val want = df.groupBy(col("g"))
      .agg(percentile(col("x"), array(qs.map(lit): _*)).as("p"))
      .as[(String, Seq[Double])].collect()
      .flatMap { case (g, vs) => qs.zip(vs).map { case (q, v) => (g, q) -> v } }
      .toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"at $k") }
  }

  test("weightedQuantilesBy matches the in-memory weighted-quantile walk") {
    val rng = new scala.util.Random(41)
    val rows = (1 to 3000).map { _ =>
      val g = s"g${rng.nextInt(3)}"
      (g, rng.nextInt(50).toDouble, 1L + rng.nextInt(9).toLong)
    } :+ (("solo", 7.0, 5L))
    val df = rows.toDF("g", "v", "w")
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = graft.operators.Sketch.weightedQuantilesBy(
      df, Seq("g"), col("v"), col("w"), qs, bins = 16)
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val byG = rows.groupBy(_._1)
    val want = byG.flatMap { case (g, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).groupBy(_._1).toSeq
        .map { case (v, ws) => (v, ws.map(_._2).sum.toDouble) }
        .sortBy(_._1)
      val tot = sorted.map(_._2).sum
      qs.map { q =>
        var cum = 0.0; var ans = Double.NaN
        sorted.foreach { case (v, w) =>
          cum += w; if (ans.isNaN && cum >= q * tot) ans = v
        }
        (g, q) -> ans
      }
    }
    assert(got.keySet === want.keySet)
    want.foreach { case (k, w) => assert(got(k) === w, s"at $k") }
    // unit weights reduce to the lower (type-1) unweighted quantile
    val u = graft.operators.Sketch.weightedQuantilesBy(
      (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v"),
      Seq("g"), col("v"), lit(1L), Seq(0.5), bins = 8)
      .as[(String, Double, Double)].head()
    assert(u._3 === 50.0)
  }

  test("covarianceMatrix and pc1 recover a planted principal axis") {
    // points t·u + tiny orthogonal noise, u = (3,4)/5: the dominant
    // eigenvector of the covariance must be ±u, and projections ≈ ±t
    val u = Seq(0.6, 0.8)
    val pts = (-50 to 50).map { i =>
      val t = i / 5.0
      (i.toLong + 51L,
        Array((t * u(0) + 0.001 * i % 3 * 0.01).toFloat,
          (t * u(1)).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val cov = Similarity.covarianceMatrix(df, "embedding")
      .as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // symmetric, and dominated by the u direction: cov ≈ Var(t)·u uᵀ
    assert(math.abs(cov((0, 1)) - cov((1, 0))) < 1e-12)
    assert(cov((0, 0)) > 0 && cov((1, 1)) > 0)
    assert(math.abs(cov((0, 1)) / math.sqrt(cov((0, 0)) * cov((1, 1))))
      > 0.99) // near-perfect correlation along the planted axis
    val w = Similarity.pc1(df, "embedding")
    val align = math.abs(w(0) * u(0) + w(1) * u(1))
    assert(align > 0.999, s"pc1=$w align=$align")
    assert(math.abs(math.sqrt(w.map(x => x * x).sum) - 1.0) < 1e-9)
    // projection is deterministic under repartitioning (rounded-C
    // contract)
    val p1 = Similarity.projectPc1(df, "vec_id", "embedding")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val p2 = Similarity.projectPc1(df.repartition(7), "vec_id",
      "embedding").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(p1 === p2)
  }
}
