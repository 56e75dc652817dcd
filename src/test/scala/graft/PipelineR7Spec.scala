package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Curate, Dedup, Similarity}

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
}
