package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Dedup, Split}

/** Round-4 additions: weighted sampling, edit-distance blocking, TF-IDF. */
class SampleSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSample is deterministic and favors heavy rows") {
    val df = (1L to 2000L).map(i => (i, if (i <= 100) 1000.0 else 1.0))
      .toDF("id", "w")
    val s1 = Split.weightedSample(df, "id", "w", 50).select("id")
      .as[Long].collect().sorted.toSeq
    val s2 = Split.weightedSample(df, "id", "w", 50).select("id")
      .as[Long].collect().sorted.toSeq
    assert(s1 === s2) // no RNG — identical across runs
    // the 5% of ids carrying 1000× weight should dominate the sample
    assert(s1.count(_ <= 100L) > 25)
  }

  test("weightedSample plans as a top-k, not a global sort") {
    val df = (1L to 1000L).map(i => (i, i.toDouble)).toDF("id", "w")
    val plan = Split.weightedSample(df, "id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("editDistancePairs finds near-identical docs and skips distant ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // dist 3
      (3L, "a completely different document about spark engines"),
      (4L, "the quick brown fox leaps over the lazy dog") // dist 4 vs 1
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text",
      maxDist = 5, prefixChars = 80)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("editDistancePairs PassJoin blocking is complete vs brute force") {
    // random-ish token soup with planted near-dups; compare against the
    // unblocked all-pairs answer — the pigeonhole guarantee in practice
    val base = Seq("alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "alpha beta gamma delta epsilon zeta eta theta iota kappz", // 1 sub
      "alpha beta gamma delta epsilon zeta eta theta iota",       // 6-char del
      "lorem ipsum dolor sit amet consectetur adipiscing elit")
    val docs = base.zipWithIndex.map { case (tx, i) => (i.toLong, tx) }
      .toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
      maxDist = 6, prefixChars = 60)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val texts = base.map(_.take(60).padTo(60, '\u0001'))
    val brute = (for {
      a <- base.indices; b <- base.indices if a < b
      d = levDist(texts(a), texts(b)) if d <= 6
    } yield (a.toLong, b.toLong, d)).toSet
    assert(got === brute)
  }

  test("editDistancePairs hot-bucket cap keeps a degenerate corpus near-linear") {
    // 5k IDENTICAL short texts (every segment bucket holds all 5k docs —
    // uncapped, the candidate join is 5000² on each bucket) plus one
    // planted near-dup pair with unique content. With a small cap the
    // hot buckets drop, the planted pair (whose segments are cold)
    // survives, and the call completes instead of going quadratic.
    val mass = (0L until 5000L).map(i => (i, "the same boilerplate text repeated"))
    val planted = Seq(
      (90001L, "zebra quokka wombat axolotl capybara pangolin"),
      (90002L, "zebra quokka wombat axolotl capybara pangolim")) // dist 1
    val docs = (mass ++ planted).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
      maxDist = 3, prefixChars = 48, maxBucket = 100L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((90001L, 90002L)))
    // mass-mass pairs are exactly what the cap sacrifices
    assert(!got.exists(p => p._1 < 5000L && p._2 < 5000L))
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("tfidfTopTerms surfaces the distinguishing term first") {
    val docs = Seq(
      (1L, "common common common unique1"),
      (2L, "common common common unique2"),
      (3L, "common common common unique3")).toDF("doc_id", "text")
    val top = TextFns.tfidfTopTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(top === Map(1L -> "unique1", 2L -> "unique2", 3L -> "unique3"))
  }
}
