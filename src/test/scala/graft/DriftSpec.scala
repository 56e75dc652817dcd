package graft

import org.apache.spark.sql.functions._
import graft.operators.Drift

/** Drift metrics (q222–q224): closed-form checks on tiny hand-computed
  * distributions, invariance properties, and the shard publisher's
  * determinism/coverage contract.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def mkCats(aCounts: Map[String, Int],
                     bCounts: Map[String, Int]) = {
    val rows = aCounts.toSeq.flatMap { case (c, n) =>
      Seq.fill(n)((c, "A")) } ++
      bCounts.toSeq.flatMap { case (c, n) => Seq.fill(n)((c, "B")) }
    rows.toDF("cat", "src")
  }

  test("categoricalDrift matches hand-computed JS/PSI/TVD") {
    // P = {x: .5, y: .5}, Q = {x: .25, y: .25, z: .5}
    val df = mkCats(Map("x" -> 2, "y" -> 2),
      Map("x" -> 1, "y" -> 1, "z" -> 2))
    val r = Drift.categoricalDrift(df, col("cat"), col("src"), "A", "B")
      .as[(Double, Double, Double, Long)].collect().head
    def term(p: Double, q: Double): Double = {
      val m = (p + q) / 2
      (if (p > 0) p * math.log(p / m) / 2 else 0d) +
        (if (q > 0) q * math.log(q / m) / 2 else 0d)
    }
    val js = term(.5, .25) + term(.5, .25) + term(0, .5)
    val psi = (.5 - .25) * math.log(.5 / .25) * 2 // z absent on A side
    val tvd = (math.abs(.5 - .25) * 2 + .5) / 2
    assert(math.abs(r._1 - js) < 1e-6)
    assert(math.abs(r._2 - psi) < 1e-6)
    assert(math.abs(r._3 - tvd) < 1e-6)
    assert(r._4 === 3L)
  }

  test("categoricalDrift: identical distributions score zero; " +
    "disjoint supports hit the JS ln2 / TVD 1 bounds") {
    val same = mkCats(Map("x" -> 3, "y" -> 1), Map("x" -> 6, "y" -> 2))
    val r0 = Drift.categoricalDrift(same, col("cat"), col("src"), "A", "B")
      .as[(Double, Double, Double, Long)].collect().head
    assert(r0._1 === 0d && r0._2 === 0d && r0._3 === 0d)
    val disj = mkCats(Map("x" -> 4), Map("z" -> 4))
    val r1 = Drift.categoricalDrift(disj, col("cat"), col("src"), "A", "B")
      .as[(Double, Double, Double, Long)].collect().head
    assert(math.abs(r1._1 - math.log(2)) < 1e-6) // JS max
    assert(r1._2 === 0d) // PSI: no shared categories
    assert(math.abs(r1._3 - 1d) < 1e-6) // TVD max
  }

  test("an empty side fails loudly instead of reporting zero drift") {
    val df = mkCats(Map("x" -> 3), Map("y" -> 2))
    // typo'd source name: side B has zero rows -> PSI would read 0.0
    val exC = intercept[Exception] {
      Drift.categoricalDrift(df, col("cat"), col("src"), "A", "Z").collect()
    }
    assert(exC.getMessage.contains("zero rows") ||
      Option(exC.getCause).exists(_.getMessage.contains("zero rows")))
    val exK = intercept[Exception] {
      Drift.ksStatistic(Seq((1, "A"), (2, "A")).toDF("v", "src"),
        col("v"), col("src"), "A", "Z").collect()
    }
    assert(exK.getMessage.contains("zero rows") ||
      Option(exK.getCause).exists(_.getMessage.contains("zero rows")))
  }

  test("ksStatistic equals the brute-force sup over both samples") {
    val a = Seq(1, 2, 2, 3, 5, 8, 13, 21).map((_, "A"))
    val b = Seq(2, 3, 3, 4, 4, 9).map((_, "B"))
    val df = (a ++ b).toDF("v", "src")
    val r = Drift.ksStatistic(df, col("v"), col("src"), "A", "B")
      .as[(Double, Long, Long, Long)].collect().head
    val av = a.map(_._1.toDouble); val bv = b.map(_._1.toDouble)
    val sup = (av ++ bv).distinct.map { x =>
      math.abs(av.count(_ <= x).toDouble / av.size -
        bv.count(_ <= x).toDouble / bv.size)
    }.max
    assert(math.abs(r._1 - sup) < 1e-6)
    assert(r._2 === 8L && r._3 === 6L)
    assert(r._4 === (av ++ bv).distinct.size.toLong)
    // same distribution → D = 0
    val eq = Drift.ksStatistic(
      (a ++ a.map { case (v, _) => (v, "B") }).toDF("v", "src"),
      col("v"), col("src"), "A", "B")
      .as[(Double, Long, Long, Long)].collect().head
    assert(eq._1 === 0d)
  }

  test("fuzz: JS/PSI/TVD are symmetric under source swap and vanish " +
    "on identical distributions") {
    val rng = new scala.util.Random(13)
    for (_ <- 0 until 3) {
      val cats = ('a' to 'f').map(_.toString)
      val aCounts = cats.map(c => c -> (1 + rng.nextInt(9))).toMap
      val bCounts = cats.filter(_ => rng.nextBoolean())
        .map(c => c -> (1 + rng.nextInt(9))).toMap + ("z" -> 3)
      val df = mkCats(aCounts, bCounts)
      val ab = Drift.categoricalDrift(df, col("cat"), col("src"), "A", "B")
        .as[(Double, Double, Double, Long)].collect().head
      val ba = Drift.categoricalDrift(df, col("cat"), col("src"), "B", "A")
        .as[(Double, Double, Double, Long)].collect().head
      // every metric is symmetric: JS by construction, PSI because
      // (p-q)ln(p/q) = (q-p)ln(q/p), TVD trivially
      assert(math.abs(ab._1 - ba._1) < 1e-6)
      assert(math.abs(ab._2 - ba._2) < 1e-6)
      assert(math.abs(ab._3 - ba._3) < 1e-6)
      assert(ab._4 === ba._4)
      // JS within [0, ln2], TVD within [0, 1], PSI >= 0
      assert(ab._1 >= 0d && ab._1 <= math.log(2) + 1e-9)
      assert(ab._3 >= 0d && ab._3 <= 1d + 1e-9)
      assert(ab._2 >= -1e-9)
    }
  }

  test("binnedDrift: include-lowest boundary semantics, out-of-range " +
    "exclusion, and edge validation") {
    import org.apache.spark.sql.functions.col
    // edges [0,10,20]: bin1 = [0,10], bin2 = (10,20]; -1 and 21 excluded
    val rows = Seq(
      (0.0, "A"), (10.0, "A"), (10.0, "A"), (15.0, "A"),   // A: b1x3? no: 0,10,10 -> bin1; 15 -> bin2
      (-1.0, "A"), (21.0, "A"),                            // excluded
      (5.0, "B"), (20.0, "B"), (11.0, "B"), (0.0, "B")     // B: bin1 x2, bin2 x2
    ).toDF("v", "src")
    val r = Drift.binnedDrift(rows, col("v"), col("src"), "A", "B",
      Seq(0.0, 10.0, 20.0))
      .as[(Double, Double, Double, Long)].collect().head
    // A: bin1=3/4, bin2=1/4 (out-of-range dropped); B: bin1=2/4, bin2=2/4
    def half(p: Double, q: Double) = {
      val m = (p + q) / 2
      p * math.log(p / m) / 2 + q * math.log(q / m) / 2
    }
    val js = half(.75, .5) + half(.25, .5)
    val psi = (.75 - .5) * math.log(.75 / .5) +
      (.25 - .5) * math.log(.25 / .5)
    assert(math.abs(r._1 - js) < 1e-6)
    assert(math.abs(r._2 - psi) < 1e-6)
    assert(math.abs(r._3 - (math.abs(.75 - .5) + math.abs(.25 - .5)) / 2)
      < 1e-6)
    assert(r._4 === 2L)
    // unsorted / duplicate edges fail fast with the real cause
    val ex = intercept[IllegalArgumentException] {
      Drift.binnedDrift(rows, col("v"), col("src"), "A", "B",
        Seq(20.0, 0.0, 10.0))
    }
    assert(ex.getMessage.contains("strictly increasing"))
    intercept[IllegalArgumentException] {
      Drift.binnedDrift(rows, col("v"), col("src"), "A", "B",
        Seq(0.0, 10.0, 10.0))
    }
  }

  test("driftMatrix rows equal pairwise categoricalDrift; disjoint " +
    "pairs hit the ln2/1/0 extremes") {
    val df = mkCats(Map("x" -> 2, "y" -> 2),
      Map("x" -> 1, "y" -> 1, "z" -> 2))
      .union(Seq.fill(4)(("w", "C")).toDF("cat", "src"))
    val m = Drift.categoricalDriftMatrix(df, col("cat"), col("src"))
      .as[(String, String, Double, Double, Double, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(m.size === 3) // all pairs present, incl. zero-overlap ones
    // (A,B) must equal the dedicated two-source operator
    val ab = Drift.categoricalDrift(df, col("cat"), col("src"), "A", "B")
      .as[(Double, Double, Double, Long)].collect().head
    val mAB = m(("A", "B"))
    assert(mAB._1 === ab._1 && mAB._2 === ab._2 && mAB._3 === ab._3)
    assert(mAB._4 === 2L) // shared support {x, y}
    // C is disjoint from both: JS = ln2, PSI = 0, TVD = 1
    for (pair <- Seq(("A", "C"), ("B", "C"))) {
      val r = m(pair)
      assert(math.abs(r._1 - math.log(2)) < 1e-6)
      assert(r._2 === 0d && math.abs(r._3 - 1d) < 1e-6 && r._4 === 0L)
    }
  }

  test("ksMatrix rows equal pairwise ksStatistic over every source pair") {
    val rows = (Seq(1, 2, 2, 3, 5, 8).map((_, "A")) ++
      Seq(2, 3, 3, 4, 9).map((_, "B")) ++
      Seq(7, 7, 8, 10).map((_, "C"))).toDF("v", "src")
    val m = Drift.ksMatrix(rows, col("v"), col("src"))
      .as[(String, String, Double, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(m.size === 3)
    for ((sa, sb) <- Seq(("A", "B"), ("A", "C"), ("B", "C"))) {
      val two = Drift.ksStatistic(rows, col("v"), col("src"), sa, sb)
        .as[(Double, Long, Long, Long)].collect().head
      val got = m((sa, sb))
      assert(got._1 === two._1, s"($sa,$sb)")
      assert(got._2 === two._2 && got._3 === two._3)
    }
  }

  test("publishShards: deterministic, covering, seed-sensitive, " +
    "seq is a dense per-shard permutation") {
    val ids = (1L to 500L).toDF("id")
    val s1 = Drift.publishShards(ids, "id", nShards = 8, seed = 7L)
      .as[(Int, Int, Long)].collect().toSeq
    val s2 = Drift.publishShards(ids, "id", nShards = 8, seed = 7L)
      .as[(Int, Int, Long)].collect().toSeq
    assert(s1.toSet === s2.toSet) // re-run stable
    assert(s1.map(_._3).toSet === (1L to 500L).toSet) // every row placed once
    assert(s1.map(_._1).toSet.subsetOf((0 until 8).toSet))
    // seq is 1..n within each shard, ordered by the hash
    s1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === (1 to rows.size))
    }
    val s3 = Drift.publishShards(ids, "id", nShards = 8, seed = 8L)
      .as[(Int, Int, Long)].collect().toSeq
    assert(s3.toSet !== s1.toSet) // a new seed is a full reshuffle
    // roughly balanced (hash-uniform: no shard over 2x the mean)
    val sizes = s1.groupBy(_._1).values.map(_.size)
    assert(sizes.max <= 2 * (500 / 8))
  }
}
