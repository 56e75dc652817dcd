package graft

import org.apache.spark.sql.functions._
import graft.operators.Curate

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("mixSample honors per-source budgets and is deterministic") {
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val w = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val got = Curate.mixSample(docs, "doc_id", "source", w, 100)
    val counts = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts === Map("src0" -> 50L, "src1" -> 30L, "src2" -> 20L))
    val again = Curate.mixSample(docs, "doc_id", "source", w, 100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === got.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("packSequences: exclusive prefix sum buckets, per group") {
    val docs = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L),
      ("b", 4L, 900L), ("b", 5L, 50L)).toDF("g", "id", "tokens")
    val packs = Curate.packSequences(docs, Seq("g"), Seq(col("id")),
      "tokens", 500L)
      .select("g", "id", "pack_id").as[(String, Long, Long)].collect()
      .map { case (g, id, p) => (g, id) -> p }.toMap
    // a: cum-excl 0,300,600 → packs 0,0,1 ; b: 0,900 → 0,1
    assert(packs === Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("b", 4L) -> 0L, ("b", 5L) -> 1L))
  }

  test("funnel counts each stage independently plus the intersection") {
    val df = Seq((1, 10, true), (2, 100, true), (3, 100, false), (4, 5, false))
      .toDF("id", "v", "flag").withColumn("g", lit("all"))
    val r = Curate.funnel(df, Seq("g"), Seq(
      "big" -> (col("v") >= 50), "flagged" -> col("flag"))).collect().head
    assert(r.getAs[Long]("n_total") === 4L)
    assert(r.getAs[Long]("n_big") === 2L)
    assert(r.getAs[Long]("n_flagged") === 2L)
    assert(r.getAs[Long]("n_all") === 1L) // only id=2
  }

  test("substringDupStats: shared k-token span counted, unique spans not") {
    // d1/d2 share the 4-token span "a b c d" (d2 repeats it twice);
    // d3 is disjoint; d4 is shorter than k and must be excluded.
    val docs = Seq(
      (1L, "a b c d x y"),          // grams: abcd,bcdx,cdxy → 1 dup
      (2L, "q a b c d a b c d"),    // 6 grams, abcd twice + qabc,bcda,cdab
      (3L, "m n o p q r"),          // 3 grams, none shared
      (4L, "a b c")                 // < k tokens → excluded
    ).toDF("doc_id", "text")
    val byDoc = graft.operators.Dedup
      .substringDupStats(docs, "doc_id", "text", k = 4)
      .select("doc_id", "n_grams", "dup_grams")
      .collect().map(r2 => (r2.getLong(0), (r2.getLong(1), r2.getLong(2)))).toMap
    assert(byDoc === Map(
      1L -> ((3L, 1L)),   // abcd shared with d2
      2L -> ((6L, 2L)),   // both abcd occurrences count
      3L -> ((3L, 0L))))
    assert(!byDoc.contains(4L))
  }

  test("prototypeRank: quartile sizes exact, prunable = highest centroid-cosine") {
    // cluster 0: 8 points on a line from the centroid direction —
    // prunable must be the floor(8/4)=2 most centroid-aligned (ties by id)
    val vecs = (0 until 8).map { i =>
      (i.toLong, 0, Array(1.0f, i.toFloat)) // angle grows with i
    } ++ (0 until 3).map(i => (100L + i, 1, Array(1.0f, 1.0f)))
    val df = vecs.toDF("vec_id", "label", "embedding")
    val got = Curate.prototypeRank(df, "vec_id", "embedding", "label", 0.25)
    val pruned = got.filter(col("prunable")).select("vec_id")
      .as[Long].collect().toSet
    // cluster 1: all identical → cosine ties, id ascending wins; floor(3/4)=0
    assert(pruned.intersect(Set(100L, 101L, 102L)).isEmpty)
    // cluster 0: exactly 2 prunable, and they are the 2 closest to the
    // centroid by cosine — compute ground truth brute-force
    val rows = got.filter(col("label") === 0)
      .select("vec_id", "cos_centroid", "prunable")
      .collect().map(r2 => (r2.getLong(0), r2.getDouble(1), r2.getBoolean(2)))
    val top2 = rows.sortBy { case (id, c, _) => (-c, id) }.take(2).map(_._1).toSet
    assert(rows.count(_._3) === 2)
    assert(rows.filter(_._3).map(_._1).toSet === top2)
  }

  test("dsirLogWeights matches in-memory brute force; target docs score higher") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the rug"),
      (3L, "en", "the cat and the dog"),
      (4L, "de", "der hund und die katze"),
      (5L, "de", "die katze sitzt auf der matte"),
      (6L, "de", "the cat der hund") // mixed
    ).toDF("doc_id", "lang", "text")
    val b = 64
    val got = Curate.dsirLogWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = b)
      .collect().map(r2 => r2.getLong(0) -> (r2.getDouble(1), r2.getLong(2))).toMap

    // brute force with the same portable md5 bucket hash
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val rows = Seq(
      (1L, true, "the cat sat on the mat"), (2L, true, "the dog sat on the rug"),
      (3L, true, "the cat and the dog"), (4L, false, "der hund und die katze"),
      (5L, false, "die katze sitzt auf der matte"), (6L, false, "the cat der hund"))
    val grams = rows.flatMap { case (id, tgt, tx) =>
      val t = tx.split(" ")
      (t ++ t.init.zip(t.tail).map { case (a, bb) => s"$a $bb" })
        .map(g => (id, tgt, h60(g) % b))
    }
    val cr = grams.groupBy(_._3).view.mapValues(_.size.toDouble).toMap
    val ct = grams.filter(_._2).groupBy(_._3).view.mapValues(_.size.toDouble).toMap
    val (nr, nt) = (grams.size.toDouble, grams.count(_._2).toDouble)
    rows.foreach { case (id, _, _) =>
      val mine = grams.filter(_._1 == id)
      val expect = mine.map { case (_, _, bk) =>
        math.log((ct.getOrElse(bk, 0d) + 1) / (nt + b)) -
          math.log((cr(bk) + 1) / (nr + b))
      }.sum
      assert(got(id)._2 === mine.size.toLong, s"doc $id n_grams")
      assert(math.abs(got(id)._1 - expect) < 2e-6, s"doc $id log_weight")
    }
    // domain signal: every pure-English doc outweighs every pure-German doc
    val minEn = Seq(1L, 2L, 3L).map(got(_)._1).min
    val maxDe = Seq(4L, 5L).map(got(_)._1).max
    assert(minEn > maxDe)
  }

  test("calibrateScores equals percent_rank per source, ties and 1-row groups included") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 500).map(i =>
      (i.toLong, s"s${rng.nextInt(4)}", rng.nextInt(15))) :+
      ((999L, "lonely", 7)) // single-row source → 0.0
    val df = rows.toDF("id", "src", "sc")
    val got = Curate.calibrateScores(df, "src", col("sc"))
      .select(col("id"), col("calibrated")).as[(Long, Double)]
      .collect().toMap
    val want = df.withColumn("pr",
        percent_rank().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("src")).orderBy(col("sc"))))
      .select(col("id"), col("pr")).as[(Long, Double)].collect().toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, v) => assert(v === want(id), s"id=$id") }
    assert(got(999L) === 0.0)
  }

  test("unimaxBudgets water-fills: caps bind small sources, the level splits the rest") {
    // tokens a=10, b=40, c=400; epochCap=2 → caps 20, 80, 800;
    // B = 0.5 * 450 = 225; a fills to its cap (20), the remaining 205
    // splits... level t solves min(20,t)+min(80,t)+min(800,t)=225 →
    // 20 + 80 + t = 225 → t = 125 ≥ 80? then b also caps: t = 125,
    // allocs = (20, 80, 125), sum 225.
    val df = (1 to 10).map(i => ("a", 1L)) ++ (1 to 10).map(i => ("b", 4L)) ++
      (1 to 10).map(i => ("c", 40L))
    val out = Curate.unimaxBudgets(df.toDF("src", "tok"), "src", col("tok"),
      epochCap = 2.0, budgetFrac = 0.5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("alloc")).toMap
    assert(out === Map("a" -> 20.0, "b" -> 80.0, "c" -> 125.0))
    // budget beyond all caps → every source allocates its full cap
    val all = Curate.unimaxBudgets(df.toDF("src", "tok"), "src", col("tok"),
      epochCap = 1.0, budgetFrac = 5.0)
      .collect().map(r => r.getAs[Double]("alloc")).sum
    assert(all === 450.0)
    // conservation: Σ alloc = B whenever the budget binds
    val out2 = Curate.unimaxBudgets(df.toDF("src", "tok"), "src", col("tok"),
      epochCap = 3.0, budgetFrac = 0.2)
      .collect().map(_.getAs[Double]("alloc")).sum
    assert(math.abs(out2 - 90.0) < 1e-9)
  }
  test("rejectionReasons: first-failing-gate attribution, null " +
    "predicates reject, duplicate names refused") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, "s0", "en", 5, 1),    // kept
      (2L, "s0", "de", 5, 1),    // lang (first gate wins)
      (3L, "s0", "de", -1, 2),   // lang, not quality/duplicate
      (4L, "s0", "en", -1, 1),   // quality
      (5L, "s0", "en", 5, 2),    // duplicate
      (6L, "s1", null, 5, 1)     // null lang -> rejected by lang
    ).toDF("id", "source", "lang", "score", "rn")
    val out = graft.operators.Curate.rejectionReasons(df, Seq("source"), Seq(
        "lang" -> (col("lang") === "en"),
        "quality" -> (col("score") > 0),
        "duplicate" -> (col("rn") === 1)))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map(
      ("s0", "kept") -> 1L, ("s0", "lang") -> 2L,
      ("s0", "quality") -> 1L, ("s0", "duplicate") -> 1L,
      ("s1", "lang") -> 1L))
    intercept[IllegalArgumentException] {
      graft.operators.Curate.rejectionReasons(df, Seq("source"), Seq(
        "g" -> lit(true), "g" -> lit(false)))
    }
  }

  test("gopherGates: each rule fires first on its crafted document") {
    import graft.operators.Curate
    val goodWords = // 60 words, mean len in [3,10], stopwords present
      (Seq.fill(29)("quality") ++ Seq.fill(29)("corpus") ++
        Seq("the", "with")).mkString(" ")
    val docs = Seq(
      (1L, goodWords),                                   // kept
      (2L, "short doc"),                                 // word_count (2 < 50)
      (3L, Seq.fill(60)("a").mkString(" ")),             // mean_word_len (1 < 3)
      (4L, (Seq.fill(53)("with") ++ Seq.fill(7)("#")).mkString(" ")), // symbol_ratio (10·7 ≥ 60)
      (5L, (Seq.fill(43)("1234") ++ Seq.fill(15)("word") ++
        Seq("the", "with")).mkString(" ")),              // alpha_frac (5·17 < 4·60)
      (6L, Seq.fill(60)("quality").mkString(" ")),       // stopwords (0 < 2)
      // symbol ratio EXACTLY 0.1 (6 '#' in 60 words): Rae et al. remove
      // only ratio > 0.1, so the boundary doc is KEPT (10·6 ≤ 60)
      (7L, (Seq.fill(52)("quality") ++ Seq("the", "with") ++
        Seq.fill(6)("#")).mkString(" ")),
      // 2 stopword OCCURRENCES but only 1 DISTINCT stopword: the paper's
      // "contain at least two of the following words" counts distinct,
      // so this is rejected by the stopword gate
      (8L, (Seq.fill(58)("quality") ++ Seq("the", "the")).mkString(" "))
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Curate.rejectionReasonCol(Curate.gopherGates(col("text")))
          .as("reason"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "kept", 2L -> "word_count",
      3L -> "mean_word_len", 4L -> "symbol_ratio",
      5L -> "alpha_frac", 6L -> "stopwords",
      7L -> "kept", 8L -> "stopwords"))
  }
}
