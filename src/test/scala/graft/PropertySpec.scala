package graft

import java.nio.file.Files
import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.GroupOps

/** Property-style tests mirroring the reference's hypothesis suites
  * (`riptable/hypothesis_tests/test_riptide_numpy_equivalency.py`,
  * `test_sds_property.py`; FIXTURES §B): generated data over a
  * (key-cardinality × null-density) grid, checked against brute-force
  * in-memory references with a fixed seed.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(12345)

  private def genData(n: Int, keys: Int, nullFrac: Double): Seq[(String, Option[Double])] =
    (0 until n).map { _ =>
      val k = s"k${rng.nextInt(keys)}"
      val v = if (rng.nextDouble() < nullFrac) None else Some(rng.nextDouble() * 100 - 50)
      (k, v)
    }

  test("groupby sum/min/max/count match brute force across the grid") {
    for (keys <- Seq(3, 17); nullFrac <- Seq(0.0, 0.3)) {
      val data = genData(500, keys, nullFrac)
      val df = data.toDF("k", "v")
      val got = df.groupBy("k")
        .agg(sum("v").as("s"), min("v").as("mn"), max("v").as("mx"), count("v").as("c"))
        .collect().map(r => r.getString(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Double]),
            Option(r.get(2)).map(_.asInstanceOf[Double]),
            Option(r.get(3)).map(_.asInstanceOf[Double]), r.getLong(4))).toMap

      data.groupBy(_._1).foreach { case (k, rows) =>
        val vs = rows.flatMap(_._2)
        val (s, mn, mx, c) = got(k)
        assert(c === vs.length, s"count keys=$keys null=$nullFrac")
        if (vs.isEmpty) assert(s.isEmpty && mn.isEmpty && mx.isEmpty)
        else {
          assert(math.abs(s.get - vs.sum) < 1e-9 * math.max(1, math.abs(vs.sum)))
          assert(mn.get === vs.min && mx.get === vs.max)
        }
      }
    }
  }

  test("strict vs nan aggregates: strict null iff group has any null") {
    val data = genData(300, 11, 0.25)
    val df = data.toDF("k", "v")
    val got = df.groupBy("k").agg(GroupOps.strictSum($"v").as("s")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val hasNull = rows.exists(_._2.isEmpty)
      assert(got(k).isEmpty === hasNull, s"key $k")
    }
  }

  test("orderBy with total order matches in-memory sort") {
    val data = (0 until 400).map(i => (rng.nextInt(20), rng.nextDouble(), i))
    val df = data.toDF("a", "b", "id")
    val got = df.orderBy($"a", $"b".desc, $"id").select("id").as[Int].collect().toSeq
    val want = data.sortBy { case (a, b, id) => (a, -b, id) }.map(_._3)
    assert(got === want)
  }

  test("two-level gbHead/gbNth match brute force under random repartitioning") {
    // the salted pre-filter must be invisible in results: whatever the
    // physical partitioning, the survivor set is a superset of the
    // per-group top-n and the final window picks exactly it
    for (parts <- Seq(1, 7, 32); keys <- Seq(2, 13)) {
      val data = (0 until 600).map(i => (rng.nextInt(keys), rng.nextDouble(), i))
      val df = data.toDF("k", "v", "id").repartition(parts)
      val gotHead = GroupOps.gbHead(df, Seq("k"), 3, Seq($"v", $"id"))
        .select("id").as[Int].collect().toSet
      val wantHead = data.groupBy(_._1).values.flatMap(
        _.sortBy(t => (t._2, t._3)).take(3).map(_._3)).toSet
      assert(gotHead === wantHead, s"parts=$parts keys=$keys")
      val gotNth = GroupOps.gbNth(df, Seq("k"), 2, Seq($"v", $"id"))
        .select("id").as[Int].collect().toSet
      val wantNth = data.groupBy(_._1).values.flatMap(
        _.sortBy(t => (t._2, t._3)).drop(2).take(1).map(_._3)).toSet
      assert(gotNth === wantNth, s"parts=$parts keys=$keys")
    }
  }

  test("parquet round-trip across dtypes preserves values (sds property)") {
    val data = (0 until 200).map { i =>
      (i.toLong, rng.nextInt(), rng.nextDouble(), rng.nextBoolean(),
        rng.alphanumeric.take(rng.nextInt(12)).mkString,
        if (i % 7 == 0) None else Some(rng.nextFloat()))
    }
    val df = data.toDF("id", "i", "d", "b", "s", "f")
    val path = Files.createTempDirectory("graft_prop").toString + "/t"
    df.write.parquet(path)
    val back = spark.read.parquet(path).orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    assert(back.toSeq === orig.toSeq)
  }

  test("cast widening round-trips (unsigned-widening policy analog)") {
    val data = (0 until 300).map(_ => rng.nextInt(Short.MaxValue).toShort)
    val df = data.toDF("v")
    val back = df.select($"v".cast("int").cast("long").cast("short").as("v"))
      .as[Short].collect().toSeq
    assert(back.sorted === data.sorted)
  }

  test("prefix-filtered jaccardPairs matches brute force on random docs") {
    val vocab = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0 until 60).map { i =>
      val base = (0 until 12).map(_ => vocab(rng.nextInt(vocab.length)))
      (i.toLong, base.mkString(" "))
    } ++ Seq((100L, "aa bb cc dd ee ff"), (101L, "aa bb cc dd ee ff")) // exact dup
    val df = docs.toDF("id", "text")
    for (thr <- Seq(0.3, 0.6, 0.9)) {
      val got = graft.operators.Dedup.jaccardPairs(df, "id", "text", 3, thr)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // brute force on 3-gram shingle sets
      def shingles(t: String): Set[String] = {
        val ts = t.split("\\s+").toSeq
        if (ts.length < 3) Set(ts.mkString(" "))
        else ts.sliding(3).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingles(ta); sb = shingles(tb)
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= thr
      } yield (ia, ib)).toSet
      assert(got === want, s"threshold $thr")
    }
  }

  test("rolling sum over random series matches sliding-window reference") {
    val data = (0 until 250).map(i => (i % 5, i, rng.nextDouble()))
    val df = data.toDF("k", "t", "v")
    val got = graft.operators.Rolling
      .rollingSum(df, Seq("k"), Seq(col("t")), 4, "v", "rs")
      .select("k", "t", "rs").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, t, _), i) =>
        val expect = sorted.slice(math.max(0, i - 3), i + 1).map(_._3).sum
        assert(math.abs(got((k, t)) - expect) < 1e-9, s"k=$k t=$t")
      }
    }
  }

  test("merge2 matches brute-force join on random keyed data with nulls") {
    import graft.operators.Merge
    for (trial <- 0 until 3) {
      val l = (0 until 80).map(i => (
        if (rng.nextDouble() < 0.15) None else Some(rng.nextInt(10).toLong), i))
      val r = (0 until 60).map(j => (
        if (rng.nextDouble() < 0.15) None else Some(rng.nextInt(10).toLong), j * 1.5))
      val lDf = l.map { case (k, v) => (k.map(Long.box).orNull, v) }.toDF("k", "lid")
      val rDf = r.map { case (k, v) => (k.map(Long.box).orNull, v) }.toDF("k", "rv")
      // brute force: null keys never match (rt_merge.py:2320)
      val expInner = for {
        (lk, lid) <- l; (rk, rv) <- r
        if lk.isDefined && lk == rk
      } yield (lid, rv)
      val gotInner = Merge.merge2(lDf, rDf, Seq("k"), "inner")
        .select("lid", "rv").as[(Int, Double)].collect().toSeq
      assert(gotInner.sorted === expInner.sorted, s"inner trial=$trial")
      // left join: every left row appears; unmatched get null
      val gotLeft = Merge.merge2(lDf, rDf, Seq("k"), "left")
        .select("lid", "rv").as[(Int, Option[Double])].collect().toSeq
      val expLeft = l.flatMap { case (lk, lid) =>
        val ms = r.collect { case (rk, rv) if lk.isDefined && lk == rk => rv }
        if (ms.isEmpty) Seq((lid, None)) else ms.map(rv => (lid, Some(rv)))
      }
      assert(gotLeft.sorted === expLeft.sorted, s"left trial=$trial")
    }
  }

  test("interp matches piecewise-linear reference on random series") {
    import graft.operators.Interp
    for (trial <- 0 until 2) {
      val pts = (0 until 20).map(_ => (1L, rng.nextInt(100).toLong, rng.nextDouble() * 10))
        .groupBy(_._2).map(_._2.head).toSeq // unique x per group
      val qs = (0 until 40).map(i => (1L, rng.nextInt(120).toLong - 10, i))
      val pDf = pts.toDF("g", "x", "y")
      val qDf = qs.toDF("g", "x", "qid")
      val sorted = pts.sortBy(_._2)
      def ref(x: Long): Double = {
        val before = sorted.filter(_._2 <= x)
        val after = sorted.filter(_._2 >= x)
        (before.lastOption, after.headOption) match {
          case (Some(b), Some(a)) if a._2 == b._2 => b._3
          case (Some(b), Some(a)) =>
            b._3 + (a._3 - b._3) * (x - b._2).toDouble / (a._2 - b._2)
          case (Some(b), None) => b._3 // clamp right
          case (None, Some(a)) => a._3 // clamp left
          case _ => Double.NaN
        }
      }
      val got = Interp.interp(qDf, pDf, "x", Seq("g"), "y", "iv")
        .select("qid", "iv").as[(Int, Double)].collect().toMap
      qs.foreach { case (_, x, qid) =>
        assert(math.abs(got(qid) - ref(x)) < 1e-9, s"trial=$trial x=$x")
      }
    }
  }

  test("asof exec matches brute force on random data, all directions") {
    import graft.operators.AsofJoin
    // heavy ties (times drawn from a small range) stress the equal-time
    // register logic in the native exec
    for (trial <- 0 until 3; exact <- Seq(true, false)) {
      val l = (0 until 120).map(i =>
        (rng.nextInt(4).toLong, rng.nextInt(25).toLong, i))
      val r = (0 until 80).map(i =>
        (rng.nextInt(4).toLong, rng.nextInt(25).toLong, i.toDouble))
      val lDf = l.toDF("g", "t", "lid")
      val rDf = r.toDF("g", "t", "rv")
      // brute-force reference over the in-memory rows; right ties at one
      // (g, t) broken by the full-row order used in the exec's sort —
      // make right (g, t, rv) unique to sidestep tie ambiguity
      val rUniq = r.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
      val rDfU = rUniq.toDF("g", "t", "rv")
      def brute(direction: String): Map[Int, Option[Double]] =
        l.map { case (g, t, lid) =>
          val cands = rUniq.filter(_._1 == g)
          def back = cands.filter(c => c._2 < t || (c._2 == t && exact))
            .sortBy(c => (c._2, c._3)).lastOption
          def fwd = cands.filter(c => c._2 > t || (c._2 == t && exact))
            .sortBy(c => (c._2, c._3)).headOption
          val m = direction match {
            case "backward" => back
            case "forward"  => fwd
            case "nearest"  => (back, fwd) match {
              case (Some(b), Some(f)) =>
                if (t - b._2 <= f._2 - t) Some(b) else Some(f)
              case (b, f) => b.orElse(f)
            }
          }
          lid -> m.map(_._3)
        }.toMap
      for (dir <- Seq("backward", "forward", "nearest")) {
        val got = AsofJoin.asofExec(lDf, rDfU, "t", Seq("g"), Seq("rv"),
          allowExactMatches = exact, direction = dir)
          .select("lid", "rv").as[(Int, Option[Double])].collect().toMap
        assert(got === brute(dir), s"trial=$trial exact=$exact dir=$dir")
      }
    }
  }

  test("rollupAgg totals equal brute-force recomputation per grouping set") {
    val data = (0 until 400).map { _ =>
      (s"a${rng.nextInt(4)}", s"b${rng.nextInt(6)}", rng.nextInt(100).toDouble)
    }
    val df = data.toDF("a", "b", "v")
    val got = GroupOps.rollupAgg(df, Seq("a", "b"), "sv" -> sum(col("v")))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getAs[Long]("gid")) -> r.getAs[Double]("sv")).toMap
    val leaves = data.groupBy(d => (d._1, d._2)).view
      .mapValues(_.map(_._3).sum).toMap
    leaves.foreach { case ((a, b), s) =>
      assert(math.abs(got((Some(a), Some(b), 0L)) - s) < 1e-9) }
    data.groupBy(_._1).view.mapValues(_.map(_._3).sum).foreach { case (a, s) =>
      assert(math.abs(got((Some(a), None, 1L)) - s) < 1e-9) }
    assert(math.abs(got((None, None, 3L)) - data.map(_._3).sum) < 1e-9)
  }

  test("packSequences matches the sequential reference packer") {
    import graft.operators.Curate
    val docs = (1 to 200).map(i => ("g", i.toLong, (rng.nextInt(300) + 1).toLong))
    val df = docs.toDF("g", "id", "tokens")
    val got = Curate.packSequences(df, Seq("g"), Seq(col("id")), "tokens", 512L)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    var cum = 0L
    docs.sortBy(_._2).foreach { case (_, id, tok) =>
      assert(got(id) === cum / 512L, s"id=$id")
      cum += tok
    }
  }

  test("tfidfTopTerms matches in-memory brute force on random docs") {
    import graft.functions.TextFns
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 30L).map { id =>
      (id, (0 until (rng.nextInt(8) + 3)).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = TextFns.tfidfTopTerms(df, "doc_id", "text", 2)
      .select("doc_id", "rk", "term").as[(Long, Long, String)]
      .collect().map { case (d, r, t) => (d, r) -> t }.toMap
    // brute force with the same formula and the same rounded-score ranking
    val n = docs.size.toDouble
    val tf = docs.flatMap { case (id, tx) =>
      tx.split(" ").groupBy(identity).map { case (t, xs) => (id, t, xs.length) }
    }
    val len = tf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val dfreq = tf.groupBy(_._2).view.mapValues(_.size).toMap
    val brute = tf.groupBy(_._1).flatMap { case (id, rows) =>
      rows.map { case (_, t, c) =>
          val score = BigDecimal(c.toDouble / len(id) * math.log(n / dfreq(t)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (t, score)
        }.sortBy { case (t, s) => (-s, t) }.take(2).zipWithIndex
        .map { case ((t, _), i) => (id, i + 1L) -> t }
    }
    assert(got === brute)
  }

  test("unigramCrossEntropy matches in-memory brute force") {
    import graft.functions.TextFns
    val vocab = Vector("a", "b", "c", "d")
    val docs = (1L to 20L).map { id =>
      (id, (0 until (rng.nextInt(6) + 2)).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    }
    val got = TextFns.unigramCrossEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "xent").as[(Long, Double)].collect().toMap
    val all = docs.flatMap(_._2.split(" "))
    val freq = all.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val tot = all.size.toDouble
    docs.foreach { case (id, tx) =>
      val toks = tx.split(" ")
      val expect = toks.map(t => -math.log(freq(t) / tot)).sum / toks.length
      assert(math.abs(got(id) - expect) < 2e-6, s"doc $id")
    }
  }

  test("bigramCrossEntropy matches in-memory brute force") {
    import graft.functions.TextFns
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 20L).map { id =>
      (id, (0 until (rng.nextInt(8) + 2)).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    }
    val got = TextFns.bigramCrossEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "xent2", "n_bigrams").as[(Long, Double, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val allBg = docs.flatMap { case (_, tx) =>
      val t = tx.split(" "); t.init.zip(t.tail)
    }
    val c2 = allBg.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c1 = allBg.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val v = allBg.map(_._2).distinct.size.toDouble
    docs.foreach { case (id, tx) =>
      val t = tx.split(" ")
      val bgs = t.init.zip(t.tail)
      assert(got(id)._2 === bgs.length.toLong, s"doc $id n_bigrams")
      val expect = bgs.map(b => -math.log((c2(b) + 1) / (c1(b._1) + v))).sum / bgs.length
      assert(math.abs(got(id)._1 - expect) < 2e-6, s"doc $id xent2")
    }
  }

  test("repetitionStats matches in-memory brute force") {
    import graft.functions.TextFns
    val vocab = Vector("a", "b", "c")
    val docs = (1L to 24L).map { id =>
      (id, (0 until rng.nextInt(10)).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    }
    val got = TextFns.repetitionStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", ns = Seq(2, 3))
      .select("doc_id", "top2_frac", "dup2_frac", "top3_frac", "dup3_frac")
      .as[(Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    def fr(toks: Seq[String], n: Int): (Double, Double) = {
      val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      if (grams.isEmpty) (0.0, 0.0)
      else {
        val c = grams.groupBy(identity).view.mapValues(_.size).toMap
        val tot = grams.size.toDouble
        (c.values.max / tot, (tot - c.size) / tot)
      }
    }
    docs.foreach { case (id, tx) =>
      val toks = tx.split("\\s+").toSeq // "" → one empty token, like Spark
      val (t2, d2) = fr(toks, 2)
      val (t3, d3) = fr(toks, 3)
      val g = got(id)
      assert(math.abs(g._2 - t2) < 1e-6 && math.abs(g._3 - d2) < 1e-6,
        s"doc $id 2-gram")
      assert(math.abs(g._4 - t3) < 1e-6 && math.abs(g._5 - d3) < 1e-6,
        s"doc $id 3-gram")
    }
  }

  test("charEntropyBy matches in-memory brute force per source") {
    import graft.functions.TextFns
    val vocab = "abcde "
    val docs = (1L to 20L).map { id =>
      (s"s${id % 2}", (0 until 5 + rng.nextInt(30)).map(_ =>
        vocab(rng.nextInt(vocab.length))).mkString)
    }
    val got = TextFns.charEntropyBy(docs.toDF("source", "text"),
        "source", "text")
      .select("source", "n_chars", "n_distinct_chars", "entropy_nats")
      .as[(String, Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for (src <- Seq("s0", "s1")) {
      val chars = docs.filter(_._1 == src).flatMap(_._2.toSeq)
      val counts = chars.groupBy(identity).view.mapValues(_.size).toMap
      val nn = chars.size.toDouble
      val h = counts.values.map { n =>
        val p = n / nn; -p * math.log(p)
      }.sum
      val (gn, gd, gh) = got(src)
      assert(gn === chars.size.toLong, s"$src n_chars")
      assert(gd === counts.size.toLong, s"$src distinct")
      assert(math.abs(gh - h) < 1e-5, s"$src entropy $gh vs $h")
    }
  }

  test("ngramDiversity matches in-memory brute force per (source, n)") {
    import graft.functions.TextFns
    val vocab = Vector("a", "b", "c", "d")
    val docs = (1L to 30L).map { id =>
      (s"s${id % 3}", (0 until rng.nextInt(8)).map(_ =>
        vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val got = TextFns.ngramDiversity(docs.toDF("source", "text"),
        "source", "text", ns = Seq(1, 2, 3))
      .select("source", "n", "total_grams", "distinct_grams", "diversity")
      .as[(String, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    for (src <- Seq("s0", "s1", "s2"); n <- Seq(1, 2, 3)) {
      val grams = docs.filter(_._1 == src).flatMap { case (_, tx) =>
        tx.split("\\s+").filter(_.nonEmpty).toSeq
          .sliding(n).filter(_.size == n).map(_.mkString(" "))
      }
      if (grams.isEmpty)
        assert(!got.contains((src, n.toLong)), s"$src n=$n should be absent")
      else {
        val (tot, dis, div) = got((src, n.toLong))
        assert(tot === grams.size.toLong, s"$src n=$n total")
        assert(dis === grams.distinct.size.toLong, s"$src n=$n distinct")
        assert(math.abs(div - grams.distinct.size.toDouble / grams.size)
          < 1e-6, s"$src n=$n diversity")
      }
    }
  }

  test("semanticDupFlags matches within-cluster brute force") {
    import graft.operators.Similarity
    val dim = 8
    val rows = (0L until 80L).map { id =>
      (id, (id % 4).toInt,
        Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat))
    }
    val thr = 0.2
    val got = Similarity.semanticDupFlags(rows.toDF("id", "cl", "vec"),
        "id", "vec", "cl", thr)
      .select("id", "sem_dup").as[(Long, Boolean)].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    rows.foreach { case (id, cl, v) =>
      val expect = rows.exists { case (id2, cl2, v2) =>
        cl2 == cl && id2 < id && cos(v2, v) >= thr
      }
      assert(got(id) === expect, s"id $id")
    }
  }

  test("connectedComponents matches union-find on random graphs") {
    import graft.operators.Cluster
    for (trial <- 1 to 4) {
      val n = 120
      val nEdges = trial * 40 // sparse → denser: isolated chains → blobs
      val edges = (0 until nEdges)
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .distinct
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val brute = verts.map(v => v -> {
        // component min = min vertex id in the component
        val root = find(v.toInt)
        verts.filter(u => find(u.toInt) == root).min
      }).toMap
      val got = Cluster.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(got === brute, s"trial=$trial nEdges=$nEdges")
    }
  }

  test("BizCal shiftBday matches java.time brute force over random calendars") {
    import graft.functions.BizCal
    import java.time.LocalDate
    val start = LocalDate.parse("2001-01-01")
    for (trial <- 1 to 3; n <- Seq(0, 1, 5)) {
      // random holiday set inside a 3-month window
      val hols = (0 until 8).map(_ => start.plusDays(rng.nextInt(90)))
        .distinct.map(_.toString)
      val holSet = hols.map(LocalDate.parse).toSet
      val cal = BizCal.calendarDim(spark, "2001-01-01", "2001-06-30", hols)
      val dates = (0 until 25).map(_ => start.plusDays(rng.nextInt(75)).toString)
      val df = dates.distinct.toDF("s").select($"s".cast("date").as("d"))
      val got = BizCal.shiftBday(df, "d", n, cal, "out")
        .select($"d".cast("string"), $"out".cast("string"))
        .as[(String, String)].collect().toMap
      def isB(x: LocalDate) =
        x.getDayOfWeek.getValue <= 5 && !holSet(x)
      def nextB(x0: LocalDate) = {
        var x = x0; while (!isB(x)) x = x.plusDays(1); x }
      dates.distinct.foreach { s =>
        var c = nextB(LocalDate.parse(s))
        (1 to n).foreach(_ => c = nextB(c.plusDays(1)))
        assert(got(s) === c.toString, s"trial=$trial n=$n d=$s hols=$hols")
      }
    }
  }

  test("partition2 matches brute-force bottom-k over random frames") {
    for (trial <- 1 to 3; k <- Seq(1, 17, 100)) {
      val data = (0 until 400).map(i => (rng.nextInt(50).toDouble, i.toLong))
      val df = data.toDF("v", "id")
      val got = syntax.partition2(df, "v", "id", k, "bk")
        .filter($"bk").select("v", "id").as[(Double, Long)].collect().toSet
      val want = data.sortBy(identity).take(k).toSet
      assert(got === want, s"trial=$trial k=$k")
    }
  }

  test("chunkDocs matches the reference chunker over random sizes") {
    val rng = new scala.util.Random(11)
    def refChunks(t: String, size: Int, overlap: Int): Seq[String] = {
      val step = size - overlap
      val n = math.max(1L,
        (t.length - overlap + step - 1).toLong / step).toInt
      (0 until n).map(i => t.slice(i * step, i * step + size))
    }
    for ((size, overlap) <- Seq((200, 50), (64, 0), (10, 9), (7, 3))) {
      val docs = (1L to 60L).map { i =>
        (i, rng.alphanumeric.take(rng.nextInt(3 * size) + 1).mkString)
      }
      val got = graft.operators.Curate
        .chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text",
          size, overlap)
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      docs.foreach { case (id, t) =>
        assert(got(id) === refChunks(t, size, overlap),
          s"id=$id size=$size overlap=$overlap len=${t.length}")
      }
    }
  }

  /** Driver-side twin of Dedup.portableHash64: first 15 hex digits of
    * md5 as a long — pins the Scala↔SQL hash contract independently of
    * the DuckDB oracle.
    */
  private def refHash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("countMinTopKBy matches a driver brute force (zipf groups)") {
    val (d, w, k) = (3, 64, 4)
    val data = (1 to 3000).map { i =>
      (s"g${i % 3}", s"t${(math.pow(i % 97 / 97.0, 2) * 30).toInt}")
    }
    val want = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .groupBy(_._1._1).flatMap { case (g, m) =>
        val counts = m.map { case ((_, v), n) => v -> n }
        val cm = Array.ofDim[Long](d, w)
        counts.foreach { case (v, n) =>
          (0 until d).foreach { j =>
            cm(j)((refHash60(s"$j:$v") % w).toInt) += n
          }
        }
        counts.toSeq.sortBy { case (v, n) => (-n, v) }.take(k)
          .zipWithIndex.map { case ((v, n), r) =>
            val est = (0 until d)
              .map(j => cm(j)((refHash60(s"$j:$v") % w).toInt)).min
            (g, r + 1L, v) -> ((n, est, est - n))
          }
      }
    val got = graft.operators.Sketch.countMinTopKBy(
      data.toDF("g", "v"), Seq("g"), col("v"), d, w, k)
      .as[(String, Long, String, Long, Long, Long)].collect()
    assert(got.length === want.size)
    got.foreach { case (g, r, v, n, est, over) =>
      assert(want((g, r, v)) === ((n, est, over)), s"($g, $r, $v)")
    }
    graft.operators.Dedup.clearDedupCaches()
  }

  test("hashedLinearScore matches a driver brute force") {
    val buckets = 512
    val docs = (1L to 40L).map { i =>
      (i, (1 to (i % 7 + 1).toInt).map(j => s"w${(i * j) % 23}")
        .mkString(" "))
    }
    def refW(b: Long): Long = (b * 2654435761L + 104729L) % 19997L - 9998L
    val want = docs.map { case (id, t) =>
      val toks = t.toLowerCase.trim.split("\\s+").toSeq
      val units = toks.map(tk => refW(refHash60(tk) % buckets)).sum
      id -> ((toks.size.toLong, units))
    }.toMap
    val got = graft.operators.Curate.hashedLinearScore(
      docs.toDF("doc_id", "text"), "doc_id", "text", buckets)
      .select("doc_id", "n_tokens", "score_units")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, nt, u) =>
      assert(want(id) === ((nt, u)), s"id=$id")
    }
  }

  test("dupSpanStats / removeDupSpans match interval brute force on " +
    "random overlapping docs") {
    // tiny vocabulary forces dense cross-doc gram collisions
    val vocab = Vector("a", "b", "c", "d", "e")
    for (k <- Seq(2, 3); trial <- 1 to 3) {
      val docs = (1L to 25L).map { i =>
        (i, Seq.fill(rng.nextInt(30) + 1)(vocab(rng.nextInt(vocab.size)))
          .mkString(" "))
      }
      def grams(t: String): Seq[(Int, String)] = {
        val toks = t.split("\\s+").toSeq
        if (toks.size < k) Nil
        else (0 to toks.size - k).map(i =>
          i -> toks.slice(i, i + k).mkString(" "))
      }
      val docFreq = docs.flatMap { case (id, t) =>
        grams(t).map(_._2).distinct.map(_ -> id)
      }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val want = docs.map { case (id, t) =>
        val toks = t.split("\\s+").toSeq
        val covered = Array.fill(toks.size)(false)
        grams(t).foreach { case (i, g) =>
          if (docFreq(g) > 1) (i until i + k).foreach(covered(_) = true)
        }
        // islands = maximal covered runs
        val spans = covered.zipWithIndex.foldLeft(0) {
          case (acc, (c, i)) =>
            if (c && (i == 0 || !covered(i - 1))) acc + 1 else acc
        }
        val cleaned = toks.zipWithIndex.collect {
          case (tok, i) if !covered(i) => tok }.mkString(" ")
        id -> ((toks.size.toLong, spans.toLong, covered.count(identity).toLong,
          cleaned))
      }.toMap
      val df = docs.toDF("doc_id", "text")
      val gotStats = graft.operators.Dedup
        .dupSpanStats(df, "doc_id", "text", k)
        .select("doc_id", "n_tokens", "n_spans", "covered_tokens")
        .as[(Long, Long, Long, Long)].collect()
      gotStats.foreach { case (id, nt, ns, cv) =>
        val (wnt, wns, wcv, _) = want(id)
        assert((nt, ns, cv) === ((wnt, wns, wcv)), s"id=$id k=$k")
      }
      val gotClean = graft.operators.Dedup
        .removeDupSpans(df, "doc_id", "text", k)
        .select("doc_id", "cleaned_text").as[(Long, String)]
        .collect().toMap
      want.foreach { case (id, (_, _, _, cleaned)) =>
        assert(gotClean(id) === cleaned, s"id=$id k=$k")
      }
      graft.operators.Dedup.clearDedupCaches()
    }
  }

  test("unimaxBudgets water-filling equals UniMax's published sequential scan") {
    // the paper's procedure: walk sources ASCENDING by size; give each
    // min(cap, remaining/remaining_sources); subtract and continue.
    // The closed form must reproduce it on random inputs.
    def sequential(caps: Seq[Double], b: Double): Seq[Double] = {
      var remaining = b
      val sorted = caps.zipWithIndex.sortBy(_._1)
      val out = Array.fill(caps.length)(0.0)
      sorted.zipWithIndex.foreach { case ((cap, origIdx), pos) =>
        val fair = remaining / (caps.length - pos)
        val alloc = math.min(cap, fair)
        out(origIdx) = alloc
        remaining -= alloc
      }
      out.toSeq
    }
    for (trial <- 1 to 8) {
      val nSrc = 2 + rng.nextInt(9)
      val counts = (0 until nSrc).map(i =>
        (s"s$i", 1L + rng.nextInt(1000).toLong))
      val epochs = Seq(1.0, 2.0, 3.5)(trial % 3)
      val frac = Seq(0.1, 0.5, 0.9, 2.0, 10.0)(trial % 5)
      val rows = counts.flatMap { case (src, n) =>
        // split each source's tokens across a few rows
        val a = n / 2; Seq((src, a), (src, n - a))
      }
      val got = graft.operators.Curate.unimaxBudgets(
        rows.toDF("src", "tok"), "src", col("tok"), epochs, frac)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("alloc")).toMap
      val caps = counts.map(_._2.toDouble * epochs)
      val b = math.min(counts.map(_._2).sum * frac, caps.sum)
      val want = sequential(caps, counts.map(_._2).sum * frac)
      // the operator rounds allocations to 6dp — tolerate that, and its
      // accumulation across sources in the conservation check
      counts.map(_._1).zip(want).foreach { case (src, w) =>
        assert(math.abs(got(src) - w) < 1e-5,
          s"trial=$trial src=$src got=${got(src)} want=$w")
      }
      assert(math.abs(got.values.sum - math.min(b, caps.sum)) < 1e-4)
    }
  }

  test("rocAuc matches the brute-force pair-counting AUC on random data") {
    for (trial <- 1 to 5) {
      val n = 100 + rng.nextInt(200)
      // coarse scores force heavy ties
      val data = (0 until n).map(_ =>
        (rng.nextInt(12), if (rng.nextDouble() < 0.4) 1 else 0))
      if (data.exists(_._2 == 1) && data.exists(_._2 == 0)) {
        val got = graft.functions.Stats.rocAuc(
          data.toDF("s", "y"), col("s"), col("y"))
          .head().getAs[Double]("auc")
        val pos = data.filter(_._2 == 1).map(_._1)
        val neg = data.filter(_._2 == 0).map(_._1)
        val wins = (for (p <- pos; q <- neg) yield
          if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val want = wins / (pos.size.toDouble * neg.size)
        assert(math.abs(got - want) < 1e-6, s"trial=$trial")
      }
    }
  }

  test("chunk-parallel rolling equals a brute-force frame scan on random " +
    "tapes across every (kind, n, width) — dyadic values, gappy keys") {
    // brute force is an independent in-memory reference (NOT the plain
    // Spark window the OpsSpec grid uses): per row, the frame is the
    // last n rows of its key by (t, id) — sums/extremes/var computed
    // directly. Dyadic values (k/8) keep sums association-exact.
    for (trial <- 1 to 4) {
      val data = (0 until 160).map { i =>
        (rng.nextInt(4).toLong, i.toLong,
          rng.nextInt(400).toLong, // ts with many collisions per chunk
          (rng.nextInt(64) - 32) / 8.0)
      }
      val df = data.toDF("k", "id", "t", "v")
      val byKey = data.groupBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(r => (r._3, r._2))
      }
      for (n <- Seq(1, 3, 5); w <- Seq(7L, 50L);
           kind <- Seq("sum", "mean", "min", "max", "var", "quantile")) {
        val got = graft.operators.Rolling
          .rollingAggChunked(df, "k", "t", "id", n, "v", "o", w, kind)
          .select("k", "id", "o").collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
        byKey.foreach { case (k, rows) =>
          rows.zipWithIndex.foreach { case ((_, id, _, _), i) =>
            val frame = rows.slice(math.max(0, i - n + 1), i + 1).map(_._4)
            val want: Option[Double] = kind match {
              case "sum"  => Some(frame.sum)
              case "mean" => Some(frame.sum / frame.length)
              case "min"  => Some(frame.min)
              case "max"  => Some(frame.max)
              case "var" =>
                if (frame.length < 2) None
                else {
                  val m = frame.sum / frame.length
                  Some(frame.map(x => (x - m) * (x - m)).sum / (frame.length - 1))
                }
              case "quantile" => // median, quantile_cont interpolation
                val s = frame.sorted
                val p = 0.5 * (s.length - 1)
                val lo = math.floor(p).toInt
                val hi = math.min(lo + 1, s.length - 1)
                Some(s(lo) + (p - lo) * (s(hi) - s(lo)))
            }
            val g = got((k, id))
            (g, want) match {
              case (Some(gv), Some(wv)) =>
                assert(math.abs(gv - wv) <= 1e-9 * math.max(1.0, math.abs(wv)),
                  s"trial=$trial kind=$kind n=$n w=$w key=$k id=$id: $gv != $wv")
              case _ => assert(g === want,
                s"trial=$trial kind=$kind n=$n w=$w key=$k id=$id null-mask")
            }
          }
        }
      }
    }
  }

  test("chunk-parallel EMA matches a brute-force sequential recurrence " +
    "on random tapes across chunk widths") {
    for (trial <- 1 to 4) {
      val data = (0 until 120).map { i =>
        (rng.nextInt(3).toLong, i.toLong, rng.nextInt(300).toLong,
          rng.nextDouble() * 10)
      }
      // the sequential reference needs a deterministic order: drop
      // (k, t) duplicates so ties cannot flip between implementations
      val dedup = data.groupBy(r => (r._1, r._3)).map(_._2.head).toSeq
      val df = dedup.toDF("k", "id", "t", "v")
      for (rate <- Seq(0.0, 0.01); w <- Seq(13L, 100L)) {
        val got = graft.operators.Ema
          .emaDecayChunked(df, "k", "t", "id", "v", rate, "ema", w)
          .select("k", "id", "ema").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        dedup.groupBy(_._1).foreach { case (k, rows) =>
          var acc = 0.0
          var prevT = 0L
          var first = true
          rows.sortBy(r => (r._3, r._2)).foreach { case (_, id, t, v) =>
            if (first) { prevT = t; first = false }
            acc = v + acc * math.exp(-rate * (t - prevT).toDouble)
            prevT = t
            val g = got((k, id))
            assert(math.abs(g - acc) <= 1e-9 * math.max(1.0, math.abs(acc)),
              s"trial=$trial rate=$rate w=$w key=$k id=$id: $g != $acc")
          }
        }
      }
    }
  }
}
