package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

/** PageRank (r16 — link-graph quality weighting for crawl curation):
  * the simplified (leaking-dangling) variant pinned against a
  * hand-computed reference on a small graph, plus the structural
  * properties curation relies on.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 0 → 1, 0 → 2, 1 → 2, 2 → 0, 3 dangling; 4 isolated
  private def nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
  private def edges =
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 0L)).toDF("src", "dst")

  test("matches a hand-rolled reference iteration on a known graph") {
    val got = Graph.pageRank(nodes, edges, iters = 5, damping = 0.85)
      .orderBy("id").select("rank").as[Double].collect()
    // reference: same recursion in plain Scala
    val out = Map(0L -> Seq(1L, 2L), 1L -> Seq(2L), 2L -> Seq(0L),
      3L -> Seq(0L))
    var r = Seq(0L, 1L, 2L, 3L, 4L).map(_ -> 0.2).toMap
    val base = 0.15 / 5.0
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      out.foreach { case (u, vs) =>
        vs.foreach(v => contrib(v) += r(u) / vs.size)
      }
      r = r.keys.map(v => v -> (base + 0.85 * contrib(v))).toMap
    }
    val want = r.toSeq.sortBy(_._1).map(_._2)
    got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) <= 1e-12, s"node $i: $g vs $e")
    }
    // isolated node sits exactly at the teleport floor
    assert(math.abs(got(4) - base) <= 1e-15)
  }

  test("dangling mass leaks (documented variant): total rank < 1 when " +
    "a node has no out-edges, = 1 on a closed graph") {
    val leaky = Graph.pageRank(nodes, edges, iters = 3)
      .agg(sum("rank")).as[Double].head()
    assert(leaky < 1.0 - 1e-6, s"expected leak, got total $leaky")
    val closedE = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val closedN = Seq(0L, 1L, 2L).toDF("id")
    val closed = Graph.pageRank(closedN, closedE, iters = 4)
      .agg(sum("rank")).as[Double].head()
    assert(math.abs(closed - 1.0) <= 1e-9, s"closed graph total $closed")
  }

  test("weighted + personalized: matches a hand-rolled reference " +
    "(teleport mass on seeds only, contribution r·w/W)") {
    val wEdges = Seq((0L, 1L, 3L), (0L, 2L, 1L), (1L, 2L, 2L),
      (2L, 0L, 1L), (3L, 0L, 5L)).toDF("src", "dst", "w")
    val seeds = Seq(0L, 3L).toDF("id")
    val got = Graph.pageRank(nodes, wEdges, iters = 4, damping = 0.85,
        weightCol = Some("w"), teleport = Some(seeds))
      .orderBy("id").select("rank").as[Double].collect()
    val out = Map(0L -> Seq((1L, 3L), (2L, 1L)), 1L -> Seq((2L, 2L)),
      2L -> Seq((0L, 1L)), 3L -> Seq((0L, 5L)))
    val p = Map(0L -> 0.5, 1L -> 0.0, 2L -> 0.0, 3L -> 0.5, 4L -> 0.0)
    var r = p
    for (_ <- 1 to 4) {
      val contrib = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      out.foreach { case (u, vs) =>
        val tot = vs.map(_._2).sum.toDouble
        vs.foreach { case (v, w) => contrib(v) += r(u) * w / tot }
      }
      r = p.keys.map(v => v -> (0.15 * p(v) + 0.85 * contrib(v))).toMap
    }
    val want = r.toSeq.sortBy(_._1).map(_._2)
    got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) <= 1e-12, s"node $i: $g vs $e")
    }
    // non-seed island (node 4, isolated): decays to exactly 0
    assert(got(4) === 0.0)
  }

  test("q278 plan: every iteration reads the PERSISTED edge frame " +
    "(InMemoryTableScan per iteration, no cartesian product)") {
    val df = SparkEntry.queries("q278_pagerank")(spark,
      "/root/testdata/sf0.001")
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "InMemoryTableScan".r.findAllIn(plan).size
    assert(scans >= 5,
      s"expected >= 5 cached edge scans (one per iteration), got $scans:\n" +
        plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("the degree-joined edge frame registry-persists: a second run " +
    "hits instead of rebuilding (iteration reuse contract)") {
    val n = Seq.tabulate(50)(i => i.toLong).toDF("id")
    val e = n.select(col("id").as("src"), ((col("id") * 3 + 1) % 50).as("dst"))
      .filter(col("src") =!= col("dst"))
    Graph.pageRank(n, e, iters = 2).count()
    val hits0 = Dedup.registryHits
    val miss0 = Dedup.registryMisses
    Graph.pageRank(n, e, iters = 2).count()
    assert(Dedup.registryHits > hits0 && Dedup.registryMisses == miss0,
      "second pageRank over the same graph must reuse the persisted " +
        "degree-joined edges")
  }
}
