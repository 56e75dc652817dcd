package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster assembly: connected components over a near-dup
  * pair set. (Builder-brief extension beyond the riptable surface —
  * riptable dedups row-wise, `riptable/rt_dataset.py:3631`; a corpus
  * dedup pipeline needs PAIRS → CLUSTERS → one kept doc per cluster.)
  *
  * Scale design: large-star/small-star alternation (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — public
  * algorithm, also the shape GraphFrames ships). The critical property
  * vs naive min-label propagation with a label-of-label shortcut: NO
  * step ever joins the frame on the component LABEL. A giant component
  * (millions of boilerplate near-dups) therefore never keys a shuffle
  * on a single value — the only join key is the vertex id, whose
  * worst-case multiplicity is a node's degree, and that join pairs the
  * edge list against a ONE-ROW-PER-NODE aggregate, which AQE's skew
  * handling can split freely. Converges in O(log² n) rounds; each
  * half-round is one map-side-combined per-node min + one equi-join.
  *
  * Rounds materialize via localCheckpoint (lineage truncation —
  * constant per-round planning cost); each round's blocks are
  * explicitly freed once the next round is materialized, so memory is
  * genuinely one edge frame regardless of round count.
  *
  * FAULT-TOLERANCE SCOPE: by default rounds pin via localCheckpoint,
  * which stores blocks on the executors WITHOUT a recompute path —
  * lose an executor mid-loop on a real cluster and the job fails (it
  * cannot rebuild the truncated lineage). That trade is right for
  * job-scoped pipelines and the single-JVM harness (a failed CC job
  * simply reruns — the algorithm is deterministic). When the session
  * HAS a checkpoint dir (`spark.sparkContext.setCheckpointDir(...)`),
  * every pin automatically upgrades to reliable `checkpoint()` — same
  * semantics, blocks in fault-tolerant storage with a recompute path,
  * ~2-5× slower per round from the extra write. ClusterSpec pins both
  * modes to identical results.
  */
object Cluster {

  /** Lineage-truncation point for a CC round: reliable `checkpoint()`
    * when the session has a checkpoint dir configured, executor-local
    * `localCheckpoint()` otherwise (see FAULT-TOLERANCE SCOPE above).
    */
  private def pin(df: DataFrame, eager: Boolean): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager)
    else df.localCheckpoint(eager)

  /** Free the storage behind a pinned frame that no later round can
    * ever re-read. localCheckpoint mode: unpersist the MEMORY_AND_DISK
    * blocks (the ContextCleaner only reclaims them at GC time — too
    * late on a large graph with many rounds). Reliable-checkpoint mode
    * (ADVICE r11): unpersist is a no-op for the checkpoint FILES, so
    * additionally delete the round's snapshot directory from the
    * checkpoint dir — otherwise a long CC loop accumulates one
    * edge-frame snapshot per round on disk and the "one edge frame
    * regardless of round count" invariant fails for storage. Only ever
    * called on frames whose successor is already eagerly materialized,
    * so deleting the recompute path is safe.
    */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        lr.rdd.getCheckpointFile.foreach { f =>
          try {
            val path = new org.apache.hadoop.fs.Path(f)
            val fs = path.getFileSystem(
              df.sparkSession.sparkContext.hadoopConfiguration)
            fs.delete(path, true)
          } catch { case _: Throwable => () } // cleanup is best-effort
        }
      case _ => ()
    }

  /** Connected components of the undirected graph given by a pair
    * frame. Returns (id, cluster_id) for every vertex that appears in
    * at least one pair, cluster_id = min vertex id in the component.
    *
    * Run exact dedup BEFORE pairing when the corpus may contain masses
    * of identical docs — CC is robust to a giant component (see object
    * doc) but the upstream pair GENERATORS are not obligated to be.
    *
    * `maxIter` bounds the driver loop; convergence (edge set fixed
    * under both stars) is detected by comparing a (count, hash-xor)
    * signature between rounds — ONE map-side-combined aggregate per
    * round instead of a set-equality anti-join (the signature carries
    * over, so each round pays a single action). XOR (not SUM) of the
    * row hashes: overflow-free under ANSI mode (Spark 4 defaults
    * `spark.sql.ansi.enabled=true`, where a sum of uniform-over-Long
    * xxhash64 values would throw ArithmeticException almost surely),
    * and order/duplication-safe because the edge set is `.distinct()`.
    * Equal signatures on unequal sets would need an xxhash64 xor
    * collision (~2⁻⁶⁴) — accepted, like every hash-partitioned shuffle
    * accepts hash behavior.
    */
  def connectedComponents(pairs: DataFrame, idA: String, idB: String,
                          maxIter: Int = 30): DataFrame =
    connectedComponentsWithRounds(pairs, idA, idB, maxIter)._1

  // Call-level memo: the star loop is an EAGER driver loop (one action
  // per round), so lazy-plan caching cannot share it — q119/q122/q176/
  // q186 all cluster the SAME pair set and would each pay the full
  // O(log² n) rounds. Keyed by (session, canonicalized input plan,
  // idA, idB, maxIter) — the id columns are part of the GRAPH, not
  // just the frame, so two clusterings of one frame on different edge
  // columns must not collide. The memoized result is pinned via
  // localCheckpoint and the loop's intermediate blocks are freed, so a
  // hit costs one cached-frame scan. LRU-capped; entries from stopped
  // sessions are dropped. Evicted results are REMOVED but their
  // blocks are NOT force-freed: a localCheckpoint truncates lineage,
  // so unpersisting blocks an earlier caller still references would
  // make that caller's lazy frame unrecomputable (hard job failure);
  // the ContextCleaner reclaims the blocks once the last reference is
  // GC'd, which is the correct lifetime.
  private val ccMemo = new java.util.LinkedHashMap[
    (org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String, String, Int),
    (DataFrame, Int)](16, 0.75f, true)
  private val maxMemo = 4

  /** Same as connectedComponents, additionally returning the number of
    * star rounds executed before the edge set reached its fixpoint —
    * the empirical handle for the O(log² n) convergence contract (the
    * scale-stress spec drives a ≥500k-vertex giant component through
    * this and asserts the bound held).
    *
    * Concurrency: the memo lock covers only lookup/insert, never the
    * multi-round compute — concurrent callers with DIFFERENT pair sets
    * cluster in parallel; two racing callers with the SAME key may
    * both compute (harmless — last insert wins, both results correct).
    */
  def connectedComponentsWithRounds(pairs: DataFrame, idA: String, idB: String,
                                    maxIter: Int = 30): (DataFrame, Int) = {
    val analyzed = pairs.queryExecution.analyzed
    // Memo precondition: canonicalized-plan equality only implies
    // result equality for DETERMINISTIC plans. A pair frame built via
    // rand()/sample/uuid canonicalizes identically across two
    // materializations that produce different edges — a memo hit would
    // silently return the FIRST run's clustering. Such plans bypass
    // the memo entirely (compute every time, still correct).
    val memoizable = !GraftPlanUtil.nondeterministic(analyzed)
    val key = (pairs.sparkSession, analyzed.canonicalized, idA, idB, maxIter)
    val hit = if (!memoizable) None else ccMemo.synchronized {
      ccMemo.entrySet().removeIf(e => e.getKey._1.sparkContext.isStopped)
      Option(ccMemo.get(key))
    }
    hit.getOrElse {
      val (out, rounds) = computeCC(pairs, idA, idB, maxIter)
      // pin the RESULT (vertex-count rows), then free the loop's
      // final frames — consumers only ever need the pinned output.
      // pin() chooses the durability mode: executor-local blocks by
      // default (fast; right for job-scoped pipelines and the
      // single-JVM bench), reliable checkpoint files when the session
      // has a checkpoint dir (survives executor loss — set one for a
      // long-lived service holding results across hours).
      val pinned = pin(out, eager = true)
      freeLocalCheckpoint(out)
      val entry = (pinned, rounds)
      if (memoizable) ccMemo.synchronized {
        ccMemo.put(key, entry)
        while (ccMemo.size > maxMemo)
          ccMemo.remove(ccMemo.keySet.iterator.next())
      }
      entry
    }
  }

  private def computeCC(pairs: DataFrame, idA: String, idB: String,
                        maxIter: Int): (DataFrame, Int) = {
    // every vertex seen in any pair (self-pairs keep a vertex alive
    // even though they contribute no edge)
    val vertices = pin(pairs.select(col(idA).as("id"))
      .union(pairs.select(col(idB).as("id")))
      .distinct(), eager = true)
    // proper edges, canonically oriented src > dst (the small-star
    // invariant), from ONE scan of `pairs`
    var edges = pairs
      .select(col(idA).as("a"), col(idB).as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct()
    edges = pin(edges, eager = true)

    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("src"), col("dst")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var iter = 0
    var prevSig = signature(edges)
    var converged = prevSig._1 == 0L
    while (iter < maxIter && !converged) {
      // LARGE-STAR over the symmetric closure: for each node u with
      // m = min(N(u) ∪ {u}), relink every strictly-larger neighbor
      // v > u to m. Output stays oriented src > dst by construction.
      val sym = edges.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val lmin = sym.groupBy("src").agg(min("dst").as("mn"))
      val afterLarge = sym.join(lmin, Seq("src"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), least(col("src"), col("mn")).as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
      // SMALL-STAR over the oriented list: for each node u with
      // smaller-neighborhood N = {v : (u,v) edge} and m = min(N ∪ {u}),
      // relink all of N ∪ {u} except m directly to m.
      val smin = afterLarge.groupBy("src").agg(min("dst").as("mn"))
      val next = afterLarge.join(smin, Seq("src"))
        .select(explode(array(
            struct(col("dst").as("v"), col("mn")),
            struct(col("src").as("v"), col("mn")))).as("e"))
        .select(col("e.v").as("src"), col("e.mn").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
      val nextPinned = // lazy: the signature action materializes it
        pin(next, eager = false)
      val sig = signature(nextPinned)
      converged = sig == prevSig
      prevSig = sig
      freeLocalCheckpoint(edges) // previous round's blocks are dead now
      edges = nextPinned
      iter += 1
    }
    // at the fixpoint every non-root points straight at its component
    // min; vertices with no proper edge are their own root
    val out = vertices
      .join(edges.select(col("src").as("id"), col("dst").as("cluster_id")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    (out, iter)
  }

  /** One kept doc per duplicate cluster (min id — deterministic), plus
    * the cluster size: the "which rows survive dedup" answer.
    */
  def clusterRepresentatives(components: DataFrame): DataFrame =
    components.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("cluster_id").as("keep_id"), col("n_docs"))

  /** Quality-aware representative: keep the member with the HIGHEST
    * score per cluster (ties to the lowest id), instead of min-id —
    * what a curation pipeline actually wants from near-dup clusters
    * ("drop the duplicates, keep the best-written copy"). `scores` is
    * (id, score); one window per cluster (partition = cluster size,
    * which the near-dup banding bounds — a giant cluster means a giant
    * dup group, the thing upstream dedup exists to shrink).
    */
  def clusterRepresentativesBy(components: DataFrame, scores: DataFrame,
                               idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = components
      .join(scores.select(col(idCol).as("id"), col(scoreCol).as("__sc")), Seq("id"))
    val byCluster = Window.partitionBy(col("cluster_id"))
    val best = byCluster.orderBy(col("__sc").desc, col("id").asc)
    joined
      .withColumn("__rn", row_number().over(best))
      .withColumn("n_docs", count(lit(1)).over(byCluster))
      .filter(col("__rn") === 1)
      .select(col("cluster_id"), col("id").as("rep_id"), col("n_docs"),
        col("__sc").as(scoreCol))
  }
}
