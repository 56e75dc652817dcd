package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster assembly: connected components over a near-dup
  * pair set. (Builder-brief extension beyond the riptable surface —
  * riptable dedups row-wise, `riptable/rt_dataset.py:3631`; a corpus
  * dedup pipeline needs PAIRS → CLUSTERS → one kept doc per cluster.)
  *
  * Scale design: iterative min-label propagation. Each vertex starts
  * labeled with its own id; every round each vertex takes the min of
  * its label and its neighbors' labels. Converges in O(component
  * diameter) rounds — near-dup clusters are dense (diameter ≤ a few
  * hops), so 3–5 rounds in practice. Each round is ONE shuffle join on
  * the edge list (never materializes the transitive closure, never
  * all-pairs), which is the standard Spark CC shape at web scale.
  * Labels materialize per round via localCheckpoint (lineage
  * truncation — constant per-round planning cost), so memory is one
  * (vertex, label) frame regardless of round count.
  */
object Cluster {

  /** Connected components of the undirected graph given by a pair
    * frame. Returns (id, cluster_id) for every vertex that appears in
    * at least one pair, cluster_id = min vertex id in the component.
    *
    * `maxIter` bounds the driver loop; convergence is detected by a
    * changed-label count (one action per round — unavoidable for an
    * iterative fixpoint and proportional to rounds, not data).
    */
  def connectedComponents(pairs: DataFrame, idA: String, idB: String,
                          maxIter: Int = 20): DataFrame = {
    // undirected edge list, both directions from ONE scan of `pairs`
    // (a union of two selects would evaluate the pair pipeline twice),
    // pre-partitioned on src so the edge side — the big side at scale —
    // is shuffled once at build time, not once per round
    // localCheckpoint (not persist): the loop's lineage would otherwise
    // grow by several joins per round, and Catalyst re-optimizes the
    // WHOLE accumulated plan on every convergence-check action — at
    // round 10 the planning alone dwarfs the (tiny) shuffles. Truncating
    // to a materialized leaf keeps per-round cost constant. (Standard
    // iterative-Spark practice; on a real cluster an executor loss costs
    // a stage retry from the checkpoint, which is the right trade for a
    // fixpoint loop.)
    val edges = pairs
      .select(explode(array(
        struct(col(idA).as("src"), col(idB).as("dst")),
        struct(col(idB).as("src"), col(idA).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate label per vertex: min over self, neighbor labels, and
      // label-of-label (pointer-doubling shortcut — chains collapse in
      // O(log diameter) rounds instead of O(diameter)). The neighbor
      // aggregate is map-side combined; its shuffle carries one row per
      // dst key, not per edge. The changed flag rides the same select,
      // so convergence detection costs no extra join.
      val fromNbrs = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr"))
      val viaLbl = labels.toDF("id", "lbl")
        .join(labels.toDF("lbl", "lbl2"), Seq("lbl"))
        .select(col("id"), col("lbl2").as("via"))
      val next = labels
        .join(fromNbrs, Seq("id"), "left")
        .join(viaLbl, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr"), col("label")),
            coalesce(col("via"), col("label"))).as("label"),
          (least(coalesce(col("nbr"), col("label")),
            coalesce(col("via"), col("label"))) < col("label")).as("__chg"))
        .localCheckpoint(true) // materialize + truncate in one action
      val changed = next.filter(col("__chg")).count()
      labels = next.select(col("id"), col("label"))
      converged = changed == 0L
      iter += 1
    }
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** One kept doc per duplicate cluster (min id — deterministic), plus
    * the cluster size: the "which rows survive dedup" answer.
    */
  def clusterRepresentatives(components: DataFrame): DataFrame =
    components.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("cluster_id").as("keep_id"), col("n_docs"))
}
