package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * Labels persist per round and the previous round unpersists, so
  * memory is one (vertex, label) frame regardless of round count.
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
    val spark = pairs.sparkSession
    // undirected edge list, both directions (src -> dst)
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count() // materialize before the loop mutates `labels`
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate label per vertex: min over self and neighbor labels.
      // The aggregate is map-side combined; shuffle carries one row per
      // (dst) key, not per edge.
      val fromNbrs = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr"))
      val next = labels.join(fromNbrs, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") < col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    edges.unpersist()
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
