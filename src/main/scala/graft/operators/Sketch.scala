package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, oracle-reproducible cardinality sketching.
  *
  * KMV — k-minimum-values (Bar-Yossef et al. 2002; Beyer et al. 2007's
  * unbiased form): hash every value with a fixed uniform hash onto
  * [0, M), keep each group's k smallest DISTINCT hashes; with h_k the
  * k-th smallest, n̂ = (k−1)·M/h_k (relative error ~ 1/√(k−2)). Groups
  * with fewer than k distinct values are EXACT (the sketch holds them
  * all).
  *
  * Why not HLL (Spark's approx_count_distinct): HLL's estimate depends
  * on implementation-private hashing and register layout — it cannot be
  * oracle-checked. KMV over `Dedup.portableHash64` is a pure function
  * of the data, so a DuckDB oracle reproduces the ESTIMATE bit-for-bit,
  * and the engine's answer is auditable, reproducible across engines,
  * reruns and cluster sizes — the property every other sampler in this
  * library holds.
  *
  * Scale shape: dedup to distinct (group, hash) via one map-side-
  * combined aggregate; the k-smallest selection is the SALTED two-level
  * rank (per-(group, partition) top-k first, so the per-group reducer
  * merges ≤ partitions·k candidate rows, never the group's full
  * distinct set — the gbHead trick). Sketches merge by construction:
  * the two-level rank IS "union mins, re-take k smallest".
  */
object Sketch {

  /** KMV estimate side-by-side with the exact distinct count, sharing
    * ONE distinct pass: the expensive part of both pipelines is
    * deduplicating the (group, value) stream (for q187's shingles, a
    * full explode + shuffle). Computing them independently runs that
    * explode+distinct twice; here the distinct frame is built once,
    * registered in the dedup LRU, and feeds the exact `count` and the
    * sketch (whose internal re-distinct then runs on the already-small
    * set of hashes). Both outputs are per-group aggregates, so the
    * final join is broadcast-sized.
    */
  def kmvWithExact(df: DataFrame, groupCols: Seq[String], value: Column,
                   k: Int): DataFrame = {
    val gs = groupCols.map(col)
    val distinctVals = Dedup.registryPersist(
      df.select(gs :+ value.as("__v"): _*).distinct())
    val exact = distinctVals.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_exact"))
    exact.join(kmvDistinct(distinctVals, groupCols, col("__v"), k), groupCols)
  }

  def kmvDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 3, "KMV needs k >= 3")
    val M = (1L << 60).toDouble // portableHash64 range
    val gs = groupCols.map(col)
    val hashes = df
      .select(gs :+ Dedup.portableHash64(value.cast("string")).as("__h"): _*)
      .distinct()
    val salted = Window.partitionBy(gs :+ col("__salt"): _*).orderBy(col("__h"))
    val full = Window.partitionBy(gs: _*).orderBy(col("__h"))
    hashes
      .withColumn("__salt", spark_partition_id())
      .withColumn("__r1", row_number().over(salted))
      .filter(col("__r1") <= k)
      .withColumn("__rn", row_number().over(full))
      .filter(col("__rn") <= k)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("__cnt"), max(col("__h")).as("__hk"))
      .select(gs ++ Seq(
        when(col("__cnt") < k, col("__cnt").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(M)
            / col("__hk").cast("double"), 4)).as("distinct_est"),
        col("__cnt").cast("long").as("sketch_size")): _*)
  }
}
