package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines — builder-brief
  * extension (riptable's own sampling is `FastArray.sample`,
  * `rt_fastarray.py:1827`, seeded RNG on one node).
  *
  * The split key is a PORTABLE hash of the id (md5-derived, see
  * `Dedup.portableHash64`), not an engine RNG: the same row lands in the
  * same split on any engine, any partitioning, any cluster size — the
  * property a 100 TB pipeline actually needs (repeatable splits across
  * reruns and engines, no seed-plumbing), and what makes the assignment
  * itself oracle-checkable. Scan-only: no shuffle, no state.
  */
object Split {

  /** Stable bucket in [0, buckets) for an id column. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(Dedup.portableHash64(id.cast("string")), lit(buckets.toLong))

  /** Seeded-sample compat shim (`FastArray.sample(N, seed)`
    * `riptable/rt_fastarray.py:1827`; `Date.random`/`random_invalid`
    * `rt_datetime.py:6041,6098`): the engine's sampling contract is
    * deterministic hash-rank selection, not RNG — so the "seed" folds
    * into the portable hash instead of seeding a generator. Same
    * (seed, id) → same keep/drop decision on any engine, partitioning,
    * or cluster size; different seeds → independent samples (md5
    * avalanche). Map-only, zero shuffle.
    */
  def sampleSeeded(df: DataFrame, idCol: String, frac: Double,
                   seed: Long): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac in [0, 1]")
    val m = 1073741824L // 2^30
    val u = pmod(Dedup.portableHash64(
      concat_ws(":", lit(seed.toString), col(idCol).cast("string"))),
      lit(m)).cast("double") / m.toDouble
    df.filter(u < lit(frac))
  }

  /** Exact-k variant of sampleSeeded — the `sample(N)` form. Hash-rank
    * top-k plans as TakeOrderedAndProject (per-partition partial top-k,
    * driver merges k·numPartitions candidates), never a global sort.
    */
  def sampleSeededK(df: DataFrame, idCol: String, k: Int,
                    seed: Long): DataFrame =
    df.withColumn("__rk", Dedup.portableHash64(
      concat_ws(":", lit(seed.toString), col(idCol).cast("string"))))
      .orderBy(col("__rk"), col(idCol))
      .limit(k)
      .drop("__rk")

  /** Add a `split` label: "train" for the first `trainPct` buckets of
    * 100, "test" for the rest.
    */
  def trainTest(df: DataFrame, idCol: String, trainPct: Int,
                out: String = "split"): DataFrame = {
    require(trainPct > 0 && trainPct < 100, "trainPct in (0, 100)")
    df.withColumn(out,
      when(hashBucket(col(idCol)) < trainPct, "train").otherwise("test"))
  }

  /** Leakage-safe train/test split: near-duplicate documents must land
    * on the SAME side of the cut — a per-doc hash split leaks content
    * from train into test through dup pairs, silently inflating eval
    * scores (the classic contamination trap in ML data prep). The
    * split unit is therefore the NEAR-DUP CLUSTER: connected
    * components over jaccard ≥ τ pairs, singleton docs as their own
    * cluster, then the deterministic hash-bucket split runs on
    * cluster_id, making every cluster atomic across the cut.
    *
    * Scale shape: the pair set and CC come from the shared dedup
    * machinery (banded candidates, registry-persisted shingle frames,
    * bounded-round large/small-star CC); the cluster-label frame is
    * bounded by docs-that-have-a-dup, left-joined back; the split
    * itself is a map-only hash.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       trainPct: Int, shingleN: Int = 3,
                       tau: Double = 0.5,
                       out: String = "split"): DataFrame = {
    require(trainPct > 0 && trainPct < 100, "trainPct in (0, 100)")
    val pairs = Dedup.jaccardPairs(docs, idCol, textCol, shingleN, tau)
      .select(col("id_a"), col("id_b"))
    val cc = Cluster.connectedComponents(pairs, "id_a", "id_b")
    docs.join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn(out,
        when(hashBucket(col("cluster_id")) < trainPct, "train")
          .otherwise("test"))
  }

  /** Deterministic k-per-group downsample: keep each group's k rows with
    * the smallest portable id hash (ties broken by id). The hash order
    * is a repeatable pseudo-random order, so this is stratified sampling
    * without an RNG — per-class balancing for training sets that
    * reproduces across engines and reruns. One shuffle on the group
    * keys, streaming rank.
    */
  def sampleKPerGroup(df: DataFrame, idCol: String, by: Seq[String],
                      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Dedup.portableHash64(col(idCol).cast("string"))
    val w = Window.partitionBy(by.map(col): _*).orderBy(h, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Weighted sampling without replacement, deterministic: Efraimidis–
    * Spirakis A-ES keys with the RNG replaced by the portable id hash.
    * u = (h mod 2³⁰ + 1) / (2³⁰ + 1) ∈ (0, 1], key = −ln(u)/w; the k
    * smallest keys win, so inclusion probability scales with weight,
    * and the same rows win on any engine/cluster/rerun. The rank orders
    * on the key ROUNDED to 9 decimals with the id as tiebreak — ln()
    * differs across engines only in the last ulp (~1e-16 relative),
    * far inside the rounding, so selection cannot flap at the boundary.
    * One top-k (TakeOrderedAndProject at the plan level) — no shuffle
    * of the full table, no RNG, no seed plumbing.
    *
    * Weights must be strictly positive; rows with w ≤ 0 or null are
    * excluded up front (w=0 would key to +Inf and never win, w<0 would
    * key negative and ALWAYS win — both nonsense inclusion semantics).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val m = 1073741824L // 2^30
    val u = (pmod(Dedup.portableHash64(col(idCol).cast("string")), lit(m)) + 1)
      .cast("double") / (m + 1).toDouble
    val key = round(-log(u) / col(weightCol), 9)
    // orderBy+limit → TakeOrderedAndProject: per-partition partial top-k,
    // driver merges k·numPartitions candidates — never a global sort
    df.filter(col(weightCol) > 0)
      .withColumn("__key", key)
      .orderBy(col("__key"), col(idCol))
      .limit(k)
      .drop("__key")
  }
}
