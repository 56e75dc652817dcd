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

  /** Add a `split` label: "train" for the first `trainPct` buckets of
    * 100, "test" for the rest.
    */
  def trainTest(df: DataFrame, idCol: String, trainPct: Int,
                out: String = "split"): DataFrame = {
    require(trainPct > 0 && trainPct < 100, "trainPct in (0, 100)")
    df.withColumn(out,
      when(hashBucket(col(idCol)) < trainPct, "train").otherwise("test"))
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
}
