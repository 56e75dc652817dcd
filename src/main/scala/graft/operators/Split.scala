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
}
