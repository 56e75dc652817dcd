package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / range joins: equi-keys plus a time-in-[start, end]
  * predicate. Riptable expresses these imperatively (mask + fancy
  * index); pipelines need them relationally (e.g. attach the session or
  * campaign window a record falls into).
  *
  * Scale shape: with equi-keys the plan is a hash/sort-merge join on the
  * keys with the range as a post-join filter — no nested-loop. Without
  * equi-keys a pure range join degenerates to a broadcast-nested-loop;
  * `bucketized` buckets the time axis so it becomes an equi-join on
  * (key, bucket): each left row probes only its bucket (intervals are
  * exploded over the buckets they span) — the standard interval-join
  * decomposition.
  */
object RangeJoin {

  /** Equi-key + range predicate join. */
  def intervalJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                   time: Column, start: Column, end: Column,
                   how: String = "inner"): DataFrame =
    left.join(right, on.map(c => left(c) === right(c)).reduce(_ && _) &&
      time >= start && time <= end, how)

  /** Bucketized range join for the keyless/low-key case: explode each
    * interval over the `bucketLen`-sized buckets it covers, equi-join on
    * the bucket, then re-apply the exact range predicate.
    */
  def bucketizedIntervalJoin(left: DataFrame, right: DataFrame,
                             timeCol: String, startCol: String, endCol: String,
                             bucketLen: Long): DataFrame = {
    val l = left.withColumn("__bucket", (col(timeCol) / bucketLen).cast("long"))
    val r = right.withColumn("__bucket",
      explode(sequence((col(startCol) / bucketLen).cast("long"),
        (col(endCol) / bucketLen).cast("long"))))
    l.join(r, Seq("__bucket"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("__bucket")
  }
}
