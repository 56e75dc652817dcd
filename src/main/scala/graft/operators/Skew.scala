package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper.
  *
  * AQE's skew-join splitting (enabled in RipSession) handles moderate
  * skew automatically; this manual salting transform is the escape hatch
  * for pathological hot keys (the classic web-scale pattern): the left
  * (large, skewed) side gets a random-ish salt derived deterministically
  * from a tiebreaker column, the right side is exploded ×saltFactor so
  * every (key, salt) bucket finds its match. One shuffle each side, hot
  * keys spread over `saltFactor` reducers.
  *
  * Riptable never needed this (single machine, `hint_size` at most —
  * `riptable/rt_merge.py:2309`); on a cluster it is the difference
  * between a straggler task and an even stage.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                 saltCol: String, saltFactor: Int = 8,
                 how: String = "inner"): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(col(saltCol)), lit(saltFactor)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, on :+ "__salt", how).drop("__salt")
  }
}
