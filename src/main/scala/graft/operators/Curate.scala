package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines (builder-brief
  * extension): deterministic source mixing, sequential sequence packing,
  * and filter-funnel accounting. All deterministic (portable-hash
  * ordering, no RNG) so results reproduce across engines and cluster
  * sizes, and every step is one scan + one bounded shuffle.
  */
object Curate {

  /** Deterministic corpus mixing: sample to target source proportions.
    * Each source `s` keeps its `floor(k · w_s)` docs with the smallest
    * portable id hash (ties by id) — the per-source budget of a global
    * sample of size ~k under mixture weights `w`. The weights table is
    * tiny → broadcast; ranking is one shuffle on the source key.
    */
  def mixSample(df: DataFrame, idCol: String, sourceCol: String,
                weights: Map[String, Double], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = weights.toSeq.map { case (s, w) =>
      (s, math.floor(k * w).toLong)
    }.toDF(sourceCol, "__budget")
    val h = Dedup.portableHash64(col(idCol).cast("string"))
    val w = Window.partitionBy(col(sourceCol)).orderBy(h, col(idCol))
    df.join(broadcast(budgets), Seq(sourceCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__budget"))
      .drop("__rn", "__budget")
  }

  /** Budget-quantized sequential packing: assign docs (in a fixed order
    * per `by` group) to training sequences of ~`budget` tokens each:
    * pack_id = ⌊exclusive-prefix-sum(tokens) / budget⌋. This is the
    * map-side streaming approximation of greedy bin packing — documents
    * can straddle a boundary (they'd be truncated/continued by the
    * loader), which is exactly what sequential packers in LLM data
    * loaders do. One window cumsum per group — a single shuffle on the
    * group key, no iteration.
    */
  def packSequences(df: DataFrame, by: Seq[String], order: Seq[Column],
                    tokenCol: String, budget: Long,
                    out: String = "pack_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn(out, floor((col("__cum") - col(tokenCol)) / budget))
      .drop("__cum")
  }

  /** Filter-funnel accounting: per group, the row count surviving each
    * named stage predicate and the intersection of all stages — the
    * "where did my corpus go" report, as ONE map-side-combined aggregate
    * (conditional sums), not one pass per stage.
    */
  def funnel(df: DataFrame, by: Seq[String],
             stages: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_total") +:
      (stages.map { case (name, pred) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"n_$name")
      } :+ sum(when(stages.map(_._2).reduce(_ && _), 1L).otherwise(0L))
        .as("n_all"))
    df.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
