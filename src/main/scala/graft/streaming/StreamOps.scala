package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the time-bucket operators.
  *
  * Riptable has NO streaming subsystem (SURVEY §2.9) — its "real-time"
  * story is re-running batch queries. These are Spark-native capability
  * extensions over the `events` schema: watermarked tumbling/sliding
  * window aggregation, session windows, and a stateful streaming EMA via
  * `flatMapGroupsWithState` (the streaming twin of operators.Ema).
  */
object StreamOps {

  /** Tumbling-window count/sum with late-data watermark. */
  def windowedAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Session windows per user (gap-based). */
  def sessionAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  final case class EmaState(ema: Double, lastTs: Long)
  final case class EmaOut(user_id: Long, ts: Long, value: Double, ema: Double)

  /** Streaming ema_decay (batch twin: graft.operators.Ema): per-key state
    * carries (ema, lastTs); each micro-batch folds its (sorted) rows in.
    */
  def streamingEma(events: DataFrame, rate: Double): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EmaState, EmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[EmaState]) =>
          var (ema, lastTs) = state.getOption.map(s => (s.ema, s.lastTs)).getOrElse((0.0, Long.MinValue))
          val out = rows.toSeq.sortBy(_._2).map { case (_, t, v) =>
            val w = if (lastTs == Long.MinValue) 0.0 else math.exp(-rate * (t - lastTs).toDouble)
            ema = v + ema * w
            lastTs = t
            EmaOut(uid, t, v, ema)
          }
          state.update(EmaState(ema, lastTs))
          out.iterator
      }.toDF()
  }

  /** File-source stream over a parquet directory (for tests: feed the
    * batch fixtures through the streaming engine via availableNow).
    */
  def eventsStream(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)
}
