package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Ema
import graft.streaming.StreamOps

/** Structured Streaming extensions (SURVEY §2.9: riptable has no
  * streaming; these are Spark-native capability additions). Batch
  * fixtures are replayed through the streaming engine with an
  * availableNow file source and checked against the batch operators.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_stream").toString
    // micro-batch-friendly replay: a small slice of synthetic events
    val ev = Seq(
      (1L, "2024-01-01 00:00:10", 1L, "click", 1.0),
      (2L, "2024-01-01 00:01:10", 1L, "click", 2.0),
      (3L, "2024-01-01 00:06:10", 1L, "view", 3.0),
      (4L, "2024-01-01 00:00:40", 2L, "click", 10.0),
      (5L, "2024-01-01 00:07:20", 2L, "view", 20.0)
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    ev.write.mode("overwrite").parquet(d + "/in")
    d
  }

  private def streamIn = {
    val schemaFrom = spark.read.parquet(dir + "/in")
    spark.readStream.schema(schemaFrom.schema).parquet(dir + "/in")
  }

  test("windowed aggregation over a replayed stream") {
    val q = StreamOps.windowedAgg(streamIn, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT event_type, sum(n) FROM win_agg GROUP BY 1")
      .as[(String, Long)].collect().toMap
    assert(out === Map("click" -> 3L, "view" -> 2L))
  }

  test("streaming EMA matches the batch Ema operator") {
    val q = StreamOps.streamingEma(streamIn, rate = 1e-8)
      .writeStream.format("memory").queryName("ema_stream")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT user_id, ts, ema FROM ema_stream")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap

    val batchIn = spark.read.parquet(dir + "/in")
      .select($"user_id", unix_micros($"ts").as("tsu"), $"value".cast("double"))
    val batch = Ema.ema(batchIn, "user_id", "tsu", "value", rate = 1e-8, Ema.Decay, "ema")
      .select($"user_id", $"tsu", $"ema")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap

    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (k, v) => assert(math.abs(v - batch(k)) < 1e-9, s"$k") }
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val dupDir = Files.createTempDirectory("graft_dedup").toString
    val ev = Seq(
      (1L, "2024-01-01 00:00:10", 1L, "click", 1.0),
      (1L, "2024-01-01 00:00:10", 1L, "click", 1.0), // exact duplicate
      (2L, "2024-01-01 00:01:10", 1L, "view", 2.0)
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    ev.write.mode("overwrite").parquet(dupDir + "/in")
    val src = spark.readStream.schema(spark.read.parquet(dupDir + "/in").schema)
      .parquet(dupDir + "/in")
    val q = src.withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT count(*) FROM dedup_stream").as[Long].head() === 2L)
  }

  test("streaming as-of join matches the batch as-of on a replayed batch") {
    val q = StreamOps.streamingAsof(streamIn, leftType = "click", rightType = "view")
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.sql("SELECT event_id, matched FROM asof_stream")
      .as[(Long, Option[Double])].collect().toMap

    val ev = spark.read.parquet(dir + "/in").withColumn("tsu", unix_micros($"ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"tsu", $"event_id")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"tsu", $"value".as("mv"))
    val batch = graft.operators.AsofJoin.asof(clicks, views, "tsu",
      Seq("user_id"), Seq("mv"))
      .select("event_id", "mv").as[(Long, Option[Double])].collect().toMap
    assert(streamed === batch)
  }

  test("session windows group events by gap") {
    val q = StreamOps.sessionAgg(streamIn, "3 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_agg")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // user 1: events at 0:10/1:10 (one session) and 6:10 (another);
    // user 2: 0:40 and 7:20 → two sessions. Total 4 sessions.
    assert(spark.sql("SELECT count(*) FROM sess_agg").as[Long].head() === 4L)
  }
}
