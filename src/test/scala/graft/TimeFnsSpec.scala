package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** TimeZone/Calendar pack vs riptable's contract (rt_timezone.py:1237,
  * rt_datetime.py:4572-4766): DST-aware wall conversion both directions,
  * per-instant offsets, strftime/to_iso formatting.
  */
class TimeFnsSpec extends SparkSpec {
  import spark.implicits._

  // UTC instants straddling the 2021 US DST transitions
  // (spring forward 2021-03-14 07:00 UTC, fall back 2021-11-07 06:00 UTC)
  private def ts = Seq(
    (1L, "2021-03-14 06:30:00"), // EST, 30 min before spring-forward
    (2L, "2021-03-14 07:30:00"), // EDT, 30 min after
    (3L, "2021-11-07 05:30:00"), // EDT, 30 min before fall-back
    (4L, "2021-11-07 06:30:00"), // EST, 30 min after
    (5L, "2021-07-01 12:34:56.123456")
  ).toDF("id", "s").select($"id", to_timestamp($"s").as("utc"))

  test("astimezone is DST-aware across both transitions") {
    val out = ts.select($"id",
      date_format(TimeFns.astimezone($"utc", "America/New_York"),
        "yyyy-MM-dd HH:mm").as("wall"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "2021-03-14 01:30") // UTC-5
    assert(out(2L) === "2021-03-14 03:30") // UTC-4 (02:30 never exists)
    assert(out(3L) === "2021-11-07 01:30") // UTC-4
    assert(out(4L) === "2021-11-07 01:30") // UTC-5 (01:30 repeats)
  }

  test("tzOffsetMinutes flips -300/-240 at the transition") {
    val out = ts.select($"id",
      TimeFns.tzOffsetMinutes($"utc", "America/New_York").as("off"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> -300L, 2L -> -240L, 3L -> -240L,
      4L -> -300L, 5L -> -240L))
  }

  test("setTimezone inverts astimezone on unambiguous instants") {
    val wall = ts.filter($"id" === 5)
      .select(TimeFns.astimezone($"utc", "Asia/Kolkata").as("w"))
    val back = wall.select(TimeFns.setTimezone($"w", "Asia/Kolkata").as("u"))
      .as[Timestamp].head()
    assert(back === Timestamp.valueOf("2021-07-01 12:34:56.123456"))
  }

  test("fixDstMicros shifts epoch micros by the per-instant offset") {
    val out = ts.select($"id",
      (TimeFns.fixDstMicros(unix_micros($"utc"), "America/New_York")
        - unix_micros($"utc")).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) === -300L * 60000000L)
    assert(out(2L) === -240L * 60000000L)
  }

  test("strftime and toIso render micros") {
    val out = ts.filter($"id" === 5).select(
      TimeFns.strftime($"utc", "MM/dd/yyyy").as("us"),
      TimeFns.toIso($"utc").as("iso")).as[(String, String)].head()
    assert(out === ("07/01/2021", "2021-07-01T12:34:56.123456"))
  }
}
