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

  test("cutTime matches riptable searchsorted-left kernel at boundaries") {
    // rt_datetime.py:5149: buckets are (lo, hi] — a value exactly at the
    // session start is Filtered (searchsorted-left gives bin 0), a value
    // at the first cut point lands in bin 1, past end is Filtered
    import graft.functions.TimeFns
    val us = Seq(
      (1L, 34200000000L),  // 09:30:00 exactly -> Filtered (bin 0)
      (2L, 34200000001L),  // just after open  -> bin 1 "09:30"
      (3L, 36000000000L),  // 10:00:00 exactly -> bin 1 (right-closed)
      (4L, 36000000001L),  // just after       -> bin 2 "10:00"
      (5L, 58500000000L),  // 16:15:00 exactly -> bin 14 "16:00" (partial)
      (6L, 58500000001L),  // past close       -> Filtered
      (7L, 100L)           // pre-open         -> Filtered
    ).toDF("id", "usm")
    val (bin, label) = TimeFns.cutTime($"usm", (9, 30), (16, 15), 30)
    val out = us.select($"id", bin.as("b"), label.as("l"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) === (None, None))
    assert(out(2L) === (Some(1), Some("09:30")))
    assert(out(3L) === (Some(1), Some("09:30")))
    assert(out(4L) === (Some(2), Some("10:00")))
    assert(out(5L) === (Some(14), Some("16:00")))
    assert(out(6L) === (None, None))
    assert(out(7L) === (None, None))
  }

  test("cutTime pre/post buckets catch out-of-session rows; right labels") {
    import graft.functions.TimeFns
    val us = Seq((1L, 100L), (2L, 40000000000L), (3L, 80000000000L))
      .toDF("id", "usm")
    val (bin, label) = TimeFns.cutTime($"usm", (9, 30), (16, 15), 30,
      labelSide = "right", addPreBucket = true, addPostBucket = true)
    val out = us.select($"id", bin.as("b"), label.as("l"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.getString(2))).toMap
    assert(out(1L)._2 === "pre")
    assert(out(2L)._2 === "11:30")  // 40000s = 11:06:40 -> (11:00,11:30]
    assert(out(3L)._2 === "post")
  }

  test("BizCal shiftBday crosses a year-end holiday cluster like brute force") {
    import graft.functions.BizCal
    import java.time.LocalDate
    // dense cluster: Xmas Eve/Day (Thu/Fri), weekend, the 28th (Mon),
    // New Year's Eve (Thu) + New Year's Day (Fri), weekend
    val hols = Seq("1998-12-24", "1998-12-25", "1998-12-28",
      "1998-12-31", "1999-01-01")
    val cal = BizCal.calendarDim(spark, "1998-12-01", "1999-01-31", hols)
    val dates = Seq("1998-12-21", "1998-12-22", "1998-12-23", "1998-12-24",
      "1998-12-26", "1998-12-29", "1998-12-30", "1998-12-31")
    val df = dates.toDF("s").select($"s".cast("date").as("d"))
    val got = BizCal.shiftBday(df, "d", 2, cal, "d2")
      .select($"d".cast("string"), $"d2".cast("string"))
      .as[(String, String)].collect().toMap
    val holSet = hols.map(LocalDate.parse).toSet
    def isB(x: LocalDate) = x.getDayOfWeek.getValue <= 5 && !holSet(x)
    def nextB(x0: LocalDate) = { var x = x0; while (!isB(x)) x = x.plusDays(1); x }
    def shift(s: String, n: Int): String = {
      var c = nextB(LocalDate.parse(s))
      (1 to n).foreach(_ => c = nextB(c.plusDays(1)))
      c.toString
    }
    dates.foreach(d => assert(got(d) === shift(d, 2), s"shift($d, 2)"))
  }

  test("BizCal bdayDiff is a roll-forward index difference") {
    import graft.functions.BizCal
    val cal = BizCal.calendarDim(spark, "1998-12-01", "1999-01-31",
      Seq("1998-12-25", "1999-01-01"))
    val df = Seq(("1998-12-23", "1999-01-04")).toDF("a", "b")
      .select($"a".cast("date").as("a"), $"b".cast("date").as("b"))
    // biz days after 12-23 up to 01-04: 24, 28, 29, 30, 31, Jan 4 = 6
    // (25 hol, 26-27 wknd, Jan 1 hol, 2-3 wknd)
    val diff = BizCal.bdayDiff(df, "a", "b", cal, "n")
      .select($"n").as[Long].head()
    assert(diff === 6L)
    // symmetric: reversed direction is the negative
    val rev = BizCal.bdayDiff(df, "b", "a", cal, "n").select($"n").as[Long].head()
    assert(rev === -6L)
  }

  test("nanosecond grid: int64-ns arithmetic is exact; only the timestamp cast truncates") {
    // SURVEY §1.2's documented gap, pinned: riptable DateTimeNano is
    // int64 UTC nanos (rt_datetime.py:2718); Spark TimestampType is
    // micros. Contract: ns held AS LONG round-trips parquet and
    // supports exact accessor/diff/shift arithmetic; converting to
    // TimestampType truncates ns→micros (floor), and that is the ONLY
    // lossy edge.
    val base = 1704067200L * 1000000000L // 2024-01-01 00:00:00 UTC in ns
    // sub-microsecond digits deliberately non-zero
    val nanos = Seq(base + 123456789L, base + 999999999L,
      base + 86400L * 1000000000L + 1L, base, base + 1000L, base + 999L)
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    nanos.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "ts_ns").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).orderBy("id")

    // 1) parquet round-trip of int64 ns is exact
    assert(df.select($"ts_ns").as[Long].collect().toSeq === nanos)

    // 2) accessors computed on the long are exact at ns granularity
    val acc = df.select($"id", ($"ts_ns" % 1000000000L).as("ns_of_sec"),
      expr("ts_ns div 1000000000").as("epoch_s")).as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    nanos.zipWithIndex.foreach { case (n, i) =>
      assert(acc(i.toLong) === ((n % 1000000000L, n / 1000000000L)), s"row $i")
    }

    // 3) diff/shift on longs: exact (including the 1-ns resolution case)
    val d = df.select(($"ts_ns" + 1L - $"ts_ns").as("one")).as[Long].head()
    assert(d === 1L)

    // 4) THE lossy edge: long-ns → TimestampType floors to micros;
    //    round-tripping back yields ts_ns - (ts_ns % 1000), never more
    val rt = df.select($"ts_ns",
      unix_micros(timestamp_micros(expr("ts_ns div 1000"))).as("micros"))
      .as[(Long, Long)].collect()
    rt.foreach { case (ns, us) =>
      assert(us * 1000L === ns - (ns % 1000L), s"ns=$ns")
      assert(math.abs(ns - us * 1000L) < 1000L)
    }

    // 5) java.time ground truth for the calendar accessors reached via
    //    the micros cast (date parts are >> 1 µs, so the cast is safe
    //    for them — that's WHY the engine converts at query edges)
    val cal = df.select($"id",
      year(timestamp_micros(expr("ts_ns div 1000"))).as("y"),
      hour(timestamp_micros(expr("ts_ns div 1000"))).as("h"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    nanos.zipWithIndex.foreach { case (n, i) =>
      val t = java.time.Instant.ofEpochSecond(n / 1000000000L, n % 1000000000L)
        .atZone(java.time.ZoneOffset.UTC)
      assert(cal(i.toLong) === ((t.getYear, t.getHour)), s"row $i")
    }
  }
}
