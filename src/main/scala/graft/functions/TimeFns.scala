package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TimeZone / Calendar surface — riptable keeps instants as UTC nanos and
  * converts to a display/wall zone on demand.
  *
  * Reference: `riptable/rt_timezone.py:1237` (fix_dst), `:1294` (to_utc),
  * `riptable/rt_datetime.py:4717` (astimezone), `:4666` (set_timezone),
  * `:4572` (strftime), `:4766` (to_iso).
  *
  * Spark-first mapping: instants live as `TimestampType` (UTC micros;
  * nanos-as-long inputs convert with `timestamp_micros(ns div 1000)`), and
  * every conversion is a codegen'd built-in — `from_utc_timestamp` /
  * `to_utc_timestamp` / `date_format` — so the whole pack stays inside
  * whole-stage codegen with zero UDFs and is a pure per-row map at any
  * scale (no shuffle, no state). DST transitions come from the JVM tz
  * database, same source riptable's `TimeZone` tables are generated from.
  */
object TimeFns {

  /** astimezone (`rt_datetime.py:4717`): UTC instant → wall clock in `tz`.
    * The result renders as the tz-local wall time (DST-aware).
    */
  def astimezone(ts: Column, tz: String): Column = from_utc_timestamp(ts, tz)

  /** set_timezone / from-wall construction (`rt_datetime.py:4666`):
    * reinterpret a wall-clock reading recorded in `tz` as a UTC instant.
    */
  def setTimezone(wall: Column, tz: String): Column = to_utc_timestamp(wall, tz)

  /** fix_dst (`rt_timezone.py:1237`): UTC epoch micros → wall-clock epoch
    * micros in `tz` (riptable applies the same shift to UTC nanos). The
    * offset is instant-dependent — DST is handled per row.
    */
  def fixDstMicros(utcMicros: Column, tz: String): Column =
    unix_micros(from_utc_timestamp(timestamp_micros(utcMicros), tz))

  /** UTC offset of `tz` at each instant, in whole minutes (e.g. New York
    * is −300 in winter, −240 under DST).
    */
  def tzOffsetMinutes(ts: Column, tz: String): Column =
    ((unix_micros(from_utc_timestamp(ts, tz)) - unix_micros(ts)) / 60000000L)
      .cast("long")

  /** strftime (`rt_datetime.py:4572`) — Spark datetime pattern dialect. */
  def strftime(ts: Column, fmt: String): Column = date_format(ts, fmt)

  /** to_iso (`rt_datetime.py:4766`): ISO-8601 with microsecond precision
    * (riptable emits nanos; Spark timestamps carry micros).
    */
  def toIso(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** cut_time (`rt_datetime.py:5149`): bucket by time-of-day only, dates
    * ignored. Cut points are built from (start, end, bucketSize) exactly
    * like the reference — full-width buckets from start, plus a final
    * partial bucket ending at end — and binning follows its
    * `searchsorted(points, nsm)` kernel: buckets are (lo, hi], a value at
    * or before the first point or after the last is Filtered (null here,
    * bin 0 there). Labels are the bucket's left or right endpoint
    * formatted per `labelFmt`; optional pre/post buckets catch the
    * out-of-range rows instead of filtering them.
    *
    * Returns (binExpr, labelExpr) over a since-midnight column in `unit`
    * micros or nanos. Pure unrolled comparison chain + a literal label
    * array lookup → whole-stage codegen, no shuffle, no state: a per-row
    * map at any scale.
    */
  def cutTime(sinceMidnight: Column,
              start: (Int, Int), end: (Int, Int), bucketMinutes: Int,
              labelSide: String = "left", labelFmt: String = "HH:mm",
              addPreBucket: Boolean = false, addPostBucket: Boolean = false,
              unit: String = "micros"): (Column, Column) = {
    require(labelSide == "left" || labelSide == "right",
      s"label must be left|right, got $labelSide")
    val perSec: Long = unit match {
      case "micros" => 1000000L
      case "nanos"  => 1000000000L
      case u => throw new IllegalArgumentException(s"unit must be micros|nanos, got $u")
    }
    def toUnits(hm: (Int, Int)): Long = (hm._1 * 3600L + hm._2 * 60L) * perSec
    val step = bucketMinutes * 60L * perSec
    val core = (toUnits(start) until toUnits(end) by step) :+ toUnits(end)
    val points = (if (addPreBucket) Seq(0L) else Nil) ++ core ++
      (if (addPostBucket) Seq(24L * 3600L * perSec) else Nil)
    val fmt = java.time.format.DateTimeFormatter.ofPattern(labelFmt)
    def lbl(p: Long): String = {
      // the 24:00 post point wraps to 00:00 — its label is overwritten
      // with "post" below, so the formatted value is never shown
      val nanos = p / perSec * 1000000000L + p % perSec * (1000000000L / perSec)
      java.time.LocalTime.ofNanoOfDay(nanos % 86400000000000L).format(fmt)
    }
    val endpoints = if (labelSide == "left") points.init else points.tail
    val labels = endpoints.map(lbl).toArray
    if (addPreBucket) labels(0) = "pre"
    if (addPostBucket) labels(labels.length - 1) = "post"
    // searchsorted-left bin: count of points strictly below the value;
    // 0 (at/before first point) and > #buckets (past last point) → Filtered.
    val raw = points.foldLeft(lit(0)) { (acc, p) =>
      acc + when(lit(p) < sinceMidnight, 1).otherwise(0)
    }
    val bin = when(raw.between(1, labels.length), raw)
    val label = element_at(array(labels.map(lit).toSeq: _*), bin)
    (bin, label)
  }
}
