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
}
