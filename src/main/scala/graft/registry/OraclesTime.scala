package graft

/** DuckDB oracle SQL paired 1:1 with `QueriesTime.m` — window / ordered / time-series: rolling, EMA, as-of, cumulative, calendar.
  * Column names/types mirror the Spark side exactly (driver hash gate).
  */
private[graft] object OraclesTime {
  import OracleSqlHelpers._

  def m: Map[String, String] = Map(

    "q10_rolling" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER w, 6) AS roll_sum,
        |  round(avg(value) OVER w, 6) AS roll_mean
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q266_rolling_chunked" ->
      """SELECT event_id, user_id,
        |  round(sum(coalesce(value, 0)) OVER w, 6) AS roll_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q270_rolling_chunked_var" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |    floor(coalesce(value, 0)) AS v FROM events),
        |s AS (SELECT event_id, user_id,
        |    sum(v) OVER w AS s1, sum(v * v) OVER w AS s2,
        |    count(*) OVER w AS cnt
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  round(CASE WHEN cnt >= 2
        |    THEN greatest((s2 - s1 * s1 / cnt) / (cnt - 1.0), 0.0) END, 6)
        |    AS roll_var,
        |  round(CASE WHEN cnt >= 2
        |    THEN sqrt(greatest((s2 - s1 * s1 / cnt) / (cnt - 1.0), 0.0)) END, 6)
        |    AS roll_std
        |FROM s ORDER BY event_id""".stripMargin,

    "q273_rolling_quantile_chunked" ->
      """SELECT event_id, user_id,
        |  round(quantile_cont(coalesce(value, 0), 0.5) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS roll_med
        |FROM events ORDER BY event_id""".stripMargin,

    "q11_cumsum" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER w, 6) AS cum_value,
        |  (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)) - 1 AS cum_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q12_shift_diff" ->
      """SELECT event_id, user_id,
        |  round(lag(value, 1) OVER w, 6) AS prev_value,
        |  round(value - lag(value, 1) OVER w, 6) + 0.0 AS dvalue
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q13_ffill" ->
      """SELECT event_id, user_id,
        |  round(last_value(CASE WHEN value < 10.0 THEN NULL ELSE value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled
        |FROM events ORDER BY event_id""".stripMargin,

    "q14_rank" ->
      """SELECT event_id, user_id,
        |  rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rnk
        |FROM events ORDER BY event_id""".stripMargin,

    "q15_asof_backward" ->
      """WITH c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id
        |           FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, round(p.value, 6) AS purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsu >= p.tsu
        |ORDER BY c.event_id""".stripMargin,

    "q83_asof_exec" ->
      """WITH c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id
        |           FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, round(p.value, 6) AS purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsu >= p.tsu
        |ORDER BY c.event_id""".stripMargin,

    "q85_interval_join" ->
      """SELECT l_orderkey AS o_orderkey, l_linenumber
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,

    "q16_asof_forward" ->
      """WITH c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id
        |           FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, round(p.value, 6) AS purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.tsu <= p.tsu
        |ORDER BY c.event_id""".stripMargin,

    "q17_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom, dayofweek(o_orderdate) + 1 AS dow,
        |  dayofyear(o_orderdate) AS doy,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  year(o_orderdate) * 10000 + month(o_orderdate) * 100
        |    + day(o_orderdate) AS yyyymmdd
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q38_ema_decay" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, tsu, value, value AS ema
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.tsu, n.value,
        |    n.value + s.ema * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu))
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, round(ema, 6) AS ema
        |FROM s ORDER BY event_id""".stripMargin,

    // identical to q38's sequential recursion — the chunk decomposition
    // must be invisible (q266's oracle design applied to EMA)
    "q272_ema_chunked" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, tsu, value, value AS ema
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.tsu, n.value,
        |    n.value + s.ema * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu))
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, round(ema, 6) AS ema
        |FROM s ORDER BY event_id""".stripMargin,

    "q75_ema_window" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, tsu, value, value AS ema
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.tsu, n.value,
        |    n.value + s.ema * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu))
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, round(ema, 6) AS ema
        |FROM s ORDER BY event_id""".stripMargin,

    "q80_ema_normal" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, tsu, value,
        |    value AS num, CAST(1.0 AS DOUBLE) AS den
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.tsu, n.value,
        |    n.value + s.num * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu)),
        |    1.0 + s.den * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu))
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, round(num / den, 6) AS ema
        |FROM s ORDER BY event_id""".stripMargin,

    // identical to q80's sequential recursion — the doubled-carry
    // chunk decomposition must be invisible (q272's oracle design
    // applied to ema_normal)
    "q275_ema_normal_chunked" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, tsu, value,
        |    value AS num, CAST(1.0 AS DOUBLE) AS den
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.tsu, n.value,
        |    n.value + s.num * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu)),
        |    1.0 + s.den * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu))
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, round(num / den, 6) AS ema
        |FROM s ORDER BY event_id""".stripMargin,

    // identical to q110's sequential filter/reset recursion — the
    // chunk decomposition with reset gates must be invisible
    "q276_ema_filtered_chunked" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    CASE WHEN event_type = 'click' THEN value ELSE 0 END AS contrib,
        |    (event_type = 'click' AND value > 95) AS rst,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, tsu, contrib AS ema
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.tsu,
        |    n.contrib + CASE WHEN n.rst THEN 0 ELSE
        |      s.ema * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu)) END
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, round(ema, 6) AS ema
        |FROM s ORDER BY event_id""".stripMargin,

    // the normalized twin: den counts 1 per row regardless of the
    // filter; an effective reset restarts BOTH accumulators (num =
    // contrib, den = 1 at the reset row)
    "q277_ema_normal_filtered_chunked" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    CASE WHEN event_type = 'click' THEN value ELSE 0 END AS contrib,
        |    (event_type = 'click' AND value > 95) AS rst,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, tsu,
        |    contrib AS num, CAST(1.0 AS DOUBLE) AS den
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.tsu,
        |    CASE WHEN n.rst THEN n.contrib ELSE n.contrib +
        |      s.num * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu)) END,
        |    CASE WHEN n.rst THEN 1.0 ELSE 1.0 +
        |      s.den * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu)) END
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, round(num / den, 6) AS ema
        |FROM s ORDER BY event_id""".stripMargin,

    "q81_ema_weighted" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, value, value AS ema
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.value,
        |    0.25 * n.value + 0.75 * s.ema
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, ema
        |FROM s ORDER BY event_id""".stripMargin,

    "q77_asof_nearest" -> nearestAsofOracle,

    // native-exec nearest: same semantics, same oracle (q92 routes
    // through AsofJoinExec instead of the union+window formulation)
    "q92_asof_exec_nearest" -> nearestAsofOracle,

    "q39_timewindow" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY tsu
        |    RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 6) AS tw_sum
        |FROM (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events)
        |ORDER BY event_id""".stripMargin,

    // plain RANGE window SQL — the signed-event-stream chunk
    // decomposition must be bit-invisible (values floored to
    // integer-valued doubles, so the subtractive cumsum is exact)
    "q274_timewindow_chunked" ->
      """SELECT event_id, user_id,
        |  round(sum(v) OVER (PARTITION BY user_id ORDER BY tsu
        |    RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 6) AS tw_sum
        |FROM (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |        CAST(floor(coalesce(value, 0)) AS DOUBLE) AS v
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    "q40_resample" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 300 * 300 AS bucket,
        |  event_type, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q41_time_of_day" ->
      """SELECT event_id,
        |  hour(CAST(ts AS TIMESTAMP)) AS hr,
        |  minute(CAST(ts AS TIMESTAMP)) AS mi,
        |  second(CAST(ts AS TIMESTAMP)) AS se,
        |  epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 AS us_since_midnight
        |FROM events ORDER BY event_id""".stripMargin,

    "q58_transitions" ->
      """WITH w AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |  count(*) FILTER (prev IS NOT NULL AND prev <> event_type) AS n_trans
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q59_shift_cat" ->
      """SELECT event_id, user_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS shifted
        |FROM events ORDER BY event_id""".stripMargin,

    "q61_rolling_quantile" ->
      """SELECT event_id, user_id,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
        |    AS roll_med
        |FROM events ORDER BY event_id""".stripMargin,

    "q64_interp" ->
      """WITH q AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id
        |    FROM events WHERE event_type = 'click'),
        |  p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value
        |    FROM events WHERE event_type = 'view'),
        |  bk AS (SELECT q.event_id, q.user_id, q.tsu, p.tsu AS x0, p.value AS y0
        |    FROM q ASOF LEFT JOIN p ON q.user_id = p.user_id AND q.tsu >= p.tsu),
        |  fw AS (SELECT q.event_id, p.tsu AS x1, p.value AS y1
        |    FROM q ASOF LEFT JOIN p ON q.user_id = p.user_id AND q.tsu <= p.tsu)
        |SELECT bk.event_id, bk.user_id,
        |  round(CASE WHEN x0 IS NULL THEN y1
        |    WHEN x1 IS NULL THEN y0
        |    WHEN x1 = x0 THEN y0
        |    ELSE y0 + (y1 - y0) * (bk.tsu - x0) / (x1 - x0) END, 6) AS iv
        |FROM bk JOIN fw ON bk.event_id = fw.event_id
        |ORDER BY bk.event_id""".stripMargin,

    "q68_datetime2" ->
      """SELECT o_orderkey,
        |  dayofweek(o_orderdate) IN (0, 6) AS is_weekend,
        |  CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |    AS INTEGER) AS days_since_epoch,
        |  (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0)
        |    OR year(o_orderdate) % 400 = 0 AS is_leapyear,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
        |  quarter(o_orderdate) AS qtr,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS woy
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q73_daterange" ->
      """SELECT o_orderkey,
        |  unnest(generate_series(o_orderdate, o_orderdate + INTERVAL 3 DAY,
        |    INTERVAL 1 DAY)) AS d
        |FROM orders WHERE o_orderkey <= 5
        |ORDER BY o_orderkey, d""".stripMargin,

    "q74_move_arg" ->
      """SELECT event_id, user_id,
        |  arg_max(event_id, CAST(round(value * 1000) AS BIGINT) * 100000000
        |    + event_id) OVER w AS arg_max_ev,
        |  round(max(value) OVER w, 6) AS move_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q76_timewindow_prod" ->
      """SELECT event_id, user_id,
        |  round(product(1.0 + value / 10000.0) OVER (PARTITION BY user_id
        |    ORDER BY tsu RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 6)
        |    AS twp
        |FROM (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events)
        |ORDER BY event_id""".stripMargin,

    // round 3: TimeZone pack. `timezone('UTC', naive)` pins the
    // naive→instant interpretation to UTC so the oracle is independent
    // of the DuckDB session TimeZone; `timezone(tz, instant)` then
    // yields the tz wall clock (PostgreSQL AT TIME ZONE semantics).
    "q88_astimezone" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS utc FROM events)
        |SELECT event_id,
        |  timezone('America/New_York', timezone('UTC', utc)) AS ny_wall,
        |  CAST(hour(timezone('America/New_York', timezone('UTC', utc))) AS BIGINT)
        |    AS ny_hour,
        |  timezone('Asia/Kolkata', timezone('UTC', utc)) AS kolkata_wall,
        |  strftime(utc, '%Y-%m-%dT%H:%M:%S.%f') AS iso
        |FROM e ORDER BY event_id""".stripMargin,

    "q89_strftime" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS s_full,
        |  strftime(o_orderdate, '%m/%d/%Y') AS s_us,
        |  strftime(o_orderdate, '%j') AS s_doy,
        |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') AS s_iso
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q90_fix_dst" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS utc
        |  FROM orders)
        |SELECT o_orderkey,
        |  epoch_us(timezone('America/New_York', timezone('UTC', utc)))
        |    AS ny_micros,
        |  CAST((epoch_us(timezone('America/New_York', timezone('UTC', utc)))
        |    - epoch_us(utc)) // 60000000 AS BIGINT) AS ny_off_min,
        |  CAST((epoch_us(timezone('Europe/London', timezone('UTC', utc)))
        |    - epoch_us(utc)) // 60000000 AS BIGINT) AS lon_off_min,
        |  timezone('UTC', timezone('America/New_York', utc)) AS utc_of_ny_wall
        |FROM o ORDER BY o_orderkey""".stripMargin,

    "q93_interp_extrap" ->
      """WITH q AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id
        |    FROM events WHERE event_type = 'click'),
        |  p0 AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value
        |    FROM events WHERE event_type = 'view'),
        |  p AS (SELECT user_id, tsu, value,
        |    lead(tsu) OVER w AS nx, lead(value) OVER w AS ny,
        |    lag(tsu) OVER w AS px, lag(value) OVER w AS py
        |    FROM p0 WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
        |  bk AS (SELECT q.event_id, q.user_id, q.tsu,
        |    p.tsu AS x0, p.value AS y0, p.px, p.py
        |    FROM q ASOF LEFT JOIN p ON q.user_id = p.user_id AND q.tsu >= p.tsu),
        |  fw AS (SELECT q.event_id, p.tsu AS x1, p.value AS y1, p.nx, p.ny
        |    FROM q ASOF LEFT JOIN p ON q.user_id = p.user_id AND q.tsu <= p.tsu)
        |SELECT bk.event_id, bk.user_id,
        |  round(CASE
        |    WHEN x0 IS NULL AND x1 IS NULL THEN NULL
        |    WHEN x0 IS NULL THEN CASE WHEN nx IS NULL THEN y1
        |      ELSE y1 + (ny - y1) * (bk.tsu - x1) / (nx - x1) END
        |    WHEN x1 IS NULL THEN CASE WHEN px IS NULL THEN y0
        |      ELSE y0 + (y0 - py) * (bk.tsu - x0) / (x0 - px) END
        |    WHEN x1 = x0 THEN y0
        |    ELSE y0 + (y1 - y0) * (bk.tsu - x0) / (x1 - x0) END, 6) AS iv
        |FROM bk JOIN fw ON bk.event_id = fw.event_id
        |ORDER BY bk.event_id""".stripMargin,

    // cut_time mirror: searchsorted-left over the same 15 cut points
    // (9:30–16:15 by 30 min + partial last bucket), bin 0 / past-end →
    // NULL, left-endpoint labels by 1-based list index
    "q117_cut_time" ->
      """WITH e AS (SELECT event_id,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000) AS usm
        |  FROM events),
        |b AS (SELECT event_id, len(list_filter(
        |    [34200000000, 36000000000, 37800000000, 39600000000,
        |     41400000000, 43200000000, 45000000000, 46800000000,
        |     48600000000, 50400000000, 52200000000, 54000000000,
        |     55800000000, 57600000000, 58500000000],
        |    p -> p < usm)) AS raw FROM e)
        |SELECT event_id,
        |  CASE WHEN raw BETWEEN 1 AND 14 THEN CAST(raw AS BIGINT) END
        |    AS tod_bin,
        |  CASE WHEN raw BETWEEN 1 AND 14 THEN
        |    ['09:30','10:00','10:30','11:00','11:30','12:00','12:30',
        |     '13:00','13:30','14:00','14:30','15:00','15:30','16:00'][raw]
        |    END AS tod_label
        |FROM b ORDER BY event_id""".stripMargin,

    "q101_rankdata" ->
      """SELECT l_orderkey, l_linenumber,
        |  rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |    + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
        |    AS rnk
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q104_cumprod" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(product(1.0 + l_tax) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
        |      l_extendedprice, l_discount, l_tax
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cp
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q105_ffill_limit" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'purchase' THEN value END AS v
        |  FROM events),
        |w1 AS (SELECT *, row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM e),
        |w2 AS (SELECT event_id, user_id, v, rn,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY rn
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |    max(CASE WHEN v IS NOT NULL THEN rn END) OVER
        |      (PARTITION BY user_id ORDER BY rn
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastnn
        |  FROM w1)
        |SELECT event_id, user_id,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN rn - lastnn <= 2 THEN filled END, 6) AS v
        |FROM w2 ORDER BY event_id""".stripMargin,

    "q110_ema_filtered" ->
      """WITH RECURSIVE numbered AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    CASE WHEN event_type = 'click' THEN value ELSE 0 END AS contrib,
        |    (event_type = 'click' AND value > 95) AS rst,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, rn, tsu, contrib AS ema
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.user_id, n.event_id, n.rn, n.tsu,
        |    n.contrib + CASE WHEN n.rst THEN 0 ELSE
        |      s.ema * exp(-1.6666666666666667e-9 * (n.tsu - s.tsu)) END
        |  FROM numbered n JOIN s ON n.user_id = s.user_id AND n.rn = s.rn + 1)
        |SELECT event_id, user_id, round(ema, 6) AS ema
        |FROM s ORDER BY event_id""".stripMargin,

    "q107_strptime" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS utc FROM events)
        |SELECT event_id,
        |  strptime(strftime(utc, '%Y-%m-%d %H:%M:%S'),
        |    '%Y-%m-%d %H:%M:%S') AS parsed,
        |  CAST(year(utc) * 10000 + month(utc) * 100 + day(utc) AS INT)
        |    AS yyyymmdd,
        |  epoch_us(utc) - epoch_us(date_trunc('day', utc)) AS tsm_us
        |FROM e ORDER BY event_id""".stripMargin,

    "q123_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
        |b AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |    OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nb
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(sum(nb) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_seq FROM b)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  round(sum(value), 6) AS total_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q125_rolling_corr" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
        |    CAST(json_extract(props, '$.k') AS DOUBLE) AS k FROM events)
        |SELECT user_id, event_id,
        |  CASE WHEN row_number() OVER w >= 20
        |    THEN round(corr(value, k) OVER
        |      (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) + 0.0
        |  END AS c_win
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q138_dt_diff" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT user_id, event_id, ts_us,
        |  lag(ts_us) OVER w AS prev_us,
        |  ts_us - lag(ts_us) OVER w AS gap_us
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q145_bday_shift" ->
      """WITH days AS (
        |  SELECT CAST(unnest(generate_series(DATE '1995-01-01',
        |    DATE '2002-12-31', INTERVAL 1 DAY)) AS DATE) AS d),
        |flags AS (
        |  SELECT d, (dayofweek(d) NOT IN (0, 6) AND
        |    strftime(d, '%m-%d') NOT IN ('01-01','07-04','12-25','12-26')) AS is_b
        |  FROM days),
        |idx AS (
        |  SELECT d, is_b,
        |    SUM(CASE WHEN is_b THEN 1 ELSE 0 END) OVER (ORDER BY d) AS bidx
        |  FROM flags),
        |r AS (SELECT d, bidx + CASE WHEN is_b THEN 0 ELSE 1 END AS rfi FROM idx),
        |bd AS (SELECT bidx AS ti, d AS td FROM idx WHERE is_b),
        |a AS (SELECT rfi AS ai FROM r WHERE d = DATE '1998-06-01')
        |SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS od,
        |  nb.td AS next_b, s5.td AS shift5,
        |  CAST(ro.rfi - a.ai AS BIGINT) AS bdiff
        |FROM orders o
        |JOIN r ro ON CAST(o.o_orderdate AS DATE) = ro.d
        |JOIN bd nb ON nb.ti = ro.rfi
        |JOIN bd s5 ON s5.ti = ro.rfi + 5
        |CROSS JOIN a
        |ORDER BY o_orderkey""".stripMargin,

    "q151_partition2" ->
      """WITH t AS (SELECT l_extendedprice AS v,
        |    l_orderkey * 100 + l_linenumber AS tb FROM lineitem),
        |p AS (SELECT v, tb FROM t ORDER BY v, tb LIMIT 1 OFFSET 999)
        |SELECT count(*) AS n, round(sum(t.v), 4) AS sv
        |FROM t, p
        |WHERE t.v < p.v OR (t.v = p.v AND t.tb <= p.tb)""".stripMargin,

    "q157_nanos" ->
      """SELECT event_id,
        |  epoch_ns(ts) AS ts_ns,
        |  epoch_ns(ts) % 1000000000 AS ns_of_sec,
        |  epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS diff_ns,
        |  epoch_ns(ts) + 86400000000000 AS ts_plus_day_ns
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // stacked-load mirror: the slices recompute from the base table by
    // the same parity split the engine wrote
    "q236_stacked_load" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END
        |    AS slice,
        |  count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  round(sum(o_totalprice), 2) AS price_sum
        |FROM orders GROUP BY 1 ORDER BY slice""".stripMargin,

    // issorted mirror: each probe recomputes the monotonicity verdict
    // with a window lag over the SAME deterministic order and the SAME
    // double-cast compare as Rolling.issorted (bool_and skips the
    // first row's null lag)
    "q235_issorted" -> {
      def probe(name: String, order: String, v: String) =
        s"""SELECT '$name' AS probe, coalesce(bool_and(ok), TRUE)
           |    AS is_sorted FROM (
           |  SELECT $v >= lag($v) OVER (ORDER BY $order) AS ok
           |  FROM events)""".stripMargin
      Seq(
        probe("by_event_id__ts", "event_id",
          "CAST(epoch_ns(ts) AS DOUBLE)"),
        probe("by_event_id__value", "event_id", "CAST(value AS DOUBLE)"),
        probe("by_ts_event_id__ts", "ts, event_id",
          "CAST(epoch_ns(ts) AS DOUBLE)"),
        probe("by_value_event_id__value", "value, event_id",
          "CAST(value AS DOUBLE)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY probe")
    },

    // the five rank methods on the same coarse key; max-tie rank is
    // count(*) over the ordered window's default RANGE frame (peers
    // in-frame), exactly the engine's formulation
    "q248_rank_methods" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(floor(value) AS BIGINT) AS vb FROM events)
        |SELECT event_id, user_id,
        |  CAST(rank() OVER wv AS BIGINT) AS r_min,
        |  CAST(dense_rank() OVER wv AS BIGINT) AS r_dense,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY vb
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS r_max,
        |  round(percent_rank() OVER wv, 6) AS r_pct,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY vb, event_id) AS BIGINT) AS r_ordinal
        |FROM e
        |WINDOW wv AS (PARTITION BY user_id ORDER BY vb)
        |ORDER BY event_id""".stripMargin
  )
}
