package graft

/** DuckDB oracle SQL paired 1:1 with `QueriesCore.m` — relational core: projection/filter, joins, group-bys, accum, reshape, categorical, IO, scalar packs.
  * Column names/types mirror the Spark side exactly (driver hash gate).
  */
private[graft] object OraclesCore {
  import OracleSqlHelpers._
  import graft.functions.Stats

  def m: Map[String, String] = Map(

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount), 6) AS revenue
        |FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_join_inner" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS sum_price,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q4_join_outer" ->
      """WITH agg AS (
        |  SELECT l_orderkey AS o_orderkey, count(*) AS n_items
        |  FROM lineitem GROUP BY 1)
        |SELECT o.o_orderstatus, CASE
        |    WHEN o.o_orderkey IS NOT NULL AND a.o_orderkey IS NOT NULL THEN 'both'
        |    WHEN o.o_orderkey IS NOT NULL THEN 'left_only' ELSE 'right_only' END
        |    AS merge_indicator,
        |  count(*) AS n, CAST(sum(a.n_items) AS BIGINT) AS sum_items
        |FROM orders o FULL OUTER JOIN agg a USING (o_orderkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q5_merge_lookup" ->
      """SELECT n_name, count(*) AS n_cust, round(avg(c_acctbal), 6) AS avg_bal
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q6_ismember" ->
      """SELECT EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |    AS ismember, count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q7_gb_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(stddev_samp(l_discount), 6) AS std_disc,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q8_gb_firstlast" ->
      """SELECT o_orderpriority,
        |  arg_min(o_totalprice, o_orderkey) AS first_price,
        |  arg_max(o_totalprice, o_orderkey) AS last_price,
        |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_gb_transform" ->
      """SELECT o_orderkey, o_orderstatus,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus), 2) AS status_total,
        |  count(*) OVER (PARTITION BY o_orderstatus) AS status_n
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q84_multiq" ->
      """WITH q AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS qs
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, round(qs[1], 6) AS p25, round(qs[2], 6) AS p50,
        |  round(qs[3], 6) AS p75
        |FROM q ORDER BY 1""".stripMargin,

    "q19_cut" ->
      """WITH b AS (SELECT CASE
        |    WHEN l_quantity >= 0 AND l_quantity <= 10 THEN 1
        |    WHEN l_quantity > 10 AND l_quantity <= 20 THEN 2
        |    WHEN l_quantity > 20 AND l_quantity <= 30 THEN 3
        |    WHEN l_quantity > 30 AND l_quantity <= 40 THEN 4
        |    WHEN l_quantity > 40 AND l_quantity <= 50 THEN 5 END AS qty_bin,
        |  l_extendedprice FROM lineitem)
        |SELECT qty_bin, count(*) AS n, round(avg(l_extendedprice), 6) AS avg_price
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_qcut" ->
      """WITH q AS (SELECT o_totalprice,
        |  ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_q
        |  FROM orders)
        |SELECT price_q, count(*) AS n, round(min(o_totalprice), 6) AS lo,
        |  round(max(o_totalprice), 6) AS hi
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_hstack" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(NULL AS DOUBLE) AS l_extendedprice
        |FROM lineitem WHERE l_linestatus = 'O'
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q22_pivot" ->
      """SELECT c_mktsegment,
        |  count(*) FILTER (r_name = 'AFRICA') AS "AFRICA",
        |  count(*) FILTER (r_name = 'AMERICA') AS "AMERICA",
        |  count(*) FILTER (r_name = 'ASIA') AS "ASIA",
        |  count(*) FILTER (r_name = 'EUROPE') AS "EUROPE",
        |  count(*) FILTER (r_name = 'MIDDLE EAST') AS "MIDDLE_EAST"
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_melt" ->
      """SELECT l_orderkey, l_linenumber, k AS variable, v AS value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS k, l_quantity AS v
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount' AS k, l_discount AS v
        |  FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, variable""".stripMargin,

    "q24_dropdup" ->
      """SELECT l_orderkey, l_linenumber, round(l_quantity, 6) AS l_quantity
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_quantity, l_partkey) AS rn
        |  FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    "q25_onehot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q33_strict_agg" ->
      """WITH li AS (SELECT l_returnflag, l_linestatus,
        |  CASE WHEN l_quantity > 48 THEN NULL ELSE l_quantity END AS v FROM lineitem)
        |SELECT l_returnflag, l_linestatus,
        |  round(sum(v), 6) AS nansum_v,
        |  round(CASE WHEN count(v) = count(*) THEN sum(v) END, 6) AS sum_v,
        |  round(CASE WHEN count(v) = count(*) THEN avg(v) END, 6) AS mean_v,
        |  round(CASE WHEN count(v) = count(*) THEN max(v) END, 6) AS max_v
        |FROM li GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q34_trimbr" ->
      """WITH b AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.1) AS lo,
        |    quantile_cont(l_extendedprice, 0.9) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  round(avg(CASE WHEN l_extendedprice >= lo AND l_extendedprice <= hi
        |    THEN l_extendedprice END), 6) AS trimbr
        |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q35_ohlc" ->
      """SELECT event_type,
        |  round(arg_min(value, event_id), 6) AS open,
        |  round(max(value), 6) AS high,
        |  round(min(value), 6) AS low,
        |  round(arg_max(value, event_id), 6) AS close,
        |  round(stddev_samp(value) / sqrt(count(value)), 6) AS sem
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q36_mode_nth" ->
      """WITH m AS (SELECT l_returnflag, l_linestatus AS mode_status FROM (
        |    SELECT l_returnflag, l_linestatus, row_number() OVER (
        |      PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_linestatus) AS rk
        |    FROM lineitem GROUP BY 1, 2) WHERE rk = 1),
        | r AS (SELECT l_returnflag, l_orderkey, l_linenumber,
        |   row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY l_orderkey, l_linenumber, l_partkey) AS rn
        |   FROM lineitem)
        |SELECT r.l_returnflag, l_orderkey, l_linenumber, mode_status
        |FROM r JOIN m USING (l_returnflag) WHERE rn = 3 ORDER BY 1""".stripMargin,

    "q37_gb_headtail" ->
      """WITH h AS (SELECT o_orderstatus, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn
        |  FROM orders),
        | t AS (SELECT o_orderstatus, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT o_orderstatus, 'head' AS which, o_orderkey FROM h WHERE rn <= 2
        |UNION ALL
        |SELECT o_orderstatus, 'tail' AS which, o_orderkey FROM t WHERE rn <= 2
        |ORDER BY 1, 2, 3""".stripMargin,

    "q42_setops" ->
      """WITH wo AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
        | b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT c_custkey, 'intersect' AS op FROM (SELECT * FROM b INTERSECT SELECT * FROM wo)
        |UNION ALL
        |SELECT c_custkey, 'except' AS op FROM (SELECT * FROM b EXCEPT SELECT * FROM wo)
        |ORDER BY op, c_custkey""".stripMargin,

    "q43_describe" ->
      """SELECT count(l_quantity) AS n,
        |  round(avg(l_quantity), 6) AS mean,
        |  round(stddev_samp(l_quantity), 6) AS std,
        |  round(min(l_quantity), 6) AS mn,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        |  round(max(l_quantity), 6) AS mx
        |FROM lineitem""".stripMargin,

    "q44_normalize" ->
      """SELECT c_custkey,
        |  round((c_acctbal - avg(c_acctbal) OVER ()) / stddev_samp(c_acctbal) OVER (), 6) + 0.0 AS z,
        |  round((c_acctbal - min(c_acctbal) OVER ())
        |    / (max(c_acctbal) OVER () - min(c_acctbal) OVER ()), 6) AS mm
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q45_isin_where" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount >= 0.05 THEN 'hi' ELSE 'lo' END AS disc_class
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 20
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q46_astype_fill" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_int,
        |  round(coalesce(CASE WHEN l_discount < 0.02 THEN NULL
        |    ELSE l_extendedprice END, 0.0), 6) AS v_filled
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q49_multimodal" ->
      """SELECT doc_id, 'text/plain' AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, 8 AS n_features
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q50_pdataset" ->
      """SELECT epoch_ns(ts) // 86400000000000 AS p_date, event_type,
        |  count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q51_accum2_totals" ->
      """WITH j AS (SELECT c_mktsegment, r_name FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey),
        | base AS (SELECT c_mktsegment,
        |    count(*) FILTER (r_name = 'AFRICA') AS "AFRICA",
        |    count(*) FILTER (r_name = 'AMERICA') AS "AMERICA",
        |    count(*) FILTER (r_name = 'ASIA') AS "ASIA",
        |    count(*) FILTER (r_name = 'EUROPE') AS "EUROPE",
        |    count(*) FILTER (r_name = 'MIDDLE EAST') AS "MIDDLE_EAST",
        |    count(*) AS "Total"
        |  FROM j GROUP BY 1)
        |SELECT * FROM (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT 'Total', CAST(sum("AFRICA") AS BIGINT), CAST(sum("AMERICA") AS BIGINT),
        |    CAST(sum("ASIA") AS BIGINT), CAST(sum("EUROPE") AS BIGINT),
        |    CAST(sum("MIDDLE_EAST") AS BIGINT), CAST(sum("Total") AS BIGINT) FROM base)
        |ORDER BY c_mktsegment""".stripMargin,

    "q52_merge_keep" ->
      """WITH r AS (SELECT l_orderkey AS o_orderkey, l_linenumber, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber DESC, l_quantity DESC, l_partkey DESC) AS rn
        |  FROM lineitem)
        |SELECT o.o_orderkey, o.o_orderstatus, r.l_linenumber,
        |  round(r.l_quantity, 6) AS l_quantity
        |FROM orders o LEFT JOIN (SELECT * FROM r WHERE rn = 1) r USING (o_orderkey)
        |ORDER BY o.o_orderkey""".stripMargin,

    "q53_categorical" ->
      """WITH e AS (SELECT c_mktsegment,
        |    dense_rank() OVER (ORDER BY c_mktsegment) AS code FROM customer)
        |SELECT code, c_mktsegment, count(*) AS n
        |FROM e GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q54_udaf" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wmean_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q55_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) + 0.0 AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 6) + 0.0 AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) + 0.0 AS r2,
        |  round(corr(l_extendedprice, l_quantity), 6) + 0.0 AS corr,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q56_winsorize" ->
      """WITH b AS (SELECT quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi FROM orders)
        |SELECT round(avg(least(greatest(o_totalprice, lo), hi)), 6) AS wmean,
        |  round(min(least(greatest(o_totalprice, lo), hi)), 6) AS wmin,
        |  round(max(least(greatest(o_totalprice, lo), hi)), 6) AS wmax
        |FROM orders, b""".stripMargin,

    "q57_bincount" ->
      """SELECT l_linenumber, count(*) AS n,
        |  CAST(bit_count(CAST(l_linenumber AS BIGINT)) AS INTEGER) AS bits
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q60_multiset" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity), 6) AS sum_l_quantity,
        |  round(sum(l_discount), 6) AS sum_l_discount,
        |  round(avg(l_quantity), 6) AS mean_l_quantity,
        |  round(avg(l_discount), 6) AS mean_l_discount,
        |  round(min(l_quantity), 6) AS min_l_quantity,
        |  round(min(l_discount), 6) AS min_l_discount,
        |  round(max(l_quantity), 6) AS max_l_quantity,
        |  round(max(l_discount), 6) AS max_l_discount
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q62_ngroup" ->
      """WITH e AS (SELECT l_returnflag, l_linestatus,
        |    dense_rank() OVER (ORDER BY l_returnflag, l_linestatus) - 1 AS gid
        |  FROM lineitem)
        |SELECT gid, l_returnflag, l_linestatus, count(*) AS n
        |FROM e GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "q63_accum_ratio" ->
      """SELECT c_mktsegment,
        |  round(avg(c_acctbal) FILTER (r_name = 'AFRICA'), 6) AS "AFRICA",
        |  round(avg(c_acctbal) FILTER (r_name = 'AMERICA'), 6) AS "AMERICA",
        |  round(avg(c_acctbal) FILTER (r_name = 'ASIA'), 6) AS "ASIA",
        |  round(avg(c_acctbal) FILTER (r_name = 'EUROPE'), 6) AS "EUROPE",
        |  round(avg(c_acctbal) FILTER (r_name = 'MIDDLE EAST'), 6) AS "MIDDLE_EAST"
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q65_csv_roundtrip" ->
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 6) AS avg_price
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,

    "q66_parquet_partitioned" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q69_math" ->
      """SELECT c_custkey,
        |  round(abs(c_acctbal), 6) AS abs_bal,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
        |  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
        |  round(c_acctbal, 1) AS round1,
        |  CAST(sign(c_acctbal) AS INTEGER) AS sign_bal,
        |  round(sqrt(abs(c_acctbal)), 6) AS sqrt_bal,
        |  round(ln(greatest(abs(c_acctbal), 1.0)), 6) AS ln_bal,
        |  round(log10(greatest(abs(c_acctbal), 1.0)), 6) AS log10_bal,
        |  round(pow(c_acctbal, 2), 6) AS sq_bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q70_mbget" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(p_name, '__MISSING__') AS part_name
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q71_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q72_replace" ->
      """SELECT CASE l_returnflag WHEN 'N' THEN 'NONE' WHEN 'A' THEN 'ACCEPT'
        |    ELSE l_returnflag END AS l_returnflag,
        |  l_quantity IS NULL OR isnan(l_quantity) OR l_quantity = 0.0
        |    AS qty_nanorzero,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q78_product_gb" ->
      """SELECT l_returnflag,
        |  CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS mo,
        |  round(product(1.0 + l_discount / 10.0), 6) AS prod_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q79_qcut_scale" ->
      """WITH b AS (SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS qs
        |    FROM orders),
        | binned AS (SELECT o_totalprice,
        |    1 + CAST(o_totalprice > qs[1] AS INTEGER)
        |      + CAST(o_totalprice > qs[2] AS INTEGER)
        |      + CAST(o_totalprice > qs[3] AS INTEGER) AS price_q
        |  FROM orders, b)
        |SELECT price_q, count(*) AS n, round(min(o_totalprice), 6) AS lo,
        |  round(max(o_totalprice), 6) AS hi
        |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin,

    // CRC-32 from scratch: 256-entry table via 8 unrolled steps of the
    // reflected polynomial, then a per-string byte fold (part names are
    // ASCII, so ord(substr) == the UTF-8 byte Spark hashes).
    // 3988292384 = 0xEDB88320 (IEEE/zlib, Spark's crc32);
    // 2197175160 = 0x82F63B78 (Castagnoli, riptable's rc.CalculateCRC)
    "q94_crc32" -> crcOracle(3988292384L),

    "q112_crc32c" -> crcOracle(2197175160L),

    "q118_searchsorted" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  len(list_filter([5.0, 10.0, 20.0, 30.0, 40.0, 45.0],
        |    b -> b < l_quantity)) AS ss_left,
        |  len(list_filter([5.0, 10.0, 20.0, 30.0, 40.0, 45.0],
        |    b -> b <= l_quantity)) AS ss_right
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "q95_putmask" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(CASE WHEN l_discount >= 0.08 THEN 25.0 ELSE l_quantity END, 6)
        |    AS qty_masked
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q96_pivot_noagg" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity) FILTER (l_linestatus = 'F'), 4) AS "F",
        |  round(sum(l_quantity) FILTER (l_linestatus = 'O'), 4) AS "O"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q97_cat_isin" ->
      """SELECT n_nationkey, n_name,
        |  n_name IN ('CHINA', 'INDIA', 'FRANCE') AS isin
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // fromCodes decode replay: base-1 list indexing, code 0 = Filtered
    // (null label), out-of-range (6) normalized to 0
    "q263_cat_from_codes" ->
      """SELECT c_custkey,
        |  CAST(CASE WHEN c_custkey % 7 BETWEEN 1 AND 5
        |    THEN c_custkey % 7 ELSE 0 END AS INT) AS tier_code,
        |  CASE WHEN c_custkey % 7 BETWEEN 1 AND 5
        |    THEN (['bronze', 'silver', 'gold', 'platinum', 'diamond'])
        |      [CAST(c_custkey % 7 AS INT)] END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q98_gb_filter" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity) FILTER (l_discount > 0.05), 4) AS qty_hi_disc,
        |  count(l_quantity) FILTER (l_discount > 0.05) AS n_hi_disc,
        |  round(avg(l_extendedprice) FILTER (l_tax < 0.03), 6) AS avg_price_lo_tax
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q99_apply_groups" ->
      """SELECT l_returnflag, CAST(rn AS INT) AS rnk, l_extendedprice, l_orderkey
        |FROM (SELECT l_returnflag, l_extendedprice, l_orderkey,
        |  row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rnk""".stripMargin,

    "q100_concat_cols" ->
      """WITH a AS (SELECT n_name, row_number() OVER (ORDER BY n_name) AS rn
        |    FROM nation),
        |  b AS (SELECT r_name, row_number() OVER (ORDER BY r_name) AS rn
        |    FROM region)
        |SELECT a.n_name, b.r_name FROM a FULL OUTER JOIN b USING (rn)
        |ORDER BY n_name""".stripMargin,

    "q102_accum2_filtered" ->
      """WITH lab AS (SELECT
        |    CASE WHEN o_totalprice < 20000 THEN 'Filtered'
        |      ELSE o_orderpriority END AS o_orderpriority,
        |    o_orderstatus AS st FROM orders),
        |  body AS (SELECT o_orderpriority,
        |    count(*) FILTER (st = 'F') AS f,
        |    count(*) FILTER (st = 'O') AS o,
        |    count(*) FILTER (st = 'P') AS p
        |  FROM lab GROUP BY 1),
        |  tot AS (SELECT o_orderpriority, f, o, p, f + o + p AS total FROM body
        |    UNION ALL
        |    SELECT 'Total', sum(f), sum(o), sum(p), sum(f + o + p) FROM body)
        |SELECT o_orderpriority, CAST(f AS BIGINT) AS "F",
        |  CAST(o AS BIGINT) AS "O", CAST(p AS BIGINT) AS "P",
        |  CAST(total AS BIGINT) AS "Total"
        |FROM tot ORDER BY o_orderpriority""".stripMargin,

    "q103_imatrix" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity AS im_0, l_extendedprice AS im_1, l_discount AS im_2,
        |  round(l_quantity + l_extendedprice + l_discount, 6) AS rowsum
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q106_ismember_idx" ->
      """WITH pos AS (SELECT o_custkey,
        |    row_number() OVER (ORDER BY o_orderkey) - 1 AS rn FROM orders),
        |idx AS (SELECT o_custkey, CAST(min(rn) AS BIGINT) AS ismember_index
        |  FROM pos GROUP BY 1)
        |SELECT c_custkey AS o_custkey,
        |  idx.o_custkey IS NOT NULL AS ismember, ismember_index
        |FROM customer LEFT JOIN idx ON c_custkey = idx.o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q109_accum2_footers" ->
      """WITH body AS (SELECT o_orderpriority AS pr,
        |    CAST(count(*) FILTER (o_orderstatus = 'F') AS DOUBLE) AS f,
        |    CAST(count(*) FILTER (o_orderstatus = 'O') AS DOUBLE) AS o,
        |    CAST(count(*) FILTER (o_orderstatus = 'P') AS DOUBLE) AS p
        |  FROM orders GROUP BY 1),
        |allr AS (SELECT pr, f, o, p FROM body
        |  UNION ALL SELECT 'Total', sum(f), sum(o), sum(p) FROM body
        |  UNION ALL SELECT 'Mean', avg(f), avg(o), avg(p) FROM body)
        |SELECT pr AS o_orderpriority, round(f, 6) AS "F",
        |  round(o, 6) AS "O", round(p, 6) AS "P"
        |FROM allr ORDER BY o_orderpriority""".stripMargin,

    // identical two-pass centered-moment Cramer solve, spelled with
    // explicit products (pow() could diverge in the last ulp)
    "q124_polyfit" ->
      """WITH m AS (SELECT l_returnflag, avg(l_quantity) AS xbar
        |  FROM lineitem GROUP BY 1),
        |mo AS (SELECT l.l_returnflag, m.xbar,
        |    CAST(count(*) AS DOUBLE) AS s0,
        |    sum(l_quantity - xbar) AS s1,
        |    sum((l_quantity - xbar) * (l_quantity - xbar)) AS s2,
        |    sum((l_quantity - xbar) * (l_quantity - xbar) * (l_quantity - xbar)) AS s3,
        |    sum((l_quantity - xbar) * (l_quantity - xbar) * (l_quantity - xbar) * (l_quantity - xbar)) AS s4,
        |    sum(l_extendedprice) AS t0,
        |    sum(l_extendedprice * (l_quantity - xbar)) AS t1,
        |    sum(l_extendedprice * (l_quantity - xbar) * (l_quantity - xbar)) AS t2
        |  FROM lineitem l JOIN m USING (l_returnflag)
        |  GROUP BY 1, 2)
        |SELECT l_returnflag, round(xbar, 6) AS xbar,
        |  round((t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2))
        |    / (s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)), 4) + 0.0 AS c0,
        |  round((s0*(t1*s4 - t2*s3) - t0*(s1*s4 - s2*s3) + s2*(s1*t2 - s2*t1))
        |    / (s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)), 4) + 0.0 AS c1,
        |  round((s0*(s2*t2 - s3*t1) - s1*(s1*t2 - s2*t1) + t0*(s1*s3 - s2*s2))
        |    / (s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)), 4) + 0.0 AS c2,
        |  CAST(s0 AS BIGINT) AS n
        |FROM mo ORDER BY 1""".stripMargin,

    // degree-3 mirror: the moment CTE spells the centered power sums
    // with explicit left-assoc products (matching Spark's Column
    // chains), then evaluates graft's OWN Cramer solve text — shared
    // SQL, so the per-group solve cannot diverge between engines
    "q233_polyfit_deg3" -> {
      val sols = graft.functions.Stats.polyFitSolveSql(3)
      s"""WITH m AS (SELECT l_returnflag,
         |    avg(CAST(l_quantity AS DOUBLE)) AS xbar
         |  FROM lineitem GROUP BY 1),
         |h AS (SELECT l.l_returnflag, m.xbar,
         |    CAST(l_quantity AS DOUBLE) - m.xbar AS cx,
         |    CAST(l_extendedprice AS DOUBLE) AS yy
         |  FROM lineitem l JOIN m USING (l_returnflag)),
         |mo AS (SELECT l_returnflag, xbar,
         |    CAST(count(*) AS DOUBLE) AS s0,
         |    sum(cx) AS s1, sum(cx*cx) AS s2, sum(cx*cx*cx) AS s3,
         |    sum(cx*cx*cx*cx) AS s4, sum(cx*cx*cx*cx*cx) AS s5,
         |    sum(cx*cx*cx*cx*cx*cx) AS s6,
         |    sum(yy) AS t0, sum(yy * cx) AS t1,
         |    sum(yy * (cx*cx)) AS t2, sum(yy * (cx*cx*cx)) AS t3
         |  FROM h GROUP BY 1, 2)
         |SELECT l_returnflag, round(xbar, 6) AS xbar,
         |  round(${sols(0)}, 4) + 0.0 AS c0,
         |  round(${sols(1)}, 4) + 0.0 AS c1,
         |  round(${sols(2)}, 4) + 0.0 AS c2,
         |  round(${sols(3)}, 4) + 0.0 AS c3,
         |  CAST(s0 AS BIGINT) AS n
         |FROM mo ORDER BY 1""".stripMargin
    },

    "q126_class_error" ->
      """SELECT l_returnflag,
        |  round(avg(CASE WHEN (CASE WHEN l_extendedprice > 30000 THEN 'hi' ELSE 'lo' END)
        |    <> (CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END)
        |    THEN 1.0 ELSE 0.0 END), 6) AS class_error,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q127_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "q134_linear_spline" -> {
      val sols = Stats.spline2SolveSql
      s"""WITH h AS (SELECT l_returnflag,
         |    CAST(l_quantity AS DOUBLE) AS x,
         |    CAST(l_extendedprice AS DOUBLE) AS y,
         |    greatest(CAST(l_quantity AS DOUBLE) - 20.0, 0.0) AS h1,
         |    greatest(CAST(l_quantity AS DOUBLE) - 35.0, 0.0) AS h2
         |  FROM lineitem),
         |a AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS s0,
         |    sum(x) AS sx, sum(h1) AS sh1, sum(h2) AS sh2,
         |    sum(x*x) AS sxx, sum(x*h1) AS sxh1, sum(x*h2) AS sxh2,
         |    sum(h1*h1) AS sh1h1, sum(h1*h2) AS sh1h2, sum(h2*h2) AS sh2h2,
         |    sum(y) AS vy, sum(x*y) AS vxy, sum(h1*y) AS vh1y,
         |    sum(h2*y) AS vh2y
         |  FROM h GROUP BY 1)
         |SELECT l_returnflag, round(${sols(0)}, 4) AS c0,
         |  round(${sols(1)}, 4) AS c1, round(${sols(2)}, 4) AS c2,
         |  round(${sols(3)}, 4) AS c3, CAST(s0 AS BIGINT) AS n
         |FROM a ORDER BY 1""".stripMargin
    },

    "q143_showfilter" ->
      """SELECT CASE WHEN l_quantity > 45 THEN NULL ELSE l_returnflag END AS k,
        |  count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "q144_bool_to_fancy" ->
      """WITH pos AS (SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderkey) - 1 AS position
        |  FROM orders)
        |SELECT o_orderkey, CAST(position AS BIGINT) AS position
        |FROM pos WHERE o_totalprice > 400000 ORDER BY position""".stripMargin,

    "q139_accum_ratiop" ->
      """WITH body AS (SELECT c_mktsegment,
        |    CAST(count(*) FILTER (r_name = 'AFRICA') AS DOUBLE) AS af,
        |    CAST(count(*) FILTER (r_name = 'AMERICA') AS DOUBLE) AS am,
        |    CAST(count(*) FILTER (r_name = 'ASIA') AS DOUBLE) AS asi,
        |    CAST(count(*) FILTER (r_name = 'EUROPE') AS DOUBLE) AS eu,
        |    CAST(count(*) FILTER (r_name = 'MIDDLE EAST') AS DOUBLE) AS me
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1),
        |tot AS (SELECT sum(af + am + asi + eu + me) AS grand FROM body)
        |SELECT c_mktsegment,
        |  round(af * 100.0 / grand, 6) AS "AFRICA",
        |  round(am * 100.0 / grand, 6) AS "AMERICA",
        |  round(asi * 100.0 / grand, 6) AS "ASIA",
        |  round(eu * 100.0 / grand, 6) AS "EUROPE",
        |  round(me * 100.0 / grand, 6) AS "MIDDLE_EAST"
        |FROM body, tot ORDER BY 1""".stripMargin,

    "q148_accum_cols" ->
      """WITH g AS (
        |  SELECT l_returnflag AS k, sum(l_quantity) AS sq,
        |    sum(l_extendedprice) AS sp, count(l_extendedprice) AS cp,
        |    sum(l_extendedprice * l_discount) AS sn, sum(l_extendedprice) AS sd,
        |    sum(CASE WHEN l_quantity > 25 THEN l_quantity END) AS hq
        |  FROM lineitem GROUP BY 1
        |  UNION ALL
        |  SELECT 'Total', sum(l_quantity), sum(l_extendedprice),
        |    count(l_extendedprice), sum(l_extendedprice * l_discount),
        |    sum(l_extendedprice),
        |    sum(CASE WHEN l_quantity > 25 THEN l_quantity END)
        |  FROM lineitem),
        |tot AS (SELECT sum(l_quantity) AS tq FROM lineitem)
        |SELECT k AS l_returnflag, round(sq, 4) AS sum_qty,
        |  round(sp / cp, 6) AS avg_price,
        |  round(sn / sd, 6) AS disc_ratio,
        |  round(sq * 100.0 / tot.tq, 6) AS qty_pct,
        |  round(hq, 4) AS hi_qty_sum
        |FROM g, tot ORDER BY 1""".stripMargin,

    "q149_apply_batch" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q150_merge_indices" ->
      """WITH li AS (SELECT o_custkey,
        |    row_number() OVER (ORDER BY o_orderkey) - 1 AS left_index
        |  FROM orders),
        |ri AS (SELECT c_custkey,
        |    row_number() OVER (ORDER BY c_custkey) - 1 AS right_index
        |  FROM customer)
        |SELECT li.left_index, ri.right_index
        |FROM li JOIN ri ON li.o_custkey = ri.c_custkey
        |ORDER BY left_index, right_index""".stripMargin,

    "q152_merge_cats" ->
      """WITH s1 AS (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0),
        |s2 AS (SELECT n_nationkey, n_name FROM nation
        |  WHERE n_regionkey IN (1, 2)),
        |allrows AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
        |u AS (SELECT n_name, row_number() OVER (ORDER BY n_name) AS code
        |  FROM (SELECT DISTINCT n_name FROM allrows))
        |SELECT b.n_nationkey, b.n_name, u.code
        |FROM allrows b JOIN u USING (n_name)
        |ORDER BY n_nationkey""".stripMargin,

    // cascade mirror: member-wise rounding over the multi-func agg,
    // flattened names matching GroupOps.aggMulti's f_col convention
    "q211_multiset_cascade" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity), 2) AS sum_l_quantity,
        |  round(sum(l_extendedprice), 2) AS sum_l_extendedprice,
        |  round(avg(l_quantity), 2) AS mean_l_quantity,
        |  round(avg(l_extendedprice), 2) AS mean_l_extendedprice
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // capped per-group id materialization mirror: the 50 smallest ids
    // (content-checked via md5 of the joined list), exact size,
    // truncation flag
    "q221_groups" ->
      """WITH r AS (SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source ORDER BY doc_id) AS rn FROM documents),
        |g AS (SELECT source,
        |    list(doc_id ORDER BY doc_id) FILTER (WHERE rn <= 50) AS ids,
        |    count(*) AS n_rows FROM r GROUP BY 1)
        |SELECT source, md5(array_to_string(ids, ',')) AS ids_md5,
        |  CAST(len(ids) AS INT) AS n_ids, n_rows, n_rows > 50 AS truncated
        |FROM g ORDER BY source""".stripMargin
  )
}
