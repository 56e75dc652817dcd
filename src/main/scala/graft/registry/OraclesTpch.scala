package graft

/** DuckDB oracle SQL paired 1:1 with `QueriesTpch.m` — the TPC-H suite (multi-join analytics headliners).
  * Column names/types mirror the Spark side exactly (driver hash gate).
  */
private[graft] object OraclesTpch {
  import OracleSqlHelpers._

  def m: Map[String, String] = Map(

    "q86_tpch_q3" ->
      """SELECT l_orderkey AS o_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q87_tpch_q5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q135_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q136_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q146_tpch_q21" ->
      """WITH le AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT s.s_name, count(*) AS numwait
        |FROM le l1
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |WHERE l1.late
        |  AND EXISTS (SELECT 1 FROM le l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM le l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.late)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 50""".stripMargin,

    "q147_tpch_q22" ->
      """WITH ab AS (SELECT avg(c_acctbal) AS v FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer c, ab
        |WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  AND c.c_acctbal > ab.v
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey % 5 <> 0 AND o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q153_tpch_q17" ->
      """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#23'
        |  AND l.l_quantity < (
        |    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    "q154_tpch_q18" ->
      """SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        |  big.sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) >= 300) big
        |JOIN orders o ON o.o_orderkey = big.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey
        |LIMIT 100""".stripMargin,

    "q155_tpch_q20" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
        |  FROM lineitem
        |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |  GROUP BY 1, 2),
        |ppa AS (SELECT l_partkey, avg(sq) AS aq FROM shipped GROUP BY 1)
        |SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
        |FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT sh.l_suppkey
        |  FROM shipped sh
        |  JOIN ppa ON ppa.l_partkey = sh.l_partkey
        |  WHERE sh.sq > ppa.aq * 1.5
        |    AND sh.l_partkey IN (SELECT p_partkey FROM part
        |      WHERE p_name LIKE 'red%'))
        |ORDER BY s.s_name""".stripMargin,

    "q156_tpch_q2" ->
      """WITH supplied AS (
        |  SELECT DISTINCT l.l_partkey, l.l_suppkey, s.s_acctbal
        |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey),
        |best AS (
        |  SELECT l_partkey, l_suppkey, s_acctbal,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY s_acctbal, l_suppkey) AS rn
        |  FROM supplied)
        |SELECT p.p_partkey, p.p_name, s.s_name,
        |  round(b.s_acctbal, 2) AS s_acctbal
        |FROM best b
        |JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size < 10
        |JOIN supplier s ON s.s_suppkey = b.l_suppkey
        |WHERE b.rn = 1
        |ORDER BY p.p_partkey""".stripMargin,

    "q158_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q159_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_18')
        |   OR (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q160_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(sum(CASE WHEN s_nationkey = 21
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |    / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q161_tpch_q9" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(sum(l_extendedprice * (1 - l_discount)
        |    - 0.5 * p_retailprice * l_quantity), 2) AS sum_profit
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,

    "q162_tpch_q11" ->
      """SELECT l_partkey, round(value, 2) AS value FROM (
        |  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
        |  FROM lineitem GROUP BY 1)
        |WHERE value > 1.2 * (SELECT avg(v) FROM (
        |  SELECT sum(l_extendedprice * (1 - l_discount)) AS v
        |  FROM lineitem GROUP BY l_partkey))
        |ORDER BY value DESC, l_partkey""".stripMargin,

    "q163_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q164_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '5-LOW'
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q165_tpch_q14" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,

    "q166_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS s_suppkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM rev r JOIN supplier s ON r.s_suppkey = s.s_suppkey
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,

    "q167_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1,5,9,14,19,23,36,45)
        |GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, 1, 2, 3""".stripMargin,

    "q168_tpch_q19" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q219_tpch_q22" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
        |  count(*) AS numcust, round(sum(c.c_acctbal), 2) AS totacctbal
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |    WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
