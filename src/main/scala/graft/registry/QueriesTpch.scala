package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.functions._
import graft.syntax._

/** Query registry — the TPC-H suite (multi-join analytics headliners).
  * One entry per SURVEY §2 operator family member; names pair 1:1 with
  * `OraclesTpch.m` (driver contract: SparkEntry.queries/oracleSql).
  */
private[graft] object QueriesTpch {
  import QueryShared._

  def m: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- TPC-H-shaped multi-join headliners ----

    "q86_tpch_q3" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01"))
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      li.join(ord, Seq("o_orderkey"))
        .join(broadcast(cust), Seq("o_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q87_tpch_q5" -> ((s, dir) => {
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey").as("n_regionkey"))
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("n_nationkey"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      li.join(ord, Seq("o_orderkey"))
        .join(cust, Seq("o_custkey"))
        .join(broadcast(nat.join(broadcast(reg), Seq("n_regionkey"))), Seq("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("n_name"))
    }),

    // TPC-H Q6 shape: pure filter-scan aggregate — every predicate must
    // reach the parquet scan (PushedFilters), zero joins, one partial+
    // final agg. The "is pushdown working" headliner.
    "q135_tpch_q6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01" &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
          .as("revenue"), count(lit(1)).as("n"))),

    // TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    // fact-to-fact join on orderkey, broadcast customer dimension,
    // TakeOrderedAndProject top-k (never a global sort)
    "q136_tpch_q10" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      li.join(ord, Seq("o_orderkey"))
        .join(broadcast(cust), Seq("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q21 shape (EXISTS + NOT EXISTS): suppliers whose line was
    // the ONLY late one on a multi-supplier order. Late = shipped > 90
    // days after the order date. Single-scan rewrite (r8 verdict #4 —
    // the semi+anti formulation recomputed lineitem⋈orders three
    // times): one per-(order, supplier) pre-aggregate, then one
    // per-order rollup computes |suppliers|, |late suppliers|, the sole
    // late supplier, and its late-line count — a waiting line is late
    // with ≥2 suppliers on the order and exactly 1 late supplier. No
    // expand (two plain aggregates instead of twin count-distincts),
    // keys stay on orderkey (no supplier skew); supplier dim broadcasts
    "q146_tpch_q21" -> ((s, dir) => {
      // all-count output — partition-invariant; flooring BOTH scans on
      // the orderkey makes the join and the per-order rollup below
      // reuse one hash partitioning end to end (r16, guide §2.4)
      val ord = Tables.floored(s, dir, "orders", "o_orderkey")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
      val le = Tables.floored(s, dir, "lineitem", "l_orderkey")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(ord, Seq("l_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
            .as("late"))
      // one shuffle for BOTH aggregates: hash-partitioning on
      // l_orderkey alone satisfies the (l_orderkey, l_suppkey) group
      // clustering too, so the per-order rollup below is exchange-free
      // (the default plan would shuffle on (o,s) and then AGAIN on o —
      // and (o,s) is near-unique here, so that first exchange moves
      // the full line count for zero reduction)
      val perSupp = le.repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("any_late"),
          count(when(col("late"), lit(1))).as("n_late_lines"))
      val waiting = perSupp.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("any_late"), lit(1)).otherwise(lit(0))).as("n_late_supp"),
          max(when(col("any_late"), col("l_suppkey"))).as("l_suppkey"),
          sum(when(col("any_late"), col("n_late_lines"))).as("n_late_lines"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .select(col("l_suppkey"), col("n_late_lines"))
      waiting
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))),
          Seq("l_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_late_lines")).cast("long").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(50)
    }),

    // TPC-H Q22 shape (NOT EXISTS headliner): above-average-balance
    // customers in chosen segments with no orders at all. The average
    // is a one-row broadcast; the anti-join keys on custkey against
    // the big orders side — the plan that must stay a hash/sort-merge
    // LeftAnti (never a nested loop) at 100 TB
    // sf-robust input (RegistrySweepSpec finding, r11): the synthetic
    // generator gives EVERY customer at least one order below sf0.1, so
    // the pristine Q22 anti-join compared empty-to-empty — a vacuous
    // oracle. Slice the orders side deterministically (o_custkey % 5
    // <> 0; the oracle constructs the identical slice) so order-less
    // customers exist at every scale factor. Plan shape is unchanged:
    // scalar-aggregate broadcast, then a left-anti join on custkey.
    "q147_tpch_q22" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("__ab"))
      val orders = t(s, dir, "orders")
        .filter(pmod(col("o_custkey"), lit(5)) =!= 0)
      cust.filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__ab"))
        .join(orders.select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // TPC-H Q17 shape (correlated scalar subquery): small-quantity
    // orders for one brand vs 0.2× that part's average quantity. The
    // decorrelated plan is the one that survives 100 TB: the broadcast
    // brand semi-join sits BELOW the per-part average (per-part means
    // are independent across parts, so pre-filtering to Brand#23 parts
    // leaves every surviving average unchanged while shrinking the
    // aggregate input ~25×); the avg is then ONE partial-aggregated
    // shuffle of (partkey, sum, count) over brand rows only
    "q153_tpch_q17" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val brandParts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
      val liBrand = li.join(broadcast(brandParts),
        col("l_partkey") === col("p_partkey"), "leftsemi")
      val avgQty = liBrand.groupBy(col("l_partkey"))
        .agg((avg(col("l_quantity")) * 0.2).as("__thresh"))
      liBrand.join(avgQty, Seq("l_partkey"))
        .filter(col("l_quantity") < col("__thresh"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q18 shape (large-volume orders, HAVING pushed to a
    // semi-filterable aggregate): sum lineitem qty per order FIRST (one
    // keyed shuffle, map-side combined), keep >300, then enrich with
    // orders + customer. The big-to-big join stays keyed on orderkey;
    // the qualifying set after HAVING is tiny → AQE broadcasts it
    "q154_tpch_q18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") >= 300)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q20 shape (nested semi-joins over an aggregated subquery;
    // no partsupp in the synthetic schema, so "availability" is the
    // 1997 shipped quantity per (part, supplier)): suppliers who
    // shipped >1.5× the per-part average of any 'red%' part. Both
    // aggregates key on partkey; the part-name filter broadcasts; the
    // final supplier lookup is a semi-join on a distinct-reduced set
    "q155_tpch_q20" -> ((s, dir) => {
      val shipped = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" &&
          col("l_shipdate") < "1998-01-01")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("sq"))
      val perPartAvg = shipped.groupBy(col("l_partkey"))
        .agg(avg(col("sq")).as("aq"))
      val redParts = t(s, dir, "part")
        .filter(col("p_name").like("red%")).select(col("p_partkey"))
      val excess = shipped
        .join(perPartAvg, Seq("l_partkey"))
        .filter(col("sq") > col("aq") * 1.5)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), round(col("s_acctbal"), 2).as("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // TPC-H Q2 shape (argmin-per-group correlated subquery): the
    // cheapest supplier of each small part — min(struct(bal, key)) is
    // a plain map-side-combined aggregate (deterministic ties via the
    // key tiebreak), NEVER a window over the fact; the part dim
    // broadcasts; supplier enrichment re-joins on the one-row-per-part
    // argmin result
    "q156_tpch_q2" -> ((s, dir) => {
      // the p_size<10 filter is on the GROUP KEY, so it commutes below
      // the distinct and the argmin aggregate: broadcast-semi-join the
      // surviving part keys onto lineitem FIRST, and the
      // (l_partkey, l_suppkey) distinct's shuffle carries only ~20% of
      // the pairs (the round-6 Q17 brand-semi-join move)
      val smallParts = t(s, dir, "part")
        .filter(col("p_size") < 10)
        .select(col("p_partkey"), col("p_name"))
      val supplied = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(smallParts.select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .distinct()
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_acctbal"))),
          Seq("l_suppkey"))
      val best = supplied.groupBy(col("l_partkey"))
        .agg(min(struct(col("s_acctbal"), col("l_suppkey"))).as("__m"))
        .select(col("l_partkey"),
          col("__m.s_acctbal").as("best_bal"),
          col("__m.l_suppkey").as("best_supp"))
      best
        .join(broadcast(smallParts),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("best_supp") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          round(col("best_bal"), 2).as("s_acctbal"))
        .orderBy(col("p_partkey"))
    }),

    // ---- round 6: the remaining TPC-H headliners ----
    // Adapted where the synthetic schema lacks columns (no partsupp, no
    // l_commitdate/l_receiptdate/l_shipmode, no p_container); each query
    // notes its substitution but keeps the canonical plan shape the
    // original demands at scale: broadcast dims, semi-joins before fat
    // aggregates, scalar one-row broadcasts, no fact-side windows.

    "q158_tpch_q4" -> ((s, dir) => {
      // Q4 order-priority check. "Late" = shipped >60 days after order
      // date (stands in for commitdate < receiptdate). EXISTS becomes a
      // leftsemi keyed on orderkey with the date predicate inside the
      // join condition — the fact side never expands.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01") &&
          col("o_orderdate") < lit("1996-10-01"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li, ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "leftsemi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    "q159_tpch_q7" -> ((s, dir) => {
      // Q7 volume shipping between two nations (3 and 18 — both carry
      // suppliers at every SF). Suppliers and nation names broadcast;
      // customers pre-filtered to the pair BEFORE their custkey shuffle,
      // so both fact joins run on already-reduced inputs.
      val natS = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name").as("supp_nation"))
      val natC = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name").as("cust_nation"))
      val supp = broadcast(t(s, dir, "supplier")
        .filter(col("s_nationkey").isin(3, 18))
        .join(natS, Seq("s_nationkey"))
        .select(col("s_suppkey").as("l_suppkey"), col("supp_nation")))
      val cust = t(s, dir, "customer")
        .filter(col("c_nationkey").isin(3, 18))
        .join(broadcast(natC), Seq("c_nationkey"))
        .select(col("c_custkey").as("o_custkey"), col("cust_nation"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey"),
          col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
      li.join(supp, Seq("l_suppkey"))
        .join(ord.join(cust, Seq("o_custkey")), Seq("o_orderkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_18") ||
          (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    "q160_tpch_q8" -> ((s, dir) => {
      // Q8 national market share: NATION_21's share of ECONOMY-part
      // volume sold into AMERICA, by order year. Part + supplier +
      // nation/region dims broadcast; the fact shuffles key on orderkey
      // then custkey, and the share is a CASE inside ONE aggregate.
      val part = broadcast(t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey").as("l_partkey")))
      val supp = broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")))
      val natR = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nationkey"))
      val cust = t(s, dir, "customer").join(broadcast(natR), Seq("c_nationkey"))
        .select(col("c_custkey").as("o_custkey"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(part, Seq("l_partkey")).join(supp, Seq("l_suppkey"))
        .join(ord, Seq("o_orderkey")).join(cust, Seq("o_custkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(when(col("s_nationkey") === 21, vol).otherwise(lit(0.0))) /
          sum(vol), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    "q161_tpch_q9" -> ((s, dir) => {
      // Q9 product-type profit. Supply cost ≈ 0.5 × p_retailprice (no
      // partsupp table). Profit per supplier-nation × order year over
      // '%red%' parts; part and supplier⨝nation broadcast, one orderkey
      // shuffle for the year column.
      val part = broadcast(t(s, dir, "part")
        .filter(col("p_name").contains("red"))
        .select(col("p_partkey").as("l_partkey"), col("p_retailprice")))
      val supp = broadcast(t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("l_suppkey"), col("n_name")))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"))
      li.join(part, Seq("l_partkey")).join(supp, Seq("l_suppkey"))
        .join(ord, Seq("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.5) * col("p_retailprice") * col("l_quantity")), 2).as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    "q162_tpch_q11" -> ((s, dir) => {
      // Q11 important stock, re-keyed to lineitem revenue (no partsupp):
      // parts whose revenue exceeds 1.2× the per-part average — a
      // scale-invariant threshold (a fixed fraction of the total would
      // degenerate as the part count grows). The average is a one-row
      // broadcast against the per-part aggregate (Q22's scalar shape),
      // never a single-partition shuffle.
      val li = t(s, dir, "lineitem")
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("value"))
      val thr = perPart.agg((avg(col("value")) * lit(1.2)).as("thr"))
      perPart.join(broadcast(thr))
        .filter(col("value") > col("thr"))
        .select(col("l_partkey"), round(col("value"), 2).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    "q163_tpch_q12" -> ((s, dir) => {
      // Q12 shipping modes: l_linestatus stands in for the absent
      // l_shipmode, "late" = shipped >90 days after order date. One
      // orderkey shuffle, priority split as CASE sums in one aggregate.
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_orderkey").as("o_orderkey"), col("l_linestatus"),
          col("l_shipdate"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(ord, Seq("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(hi, 1).otherwise(0)).cast("long").as("high_line_count"),
          sum(when(!hi, 1).otherwise(0)).cast("long").as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    "q164_tpch_q13" -> ((s, dir) => {
      // Q13 customer order-count distribution. Orders pre-aggregate per
      // custkey BEFORE touching customer (the left join and the count
      // share one custkey partitioning); the histogram re-agg input is
      // one row per customer and the output dictionary-sized.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val cust = t(s, dir, "customer").select(col("c_custkey").as("o_custkey"))
      cust.join(ord, Seq("o_custkey"), "left")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q165_tpch_q14" -> ((s, dir) => {
      // Q14 promo revenue share in one year: broadcast part dim, single
      // partial-aggregated scan, one row out.
      val part = broadcast(t(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_type")))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(part, Seq("l_partkey"))
        .agg(round(sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))) *
          100.0 / sum(vol), 6).as("promo_revenue"))
    }),

    "q166_tpch_q15" -> ((s, dir) => {
      // Q15 top supplier: quarterly revenue per supplier, keep the max.
      // Revenue is rounded BEFORE the max/equality compare on BOTH the
      // Spark and oracle side, so summation-order drift cannot split the
      // argmax; the max is a one-row broadcast, names a broadcast dim.
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
      val rev = li.groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_revenue"))
      val best = rev.agg(max(col("total_revenue")).as("best"))
      val supp = broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name")))
      rev.join(broadcast(best)).filter(col("total_revenue") === col("best"))
        .join(supp, Seq("l_suppkey"))
        .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
          col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    "q167_tpch_q16" -> ((s, dir) => {
      // Q16 supplier counts per part attribute. The part↔supplier
      // relation comes from lineitem (no partsupp); the NOT-conditions
      // mirror the original. Filtered part dim broadcast, one hash
      // aggregate with count_distinct.
      val part = broadcast(t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
        .select(col("p_partkey").as("l_partkey"), col("p_brand"),
          col("p_type"), col("p_size")))
      val li = t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      li.join(part, Seq("l_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    "q168_tpch_q19" -> ((s, dir) => {
      // Q19 discounted revenue: OR-of-ANDs over part attrs (p_size
      // bands stand in for p_container) and lineitem ranges. The whole
      // predicate sits in one broadcast-hash-join filter — the fact
      // table is never shuffled.
      val part = broadcast(t(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"), col("p_size")))
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"))
      li.join(part, Seq("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 40)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    }),

    // TPC-H Q22 shape (rich but INACTIVE customers, by nation): global
    // avg broadcasts as a one-row frame; the anti-join keys on custkey
    // against the date-filtered orders (never a NOT IN scan); output
    // grouped dictionary-sized. ("no orders since 2000" rather than
    // "no orders ever" — this generator gives every customer at least
    // one order, which would make the classic predicate degenerate.)
    "q219_tpch_q22" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("__avg"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= "2000-01-01")
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    })
  )
}
