package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 surface widening: the remaining TPC-H query shapes expressible
  * on the slim synthetic schema (no partsupp / commitdate / shipmode
  * columns — those queries are adapted to equivalent plan shapes, noted
  * per query). Together with Q1/Q3/Q5/Q6/Q10 from Relational/Extended2
  * this gives the engine the full classic decision-support plan zoo:
  * EXISTS/NOT-EXISTS (semi/anti) correlation, outer-join-then-reaggregate,
  * scalar-subquery thresholds, disjunctive join predicates, groupwise
  * maxima, and multi-dimension fact-to-dim star joins.
  *
  * Scale notes (100 TB): nation/region are fixed-cardinality (25/5) and
  * always broadcast; part/supplier/customer scale with SF so they get NO
  * hint — AQE picks broadcast at small SF and shuffle-hash/sort-merge at
  * large. Every correlated predicate is expressed as a semi/anti join on
  * the fact key, so candidate generation is one key-partitioned shuffle,
  * never a per-row subquery. Threshold aggregates (Q15 max, Q17 per-part
  * avg, Q22 global avg) are separate small aggregates joined back —
  * Catalyst plans the singleton ones as broadcast nested loops.
  */
object TpchExtra {

  private def vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val queries: Map[String, Relational.Q] = Map(

    // ── Q4 shape: priority count of orders with at least one late-shipped
    // line (EXISTS → left-semi on the order key; the reference schema has
    // no commitdate, so "late" = shipped >30 days after the order). ─────
    "sql_q4_priority" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .where(to_date(col("o_orderdate")).between("1996-01-01", "1996-12-31"))
      val l = Tables(s, dir, "lineitem")
      o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
          to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 30),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // ── Q7 shape: bilateral trade volume between two regions by ship
    // year (nation-level in stock TPC-H; region-level here so the small
    // SFs are non-empty). nation/region broadcast on both legs. The
    // disjunctive pair predicate (ASIA,EUROPE)|(EUROPE,ASIA) IMPLIES
    // r_name IN ('ASIA','EUROPE') on BOTH legs, but Catalyst cannot
    // factor an OR across two columns — so the implied IN is written
    // explicitly on each region dim. That shrinks both dim-filtered
    // legs (2 of 5 regions) BEFORE they join the fact, cutting the
    // fact-side join input ~60%; the pair filter afterwards only drops
    // the same-region half. Pinned in PlanSpec ("pushed In on both
    // region scans"). ──────────────────────────────────────────────────
    "sql_q7_trade_volume" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .where(year(col("l_shipdate")).between(1996, 1997))
      def biRegion = Tables(s, dir, "region")
        .where(col("r_name").isin("ASIA", "EUROPE"))
      val suppRegion = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(biRegion),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("r_name").as("supp_region"))
      val custRegion = Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(biRegion),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name").as("cust_region"))
      l.join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(custRegion, col("o_custkey") === col("c_custkey"))
        .join(suppRegion, col("l_suppkey") === col("s_suppkey"))
        .where((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
               (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).as("l_year"))
        .agg(Num.roundp(sum(vol), 2).as("revenue"))
    }),

    // ── Q8 shape: market share of one nation's suppliers within a
    // region's ECONOMY-part purchases, by order year. ──────────────────
    "sql_q8_market_share" -> ((s, dir) => {
      val joined = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part").where(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders")
          .where(year(col("o_orderdate")).between(1996, 1997)),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation"))
          .withColumnRenamed("n_name", "cust_nation")
          .withColumnRenamed("n_nationkey", "cn_key"),
          col("c_nationkey") === col("cn_key"))
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "AMERICA")
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation"))
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
          col("s_nationkey") === col("sn_key"))
      joined
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(Num.roundp(
          sum(when(col("supp_nation") === "NATION_3", vol).otherwise(0.0)) / sum(vol),
          4).as("mkt_share"))
    }),

    // ── Q9 shape: product-line profit by supplier nation and year. The
    // schema has no partsupp.ps_supplycost, so cost is proxied as
    // 0.6 × p_retailprice × l_quantity (same plan: fact ⋈ part ⋈
    // supplier ⋈ nation with an arithmetic measure). ────────────────────
    "sql_q9_profit" -> ((s, dir) => {
      val profit = vol - lit(0.6) * col("p_retailprice") * col("l_quantity")
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part").where(col("p_name").like("%widget%")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(Num.roundp(sum(profit), 2).as("sum_profit"))
    }),

    // ── Q12 shape: shipping-lag audit — high/low-priority line counts
    // among lines shipped 30–120 days after ordering (no shipmode column;
    // l_linestatus takes its grouping role). ───────────────────────────
    "sql_q12_shipping_priority" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(year(col("l_shipdate")) === 1997 &&
          to_date(col("l_shipdate")).between(
            date_add(to_date(col("o_orderdate")), 30),
            date_add(to_date(col("o_orderdate")), 120)))
        .groupBy(col("l_linestatus"))
        .agg(count_if(hi).as("high_line_count"),
          count_if(!hi).as("low_line_count"))
    }),

    // ── Q13 shape: customer order-count distribution (left outer join
    // with an ON-clause filter, then re-aggregate the aggregate). ──────
    "sql_q13_custdist" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").where(col("o_orderpriority") =!= "5-LOW")
      Tables(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // ── Q14 shape: promo revenue share within one ship month. ──────────
    "sql_q14_promo_share" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(to_date(col("l_shipdate")).between("1997-09-01", "1997-09-30"))
        .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(Num.roundp(
          lit(100.0) * sum(when(col("p_type") === "PROMO", vol).otherwise(0.0)) / sum(vol),
          4).as("promo_revenue"))),

    // ── Q15 shape: top supplier by quarterly revenue (groupwise maximum
    // via self-joining the revenue aggregate with its own max). ────────
    "sql_q15_top_supplier" -> ((s, dir) => {
      val rev = Tables(s, dir, "lineitem")
        .where(to_date(col("l_shipdate")).between("1997-01-01", "1997-03-31"))
        .groupBy(col("l_suppkey"))
        .agg(sum(vol).as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          Num.roundp(col("total_revenue"), 2).as("total_revenue"))
    }),

    // ── Q17 shape: revenue impact of small-quantity orders — lines below
    // 20% of their part's average quantity, one brand. The correlated
    // scalar subquery becomes a per-part aggregate joined back on the
    // part key (one extra shuffle instead of a per-row probe). ─────────
    "sql_q17_small_qty" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val thr = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_thr"))
      li.join(Tables(s, dir, "part").where(col("p_brand") === "Brand#12"),
          col("l_partkey") === col("p_partkey"))
        .join(thr, col("l_partkey") === col("t_partkey"))
        .where(col("l_quantity") < col("qty_thr"))
        .agg(Num.roundp(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }),

    // ── Q18 shape: large-volume orders (HAVING on a fact aggregate,
    // joined back to orders + customer). ───────────────────────────────
    "sql_q18_big_orders" -> ((s, dir) => {
      val big = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .where(col("sum_qty") > 300)
      Tables(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("sum_qty"))
    }),

    // ── Q19 shape: disjunctive brand/size/quantity predicates — one join
    // whose ON clause is a 3-way OR (Catalyst pushes the common part-key
    // equality and evaluates the disjunction post-join). ───────────────
    "sql_q19_disjunctive" -> ((s, dir) => {
      val pred =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 25) &&
          col("l_quantity").between(20, 40))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"),
          col("l_partkey") === col("p_partkey") && pred)
        .agg(Num.roundp(sum(vol), 2).as("revenue"))
    }),

    // ── Q21 shape: suppliers who alone shipped late into multi-supplier
    // finished orders. EXISTS → left-semi, NOT EXISTS → left-anti, both
    // on the order key ("late" = >60 days after ordering; the schema has
    // no receipt/commit dates). ────────────────────────────────────────
    "sql_q21_waiting_supplier" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val late = l
        .join(Tables(s, dir, "orders").where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .where(to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 60))
        .select(col("l_orderkey"), col("l_suppkey"))
      val hasOtherSupp = late.as("l1").join(l.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.l_suppkey") =!= col("l2.l_suppkey"),
        "left_semi")
      val lateDistinct = late.distinct()
      val soleLate = hasOtherSupp.as("a").join(lateDistinct.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"),
        "left_anti")
      soleLate
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // ── Q2 shape: groupwise minimum with multi-dim join-back — for each
    // small part, the supplier offering the minimum average unit price.
    // partsupp doesn't exist in the slim schema, so the (part, supplier)
    // price list is derived from lineitem history first. ───────────────
    "sql_q2_min_cost_supp" -> ((s, dir) => {
      val ps = Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(avg(col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      val minPs = ps.groupBy(col("l_partkey").as("mp_key"))
        .agg(min(col("unit_price")).as("min_price"))
      ps.join(Tables(s, dir, "part").where(col("p_size") <= 5),
          col("l_partkey") === col("p_partkey"))
        .join(minPs, col("l_partkey") === col("mp_key") &&
          col("unit_price") === col("min_price"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"),
          Num.roundp(col("unit_price"), 4).as("unit_price"))
    }),

    // ── Q11 shape: important-stock scan — per-part inventory value
    // within one region, kept only above a scalar-subquery threshold
    // (2× the mean part value — scale-free, unlike stock Q11's
    // fraction-of-total, which thins to zero as the part count grows). ─
    "sql_q11_important_value" -> ((s, dir) => {
      val v = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice") * col("l_quantity")).as("val"))
      val thr = v.agg((avg(col("val")) * 2.0).as("thr"))
      v.join(broadcast(thr), col("val") > col("thr"))
        .select(col("l_partkey"), Num.roundp(col("val"), 2).as("part_value"))
    }),

    // ── Q16 shape: supplier diversity per part attribute, excluding a
    // supplier denylist (NOT IN → left-anti before the distinct agg). ──
    "sql_q16_supplier_cnt" -> ((s, dir) => {
      val excl = Tables(s, dir, "supplier")
        .where(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part").where(col("p_size").isin(1, 5, 9, 13)),
          col("l_partkey") === col("p_partkey"))
        .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // ── Q20 shape: suppliers with significant shipped volume of one
    // product family in one year (IN-subquery over a fact aggregate →
    // semi join). ──────────────────────────────────────────────────────
    "sql_q20_heavy_shippers" -> ((s, dir) => {
      val qual = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part").where(col("p_name").like("%widget%")),
          col("l_partkey") === col("p_partkey"))
        .where(year(col("l_shipdate")) === 1997)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .where(col("qty") > 50)
      Tables(s, dir, "supplier")
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
    }),

    // ── Q22 shape: high-balance customers gone idle — balance above the
    // positive-balance average (scalar-subquery threshold; floor()ed so a
    // cross-engine ulp in avg() can't flip a boundary row) and no orders
    // since 2000 (NOT EXISTS → left-anti). Grouped by segment (the slim
    // schema's stand-in for Q22's phone country code). ─────────────────
    "sql_q22_idle_balance" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val thr = c.where(col("c_acctbal") > 0)
        .agg(floor(avg(col("c_acctbal"))).as("bal_min"))
      val active = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= "2000-01-01")
        .select(col("o_custkey"))
      c.join(broadcast(thr), col("c_acctbal") > col("bal_min"))
        .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          Num.roundp(sum(col("c_acctbal")), 2).as("totacctbal"))
    })
  )

  val oracles: Map[String, String] = Map(
    "sql_q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 30)
        |GROUP BY o_orderpriority""".stripMargin,

    "sql_q7_trade_volume" ->
      """SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |WHERE ((sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE')
        |    OR (sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'))
        |  AND year(l_shipdate) BETWEEN 1996 AND 1997
        |GROUP BY 1, 2, 3""".stripMargin,

    "sql_q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  floor(sum(CASE WHEN sn.n_name = 'NATION_3'
        |                 THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |        / sum(l_extendedprice * (1.0 - l_discount)) * 10000 + 0.5) / 10000 AS mkt_share
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  AND year(o_orderdate) BETWEEN 1996 AND 1997
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |GROUP BY 1""".stripMargin,

    "sql_q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  floor(sum(l_extendedprice * (1.0 - l_discount)
        |            - 0.6 * p_retailprice * l_quantity) * 100 + 0.5) / 100 AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1, 2""".stripMargin,

    "sql_q12_shipping_priority" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
        |  count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE year(l_shipdate) = 1997
        |  AND CAST(l_shipdate AS DATE)
        |      BETWEEN CAST(o_orderdate AS DATE) + 30 AND CAST(o_orderdate AS DATE) + 120
        |GROUP BY l_linestatus""".stripMargin,

    "sql_q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count""".stripMargin,

    "sql_q14_promo_share" ->
      """SELECT floor(100.0
        |  * sum(CASE WHEN p_type = 'PROMO'
        |             THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |  / sum(l_extendedprice * (1.0 - l_discount)) * 10000 + 0.5) / 10000 AS promo_revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-09-01' AND DATE '1997-09-30'""".stripMargin,

    "sql_q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  floor(total_revenue * 100 + 0.5) / 100 AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin,

    "sql_q17_small_qty" ->
      """SELECT floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p_brand = 'Brand#12'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = p.p_partkey)""".stripMargin,

    "sql_q18_big_orders" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, t.sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) t
        |JOIN orders o ON o.o_orderkey = t.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey""".stripMargin,

    "sql_q19_disjunctive" ->
      """SELECT floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "sql_q21_waiting_supplier" ->
      """WITH late AS (
        |  SELECT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1 JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND CAST(l1.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name""".stripMargin,

    "sql_q2_min_cost_supp" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    avg(l_extendedprice / l_quantity) AS unit_price
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_partkey, s_suppkey, s_name, n_name,
        |  floor(unit_price * 10000 + 0.5) / 10000 AS unit_price
        |FROM ps
        |JOIN part p ON p.p_partkey = ps.l_partkey AND p.p_size <= 5
        |JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE unit_price = (SELECT min(unit_price) FROM ps ps2
        |                    WHERE ps2.l_partkey = ps.l_partkey)""".stripMargin,

    "sql_q11_important_value" ->
      """WITH v AS (
        |  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS val
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        |  GROUP BY 1)
        |SELECT l_partkey, floor(val * 100 + 0.5) / 100 AS part_value
        |FROM v WHERE val > (SELECT 2.0 * avg(val) FROM v)""".stripMargin,

    "sql_q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size IN (1, 5, 9, 13)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,

    "sql_q20_heavy_shippers" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE '%widget%' AND year(l.l_shipdate) = 1997
        |  GROUP BY l_suppkey HAVING sum(l_quantity) > 50)""".stripMargin,

    "sql_q22_idle_balance" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |  floor(sum(c_acctbal) * 100 + 0.5) / 100 AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT floor(avg(c_acctbal)) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin
  )
}
