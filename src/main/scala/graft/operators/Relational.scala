package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The relational operator inventory from SURVEY.md §2.1–§2.8, expressed
  * over the driver's TPC-H-ish tables. Each entry is a declarative
  * DataFrame plan (Catalyst owns pushdown/pruning/join strategy) paired
  * with an ANSI-SQL oracle in [[oracles]] that DuckDB runs on the same
  * parquet.
  *
  * Determinism rules used throughout:
  *  - every LIMIT/top-k has a total-order tiebreak (unique key last);
  *  - double aggregates are rounded (sum order is not bit-stable across
  *    partition-merge order, but error ~1e-9 << the rounding step);
  *  - int-typed derivations are cast to BIGINT to match DuckDB's widths.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // ── A1 (+A6, F5): TPC-H Q1-style pricing summary ──────────────────
    // dags/scripts/spark_daily_report.py:68-70 generalized: grouped agg
    // with partial+final hash aggregation; filter pushed to parquet scan.
    "a1_pricing_summary" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Num.roundp(sum(col("l_quantity")), 2).as("sum_qty"),
          Num.roundp(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          Num.roundp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          Num.roundp(avg(col("l_quantity")), 2).as("avg_qty"),
          Num.roundp(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // ── F1: projection + cheap predicate (pushdown demo) ──────────────
    "f1_project_filter" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"))),

    // ── F3 + X11/X12/X14: computed date columns ───────────────────────
    "f3_computed_dates" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        date_format(col("o_orderdate"), "yyyyMMdd").as("order_ymd"),
        to_date(col("o_orderdate")).as("order_date"))),

    // ── F5: date-range filter + agg ───────────────────────────────────
    "f5_date_range_agg" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), Num.roundp(sum(col("l_quantity")), 2).as("qty"))),

    // ── F9: string-length predicate (notebook cell 25) ────────────────
    "f9_length_filter" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .where(length(col("text")) > 400)
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))),

    // ── F10: compound string predicate (notebook cell 37) ─────────────
    "f10_compound_pred" -> ((s, dir) =>
      Tables(s, dir, "part")
        .where(col("p_type").contains("PRO") &&
               col("p_size").between(10, 30))
        .select(col("p_partkey"), col("p_type"), col("p_size"))),

    // ── F11: closed-set membership validation (collect/consumer.py:131)
    "f11_closed_set" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(when(col("event_type").isin("click", "view", "purchase"),
          col("event_type")).otherwise(lit("other")).as("etype"))
        .groupBy(col("etype")).agg(count(lit(1)).as("n"))),

    // ── J1: left-anti join = upsert-dedup semantics
    // (collect/consumer.py:81 "ON CONFLICT DO NOTHING") ────────────────
    "j1_anti_join" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").where(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // ── J2a: dimension enrich via broadcast joins ─────────────────────
    "j2_dim_broadcast" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), Num.roundp(avg(col("c_acctbal")), 2).as("avg_bal"))
    }),

    // ── J2b: fact-fact shuffle join + agg ─────────────────────────────
    "j2_fact_join" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          Num.roundp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    }),

    // ── J3: range join (equi key + interval band) ─────────────────────
    "j3_range_join" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") < o("o_orderdate") + expr("INTERVAL 30 DAY"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    }),

    // ── J4: left-semi join (EXISTS) ───────────────────────────────────
    "j4_semi_join" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem").where(col("l_quantity") > 45)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    }),

    // ── A4: null-count profile in one pass (notebook cells 16-17) ─────
    "a4_null_profile" -> ((s, dir) =>
      Tables(s, dir, "documents").agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("text"))).as("null_text"),
        (count(lit(1)) - count(col("lang"))).as("null_lang"),
        (count(lit(1)) - count(col("source"))).as("null_source"))),

    // ── A5: min/max/avg length profile (notebook cells 39-40) ─────────
    "a5_length_profile" -> ((s, dir) =>
      Tables(s, dir, "documents").agg(
        max(length(col("text"))).cast("long").as("max_len"),
        min(length(col("text"))).cast("long").as("min_len"),
        Num.roundp(avg(length(col("text"))), 2).as("avg_len"))),

    // ── A9a: exact distinct ───────────────────────────────────────────
    "a9_distinct" -> ((s, dir) =>
      Tables(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()),

    // ── A9b: rollup (grouping-sets family) ────────────────────────────
    "a9_rollup" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))),

    // ── W1 (§2.5): ranking window, top-3 orders per customer ──────────
    "w1_rank_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // ── W2: lag (analytic) over event sequence ────────────────────────
    "w2_lag_delta" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .select(col("event_id"), col("user_id"),
          Num.roundp(col("value") - col("prev_value"), 2).as("delta"))
    }),

    // ── W3: running aggregate with explicit ROWS frame ────────────────
    "w3_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          Num.roundp(sum(col("value")).over(w), 2).as("run_sum"))
    }),

    // ── O1/O2: global sort + engine-side top-k (TakeOrderedAndProject)
    "o2_topk_parts" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.groupBy(col("l_partkey"))
        .agg(Num.roundp(sum(col("l_quantity")), 2).as("total_qty"))
        .orderBy(col("total_qty").desc, col("l_partkey"))
        .limit(10)
    }),

    // ── §2.7: set operations ──────────────────────────────────────────
    "set_except" -> ((s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(Tables(s, dir, "supplier").where(col("s_acctbal") < -700)
          .select(col("s_nationkey").as("nationkey")))),

    "set_intersect" -> ((s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),

    "set_union" -> ((s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()),

    // ── X1/X2/X4/X5/X6: string function battery ───────────────────────
    "x_string_funcs" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        upper(substring(col("text"), 1, 12)).as("head12"),
        length(regexp_replace(col("text"), "a", "")).cast("long").as("len_no_a"),
        col("text").contains("spark").as("has_spark"),
        length(col("text")).cast("long").as("n_char"))),

    // ── X11/X12/X13 + T4 batch form: date bucketing ───────────────────
    "x_date_funcs" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(
          date_trunc("hour", col("ts")).as("hour_ts"),
          date_format(col("ts"), "yyyyMMdd").as("ymd"),
          to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))),

    // ── X16: JSON extraction from the events props payload ────────────
    "x16_json_extract" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))),

    // ── X20/A3: histogram binning (notebook cells 54-55) ──────────────
    "x20_histogram" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(floor(col("n_chars") / 100).cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n")))
  )

  val oracles: Map[String, String] = Map(
    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
        |  floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
        |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
        |  floor((avg(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
        |  floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "f1_project_filter" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,

    "f3_computed_dates" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  strftime(o_orderdate, '%Y%m%d') AS order_ymd,
        |  CAST(o_orderdate AS DATE) AS order_date
        |FROM orders""".stripMargin,

    "f5_date_range_agg" ->
      """SELECT l_returnflag, count(*) AS n, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,

    "f9_length_filter" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len
        |FROM documents WHERE length(text) > 400""".stripMargin,

    "f10_compound_pred" ->
      """SELECT p_partkey, p_type, p_size FROM part
        |WHERE contains(p_type, 'PRO') AND p_size BETWEEN 10 AND 30""".stripMargin,

    "f11_closed_set" ->
      """SELECT CASE WHEN event_type IN ('click','view','purchase')
        |  THEN event_type ELSE 'other' END AS etype, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "j1_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "j2_dim_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust, floor((avg(c_acctbal)) * 100 + 0.5) / 100 AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "j2_fact_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY o_orderpriority""".stripMargin,

    "j3_range_join" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderpriority""".stripMargin,

    "j4_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderstatus""".stripMargin,

    "a4_null_profile" ->
      """SELECT count(*) AS n_rows,
        |  count(*) - count(text) AS null_text,
        |  count(*) - count(lang) AS null_lang,
        |  count(*) - count(source) AS null_source
        |FROM documents""".stripMargin,

    "a5_length_profile" ->
      """SELECT CAST(max(length(text)) AS BIGINT) AS max_len,
        |  CAST(min(length(text)) AS BIGINT) AS min_len,
        |  floor((avg(length(text))) * 100 + 0.5) / 100 AS avg_len
        |FROM documents""".stripMargin,

    "a9_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "a9_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,

    "w1_rank_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "w2_lag_delta" ->
      """SELECT event_id, user_id, floor((value - prev_value) * 100 + 0.5) / 100 AS delta FROM (
        |  SELECT event_id, user_id, value,
        |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
        |  FROM events)""".stripMargin,

    "w3_running_sum" ->
      """SELECT event_id, user_id,
        |  floor((sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS run_sum
        |FROM events""".stripMargin,

    "o2_topk_parts" ->
      """SELECT l_partkey, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS total_qty
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY total_qty DESC, l_partkey LIMIT 10""".stripMargin,

    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal < -700""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin,

    "set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier""".stripMargin,

    "x_string_funcs" ->
      """SELECT doc_id,
        |  upper(substr(text, 1, 12)) AS head12,
        |  CAST(length(regexp_replace(text, 'a', '', 'g')) AS BIGINT) AS len_no_a,
        |  contains(text, 'spark') AS has_spark,
        |  CAST(length(text) AS BIGINT) AS n_char
        |FROM documents""".stripMargin,

    "x_date_funcs" ->
      """SELECT date_trunc('hour', ts) AS hour_ts,
        |  strftime(ts, '%Y%m%d') AS ymd,
        |  CAST(ts AS DATE) AS d, count(*) AS n
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "x16_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "x20_histogram" ->
      """SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket, count(*) AS n
        |FROM documents GROUP BY 1""".stripMargin
  )
}
