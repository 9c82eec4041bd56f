package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extended relational surface beyond the reference's own operators
  * (SURVEY.md §2.4 A9 "free Catalyst surface", §2.5, §2.7): pivot,
  * statistical aggregates, exact percentiles, cube, multiset set-ops,
  * the SQL entry point, and richer window functions. All oracled.
  */
object Extended {

  /** Exact interpolated quantiles per group WITHOUT the value-buffering
    * aggregate — a public operator (promoted r14). Spark's
    * `percentile()`/`median()` collect EVERY value of a group into the
    * aggregation buffer — at 100 TB a hot group OOMs its executor.
    * This shape ranks values with a per-group sorted window instead
    * (the window sort is an ExternalSorter: it SPILLS, it never
    * buffers in an agg), keeps only the two boundary rows per
    * requested quantile, and interpolates — the exact `quantile_cont`
    * recurrence (r = q·(n−1) over the 0-indexed sorted values), so the
    * DuckDB oracle is unchanged. Parallelism is one sorted partition
    * per group (the inherent cost of EXACT quantiles on
    * low-cardinality keys); the mergeable-sketch twin
    * (sk_quantile_hist) remains the constant-memory approximate path.
    *
    * NULL semantics match the buffering aggregates exactly when
    * `keepAllNullGroups = true`: per-column NULLs are ignored, a group
    * whose values are all-NULL in one spec column gets NULL for that
    * column's quantiles, and a group that is all-NULL in EVERY spec
    * column comes back with all-NULL quantiles (it is outer-joined
    * from the distinct group keys). With the default `false`, such
    * fully-absent groups are dropped — one fewer pass over the input
    * when the caller's columns are NOT NULL anyway.
    * QuantileProperties pins equality with `percentile()` on generated
    * data including all-NULL and single-row groups.
    *
    * @param specs (valueColumn, outputName, q) triples, q in [0, 1] */
  def exactQuantiles(df: DataFrame, grp: String,
      specs: Seq[(String, String, Double)],
      keepAllNullGroups: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // stack all requested value columns into ONE (grp, which, v) frame
    // so a single exchange + sort ranks everything; the per-partition
    // count rides the same partitioning as a second window function —
    // no count join, no second pipeline
    val stacked = specs.map(_._1).distinct.map { vc =>
      df.where(col(vc).isNotNull)
        .select(col(grp), lit(vc).as("wh"), col(vc).cast("double").as("v"))
    }.reduce(_ unionByName _)
    val ranked = stacked
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col(grp), col("wh")).orderBy(col("v")))
        .cast("long") - 1)
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col(grp), col("wh"))))
    def rank(q: Double) = (col("n") - lit(1)).cast("double") * lit(q)
    val boundary = specs.map { case (vc, _, q) =>
      col("wh") === vc && (col("rn") === floor(rank(q)).cast("long") ||
        col("rn") === ceil(rank(q)).cast("long"))
    }.reduce(_ || _)
    val aggExprs = specs.flatMap { case (vc, name, q) =>
      val isCol = col("wh") === vc
      Seq(
        max(when(isCol && col("rn") === floor(rank(q)).cast("long"), col("v")))
          .as(s"${name}_lo"),
        max(when(isCol && col("rn") === ceil(rank(q)).cast("long"), col("v")))
          .as(s"${name}_hi"),
        max(when(isCol, rank(q) - floor(rank(q)))).as(s"${name}_frac"))
    }
    val agged = ranked.where(boundary)
      .groupBy(col(grp)).agg(aggExprs.head, aggExprs.tail: _*)
    val withQs = specs.foldLeft(agged) { case (d, (_, name, _)) =>
      d.withColumn(name, col(s"${name}_lo") +
        col(s"${name}_frac") * (col(s"${name}_hi") - col(s"${name}_lo")))
    }
    val out = withQs
      .select(col(grp) +: specs.map { case (_, name, _) => col(name) }: _*)
    if (!keepAllNullGroups) out
    else {
      // groups all-NULL in every spec column contributed no stacked
      // rows; union them back with NULL quantiles — percentile()'s
      // shape. `except` (not a join): set ops are null-safe, so a NULL
      // group KEY that has real values is correctly seen as present.
      // Both sides are group-cardinality-sized (small by construction
      // for a groupBy key).
      val missing = df.select(col(grp)).distinct()
        .except(out.select(col(grp)))
      out.unionByName(specs.foldLeft(missing) { case (d, (_, name, _)) =>
        d.withColumn(name, lit(null).cast("double")) })
    }
  }

  val queries: Map[String, Relational.Q] = Map(

    // ── pivot: event-type counts per user as columns ──────────────────
    "a_pivot_events" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val p = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types).count()
      // pivot yields null for absent combinations; the oracle's FILTER
      // counts yield 0 — normalize.
      p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    }),

    // ── statistical aggregates ────────────────────────────────────────
    "a_stats_agg" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          Num.roundp(stddev_samp(col("l_quantity")), 2).as("sd_qty"),
          Num.roundp(var_samp(col("l_quantity")), 1).as("var_qty"),
          Num.roundp(covar_samp(col("l_quantity"), col("l_extendedprice")), 0).as("cov_qe"),
          Num.roundp(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qe"))),

    // ── exact percentiles / median — rank-selection form (r13): the
    // same quantile_cont numbers WITHOUT percentile()'s buffer-every-
    // value aggregation (see exactQuantiles) ──────────────────────────
    "a_percentiles" -> ((s, dir) =>
      exactQuantiles(Tables(s, dir, "lineitem"), "l_returnflag", Seq(
        ("l_quantity", "med_raw", 0.5),
        ("l_extendedprice", "p25_raw", 0.25),
        ("l_extendedprice", "p95_raw", 0.95)))
        .select(col("l_returnflag"),
          Num.roundp(col("med_raw"), 2).as("med_qty"),
          Num.roundp(col("p25_raw"), 2).as("p25_price"),
          Num.roundp(col("p95_raw"), 2).as("p95_price"))),

    // ── the keepAllNullGroups surface (r14): a group all-NULL in the
    // value column must come back WITH NULL quantiles, exactly as the
    // buffering percentile()/median() would return it — nullability
    // synthesized deterministically (the testdata has none) ───────────
    "a_percentiles_nullgroups" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").withColumn("v",
        when(col("event_type") =!= "error", col("value")))
      exactQuantiles(ev, "event_type", Seq(
        ("v", "p50_raw", 0.5), ("v", "p90_raw", 0.9)),
        keepAllNullGroups = true)
        .select(col("event_type"),
          Num.roundp(col("p50_raw"), 3).as("p50_value"),
          Num.roundp(col("p90_raw"), 3).as("p90_value"))
    }),

    // ── cube (full grouping-sets lattice) ─────────────────────────────
    "a9_cube" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .cube(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("n"))),

    // ── multiset except ───────────────────────────────────────────────
    "set_except_all" -> ((s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))),

    // ── SQL entry point: TPC-H Q3 shape via spark.sql over temp views ─
    "sql_q3_shipping" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("v_customer")
      Tables(s, dir, "orders").createOrReplaceTempView("v_orders")
      Tables(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_orderkey,
               floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue,
               o_orderdate, o_orderpriority
        FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")
    }),

    // ── richer windows: ntile + lead ──────────────────────────────────
    "w4_ntile_lead" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events").select(
        col("event_id"), col("user_id"),
        ntile(4).over(w).cast("long").as("quartile"),
        lead(col("event_type"), 1).over(w).as("next_type"))
    }),

    // ── approximate distinct (HLL) — rows-only: sketch internals differ
    // across engines by design ────────────────────────────────────────
    "a_approx_distinct" -> ((s, dir) =>
      Tables(s, dir, "lineitem").agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))),

    // ── second scalar-function battery: padding, translation, edit
    // distance ────────────────────────────────────────────────────────
    "x_string_funcs2" -> ((s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "_").as("brand_pad"),
        translate(col("p_type"), "AEO", "aeo").as("type_tr"),
        reverse(col("p_name")).as("name_rev"),
        repeat(col("p_brand"), 2).as("brand2"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("edit_dist"),
        ascii(col("p_name")).cast("long").as("first_ascii"))),

    // ── R1 report shape in the gate: per-category counts, descending
    // (dags/scripts/spark_daily_report.py:68-70, lang as the category) ─
    "r1_category_counts" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("count"))
        .orderBy(col("count").desc, col("lang"))),

    // ── unpivot via stack: wide → long ────────────────────────────────
    "a_unpivot_stack" -> ((s, dir) =>
      Tables(s, dir, "customer").selectExpr("c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)")),

    // ── misc scalar battery: conditionals, regex extract, date arith ──
    "x_misc_funcs" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        greatest(col("o_totalprice"), lit(200000.0d)).as("g"),
        least(col("o_totalprice"), lit(200000.0d)).as("l"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_x"),
        regexp_extract(col("o_orderpriority"), "([0-9])", 1).as("prio_num"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).cast("long").as("days_since"),
        weekday(col("o_orderdate")).cast("long").as("wd"),
        last_day(col("o_orderdate")).as("month_end"))),

    // ── A3: value-counts of string lengths (notebook cells 52/55) ─────
    "a3_length_value_counts" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(length(col("text")).cast("long").as("len"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("len"))),

    // ── schema-evolution union: by name, missing columns as null ──────
    "set_union_by_name" -> ((s, dir) => {
      val a = Tables(s, dir, "orders").where(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val b = Tables(s, dir, "orders").where(col("o_orderkey") % 1000 === 1)
        .select(col("o_orderstatus"), col("o_orderkey"))
      a.unionByName(b, allowMissingColumns = true)
    }),

    // ── array-function battery over token arrays ──────────────────────
    "x_array_funcs" -> ((s, dir) => {
      val tok = graft.functions.Text.tokens(col("text"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        array_join(slice(sort_array(tok), 1, 3), " ").as("first3"),
        array_contains(tok, "the").as("has_the"),
        size(flatten(array(tok, tok))).cast("long").as("n2"))
    }),

    // ── X17 full form: posexplode (position-aware generator) ──────────
    "x17_posexplode" -> ((s, dir) => {
      val tok = slice(graft.functions.Text.tokens(col("text")), 1, 5)
      Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(tok))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
    }),

    // ── top-k per key via bounded-heap Aggregator: same contract as
    // w1_rank_topn (same oracle), but each group carries at most k
    // entries through partial aggregation instead of being fully
    // sorted — the scale-correct top-N-per-group ────────────────────
    "w1b_topk_aggregator" -> ((s, dir) => {
      import s.implicits._
      val agg = new graft.plans.TopKAggregator(3)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
        .as[(Long, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(agg.toColumn.name("top"))
        .flatMap { case (ck, top) =>
          top.zipWithIndex.map { case ((price, ok), i) => (ck, ok, price, (i + 1).toLong) }
        }
        .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
    })
  )

  val oracles: Map[String, String] = Map(
    "a_pivot_events" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'view') AS "view",
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id""".stripMargin,

    "a_stats_agg" ->
      """SELECT l_returnflag,
        |  floor((stddev_samp(l_quantity)) * 100 + 0.5) / 100 AS sd_qty,
        |  floor((var_samp(l_quantity)) * 10 + 0.5) / 10 AS var_qty,
        |  floor((covar_samp(l_quantity, l_extendedprice)) * 1 + 0.5) / 1 AS cov_qe,
        |  floor((corr(l_quantity, l_extendedprice)) * 10000 + 0.5) / 10000 AS corr_qe
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a_percentiles" ->
      """SELECT l_returnflag,
        |  floor((median(l_quantity)) * 100 + 0.5) / 100 AS med_qty,
        |  floor((quantile_cont(l_extendedprice, 0.25)) * 100 + 0.5) / 100 AS p25_price,
        |  floor((quantile_cont(l_extendedprice, 0.95)) * 100 + 0.5) / 100 AS p95_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a_percentiles_nullgroups" ->
      """SELECT event_type,
        |  floor((quantile_cont(CASE WHEN event_type <> 'error' THEN value END, 0.5)) * 1000 + 0.5) / 1000 AS p50_value,
        |  floor((quantile_cont(CASE WHEN event_type <> 'error' THEN value END, 0.9)) * 1000 + 0.5) / 1000 AS p90_value
        |FROM events GROUP BY event_type""".stripMargin,

    "a9_cube" ->
      """SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, order_year)""".stripMargin,

    "set_except_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT ALL SELECT s_nationkey FROM supplier""".stripMargin,

    "sql_q3_shipping" ->
      """SELECT l_orderkey,
        |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "w4_ntile_lead" ->
      """SELECT event_id, user_id,
        |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS quartile,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |FROM events""".stripMargin,

    "x_string_funcs2" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '_') AS brand_pad,
        |  translate(p_type, 'AEO', 'aeo') AS type_tr,
        |  reverse(p_name) AS name_rev,
        |  repeat(p_brand, 2) AS brand2,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS edit_dist,
        |  CAST(ascii(p_name) AS BIGINT) AS first_ascii
        |FROM part""".stripMargin,

    "r1_category_counts" ->
      """SELECT lang, count(*) AS count FROM documents
        |GROUP BY lang ORDER BY count DESC, lang""".stripMargin,

    "a_unpivot_stack" ->
      """SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
        |UNION ALL
        |SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer""".stripMargin,

    "a3_length_value_counts" ->
      """SELECT CAST(length(text) AS BIGINT) AS len, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY len""".stripMargin,

    "x_misc_funcs" ->
      """SELECT o_orderkey,
        |  greatest(o_totalprice, 200000.0) AS g,
        |  least(o_totalprice, 200000.0) AS l,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x,
        |  regexp_extract(o_orderpriority, '([0-9])', 1) AS prio_num,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  CAST(isodow(o_orderdate) - 1 AS BIGINT) AS wd,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders""".stripMargin,

    "set_union_by_name" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 1000 = 0
        |UNION ALL BY NAME
        |SELECT o_orderstatus, o_orderkey FROM orders WHERE o_orderkey % 1000 = 1""".stripMargin,

    "x_array_funcs" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(tok)[1:3], ' ') AS first3,
        |  list_contains(tok, 'the') AS has_the,
        |  CAST(len(flatten([tok, tok])) AS BIGINT) AS n2
        |FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
        |      FROM documents)""".stripMargin,

    "x17_posexplode" ->
      """SELECT doc_id,
        |  CAST(unnest(range(len(tok))) AS BIGINT) AS pos,
        |  unnest(tok) AS token
        |FROM (SELECT doc_id, (list_filter(string_split(text, ' '), t -> t <> ''))[1:5] AS tok
        |      FROM documents)""".stripMargin,

    "w1b_topk_aggregator" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin
  )
}
