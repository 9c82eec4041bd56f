package graft.operators

import graft.Tables
import graft.functions.{Num, Text}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 surface widening (SURVEY.md §2.3/§2.5/§2.8 + the
  * training-data-pipeline mandate): TPC-H Q5/Q10 headline join shapes,
  * the remaining window-function battery (percent_rank / cume_dist /
  * nth_value, RANGE frames), explicit grouping sets, bitwise and map
  * scalar batteries, deterministic hash-based train/val/test splitting
  * and per-stratum sampling (the reproducible alternative to
  * `sample()` for dataset curation), TF-IDF top terms, and a composite
  * document-quality filter pipeline.
  *
  * Scale notes: Q5/Q10 broadcast the dimension sides explicitly;
  * TF-IDF's document-frequency join shuffles on `term` (the natural
  * key; vocabulary ≪ corpus); the hash split/sample are pure
  * map-side predicates — no shuffle at all, which is what makes them
  * the right curation primitives at 100 TB.
  */
object Extended2 {

  val queries: Map[String, Relational.Q] = Map(

    // ── TPC-H Q5 shape: local-supplier revenue per nation in a region.
    // nation/region broadcast; customer⋈orders⋈lineitem⋈supplier are
    // the shuffle joins (AQE may demote supplier to broadcast at small
    // SF — both plans are key-partitioned correctly at 100 TB). ──────
    "sql_q5_region_revenue" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(Num.roundp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    }),

    // ── TPC-H Q10 shape: returned-item revenue per customer, top 20. ──
    "sql_q10_returned" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem").where(col("l_returnflag") === "R")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(Num.roundp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ── W5: distribution windows. Explicit ROWS frame on nth_value —
    // engines disagree on the default frame. ─────────────────────────
    "w5_rank_battery" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events").where(col("event_type") === "purchase")
        .select(
          col("event_id"), col("user_id"),
          Num.roundp(percent_rank().over(w), 6).as("pr"),
          Num.roundp(cume_dist().over(w), 6).as("cd"),
          nth_value(col("event_id"), 2).over(wf).as("second_id"))
    }),

    // ── W6: RANGE frame over a day offset — trailing-7-day running sum
    // per user. RANGE (not ROWS) so same-day events share the frame. ──
    "w6_range_frame" -> ((s, dir) => {
      val day = datediff(to_date(col("ts")), to_date(lit("2025-01-01"))).cast("long")
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rangeBetween(-6, Window.currentRow)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), day.as("day"), col("value"))
        .select(col("event_id"), col("user_id"), col("day"),
          Num.roundp(sum(col("value")).over(w), 2).as("sum7"),
          count(lit(1)).over(w).as("n7"))
    }),

    // ── SQL LATERAL: per-group top-N as a correlated subquery —
    // planned as a join, never a per-row re-execution. ───────────────
    "sql_lateral_topn" -> ((s, dir) => {
      Tables(s, dir, "nation").createOrReplaceTempView("v_n_lat")
      Tables(s, dir, "customer").createOrReplaceTempView("v_c_lat")
      s.sql("""
        SELECT r.n_regionkey, l.n_name, l.n_cust
        FROM (SELECT DISTINCT n_regionkey FROM v_n_lat) r,
        LATERAL (
          SELECT n.n_name, count(*) AS n_cust
          FROM v_n_lat n JOIN v_c_lat c ON c_nationkey = n_nationkey
          WHERE n.n_regionkey = r.n_regionkey
          GROUP BY n.n_name
          ORDER BY n_cust DESC, n.n_name LIMIT 2) l""")
    }),

    // ── X28: error-safe evaluation — try_cast/try_divide yield NULL
    // where ANSI mode would abort the job (one bad row must not kill a
    // 100 TB pipeline). ──────────────────────────────────────────────
    "x_try_funcs" -> ((s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([0-9]+)", 1).try_cast("long").as("name_num"),
        col("p_brand").try_cast("long").as("brand_num"), // never numeric → NULL
        try_divide(col("p_retailprice"), col("p_size") - col("p_size")).as("div0"),
        try_divide(col("p_retailprice"), lit(2.0d)).as("half"))),

    // ── X29: interval arithmetic — timestampadd/timestampdiff and
    // interval addition, the event-time bookkeeping battery. ─────────
    "x_interval_funcs" -> ((s, dir) =>
      Tables(s, dir, "events").select(
        col("event_id"),
        expr("timestampadd(HOUR, 6, ts)").as("plus6h"),
        expr("timestampadd(DAY, -1, ts)").as("minus1d"),
        expr("timestampdiff(HOUR, TIMESTAMP '2025-01-01 00:00:00', ts)").as("hours_since"),
        expr("timestampdiff(DAY, TIMESTAMP '2025-01-01 00:00:00', ts)").as("days_since"))),

    // ── A13: post-aggregation HAVING filter. ──────────────────────────
    "a_having" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(Num.roundp(sum(col("l_quantity")), 2).as("total_qty"),
          count(lit(1)).as("n"))
        .where(col("total_qty") > 150)),

    // ── J6: null-safe equality join (<=>) — NULL keys match NULL keys
    // instead of silently dropping, the semantics dirty dimension data
    // needs. NULLs are synthesized from a deterministic predicate. ───
    "j6_nullsafe_join" -> ((s, dir) => {
      val a = Tables(s, dir, "orders").where(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_custkey")).as("k"))
      val b = Tables(s, dir, "customer").where(col("c_custkey") <= 70)
        .select(when(col("c_custkey") % 7 === 0, col("c_custkey")).as("k"))
      a.join(b, a("k") <=> b("k"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_matches"))
    }),

    // ── X27: exact-math battery (ops with bit-identical results across
    // engines: abs/sign/floor/ceil/mod/sqrt/integer pow). ────────────
    "x_math_funcs" -> ((s, dir) =>
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("adev"),
        // DuckDB sign() yields TINYINT, Spark signum() DOUBLE — pin both
        // to INT so the driver's value hash ("1" vs "1.0") agrees.
        signum(col("l_discount") - 0.05).cast("int").as("sgn"),
        floor(col("l_extendedprice")).cast("long").as("price_fl"),
        ceil(col("l_extendedprice")).cast("long").as("price_ce"),
        (col("l_orderkey") % 97).as("key_mod"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pow(col("l_quantity"), 2).as("qty_sq"))),

    // ── A11: conditional aggregation battery — FILTER-style partial
    // aggregates in one pass (count_if / filtered sums / bool votes). ─
    "a_cond_agg" -> ((s, dir) =>
      Tables(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        count_if(col("l_quantity") > 45).as("n_hi_qty"),
        Num.roundp(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))), 2)
          .as("disc_rev"),
        bool_and(col("l_quantity") > 0).as("all_pos"),
        bool_or(col("l_tax") > 0.07).as("any_hi_tax"))),

    // ── A12: argmax/argmin + ordered string aggregation. The ordering
    // argument is the UNIQUE key so ties cannot differ across engines. ─
    "a_argmax" -> ((s, dir) =>
      Tables(s, dir, "orders").where(col("o_orderkey") % 1000 === 0)
        .groupBy(col("o_orderstatus")).agg(
          Num.roundp(max_by(col("o_totalprice"), col("o_orderkey")), 2).as("last_price"),
          Num.roundp(min_by(col("o_totalprice"), col("o_orderkey")), 2).as("first_price"),
          array_join(array_sort(collect_list(col("o_orderkey").cast("string"))), ",")
            .as("keys_csv"))),

    // ── W7: forward-fill (LOCF) imputation — the most recent non-null
    // observation carried forward per key, the standard time-series
    // repair before training. One shuffle on the key, sort within. ───
    "w7_fill_forward" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val purchaseValue = when(col("event_type") === "purchase", col("value"))
      Tables(s, dir, "events").select(
        col("event_id"), col("user_id"),
        Num.roundp(last(purchaseValue, ignoreNulls = true).over(w), 2)
          .as("last_purchase_value"))
    }),

    // ── A10: explicit GROUPING SETS lattice with grouping() flags. ────
    "a10_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("v_li_gs")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
               count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        FROM v_li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    }),

    // ── X21: bitwise battery on keys. ─────────────────────────────────
    "x_bitwise_funcs" -> ((s, dir) =>
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(lit(255L))).as("and8"),
        (col("l_orderkey").bitwiseOR(col("l_linenumber"))).as("or_ln"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("xor_pk"),
        shiftleft(col("l_linenumber"), 3).cast("long").as("shl3"),
        shiftright(col("l_orderkey"), 2).as("shr2"),
        bit_count(col("l_orderkey")).cast("long").as("popcnt"))),

    // ── X22: map surface — construction, lookup, keys, str_to_map.
    // Map columns stay internal (parquet/pandas map compare is not
    // portable); outputs are the looked-up scalars. ──────────────────
    "x_map_funcs" -> ((s, dir) => {
      val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
      Tables(s, dir, "part").select(
        col("p_partkey"),
        element_at(m, "brand").as("m_brand"),
        size(m).cast("long").as("m_size"),
        array_join(map_keys(m), ",").as("m_keys"),
        element_at(str_to_map(lit("a:1,b:2"), lit(","), lit(":")), "b").as("m_b"))
    }),

    // ── Deterministic train/val/test split: first hex digit of a
    // seeded md5 of the key. Pure projection — no shuffle, stable
    // across runs/engines/cluster sizes, the curation-safe way to
    // split 100 TB (sample() is neither deterministic nor stratifiable
    // across re-runs). 12/2/2 sixteenths ≈ 75/12.5/12.5. ─────────────
    "samp_hash_split" -> ((s, dir) => {
      val h = substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 1)
      Tables(s, dir, "documents")
        .select(col("lang"),
          when(h <= "b", "train").when(h <= "d", "val").otherwise("test").as("split"))
        .groupBy(col("lang"), col("split")).agg(count(lit(1)).as("n"))
    }),

    // ── Deterministic per-epoch training order: shard by key residue
    // (the reader-parallelism unit), order WITHIN each shard by a
    // SEEDED md5 — every epoch is a fresh pseudorandom permutation any
    // engine reproduces bit-for-bit. Scale shape: there is NO global
    // sort — the only window is partitioned by shard, so each of the
    // ~reader-count shards sorts its own slice independently; bumping
    // the epoch literal reshuffles every shard without touching the
    // sharding. This is the "shuffle the corpus each epoch" op every
    // training loader needs, made reproducible and distributed. ──────
    "samp_epoch_shuffle" -> ((s, dir) => {
      val h = md5(concat(lit("epoch7|"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"), h.as("h"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("shard"), col("pos"), col("doc_id"))
    }),

    // ── Per-stratum deterministic sample: keep 2/16 of each lang by
    // hash threshold; returns the rows themselves. ───────────────────
    "samp_stratified" -> ((s, dir) => {
      val h = substring(md5(concat(lit("samp|"), col("doc_id").cast("string"))), 1, 1)
      Tables(s, dir, "documents")
        .where(h.isin("0", "1"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // ── TF-IDF top-3 terms per document (first 100 docs; df/N computed
    // over the whole corpus). tf shuffle on (doc, term), df shuffle on
    // term, corpus size broadcast. ───────────────────────────────────
    "text_tfidf_topterms" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val tok = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3 && col("doc_id") < 100)
        .select(col("doc_id"), col("rk"), col("term"), Num.roundp(col("score"), 4).as("score"))
    }),

    // ── Composite quality-filter pipeline (C4-style curation): length,
    // token count, and mean-token-length gates composed as one
    // predicate — all pushdown-eligible. ─────────────────────────────
    "pipe_quality_filter" -> ((s, dir) => {
      val toks = Text.tokens(col("text"))
      Tables(s, dir, "documents")
        .withColumn("n_tok", size(toks).cast("long"))
        .withColumn("avg_tok",
          (length(regexp_replace(col("text"), "\\s+", "")).cast("double") / col("n_tok")))
        .where(col("n_chars") >= 150 && col("n_tok") >= 20 &&
          col("avg_tok") >= 3.0 && col("avg_tok") <= 12.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept"), Num.roundp(avg(col("n_chars")), 2).as("avg_chars"))
    }),

    // ── J5: cross join (small × small — the only sane cartesian). ─────
    "j5_cross_join" -> ((s, dir) =>
      Tables(s, dir, "region").select(col("r_name"))
        .crossJoin(Tables(s, dir, "orders").select(col("o_orderstatus")).distinct())),

    // ── X23: binary-column battery — the opaque-payload plumbing the
    // multimodal path rides on (length / digest / encode of binary),
    // exercised over text cast to bytes. ─────────────────────────────
    "x_binary_funcs" -> ((s, dir) => {
      val b = col("p_name").cast("binary")
      Tables(s, dir, "part").select(
        col("p_partkey"),
        length(b).cast("long").as("blen"),
        base64(b).as("b64"),
        md5(b).as("bmd5"),
        sha2(b, 256).as("bsha256"),
        lower(hex(b)).as("bhex"))
    }),

    // ── Correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + left outer join, never a per-row probe. ────────────
    "sql_scalar_subquery" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("v_o_ss")
      Tables(s, dir, "lineitem").createOrReplaceTempView("v_li_ss")
      s.sql("""
        SELECT o_orderkey, o_totalprice,
               (SELECT CAST(max(l_quantity) AS DOUBLE) FROM v_li_ss
                WHERE l_orderkey = o_orderkey) AS max_qty
        FROM v_o_ss WHERE o_orderkey % 100 = 0""")
    }),

    // ── TPC-H Q6 shape: the pure scan-predicate-aggregate — every
    // predicate reaches the parquet scan, zero joins, one exchange. ──
    "sql_q6_forecast" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(Num.roundp(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))),

    // ── O5: keyset-free pagination — total-ordered offset + limit. ────
    "o5_pagination" -> ((s, dir) =>
      Tables(s, dir, "part")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .offset(20).limit(10)),

    // ── X25: regex battery — extract-all, counting, membership. ──────
    "x_regex_funcs" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-zA-Z]+"), lit(0))).cast("long").as("n_words"),
        regexp_count(col("text"), lit("[0-9]+")).cast("long").as("n_nums"),
        regexp_extract(col("text"), "([0-9]+)", 1).as("first_num"),
        col("text").rlike("[0-9]").as("has_digit"))),

    // ── X26: calendar battery — field extraction and date arithmetic. ─
    "x_date_funcs2" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
        date_add(to_date(col("o_orderdate")), 45).as("plus45d"),
        trunc(to_date(col("o_orderdate")), "month").as("month_start"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("first_of_month"))),

    // ── X24: array set-algebra battery. Outputs sorted+deduped, then
    // rendered as strings ("[1, 2, 3]" — Spark's array cast and DuckDB's
    // list cast agree on this format) so the engines' differing internal
    // orders can't leak into the hash and the driver's comparator can
    // sort the result frame (pandas can't lexsort ndarray cells).
    // Runs on a deterministic 1-in-20 orderkey subset: the set-algebra
    // semantics are per-row, so volume adds verification cost, not
    // coverage (the full scan spent 22% of the r3 bench on string
    // rendering alone). ───────────────────────────────────────────────
    "x_array_setops" -> ((s, dir) => {
      val a = array(col("l_orderkey") % 7, col("l_partkey") % 7, col("l_suppkey") % 7)
      val b = array(col("l_orderkey") % 5, col("l_partkey") % 5)
      Tables(s, dir, "lineitem").where(col("l_orderkey") % 20 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        sort_array(array_intersect(a, b)).cast("string").as("ai"),
        sort_array(array_except(a, b)).cast("string").as("ae"),
        sort_array(array_union(a, b)).cast("string").as("au"),
        array_position(a, col("l_suppkey") % 7).as("pos"),
        sort_array(array_remove(a, col("l_orderkey") % 7)).cast("string").as("arm"),
        sort_array(array_distinct(a)).cast("string").as("ad"))
    }),

    // ── W8: value-window battery — first/last/avg over explicit frames
    // (frames pinned on BOTH sides: default last_value frames differ
    // across engines, like nth_value). ────────────────────────────────
    "w8_value_window" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val full = byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val trail3 = byUser.rowsBetween(-2, Window.currentRow)
      Tables(s, dir, "events").select(
        col("event_id"), col("user_id"),
        first(col("value")).over(full).as("first_v"),
        last(col("value")).over(full).as("last_v"),
        count(lit(1)).over(full).as("n_in_user"),
        Num.roundp(avg(col("value")).over(trail3), 2).as("avg3_v"))
    }),

    // ── A13: multiple DISTINCT aggregates in one pass — Catalyst plans
    // this with an Expand (one replica per distinct group) feeding a
    // single aggregate, instead of N self-joined subqueries. ──────────
    "a_multi_distinct" -> ((s, dir) =>
      Tables(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd_line"),
        count(lit(1)).as("n_rows"))),

    // ── X28: null-semantics battery — nullif / coalesce / ifnull /
    // greatest / least (both engines skip NULLs in greatest/least). ───
    "x_null_funcs" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("v_li_null")
      s.sql("""
        SELECT l_orderkey, l_linenumber,
          nullif(l_discount, 0.05) AS nz_disc,
          coalesce(nullif(l_discount, 0.05), -1.0) AS disc_or_neg,
          ifnull(nullif(l_tax, 0.0), 9.9) AS tax_or,
          greatest(l_quantity, l_discount * 100) AS g_qd,
          least(l_quantity, l_discount * 100) AS l_qd
        FROM v_li_null""")
    }),

    // ── IN-subquery (semi-join planning from SQL). ────────────────────
    "sql_in_subquery" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("v_o_in")
      Tables(s, dir, "customer").createOrReplaceTempView("v_c_in")
      s.sql("""
        SELECT o_orderstatus, count(*) AS n
        FROM v_o_in
        WHERE o_custkey IN (SELECT c_custkey FROM v_c_in WHERE c_acctbal > 9000)
        GROUP BY o_orderstatus""")
    })
  )

  val oracles: Map[String, String] = Map(

    "sql_q5_region_revenue" ->
      """SELECT n_name,
        |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "sql_q10_returned" ->
      """SELECT c_custkey, c_name,
        |  floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "w5_rank_battery" ->
      """SELECT event_id, user_id,
        |  floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pr,
        |  floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000 AS cd,
        |  nth_value(event_id, 2) OVER
        |    (PARTITION BY user_id ORDER BY value, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_id
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)""".stripMargin,

    "w6_range_frame" ->
      """WITH d AS (
        |  SELECT event_id, user_id,
        |    datediff('day', DATE '2025-01-01', CAST(ts AS DATE)) AS day, value
        |  FROM events)
        |SELECT event_id, user_id, day,
        |  floor((sum(value) OVER w) * 100 + 0.5) / 100 AS sum7,
        |  count(*) OVER w AS n7
        |FROM d
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "sql_lateral_topn" ->
      """SELECT r.n_regionkey, l.n_name, l.n_cust
        |FROM (SELECT DISTINCT n_regionkey FROM nation) r,
        |LATERAL (
        |  SELECT n.n_name, count(*) AS n_cust
        |  FROM nation n JOIN customer c ON c_nationkey = n_nationkey
        |  WHERE n.n_regionkey = r.n_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_cust DESC, n.n_name LIMIT 2) l""".stripMargin,

    "x_try_funcs" ->
      """SELECT p_partkey,
        |  TRY_CAST(regexp_extract(p_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
        |  TRY_CAST(p_brand AS BIGINT) AS brand_num,
        |  CASE WHEN p_size - p_size = 0 THEN NULL
        |       ELSE p_retailprice / (p_size - p_size) END AS div0,
        |  p_retailprice / 2.0 AS half
        |FROM part""".stripMargin,

    "x_interval_funcs" ->
      """SELECT event_id,
        |  ts + INTERVAL 6 HOUR AS plus6h,
        |  ts - INTERVAL 1 DAY AS minus1d,
        |  (epoch_us(ts) - epoch_us(TIMESTAMP '2025-01-01 00:00:00'))
        |    // 3600000000 AS hours_since,
        |  (epoch_us(ts) - epoch_us(TIMESTAMP '2025-01-01 00:00:00'))
        |    // 86400000000 AS days_since
        |FROM events""".stripMargin,

    "a_having" ->
      """SELECT l_partkey, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS total_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_partkey
        |HAVING floor((sum(l_quantity)) * 100 + 0.5) / 100 > 150""".stripMargin,

    "j6_nullsafe_join" ->
      """WITH a AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_custkey END AS k
        |  FROM orders WHERE o_orderkey <= 500),
        |b AS (
        |  SELECT CASE WHEN c_custkey % 7 = 0 THEN c_custkey END AS k
        |  FROM customer WHERE c_custkey <= 70)
        |SELECT a.o_orderkey, count(*) AS n_matches
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY a.o_orderkey""".stripMargin,

    "x_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS adev,
        |  CAST(sign(l_discount - 0.05) AS INTEGER) AS sgn,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ce,
        |  l_orderkey % 97 AS key_mod,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  pow(l_quantity, 2) AS qty_sq
        |FROM lineitem""".stripMargin,

    "a_cond_agg" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_quantity > 45) AS n_hi_qty,
        |  floor((sum(l_extendedprice) FILTER (WHERE l_discount > 0.05)) * 100 + 0.5) / 100 AS disc_rev,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_tax > 0.07) AS any_hi_tax
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "a_argmax" ->
      """SELECT o_orderstatus,
        |  floor((arg_max(o_totalprice, o_orderkey)) * 100 + 0.5) / 100 AS last_price,
        |  floor((arg_min(o_totalprice, o_orderkey)) * 100 + 0.5) / 100 AS first_price,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ','
        |    ORDER BY CAST(o_orderkey AS VARCHAR)) AS keys_csv
        |FROM orders WHERE o_orderkey % 1000 = 0
        |GROUP BY o_orderstatus""".stripMargin,

    "w7_fill_forward" ->
      """SELECT event_id, user_id,
        |  floor((last_value(CASE WHEN event_type = 'purchase' THEN value END
        |           IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100
        |    AS last_purchase_value
        |FROM events""".stripMargin,

    "a10_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
        |  count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    "x_bitwise_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS and8,
        |  l_orderkey | l_linenumber AS or_ln,
        |  xor(l_orderkey, l_partkey) AS xor_pk,
        |  l_linenumber << 3 AS shl3,
        |  l_orderkey >> 2 AS shr2,
        |  bit_count(l_orderkey) AS popcnt
        |FROM lineitem""".stripMargin,

    "x_map_funcs" ->
      """SELECT p_partkey, p_brand AS m_brand, 2 AS m_size,
        |  'brand,type' AS m_keys, '2' AS m_b
        |FROM part""".stripMargin,

    "samp_epoch_shuffle" ->
      """SELECT doc_id % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY doc_id % 8
        |    ORDER BY md5('epoch7|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos,
        |  doc_id
        |FROM documents""".stripMargin,

    "samp_hash_split" ->
      """WITH h AS (
        |  SELECT lang, substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 1) AS hx
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN hx <= 'b' THEN 'train' WHEN hx <= 'd' THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM h GROUP BY 1, 2""".stripMargin,

    "samp_stratified" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5('samp|' || CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')""".stripMargin,

    "text_tfidf_topterms" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf * ln(n_docs / df) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, floor(score * 10000 + 0.5) / 10000 AS score
        |FROM ranked WHERE rk <= 3 AND doc_id < 100""".stripMargin,

    "pipe_quality_filter" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS n_nonws
        |  FROM documents)
        |SELECT lang, count(*) AS kept,
        |  floor((avg(n_chars)) * 100 + 0.5) / 100 AS avg_chars
        |FROM d
        |WHERE n_chars >= 150 AND n_tok >= 20
        |  AND n_nonws / n_tok >= 3.0 AND n_nonws / n_tok <= 12.0
        |GROUP BY lang""".stripMargin,

    "j5_cross_join" ->
      """SELECT r_name, o_orderstatus FROM region
        |CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)""".stripMargin,

    "x_binary_funcs" ->
      """SELECT p_partkey,
        |  octet_length(encode(p_name)) AS blen,
        |  to_base64(encode(p_name)) AS b64,
        |  md5(p_name) AS bmd5,
        |  sha256(p_name) AS bsha256,
        |  lower(hex(encode(p_name))) AS bhex
        |FROM part""".stripMargin,

    "sql_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT CAST(max(l_quantity) AS DOUBLE) FROM lineitem
        |   WHERE l_orderkey = o_orderkey) AS max_qty
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,

    "sql_in_subquery" ->
      """SELECT o_orderstatus, count(*) AS n
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderstatus""".stripMargin,

    "w8_value_window" ->
      """SELECT event_id, user_id,
        |  first_value(value) OVER fullw AS first_v,
        |  last_value(value) OVER fullw AS last_v,
        |  count(*) OVER fullw AS n_in_user,
        |  floor((avg(value) OVER trail3) * 100 + 0.5) / 100 AS avg3_v
        |FROM events
        |WINDOW
        |  fullw AS (PARTITION BY user_id ORDER BY event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |  trail3 AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "a_multi_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp,
        |  count(DISTINCT (l_orderkey, l_linenumber)) AS nd_line,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "x_null_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_discount, 0.05) AS nz_disc,
        |  coalesce(nullif(l_discount, 0.05), -1.0) AS disc_or_neg,
        |  ifnull(nullif(l_tax, 0.0), 9.9) AS tax_or,
        |  greatest(l_quantity, l_discount * 100) AS g_qd,
        |  least(l_quantity, l_discount * 100) AS l_qd
        |FROM lineitem""".stripMargin,

    "sql_q6_forecast" ->
      """SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "o5_pagination" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey
        |LIMIT 10 OFFSET 20""".stripMargin,

    "x_regex_funcs" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-zA-Z]+')) AS n_words,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_nums,
        |  regexp_extract(text, '([0-9]+)', 1) AS first_num,
        |  regexp_matches(text, '[0-9]') AS has_digit
        |FROM documents""".stripMargin,

    "x_date_funcs2" ->
      """SELECT o_orderkey,
        |  quarter(o_orderdate) AS q,
        |  dayofyear(o_orderdate) AS doy,
        |  day(o_orderdate) AS dom,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  CAST(o_orderdate AS DATE) + 45 AS plus45d,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  make_date(CAST(year(o_orderdate) AS INTEGER),
        |            CAST(month(o_orderdate) AS INTEGER), 1) AS first_of_month
        |FROM orders""".stripMargin,

    "x_array_setops" ->
      """WITH t AS (
        |  SELECT l_orderkey, l_linenumber,
        |    [l_orderkey % 7, l_partkey % 7, l_suppkey % 7] AS a,
        |    [l_orderkey % 5, l_partkey % 5] AS b,
        |    l_orderkey % 7 AS rm, l_suppkey % 7 AS fnd
        |  FROM lineitem WHERE l_orderkey % 20 = 0)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(list_sort(list_intersect(a, b)) AS VARCHAR) AS ai,
        |  CAST(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))) AS VARCHAR) AS ae,
        |  CAST(list_sort(list_distinct(a || b)) AS VARCHAR) AS au,
        |  list_position(a, fnd) AS pos,
        |  CAST(list_sort(list_filter(a, x -> x <> rm)) AS VARCHAR) AS arm,
        |  CAST(list_sort(list_distinct(a)) AS VARCHAR) AS ad
        |FROM t""".stripMargin
  )
}
