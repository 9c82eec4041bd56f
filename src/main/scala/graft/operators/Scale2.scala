package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-technique operators with exact correctness parity.
  *
  * Each query here is a pattern a 100 TB pipeline reaches for when the
  * naive plan stops scaling — and each is oracled against the naive
  * semantics, because the whole point of the technique is that it
  * changes the PLAN, never the ANSWER:
  *
  *  - **CDC apply** (`cdc_apply_latest`): collapsing a changelog to the
  *    latest-row-per-key snapshot with delete tombstones. Implemented
  *    as ONE hash aggregation (`max_by` over the (ts, id) struct) — a
  *    map-side-combining shuffle on the key, never a sort: the
  *    row_number window the oracle uses would sort every partition at
  *    100 TB; max_by keeps one row of state per key per map task.
  *
  *  - **Interval overlap join** (`iv_overlap_join`): the θ-join
  *    `a.start ≤ b.end AND b.start ≤ a.end` has no equi-key, so Spark
  *    would plan BNL (cross product — quadratic). Binning both sides to
  *    the fixed-width epochs their interval touches turns it into an
  *    equi-join on the bin: overlapping intervals share ≥1 bin by
  *    construction, non-overlapping pairs meet only within one bin
  *    width of each other. Candidates are distinct-ed (a pair can share
  *    several bins) and the exact predicate re-verified.
  *
  *  - **Salted aggregation / join** (`skew_salted_agg`,
  *    `skew_salted_join`): a hot key ("hot" owns ~70 % of lineitem
  *    here) lands its whole group on one task. Salting splits the hot
  *    group across `salt` sub-keys (two-phase re-aggregation), resp.
  *    replicates the dim row once per salt so the probe side spreads
  *    over `salt` tasks. Measures are summed in integer cents, so the
  *    re-association the salt introduces cannot perturb FP results —
  *    parity with the unsalted oracle is bit-exact.
  *
  *  - **Equi-depth histogram** (`hist_equidepth`): ntile within each
  *    o_orderpriority partition — a partitioned window, so every group
  *    sorts independently (a GLOBAL ntile would be a single-partition
  *    window: the anti-pattern this query exists to avoid).
  *
  *  - **Edit-distance battery** (`x_levenshtein`): levenshtein against
  *    the previous part name within a p_brand partition, plus
  *    Spark's banded `levenshtein(l, r, threshold)` variant (early-exit
  *    row-band DP — the form to use in a fuzzy-join hot path).
  *
  * Reference anchors: the changelog shape generalizes the consumer's
  * upsert-by-link store sink (collect/consumer.py:160-170); the skew
  * pattern is what the reference's single-host `local[*]` report job
  * (dags/daily_report_dag.py:32) never has to face but a cluster run
  * of the same GROUP BYs would.
  */
object Scale2 {

  private val NumSalts = 8

  /** Epoch-week bin index of a date (fixed-width binning for the
    * interval join; any origin works as long as both sides share it). */
  private def weekBin(d: Column): Column =
    floor(datediff(d, lit("1990-01-01").cast("date")) / 7)

  /** Skewed grouping key: ~70 % of lineitem collapses onto "hot". */
  private def skewKey: Column =
    when(col("l_orderkey") % 10 < 7, lit("hot"))
      .otherwise(concat(lit("k"), (col("l_orderkey") % 100).cast("string")))

  /** Exact integer cents of a 2-decimal double price. */
  private def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast("long")

  /** One side of the interval join: a keyed 15-day [start, end] window
    * per selected order. */
  private def intervals(s: SparkSession, dir: String,
                        modulus: Int, residue: Int, tag: String): DataFrame =
    Tables(s, dir, "orders")
      .where(col("o_orderkey") % modulus === residue)
      .select(col("o_orderkey").as(s"${tag}_key"),
        col("o_orderdate").cast("date").as(s"${tag}_start"),
        date_add(col("o_orderdate").cast("date"), 14).as(s"${tag}_end"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── CDC apply: latest row per key via ONE max_by aggregation;
    // 'error' tombstones delete the key from the snapshot. ───────────
    "cdc_apply_latest" -> ((s, dir) => {
      val e = Tables(s, dir, "events").select(
        col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      e.groupBy(col("user_id"))
        .agg(max_by(struct(col("event_type"), col("value"), col("us")),
          struct(col("us"), col("event_id"))).as("last"))
        .where(col("last.event_type") =!= "error")
        .select(col("user_id"), col("last.event_type").as("last_op"),
          Num.roundp(col("last.value"), 4).as("last_value"),
          col("last.us").as("last_us"))
    }),

    // ── Interval overlap θ-join via week binning: equi-join on the
    // bin, distinct the multi-bin pairs, re-verify the exact
    // predicate. Never a cross product. ──────────────────────────────
    "iv_overlap_join" -> ((s, dir) => {
      val a = intervals(s, dir, 31, 0, "a")
        .withColumn("bin", explode(sequence(weekBin(col("a_start")), weekBin(col("a_end")))))
      val b = intervals(s, dir, 37, 5, "b")
        .withColumn("bin", explode(sequence(weekBin(col("b_start")), weekBin(col("b_end")))))
      a.join(b, "bin")
        .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
        .select(col("a_key"), col("b_key"),
          (datediff(least(col("a_end"), col("b_end")),
            greatest(col("a_start"), col("b_start"))) + 1).as("overlap_days"))
        .distinct()
    }),

    // ── Salted two-phase aggregation: partial on (key, salt), final on
    // key. Integer-cent measures make the re-association exact. ──────
    "skew_salted_agg" -> ((s, dir) => {
      val partial = Tables(s, dir, "lineitem")
        .select(skewKey.as("k"), ((col("l_orderkey") + col("l_linenumber")) % NumSalts).as("salt"),
          col("l_quantity").cast("long").as("qty"),
          cents(col("l_extendedprice")).as("price_c"))
        .groupBy(col("k"), col("salt"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("q"), sum(col("price_c")).as("p"))
      partial.groupBy(col("k"))
        .agg(sum(col("n")).as("n_rows"), sum(col("q")).as("sum_qty"),
          sum(col("p")).as("sum_price_cents"))
    }),

    // ── Salted replicated join: dim × salts on the build side, fact
    // picks a deterministic salt — the hot suppkey's probe rows spread
    // over NumSalts tasks instead of one. ────────────────────────────
    "skew_salted_join" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
        .withColumn("salt", explode(sequence(lit(0), lit(NumSalts - 1))))
      val li = Tables(s, dir, "lineitem").select(
        col("l_suppkey"), ((col("l_orderkey") + col("l_linenumber")) % NumSalts).as("salt"),
        cents(col("l_extendedprice")).as("price_c"))
      li.join(sup,
          li("l_suppkey") === sup("s_suppkey") && li("salt") === sup("salt"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("rev_cents"))
    }),

    // ── Equi-depth histogram: ntile(10) inside each priority partition
    // (deterministic total order: (totalprice, orderkey)). ───────────
    "hist_equidepth" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("bucket", ntile(10).over(w))
        .groupBy(col("o_orderpriority"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          Num.roundp(min(col("o_totalprice")), 2).as("lo"),
          Num.roundp(max(col("o_totalprice")), 2).as("hi"))
    }),

    // ── Edit distance: full and banded (threshold=10 → -1 when the
    // band is exceeded) against the previous name in the partition. ──
    "x_levenshtein" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))
      Tables(s, dir, "part")
        .withColumn("prev_name", lag(col("p_name"), 1).over(w))
        .where(col("prev_name").isNotNull)
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("prev_name")).as("lev"),
          levenshtein(col("p_name"), col("prev_name"), 10).as("lev_band"))
    })
  )

  def oracles: Map[String, String] = Map(
    "cdc_apply_latest" ->
      """WITH r AS (
        |  SELECT user_id, event_type, value, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type AS last_op,
        |  floor(value * 10000 + 0.5) / 10000 AS last_value, us AS last_us
        |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    "iv_overlap_join" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key, CAST(o_orderdate AS DATE) AS a_start,
        |    CAST(o_orderdate AS DATE) + 14 AS a_end
        |  FROM orders WHERE o_orderkey % 31 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_key, CAST(o_orderdate AS DATE) AS b_start,
        |    CAST(o_orderdate AS DATE) + 14 AS b_end
        |  FROM orders WHERE o_orderkey % 37 = 5)
        |SELECT a_key, b_key,
        |  date_diff('day', greatest(a_start, b_start), least(a_end, b_end)) + 1 AS overlap_days
        |FROM a, b
        |WHERE a_start <= b_end AND b_start <= a_end""".stripMargin,

    "skew_salted_agg" ->
      """SELECT
        |  CASE WHEN l_orderkey % 10 < 7 THEN 'hot'
        |       ELSE 'k' || CAST(l_orderkey % 100 AS VARCHAR) END AS k,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM lineitem GROUP BY 1""".stripMargin,

    "skew_salted_join" ->
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,

    "hist_equidepth" ->
      """WITH t AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    ntile(10) OVER (PARTITION BY o_orderpriority
        |                    ORDER BY o_totalprice, o_orderkey) AS bucket
        |  FROM orders)
        |SELECT o_orderpriority, bucket, count(*) AS n,
        |  floor(min(o_totalprice) * 100 + 0.5) / 100 AS lo,
        |  floor(max(o_totalprice) * 100 + 0.5) / 100 AS hi
        |FROM t GROUP BY 1, 2""".stripMargin,

    "x_levenshtein" ->
      """WITH t AS (
        |  SELECT p_partkey, p_name,
        |    lag(p_name) OVER (PARTITION BY p_brand ORDER BY p_partkey) AS prev_name
        |  FROM part)
        |SELECT p_partkey,
        |  levenshtein(p_name, prev_name) AS lev,
        |  CASE WHEN levenshtein(p_name, prev_name) <= 10
        |       THEN levenshtein(p_name, prev_name) ELSE -1 END AS lev_band
        |FROM t WHERE prev_name IS NOT NULL""".stripMargin
  )
}
