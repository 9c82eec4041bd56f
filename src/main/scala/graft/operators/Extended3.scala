package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third scalar/aggregate battery: SQL:2016 regression aggregates,
  * ordered string aggregation + mode/boolean aggregates, and an EWMA
  * time-series smoother — rounding out the aggregate surface beyond
  * SURVEY §2.4/§2.8 (the reference computes none of these, but any
  * analytics engine replacing it is expected to).
  *
  * All three are single-pass shapes: the regression battery is one
  * grouped aggregation (Spark's regr_* are codegen'd DeclarativeAggregates —
  * partial merge is sum-of-moments, so the shuffle carries six doubles
  * per group); the EWMA is a window expression computed as a closed
  * form (α·Σ(1−α)^(rn_last−rn_i)·x_i) rather than a sequential scan, so
  * it parallelizes like any frame aggregate.
  */
object Extended3 {

  val queries: Map[String, Relational.Q] = Map(

    // ── SQL:2016 regression aggregates per return flag: price as a
    // linear function of quantity. ───────────────────────────────────
    "a_regression" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          Num.roundp(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          Num.roundp(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          Num.roundp(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          Num.roundp(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6).as("avgx"),
          Num.roundp(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4).as("avgy"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pairs"))),

    // ── Ordered string agg, mode, boolean aggregates. listagg gets an
    // explicit ORDER BY (unordered listagg is nondeterministic by
    // definition); mode is probed on a column whose per-group mode is
    // unique (order priority within status); booleans cast to int for
    // engine-neutral hashing. ────────────────────────────────────────
    "a_agg_funcs2" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.groupBy(col("o_orderstatus"))
        .agg(
          listagg_distinct(col("o_orderpriority"), lit(",")).as("prios_raw"),
          max(col("o_orderpriority")).as("max_prio"),
          bool_and(col("o_totalprice") > 0).cast("int").as("all_positive"),
          bool_or(col("o_totalprice") > 400000).cast("int").as("any_large"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .withColumn("prios", concat_ws(",", sort_array(split(col("prios_raw"), ","))))
        .drop("prios_raw")
    }),

    // ── Per-group z-score outlier gate: the feature-normalization
    // profile a training pipeline runs before standardizing a column —
    // group stats plus how many rows sit beyond 2σ. One aggregation,
    // one broadcast join back, one conditional re-aggregation. ───────
    "a_group_outliers" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").as("x"))
      // Stats are QUANTIZED before the 2σ predicate: the engines'
      // stddev algorithms differ at ~1e-10 relative, and an
      // unquantized threshold would let a row inside that band flip
      // n_outliers between engines (the sim_label_outliers bug class).
      val stats = li.groupBy(col("l_returnflag"))
        .agg(Num.roundp(avg(col("x")), 4).as("mean"),
          Num.roundp(stddev_samp(col("x")), 4).as("sd"))
      li.join(broadcast(stats), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          first(col("mean")).as("mean"),
          first(col("sd")).as("sd"),
          sum(when(abs(col("x") - col("mean")) > lit(2.0) * col("sd"), 1).otherwise(0))
            .as("n_outliers"))
    }),

    // ── Time-weighted average of each user's gauge value: each sample
    // holds until the next one, so the weight is the µs interval to the
    // next event (the last sample carries no interval). The standard
    // downsampling aggregate for irregular time series. ──────────────
    "t8_twap" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"),
          col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val iv = e.withColumn("next_us", lead(col("us"), 1).over(w))
        .where(col("next_us").isNotNull)
        .withColumn("dt", (col("next_us") - col("us")).cast("double"))
      iv.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          Num.roundp(sum(col("value") * col("dt")) / sum(col("dt")), 4).as("twap"))
    }),

    // ── EWMA (α=0.3) of each user's event values in time order,
    // reporting the final smoothed value per user. The recurrence is
    // sequential, but the closed form α·(1−α)^n·Σ(1−α)^(−i)·x_i turns
    // it into a plain frame SUM — fully parallel, one shuffle on
    // user_id. Events per user are bounded (≤ ~100), so the (1−α)^(−i)
    // scaling stays far from overflow; the magnitude ordering means the
    // terms rounding error discards are exactly the terms EWMA decays
    // away. ──────────────────────────────────────────────────────────
    "t7_ewma" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val alpha = 0.3
      val withRn = e.withColumn("rn", row_number().over(w))
      val acc = withRn
        .withColumn("sc", col("value") * pow(lit(1 - alpha), -col("rn")))
        .withColumn("acc", sum(col("sc"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("ewma", col("acc") * pow(lit(1 - alpha), col("rn")) * alpha)
      acc.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          Num.roundp(max_by(col("ewma"), col("rn")), 4).as("ewma_last"))
    })
  )

  val oracles: Map[String, String] = Map(
    "a_regression" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  floor(regr_slope(l_extendedprice, l_quantity) * 10000 + 0.5) / 10000 AS slope,
        |  floor(regr_intercept(l_extendedprice, l_quantity) * 10000 + 0.5) / 10000 AS intercept,
        |  floor(regr_r2(l_extendedprice, l_quantity) * 1000000 + 0.5) / 1000000 AS r2,
        |  floor(regr_avgx(l_extendedprice, l_quantity) * 1000000 + 0.5) / 1000000 AS avgx,
        |  floor(regr_avgy(l_extendedprice, l_quantity) * 10000 + 0.5) / 10000 AS avgy,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
        |FROM lineitem GROUP BY 1""".stripMargin,

    "a_agg_funcs2" ->
      """SELECT o_orderstatus,
        |  max(o_orderpriority) AS max_prio,
        |  CAST(bool_and(o_totalprice > 0) AS INTEGER) AS all_positive,
        |  CAST(bool_or(o_totalprice > 400000) AS INTEGER) AS any_large,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |  array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS prios
        |FROM orders GROUP BY 1""".stripMargin,

    "a_group_outliers" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    floor(avg(l_extendedprice) * 10000 + 0.5) / 10000 AS mean,
        |    floor(stddev_samp(l_extendedprice) * 10000 + 0.5) / 10000 AS sd
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  s.mean AS mean, s.sd AS sd,
        |  CAST(count(*) FILTER (WHERE abs(l.l_extendedprice - s.mean) > 2.0 * s.sd) AS BIGINT)
        |    AS n_outliers
        |FROM lineitem l JOIN s ON s.l_returnflag = l.l_returnflag
        |GROUP BY 1, s.mean, s.sd""".stripMargin,

    "t8_twap" ->
      """WITH e AS (
        |  SELECT user_id, value, epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      AS next_us
        |  FROM events),
        |iv AS (
        |  SELECT user_id, value, CAST(next_us - us AS DOUBLE) AS dt
        |  FROM e WHERE next_us IS NOT NULL)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  floor(sum(value * dt) / sum(dt) * 10000 + 0.5) / 10000 AS twap
        |FROM iv GROUP BY 1""".stripMargin,

    "t7_ewma" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, rn,
        |    sum(value * power(0.7, -rn))
        |      OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING)
        |      * power(0.7, rn) * 0.3 AS ewma
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  floor(arg_max(ewma, rn) * 10000 + 0.5) / 10000 AS ewma_last
        |FROM s GROUP BY 1""".stripMargin
  )
}
