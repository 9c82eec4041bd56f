package graft.operators

import graft.Tables
import graft.functions.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form (SURVEY.md §2.9): tumbling
  * windows and gap-based sessionization. The same transforms run under
  * Structured Streaming (graft.streaming) — watermark + window for T4,
  * state for sessionization — this batch form is what the oracle checks.
  */
object Events {

  val queries: Map[String, Relational.Q] = Map(

    // ── T4: tumbling 1-hour window aggregate ──────────────────────────
    "t4_hourly_window" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("n"),
          Num.roundp(sum(col("value")), 2).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))),

    // ── time-series densification: hourly resample with gap fill ─────
    // Generates each user's full hourly grid between their first and
    // last event (sequence + explode) and left-joins observed counts —
    // the standard resample primitive; missing hours become 0.
    "t_gapfill_hours" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val bounds = ev.groupBy(col("user_id")).agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val hours = bounds.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour_ts"))
      val counts = ev.groupBy(col("user_id"),
          date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("n"))
      hours.join(counts, Seq("user_id", "hour_ts"), "left")
        .select(col("user_id"), col("hour_ts"), coalesce(col("n"), lit(0L)).as("n"))
    }),

    // ── OHLC resample: 6-hour bars per event type — open/close are the
    // values at the bar's first/last event under a TOTAL order. The
    // order key is the fixed-width "(us, event_id)" string: zero-padded
    // concatenation makes lexicographic = numeric, giving min_by/max_by
    // a single portable argument (a bare `us` would be nondeterministic
    // on timestamp ties — latent here, fatal on real tick data). One
    // map-side-combined aggregation; no window, no sort.
    // DOMAIN: lexicographic = numeric only holds for epoch_us >= 0
    // (post-1970 timestamps) and event_id < 10^10 — "%020d" / "%010d"
    // render a '-' sign or overflow the pad width otherwise. Both hold
    // for the events table by construction; pre-epoch data would need
    // an offset (us - MIN_US) and a wider id pad. DuckDB's printf
    // formats identically, so the oracle shares the assumption. ───────
    "t9_resample_ohlc" -> ((s, dir) => {
      val ordKey = format_string("%020d%010d", unix_micros(col("ts")), col("event_id"))
      Tables(s, dir, "events")
        .select(col("event_type"),
          floor(unix_micros(col("ts")) / (6L * 3600 * 1000000)).as("bar"),
          col("value"), ordKey.as("ok"))
        .groupBy(col("event_type"), col("bar"))
        .agg(count(lit(1)).as("n"),
          Num.roundp(min_by(col("value"), col("ok")), 4).as("open"),
          Num.roundp(max(col("value")), 4).as("high"),
          Num.roundp(min(col("value")), 4).as("low"),
          Num.roundp(max_by(col("value"), col("ok")), 4).as("close"))
    }),

    // ── T5-adjacent: sessionization by 30-min inactivity gaps ─────────
    "t5_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("prev_ms").isNull ||
               unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_s")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // ── T5b: Spark-native session windows (session_window groupBy).
    // Same operator Structured Streaming runs incrementally with a
    // watermark; here in batch, oracled via gaps-and-islands SQL.
    // Session end = last event + gap; an event at exactly
    // start+gap opens a NEW session ([start, end) half-open), hence
    // the >= in the oracle's island test. Microsecond precision on
    // both sides (unix_micros / epoch_us). ───────────────────────────
    "t5b_session_window" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          Num.roundp(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("n_events"), col("sum_value"))),

    // ── T6: sliding (hopping) window — 2-hour windows every hour, each
    // event lands in exactly two. Spark expands window() to an explode
    // of the overlapping buckets, then a plain hash aggregate; the
    // oracle mirrors that expansion with an explicit 2-offset unnest. ──
    "t6_sliding_window" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          Num.roundp(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
          col("n"), col("sum_value"))),

    // ── Ordered 3-step funnel (view → click → purchase), each step
    // within 24 h of the previous. Three aggregations + two joins, all
    // keyed on user_id — co-partitioned, so the plan pays one logical
    // shuffle key throughout; no per-user event collection. ──────────
    "ev_funnel" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val day = 86400000000L // µs
      val s1 = e.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("t1"))
      val s2 = e.where(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("tc"))
        .join(s1, "user_id")
        .where(col("tc") > col("t1") && col("tc") <= col("t1") + day)
        .groupBy(col("user_id")).agg(min(col("tc")).as("t2"))
      val s3 = e.where(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tp"))
        .join(s2, "user_id")
        .where(col("tp") > col("t2") && col("tp") <= col("t2") + day)
        .groupBy(col("user_id")).agg(min(col("tp")).as("t3"))
      s1.agg(count(lit(1)).as("n_step1"))
        .crossJoin(s2.agg(count(lit(1)).as("n_step2")))
        .crossJoin(s3.agg(count(lit(1)).as("n_step3")))
    }),

    // ── Daily active users + CUMULATIVE distinct reach. A windowed
    // COUNT(DISTINCT) is either rejected by engines or quadratic in
    // history; the scale-correct decomposition counts each user on
    // their FIRST day only (one user-keyed min), then running-sums the
    // per-day news — every stage is a keyed aggregate; the only global
    // window runs over day-count rows (30 here, ~3 650 for a decade —
    // metadata-sized by construction). ───────────────────────────────
    "ev_cumulative_reach" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val newPerDay = e.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      val actPerDay = e.distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("n_active"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      actPerDay.join(newPerDay, Seq("day"), "left")
        .select(col("day"), col("n_active"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("cum_reach", sum(col("n_new")).over(w))
    }),

    // ── Markov transition matrix over the per-user event sequence:
    // (state → next state) counts via one lead() window keyed on
    // user_id, then a global count + per-source normalization. Scale
    // shape: the window shuffles once on user_id (per-user sequences
    // processed independently), the transition matrix itself is
    // |states|²-sized — the user-journey model every product-analytics
    // and session-synthesis pipeline starts from. ────────────────────
    "ev_markov_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val pairs = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type").as("from_state"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("to_state", lead(col("from_state"), 1).over(w))
        .where(col("to_state").isNotNull)
      val counts = pairs.groupBy(col("from_state"), col("to_state"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("from_state")).agg(sum(col("n")).as("tot"))
      counts.join(totals, "from_state")
        .select(col("from_state"), col("to_state"), col("n"),
          Num.roundp(col("n").cast("double") / col("tot"), 6).as("p"))
    }),

    // ── Weekly cohort retention: users bucketed by first-active week,
    // retention(k) = |active in cohort-week + k| / |cohort|. Two
    // aggregations keyed on user_id (distinct weeks, first week) + one
    // cohort-sized join — the corpus shuffles once on user_id; week
    // arithmetic is exact integer µs (truncated weeks differ by exact
    // multiples of 604 800 000 000), so k and the ratio are
    // engine-stable. ─────────────────────────────────────────────────
    "ev_retention_cohorts" -> ((s, dir) => {
      val wk = Tables(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = wk.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
      wk.join(first, "user_id")
        .select(col("cohort"),
          expr("(unix_micros(wk) - unix_micros(cohort)) div 604800000000")
            .as("k"))
        .groupBy(col("cohort"), col("k")).agg(count(lit(1)).as("n_active"))
        .join(sizes, "cohort")
        .select(col("cohort"), col("k"), col("n_active"), col("n_cohort"),
          Num.roundp(col("n_active").cast("double") / col("n_cohort"), 6)
            .as("retention"))
    }),

    // ── Robust per-user outlier profile: rank-based median and MAD
    // (median absolute deviation), flagging |v − med| > 3·MAD. The
    // medians are ORDER-STATISTIC selections (row_number = (n+1) div 2
    // over (value, event_id)) rather than interpolating percentiles —
    // the selected value is an exact input double on BOTH engines, so
    // the 3·MAD threshold compares identical bits and no quantization
    // of the intermediate is needed. Two window passes + one grouped
    // aggregate, all partitioned on user_id (one logical shuffle key);
    // per-user event counts are bounded, so the windows never
    // concentrate. ───────────────────────────────────────────────────
    "t10_mad_outliers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"))
      val byUser = Window.partitionBy("user_id")
      val wv = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
      val med = e.withColumn("rn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(byUser))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("user_id"), col("value").as("med"))
      val dev = e.join(med, "user_id")
        .withColumn("ad", abs(col("value") - col("med")))
      val wa = Window.partitionBy("user_id").orderBy(col("ad"), col("event_id"))
      val mad = dev.withColumn("rn", row_number().over(wa))
        .withColumn("n", count(lit(1)).over(byUser))
        .where(col("rn") === expr("(n + 1) div 2"))
        .select(col("user_id"), col("ad").as("mad"))
      dev.join(mad, "user_id")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          Num.roundp(min(col("med")), 4).as("med"),
          Num.roundp(min(col("mad")), 4).as("mad"),
          sum(when(col("ad") > lit(3.0) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
    })
  )

  val oracles: Map[String, String] = Map(
    "t9_resample_ohlc" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 21600000000) AS BIGINT) AS bar,
        |    value,
        |    printf('%020d%010d', epoch_us(ts), event_id) AS ok
        |  FROM events)
        |SELECT event_type, bar, count(*) AS n,
        |  floor(arg_min(value, ok) * 10000 + 0.5) / 10000 AS open,
        |  floor(max(value) * 10000 + 0.5) / 10000 AS high,
        |  floor(min(value) * 10000 + 0.5) / 10000 AS low,
        |  floor(arg_max(value, ok) * 10000 + 0.5) / 10000 AS close
        |FROM e GROUP BY 1, 2""".stripMargin,

    "t4_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n,
        |  floor((sum(value)) * 100 + 0.5) / 100 AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "t_gapfill_hours" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1
        |  FROM events GROUP BY user_id),
        |hours AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
        |  FROM b),
        |c AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour_ts, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT h.user_id, h.hour_ts, coalesce(c.n, 0) AS n
        |FROM hours h LEFT JOIN c USING (user_id, hour_ts)""".stripMargin,

    "t5_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT user_id, epoch_ms(ts) AS ms,
        |          lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ms
        |        FROM events))
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,

    "t5b_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        |  FROM events),
        |g AS (
        |  SELECT user_id, us, value,
        |    sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1
        |             ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
        |  count(*) AS n_events, floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin,

    "t6_sliding_window" ->
      """WITH w AS (
        |  SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS win_start, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) o)
        |SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end,
        |  count(*) AS n, floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
        |FROM w GROUP BY 1""".stripMargin,

    "ev_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click'
        |    AND epoch_us(e.ts) > s1.t1 AND epoch_us(e.ts) <= s1.t1 + 86400000000
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) > s2.t2 AND epoch_us(e.ts) <= s2.t2 + 86400000000
        |  GROUP BY 1)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_step1,
        |       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_step2,
        |       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_step3""".stripMargin,

    "ev_cumulative_reach" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS day FROM d GROUP BY 1),
        |nw AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1),
        |act AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active FROM d GROUP BY 1)
        |SELECT act.day, act.n_active, coalesce(nw.n_new, 0) AS n_new,
        |  CAST(sum(coalesce(nw.n_new, 0)) OVER (ORDER BY act.day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_reach
        |FROM act LEFT JOIN nw ON act.day = nw.day""".stripMargin,

    "ev_markov_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_state
        |  FROM events),
        |c AS (
        |  SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_state, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.from_state, c.to_state, c.n,
        |  floor((CAST(c.n AS DOUBLE) / t.tot) * 1000000 + 0.5) / 1000000 AS p
        |FROM c JOIN t USING (from_state)""".stripMargin,

    "ev_retention_cohorts" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort FROM wk GROUP BY 1),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
        |       FROM f GROUP BY 1),
        |act AS (
        |  SELECT f.cohort,
        |    CAST((epoch_us(wk.wk) - epoch_us(f.cohort)) // 604800000000
        |      AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM wk JOIN f ON f.user_id = wk.user_id
        |  GROUP BY 1, 2)
        |SELECT act.cohort, act.k, act.n_active, sz.n_cohort,
        |  floor(CAST(act.n_active AS DOUBLE) / sz.n_cohort * 1000000 + 0.5)
        |    / 1000000 AS retention
        |FROM act JOIN sz USING (cohort)""".stripMargin,

    "t10_mad_outliers" ->
      """WITH e AS (SELECT user_id, event_id, value FROM events),
        |r AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |med AS (SELECT user_id, value AS med FROM r WHERE rn = (n + 1) // 2),
        |dev AS (
        |  SELECT e.user_id, e.event_id, m.med, abs(e.value - m.med) AS ad
        |  FROM e JOIN med m ON m.user_id = e.user_id),
        |r2 AS (
        |  SELECT user_id, ad,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ad, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM dev),
        |mad AS (SELECT user_id, ad AS mad FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT d.user_id, CAST(count(*) AS BIGINT) AS n,
        |  floor(min(d.med) * 10000 + 0.5) / 10000 AS med,
        |  floor(min(m.mad) * 10000 + 0.5) / 10000 AS mad,
        |  CAST(sum(CASE WHEN d.ad > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad m ON m.user_id = d.user_id
        |GROUP BY d.user_id""".stripMargin
  )
}
