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
    })
  )

  val oracles: Map[String, String] = Map(
    "t4_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n,
        |  floor((sum(value)) * 100 + 0.5) / 100 AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "t5_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT user_id, epoch_ms(ts) AS ms,
        |          lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ms
        |        FROM events))
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin
  )
}
