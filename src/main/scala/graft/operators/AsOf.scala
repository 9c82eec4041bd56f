package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J3) — each left row matched to the most
  * recent right row with the same key and time <= the left time. Spark
  * has no built-in; rather than a custom SparkPlan, this composes the
  * classic merge-union formulation, which is also the scale-correct
  * plan: ONE shuffle on the key and one sort per partition — the same
  * cost profile a native as-of physical operator would have:
  *
  *   union(left tagged 1, right tagged 0)
  *     → window(partitionBy key, orderBy time, tag):
  *         carry forward the last right payload (ignoreNulls last)
  *     → keep left rows.
  *
  * Right rows at exactly the left time match (tag 0 sorts first), the
  * inclusive `>=` convention of SQL ASOF JOIN — DuckDB's native
  * `ASOF LEFT JOIN` is the oracle.
  */
object AsOf {

  /** left ⟕asof right on `key`, `time`. `payload` columns from the right
    * are carried to the matching left row (null when no earlier right
    * row exists). Both inputs must contain `key` and `time`.
    *
    * The whole right payload is carried as ONE struct over the window so
    * every output field comes from the same matched right row, and a
    * matched row's genuinely-NULL payload value stays NULL instead of
    * being back-filled from an older row — the row-wholesale semantics
    * of SQL ASOF JOIN. */
  def join(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame = {
    val lAll = left.withColumn("_is_left", lit(1))
    val rAll = right.select((Seq(col(key), col(time)) ++ payload.map(col)): _*)
      .withColumn("_is_left", lit(0))
    // unionByName null-fills: payload columns on left rows, left-only
    // columns on right rows.
    val unioned = lAll.unionByName(rAll, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof",
      last(when(col("_is_left") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    val unpacked = payload.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col("_asof").getField(c))
    }
    unpacked.where(col("_is_left") === 1)
      .drop("_is_left", "_asof").drop(payload: _*)
  }

  /** Forward as-of: each left row matched to the EARLIEST right row with
    * the same key and time >= the left time (the "next event" join —
    * attribution windows, next-purchase lookahead). Mirror of [[join]]:
    * first-over-following instead of last-over-preceding; at equal
    * times the right row still matches (left sorts first via the
    * descending tag), the inclusive `<=` of DuckDB's forward ASOF. */
  def joinForward(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame = {
    val lAll = left.withColumn("_is_left", lit(1))
    val rAll = right.select((Seq(col(key), col(time)) ++ payload.map(col)): _*)
      .withColumn("_is_left", lit(0))
    val unioned = lAll.unionByName(rAll, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned.withColumn("_asof",
      first(when(col("_is_left") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    val unpacked = payload.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col("_asof").getField(c))
    }
    unpacked.where(col("_is_left") === 1)
      .drop("_is_left", "_asof").drop(payload: _*)
  }

  /** Native-operator form of [[join]]: plans through
    * [[graft.plans.AsOfJoinNode]] → [[graft.plans.AsOfJoinExec]] — a
    * streaming sorted merge with O(1) state instead of the union+window
    * materialization. Payload columns keep their own names (no `asof_`
    * prefix: they come from a distinct attribute set). Registers the
    * strategy on the session if absent. */
  def joinNative(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame =
    nativeImpl(left, right, key, time, payload, forward = false)

  /** Forward counterpart of [[joinNative]] (see [[joinForward]]): the
    * earliest right row at or after the left time — the same physical
    * merge run over descending time. */
  def joinForwardNative(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame =
    nativeImpl(left, right, key, time, payload, forward = true)

  private def nativeImpl(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    // Fresh exprIds on the right so self-as-of (both sides filtered from
    // the same scan) can't alias attributes across sides.
    val r = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val lp = left.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(sys.error(s"column $n not found"))
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      graft.plans.AsOfJoinNode(lp, rp, attr(lp, key), attr(lp, time),
        attr(rp, key), attr(rp, time), payload.map(attr(rp, _)), forward))
  }

  private def clicksAndPurchases(s: SparkSession, dir: String) = {
    val ev = Tables(s, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"))
    (clicks, purchases)
  }

  /** Inventory queries: each click matched to the user's most recent
    * purchase at or before it (backward), and to the next purchase at
    * or after it (forward). */
  val queries: Map[String, Relational.Q] = Map(
    "j3_asof_join" -> ((s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      join(clicks, purchases, "user_id", "ts", Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          col("asof_purchase_id").as("purchase_id"),
          col("asof_purchase_value").as("purchase_value"))
    }),

    // ── Same join through the native physical operator; same oracle
    // as j3_asof_join — the two forms must be indistinguishable. ─────
    "j3_asof_native" -> ((s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      joinNative(clicks, purchases, "user_id", "ts", Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          col("purchase_id"), col("purchase_value"))
    }),

    "j3_asof_fwd_native" -> ((s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      joinForwardNative(clicks, purchases, "user_id", "ts", Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          col("purchase_id"), col("purchase_value"))
    }),

    "j3_asof_forward" -> ((s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      joinForward(clicks, purchases, "user_id", "ts", Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          col("asof_purchase_id").as("purchase_id"),
          col("asof_purchase_value").as("purchase_value"))
    }),

    // ── Tolerance as-of: the backward match is only valid when it is at
    // most 1 hour older than the left row — the sensor-fusion /
    // stale-quote variant of ASOF. Composed ON TOP of the native
    // operator: the unconditional nearest match is either inside the
    // tolerance or there is no valid match at all (anything older is
    // even staler), so one as-of + one CASE is complete — no second
    // pass, same O(1)-state merge cost as j3_asof_native. The matched
    // right time rides along as an extra payload column to evaluate the
    // gap. ───────────────────────────────────────────────────────────
    "j3_asof_tolerance" -> ((s, dir) => {
      val (clicks, purchases) = clicksAndPurchases(s, dir)
      val p = purchases.withColumn("p_ts", col("ts"))
      val j = joinNative(clicks, p, "user_id", "ts",
        Seq("purchase_id", "purchase_value", "p_ts"))
      val fresh = col("p_ts").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("p_ts")) <= lit(3600L * 1000000L)
      j.select(col("event_id"), col("user_id"),
        when(fresh, col("purchase_id")).as("purchase_id"),
        when(fresh, col("purchase_value")).as("purchase_value"))
    }))

  val oracles: Map[String, String] = Map(
    "j3_asof_join" ->
      """SELECT c.event_id, c.user_id,
        |  p.event_id AS purchase_id, p.value AS purchase_value
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "j3_asof_native" ->
      """SELECT c.event_id, c.user_id,
        |  p.event_id AS purchase_id, p.value AS purchase_value
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "j3_asof_fwd_native" ->
      """SELECT c.event_id, c.user_id,
        |  p.event_id AS purchase_id, p.value AS purchase_value
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin,

    "j3_asof_forward" ->
      """SELECT c.event_id, c.user_id,
        |  p.event_id AS purchase_id, p.value AS purchase_value
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin,

    "j3_asof_tolerance" ->
      """SELECT c.event_id, c.user_id,
        |  CASE WHEN p.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
        |       THEN p.event_id END AS purchase_id,
        |  CASE WHEN p.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
        |       THEN p.value END AS purchase_value
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin)
}
