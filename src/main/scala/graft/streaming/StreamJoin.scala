package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY.md §2.9 extension; the
  * streaming-native form of the batch as-of/range joins in
  * graft.operators.AsOf): each click joined to the same user's
  * purchases landing within the next `horizonMinutes`.
  *
  * Both inputs are watermarked, and the join condition bounds
  * purchase_ts to [click_ts, click_ts + horizon], so Spark can expire
  * buffered rows once the watermark passes the interval — state is
  * O(rows inside watermark + horizon), never unbounded. At 100 TB/day
  * this is the only join shape that works stream-to-stream: an
  * unconstrained condition would force Spark to buffer both streams
  * forever (and the planner rejects it in append mode).
  */
object StreamJoin {

  /** clicks(click_user, click_id, click_ts) ⋈ purchases(purchase_user,
    * purchase_id, purchase_ts): interval join per user.
    *
    * With `joinType = "left_outer"`, a click with no purchase in its
    * horizon is emitted with NULL purchase columns — but only once the
    * watermark has passed `click_ts + horizon`, when Spark can prove no
    * future purchase can still match (unmatched emission is
    * watermark-driven, exactly like state expiry). */
  def clicksWithPurchases(clicks: DataFrame, purchases: DataFrame,
      horizonMinutes: Int = 10, lateness: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("click_ts", lateness)
    val p = purchases.withWatermark("purchase_ts", lateness)
    c.join(p,
      col("click_user") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
      joinType)
  }
}
