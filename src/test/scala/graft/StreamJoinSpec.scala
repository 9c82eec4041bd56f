package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamJoinSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join matches purchases within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(String, Long, Timestamp)]
    val purchases = MemoryStream[(String, Long, Timestamp)]
    val joined = StreamJoin.clicksWithPurchases(
      clicks.toDF().toDF("click_user", "click_id", "click_ts"),
      purchases.toDF().toDF("purchase_user", "purchase_id", "purchase_ts"))

    val q = joined.writeStream.format("memory").queryName("sj").start()
    try {
      clicks.addData(
        ("u1", 1L, ts("2025-05-24 09:00:00")),
        ("u1", 2L, ts("2025-05-24 12:00:00")),
        ("u2", 3L, ts("2025-05-24 09:00:00")))
      purchases.addData(
        ("u1", 10L, ts("2025-05-24 09:05:00")), // within 10 min of click 1
        ("u1", 11L, ts("2025-05-24 11:00:00")), // matches no click
        ("u2", 12L, ts("2025-05-24 09:20:00"))) // outside u2's horizon
      q.processAllAvailable()

      val rows = spark.table("sj").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
        .toSet
      assert(rows == Set((1L, 10L)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched clicks after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(String, Long, Timestamp)]
    val purchases = MemoryStream[(String, Long, Timestamp)]
    val joined = StreamJoin.clicksWithPurchases(
      clicks.toDF().toDF("click_user", "click_id", "click_ts"),
      purchases.toDF().toDF("purchase_user", "purchase_id", "purchase_ts"),
      joinType = "left_outer")

    val q = joined.writeStream.format("memory").queryName("sjo").start()
    try {
      clicks.addData(
        ("u1", 1L, ts("2025-05-24 09:00:00")),  // will match
        ("u3", 2L, ts("2025-05-24 09:00:00")))  // no purchase ever
      purchases.addData(("u1", 10L, ts("2025-05-24 09:05:00")))
      q.processAllAvailable()

      // advance both watermarks far past 09:10 + lateness so the
      // unmatched click's state can be finalized
      clicks.addData(("u9", 99L, ts("2025-05-24 13:00:00")))
      purchases.addData(("u9", 98L, ts("2025-05-24 13:00:00")))
      q.processAllAvailable()

      val rows = spark.table("sjo").collect()
        .map(r => (r.getAs[Long]("click_id"),
          Option(r.getAs[java.lang.Long]("purchase_id")).map(_.longValue)))
        .toSet
      assert(rows.contains((1L, Some(10L)))) // matched pair
      assert(rows.contains((2L, None)))      // unmatched, emitted as NULL
    } finally q.stop()
  }

  test("state is bounded: the join requires both sides watermarked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Long, Timestamp)]
    val purchases = MemoryStream[(String, Long, Timestamp)]
    val joined = StreamJoin.clicksWithPurchases(
      clicks.toDF().toDF("click_user", "click_id", "click_ts"),
      purchases.toDF().toDF("purchase_user", "purchase_id", "purchase_ts"))
    // both event-time columns carry watermarks in the analyzed plan
    val wm = joined.queryExecution.analyzed.toString
    assert(wm.contains("EventTimeWatermark"), wm)
    assert("EventTimeWatermark".r.findAllIn(wm).length == 2, wm)
  }
}
