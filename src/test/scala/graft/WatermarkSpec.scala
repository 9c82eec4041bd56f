package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Event-time streaming semantics (SURVEY.md §2.9 T3/T4 extended
  * surface): watermark + tumbling window aggregation, and bounded-state
  * streaming dedup — the engine-level replacements for the reference's
  * absent event-time handling and its 1000-URL dedup deque. */
class WatermarkSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed aggregation with watermark emits closed windows only (append mode)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()

    mem.addData(
      (ts("2025-05-24 09:10:00"), "click", 1.0),
      (ts("2025-05-24 09:40:00"), "click", 2.0),
      (ts("2025-05-24 09:50:00"), "view", 5.0))
    q.processAllAvailable()
    // advance event time far enough to close the 09:00 window
    mem.addData((ts("2025-05-24 11:30:00"), "click", 9.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("win_out").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("v")))
    // the 09:00-10:00 windows are closed and emitted; 11:00 still open
    assert(out.toSet == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("streaming session_window merges and closes sessions incrementally (T5b)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_win_out").start()

    mem.addData((ts("2025-05-24 09:00:00"), 1L), (ts("2025-05-24 09:20:00"), 1L))
    q.processAllAvailable()
    // watermark passes 09:20+30min → user 1's merged session closes
    mem.addData((ts("2025-05-24 11:00:00"), 2L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_win_out").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(out == Map(1L -> 2L)) // user 2's session still open
  }

  test("dropDuplicatesWithinWatermark bounds dedup state (F12/T5)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val dedup = mem.toDF().toDF("ts", "link")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("link")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    mem.addData((ts("2025-05-24 09:00:00"), "l1"), (ts("2025-05-24 09:01:00"), "l1"))
    q.processAllAvailable()
    mem.addData((ts("2025-05-24 09:02:00"), "l1")) // still inside watermark → dup
    q.processAllAvailable()
    q.stop()

    assert(spark.table("dedup_out").count() == 1)
  }
}
