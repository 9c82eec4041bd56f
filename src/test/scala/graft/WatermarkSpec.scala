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
