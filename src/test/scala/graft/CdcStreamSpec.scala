package graft

import graft.streaming.CdcStream
import graft.streaming.CdcStream.Change
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC apply: the held snapshot must converge to the batch
  * cdc_apply_latest result under disorder, duplication, and replay. */
class CdcStreamSpec extends SparkSuite {

  test("snapshot after out-of-order batches with replays equals batch max_by") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // The real sf0.001 events as the changelog, split into two batches
    // the WRONG way around (newest half first), batch 1's first 50
    // replayed verbatim in batch 2.
    val all = Tables(spark, sf001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .collect()
      .map { case (u, us, id, op, v) => Change(u, us, id, op, v) }
      .sortBy(c => (c.us, c.eventId))
    val (older, newer) = all.splitAt(all.length / 2)

    val changes = MemoryStream[Change]
    val q = CdcStream(changes.toDS())
      .writeStream.outputMode("update").format("memory").queryName("cdc").start()
    try {
      changes.addData(newer.toSeq)
      q.processAllAvailable()
      changes.addData(older.toSeq ++ newer.take(50))
      q.processAllAvailable()
    } finally q.stop()

    // Latest emission per key = the snapshot; drop tombstoned keys.
    val emitted = spark.table("cdc").as[CdcStream.SnapRow].collect()
    val snap = emitted.groupBy(_.userId)
      .map { case (u, rows) => rows.maxBy(r => (r.us, r.eventId)) }
      .filterNot(_.deleted)
      .map(r => (r.userId, r.op, math.floor(r.value * 10000 + 0.5) / 10000, r.us))
      .toSet

    val batch = SparkEntry.queries("cdc_apply_latest")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(snap === batch)
    assert(snap.nonEmpty)

    // Stragglers behind a tombstone must not resurrect the key: every
    // tombstoned key's state survived (held, deleted=true), so a replay
    // of an older change emitted nothing new for it in batch 2.
    val dead = emitted.groupBy(_.userId)
      .map { case (u, rows) => rows.maxBy(r => (r.us, r.eventId)) }
      .filter(_.deleted).map(_.userId).toSet
    assert(dead.intersect(snap.map(_._1)).isEmpty)
  }
}
