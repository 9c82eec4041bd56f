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

  test("state survives a checkpointed restart: stale records stay suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = Tables(spark, sf001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .collect()
      .map { case (u, us, id, op, v) => Change(u, us, id, op, v) }
      .sortBy(c => (c.us, c.eventId))
    val (older, newer) = all.splitAt(all.length / 2)
    val fresh = Seq(Change(1L, Long.MaxValue - 1, Long.MaxValue, "click", 42.0))

    // The memory sink can't recover from a checkpoint — the repo's own
    // DataSourceV2 jsonl sink can, and logs every emission durably.
    val ckpt = java.nio.file.Files.createTempDirectory("cdc-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("cdc-out").toString
    val changes = MemoryStream[Change]
    def start() = CdcStream(changes.toDS()).writeStream
      .outputMode("update").format("graft-jsonl")
      .option("checkpointLocation", ckpt).start(out)

    // Run 1 consumes the NEWER half and checkpoints its state.
    val q1 = start()
    changes.addData(newer.toSeq)
    q1.processAllAvailable()
    q1.stop()

    // Run 2 recovers from the same checkpoint, then receives ONLY
    // stale records (the older half) plus one genuinely-new change.
    // Without recovered state every stale record would win its key.
    val q2 = start()
    changes.addData(older.toSeq ++ fresh)
    q2.processAllAvailable()
    q2.stop()

    // The durable emission log across both runs must contain NO older
    // record — state recovery is what suppressed them.
    val emitted = spark.read.json(out).as[CdcStream.SnapRow].collect()
    val newerIds = newer.map(_.eventId).toSet
    val leaked = emitted.filterNot(r =>
      newerIds.contains(r.eventId) || r.eventId == Long.MaxValue)
    assert(leaked.isEmpty, s"stale records emitted: ${leaked.take(3).toSeq}")
    assert(emitted.exists(r => r.userId == 1L && r.eventId == Long.MaxValue))

    // And the log converges to the batch snapshot over all records.
    val snap = emitted.groupBy(_.userId)
      .map { case (_, rows) => rows.maxBy(r => (r.us, r.eventId)) }
      .filterNot(_.deleted)
      .map(r => (r.userId, r.us, r.eventId)).toSet
    val batchWinners = (all ++ fresh).groupBy(_.userId)
      .map { case (_, rows) => rows.maxBy(c => (c.us, c.eventId)) }
      .filterNot(_.op == "error")
      .map(c => (c.userId, c.us, c.eventId)).toSet
    assert(snap === batchWinners)
  }
}
