package graft.streaming

import graft.operators.{IncPostings, TextOps}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the incremental trigram index — the
  * micro-batch twin of [[IncPostings]]' batch timeline (r10 verdict
  * #6): a CDC-shaped change stream `(doc_id, text, op)` with
  * `op ∈ {upsert, delete}` drives one committed index generation per
  * micro-batch through the same segment/tombstone/manifest machinery,
  * so a stream-maintained index IS a batch-maintained index — same
  * storage, same reader, same LSM visibility rule.
  *
  * Replay idempotence (foreachBatch's at-least-once contract): the
  * batchId rides INSIDE the committed manifest — the same atomic
  * create-fails-if-exists that publishes the generation records which
  * batch produced it, so the replay marker is transactional with the
  * commit itself. A `commits/batch-<id>` marker file written after
  * the commit is only the fast path; when it is missing (crash
  * between manifest link and marker write) the replay consults the
  * retained manifests' batchIds before committing again, so the
  * commit completes exactly once in every crash position. (Retention
  * cannot expire the unmarked generation first: maintenance for a
  * batch runs after its marker, and later batches are only delivered
  * once this batch's foreachBatch returned.) A batch killed
  * mid-commit left no manifest — its orphaned segment files are
  * superseded by the replay's fresh writer-unique dirs and swept by
  * retention. Contract: at most one change record per doc_id per
  * batch (upstream CDC compaction — the same assumption as
  * CdcStream's tombstone stream).
  *
  * Scale shape: per batch, cost is batch-sized tokenization + one
  * metadata commit — the standing corpus is never re-read; probes stay
  * merge-on-read over segments. At 100 TB this is the only viable
  * freshness path for a text index (the full rebuild is 510 s at the
  * 100× corpus — BASELINE.md decade table — and a daily stream of
  * edits cannot pay it per batch). */
object IndexDeltaStream {

  /** Apply one change batch as one index generation. Exposed for the
    * spec's direct replay test; the streaming entry below wires it
    * into foreachBatch. */
  private[graft] def applyBatch(root: java.io.File, batch: DataFrame,
      batchId: Long, compactAtSegments: Int = Int.MaxValue,
      keepGens: Int = Int.MaxValue,
      rowsOf: DataFrame => DataFrame = TextOps.trigramRowsOf,
      layout: Seq[String] = Seq("g", "doc_id"),
      retainGraceMs: Long = IncPostings.RetainGraceMs,
      postCommit: (org.apache.spark.sql.SparkSession, java.io.File) => Unit =
        (_, _) => ()): Unit = {
    val marker = new java.io.File(root, f"commits/batch-$batchId%05d")
    if (marker.exists()) return // replayed batch: fast path
    if (!IncPostings.isBatchCommitted(root, batchId)) {
      // Payload-agnostic: the change record is (doc_id, <payload>, op)
      // — text for the postings kinds, an embedding for the vector
      // kind — and `rowsOf` owns turning the payload into index rows.
      val ups = batch.where(col("op") === "upsert").drop("op")
      val dels = batch.where(col("op") === "delete").select(col("doc_id"))
      // An upsert tombstones the doc's OLD postings; its new rows ride
      // the delta segment at the tombstone's seq (the LSM rule keeps
      // exactly the new ones). A delete is tombstone-only.
      IncPostings.commitDelta(root, rowsOf(ups),
        dels.unionByName(ups.select(col("doc_id"))), Some(batchId))
    }
    marker.getParentFile.mkdirs()
    marker.createNewFile()
    // Post-commit maintenance (best-effort — a crash here costs nothing
    // a later batch's pass won't redo): compaction when the live
    // generation's segment chain passes the read-amplification bound,
    // then retention of expired generations. Runs AFTER the marker, so
    // a replayed batch skips it with the commit; maintenance cadence is
    // per fresh batch, which bounds the chain at compactAtSegments + 1.
    val s = batch.sparkSession
    if (IncPostings.liveSegmentCount(root) >= compactAtSegments)
      IncPostings.compact(s, root, layout)
    if (keepGens != Int.MaxValue)
      // The grace default keeps this safe even when a SEPARATE
      // compaction daemon shares the root (the two-writer reality the
      // optimistic commit protocol admits): an in-flight fold's
      // unreferenced data dirs survive the sweep.
      IncPostings.retain(s, root, keepGens, retainGraceMs)
    // Kind-owned maintenance policy (e.g. the ivfvec skew gauge +
    // recluster): runs on the maintainer's own thread after each FRESH
    // batch, so a policy commit is single-writer with the batch
    // commits and a commitReplace here cannot conflict with them.
    postCommit(s, root)
  }

  /** Start maintaining the index at `root` (which must hold a committed
    * base generation — [[IncPostings.commitBase]]) from a change
    * stream. `compactAtSegments` / `keepGens` bound read amplification
    * and disk growth over an unbounded stream — without them a
    * long-running maintainer accretes one segment per batch forever.
    * `rowsOf`/`layout` select the index kind: trigram postings by
    * default, [[TextOps.positionalRowsOf]] + `Seq("tok","doc_id")` for
    * the phrase index — any (doc_id, …) postings layout rides the same
    * LSM machinery. */
  def start(changes: DataFrame, root: java.io.File, checkpoint: String,
      compactAtSegments: Int = Int.MaxValue,
      keepGens: Int = Int.MaxValue,
      rowsOf: DataFrame => DataFrame = TextOps.trigramRowsOf,
      layout: Seq[String] = Seq("g", "doc_id"),
      retainGraceMs: Long = IncPostings.RetainGraceMs,
      postCommit: (org.apache.spark.sql.SparkSession, java.io.File) => Unit =
        (_, _) => ()): StreamingQuery =
    changes.writeStream
      .foreachBatch((b: Dataset[Row], id: Long) =>
        applyBatch(root, b.toDF(), id, compactAtSegments, keepGens, rowsOf,
          layout, retainGraceMs, postCommit))
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .start()
}
