package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply — the continuous face of the batch
  * `cdc_apply_latest` operator (operators/Scale2.scala): maintain the
  * latest-row-per-key snapshot of a changelog stream, with delete
  * tombstones, emitting a row whenever a key's snapshot entry changes.
  *
  * State per key is ONE row — the (us, eventId) max seen so far plus
  * its payload — so state size is keyspace-bound, never stream-length-
  * bound. The merge rule is max over the (us, eventId) total order:
  *  - commutative + idempotent ⇒ replays and out-of-order batches
  *    cannot corrupt the snapshot (a re-delivered old change loses the
  *    max and is dropped silently);
  *  - identical to the batch operator's `max_by` ⇒ after any prefix of
  *    the stream, the emitted snapshot equals the batch query over the
  *    same records (the spec pins this, duplicates and disorder
  *    included).
  *
  * Tombstones stay IN state (`deleted = true`) rather than removing the
  * state entry: a removed entry would resurrect the key if an
  * out-of-order pre-delete change arrived later. This is the standard
  * changelog-compaction subtlety — the tombstone must outlive every
  * straggler, which at 100 TB means "keep it" (a fixed-width row per
  * deleted key; reap with an event-time timeout once the watermark
  * passes the straggler horizon if reclamation matters).
  *
  * Emission is Update-mode: one row per key per batch in which the
  * key's winner changed (or a tombstone arrived), carrying `deleted`
  * so a downstream upsert sink (e.g. the news Lake's upsertByLink,
  * news/Lake.scala) can apply it idempotently.
  */
object CdcStream {

  case class Change(userId: Long, us: Long, eventId: Long,
                    op: String, value: Double)
  case class SnapRow(userId: Long, us: Long, eventId: Long,
                     op: String, value: Double, deleted: Boolean)

  /** Changelog stream → changed-snapshot-row stream. `tombstoneOp` rows
    * delete their key from the snapshot view. */
  def apply(changes: Dataset[Change], tombstoneOp: String = "error"): Dataset[SnapRow] = {
    implicit val rowEnc = Encoders.product[SnapRow]
    changes.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, batch: Iterator[Change], state: GroupState[SnapRow]) =>
          // Winner of this batch under the (us, eventId) order…
          val localMax = batch.reduceOption { (a, b) =>
            if (ord(a.us, a.eventId, b.us, b.eventId) >= 0) a else b
          }
          // …merged against the held winner. Strictly-greater keeps the
          // merge idempotent under exact replay.
          val next = (state.getOption, localMax) match {
            case (Some(held), Some(c)) if ord(c.us, c.eventId, held.us, held.eventId) > 0 =>
              Some(toRow(c, tombstoneOp))
            case (None, Some(c)) => Some(toRow(c, tombstoneOp))
            case _ => None
          }
          next match {
            case Some(row) =>
              state.update(row)
              Iterator(row)
            case None => Iterator.empty
          }
      }
  }

  /** Sign of (aUs, aId) − (bUs, bId) under the lexicographic order. */
  private def ord(aUs: Long, aId: Long, bUs: Long, bId: Long): Int =
    if (aUs != bUs) java.lang.Long.compare(aUs, bUs)
    else java.lang.Long.compare(aId, bId)

  private def toRow(c: Change, tombstoneOp: String): SnapRow =
    SnapRow(c.userId, c.us, c.eventId, c.op, c.value, deleted = c.op == tombstoneOp)
}
