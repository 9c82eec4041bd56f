package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per key with a bounded Misra–Gries summary —
  * the streaming face of the batch top-k family (TopKAggregator,
  * sk_cms_heavy) for streams whose item domain is unbounded.
  *
  * A per-key `groupBy(item).count()` stream keeps one state row per
  * DISTINCT item — state grows with the domain, which an unbounded
  * stream cannot afford. The Misra–Gries summary caps state at K
  * (item, count) slots per key forever: increment a tracked item,
  * adopt an untracked item into a free slot, otherwise decrement every
  * slot (and the arrival's implicit counter) by one, freeing zeroed
  * slots. The deterministic guarantee — no approximation of the
  * guarantee itself — is that any item with true count > n/(K+1) over
  * the observed prefix IS tracked, and each tracked estimate
  * undercounts by at most the total decrement count ≤ n/(K+1). That
  * bound (`maxUndercount`) is carried in the state and emitted, so a
  * consumer can tell "certainly heavy" (est − bound still large) from
  * "possibly noise".
  *
  * Update-mode emission: one row per tracked item per key per batch,
  * rank-ordered by estimate. Replays are NOT idempotent for an MG
  * summary in general (unlike the HLL max-merge), so the gate belongs
  * after the checkpointed source the way EnrichStream stages it — the
  * spec drives it through MemoryStream + checkpoint the same way.
  */
object HeavyHitterStream {

  case class Hit(key: String, item: Long)
  case class MgState(n: Long, dec: Long, items: Array[Long], counts: Array[Long])
  case class Heavy(key: String, item: Long, est: Long, rank: Int,
      nSeen: Long, maxUndercount: Long)

  /** Tracked slots per key — the entire per-key state is 2·K longs. */
  val K = 8

  def heavyHitters(hits: Dataset[Hit]): Dataset[Heavy] = {
    implicit val outEnc = Encoders.product[Heavy]
    implicit val stateEnc = Encoders.product[MgState]
    hits.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  private def update(key: String, events: Iterator[Hit],
      state: GroupState[MgState]): Iterator[Heavy] = {
    val s = state.getOption.getOrElse(
      MgState(0L, 0L, Array.empty[Long], Array.empty[Long]))
    // Work in a mutable map of tracked item → count.
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    s.items.indices.foreach(i => m(s.items(i)) = s.counts(i))
    var n = s.n
    var dec = s.dec
    events.foreach { e =>
      n += 1
      m.get(e.item) match {
        case Some(c) => m(e.item) = c + 1
        case None if m.size < K => m(e.item) = 1L
        case None =>
          // Textbook Misra–Gries step: all K counters and the arrival's
          // implicit counter drop by 1 (the arrival is absorbed, slots
          // hitting zero are freed). Each such step removes K+1 units
          // from the observed total, so dec ≤ n/(K+1) — which is the
          // whole guarantee.
          dec += 1
          val dead = m.collect { case (k2, 1L) => k2 }
          m.keys.toSeq.foreach(k2 => m(k2) = m(k2) - 1)
          dead.foreach(m.remove)
      }
    }
    val items = m.keys.toArray
    val counts = items.map(m)
    state.update(MgState(n, dec, items, counts))
    val ranked = items.zip(counts).sortBy { case (it, c) => (-c, it) }
    Iterator.tabulate(ranked.length) { i =>
      Heavy(key, ranked(i)._1, ranked(i)._2, i + 1, n, dec)
    }
  }

  /** Batch reference: exact per-key counts of the same hits — the spec
    * checks every true-heavy item (count > n/(K+1)) is tracked and every
    * estimate sits within [true − dec, true]. */
  def exactCounts(hits: Seq[Hit]): Map[(String, Long), Long] =
    hits.groupBy(h => (h.key, h.item)).map { case (k, v) => k -> v.size.toLong }
}
