package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom stateful streaming operator (SURVEY.md §2.9 T5 extended
  * surface): gap-based sessionization over a keyed event stream via
  * `flatMapGroupsWithState` — the engine-level state machine the batch
  * `t5_sessionize` query computes retrospectively with a window.
  *
  * State per user is one open session (start, end, count); an event
  * beyond the gap closes the open session and emits it; event-time
  * timeout flushes sessions for idle keys. State size is O(active keys),
  * which is what makes this viable on an unbounded stream at scale —
  * the batch window variant needs the full history.
  */
object Sessionize {

  case class Event(userId: Long, ts: Timestamp)
  case class OpenSession(start: Long, end: Long, n: Int)
  case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Int)

  val GapMs: Long = 30 * 60 * 1000L

  /** Gap-close sessions per user. Event-time timeout (watermark-driven)
    * flushes the open session of an idle key once the watermark passes
    * its gap boundary, so every session is eventually emitted — without
    * it, a user who stops sending events would hold state forever and
    * their last session would never appear. */
  def sessions(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(flush)
  }

  private def flush(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // Watermark passed end+gap with no new events: the open session
      // can no longer be extended — emit it and drop the key's state.
      val out = state.getOption.map(s => Session(userId, s.start, s.end, s.n))
      state.remove()
      return out.iterator
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t - s.end <= GapMs =>
          // max: a late (out-of-order) event inside the window must not
          // shrink the session's end
          open = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.start, s.end, s.n)
          open = Some(OpenSession(t, t, 1))
        case None =>
          open = Some(OpenSession(t, t, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // Timeout must stay ahead of the current watermark or Spark
      // rejects it (a late batch can arrive with watermark past the
      // session boundary).
      state.setTimeoutTimestamp(
        math.max(s.end + GapMs, state.getCurrentWatermarkMs() + 1))
    }
    closed.result().iterator
  }
}
