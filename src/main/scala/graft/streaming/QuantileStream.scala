package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quantiles per key with histogram state — the streaming face
  * of the batch quantile sketch (operators/Sketches.quantileHist), the
  * same pairing as CardinalityStream ↔ the batch HLL.
  *
  * State per key is the equi-width bin→count map: bounded by
  * value-range/width entries forever, regardless of stream length —
  * where any exact-quantile state (e.g. holding the values) grows with
  * the stream. Bin counts are ADDITIVE, so the per-batch fold is the
  * same merge the batch sketch uses across partitions; emitted
  * estimates are computed with the identical integer bin arithmetic
  * (⌈p·n⌉-th order statistic's bin upper edge), so after any prefix of
  * the stream the streaming estimate equals the batch sketch over the
  * same observed rows bit-for-bit (the spec pins this).
  *
  * Unlike the HLL's max-merge, counting state is NOT idempotent under
  * record replay — correctness under failure relies on Structured
  * Streaming's transactional state checkpointing (each micro-batch's
  * state update commits exactly once), the standard contract for
  * counting aggregations.
  */
object QuantileStream {

  case class Obs(g: String, v: Double)
  case class HistState(bins: Map[Long, Long])
  case class Quantiles(g: String, n: Long, p50Ub: Long, p95Ub: Long, p99Ub: Long)

  val BinWidth = 256L

  /** Per-batch updated quantile estimates, one row per key per batch. */
  def estimates(obs: Dataset[Obs]): Dataset[Quantiles] = {
    implicit val outEnc = Encoders.product[Quantiles]
    implicit val stateEnc = Encoders.product[HistState]
    obs.groupByKey(_.g)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[Obs], state: GroupState[HistState]) =>
          var bins = state.getOption.map(_.bins).getOrElse(Map.empty[Long, Long])
          batch.foreach { o =>
            val b = math.floor(o.v / BinWidth).toLong
            bins = bins.updated(b, bins.getOrElse(b, 0L) + 1L)
          }
          state.update(HistState(bins))
          Iterator(quantilesOf(key, bins))
      }
  }

  /** Quantiles from a bin→count histogram: for each p, the upper edge
    * of the first bin where the cumulative count reaches ⌈p·n⌉ — the
    * identical rule as the batch sketch's SQL. */
  def quantilesOf(key: String, bins: Map[Long, Long]): Quantiles = {
    val n = bins.valuesIterator.sum
    val sorted = bins.toSeq.sortBy(_._1)
    def ub(p: Double): Long = {
      val target = math.ceil(n * p).toLong
      var cum = 0L
      val it = sorted.iterator
      while (it.hasNext) {
        val (b, c) = it.next()
        cum += c
        if (cum >= target) return (b + 1) * BinWidth
      }
      sorted.lastOption.map { case (b, _) => (b + 1) * BinWidth }.getOrElse(0L)
    }
    Quantiles(key, n, ub(0.5), ub(0.95), ub(0.99))
  }
}
