package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded K-minimum-values sketch aggregator: carries the K smallest
  * distinct hash strings through partial aggregation — the mergeable
  * theta/KMV sketch build (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07). Map-side
  * each partition holds at most K values; the shuffle moves K rows per
  * group regardless of set size — the same feasibility argument as
  * [[TopKAggregator]], applied to distinct-set synopses. Inputs need
  * not be pre-deduplicated (the buffer is a distinct set by
  * construction), which is what makes the sketch mergeable across
  * partitions and batches. */
class KmvAggregator(k: Int)
    extends Aggregator[String, Seq[String], Seq[String]] {

  override def zero: Seq[String] = Vector.empty

  // The buffer invariant is "sorted, distinct, ≤ K elements", so the
  // map-side hot path is a binary search for the insertion point
  // (O(log K) string comparisons) plus a positional splice — not a
  // linear membership scan and a full re-sort per accepted row.
  override def reduce(buf: Seq[String], h: String): Seq[String] = {
    val v: IndexedSeq[String] = buf match {
      case iv: IndexedSeq[String] => iv
      case other => other.toIndexedSeq
    }
    var lo = 0
    var hi = v.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < v.length && v(lo) == h) v // already in the sketch
    else if (v.length < k) v.patch(lo, h :: Nil, 0)
    else if (lo < k) v.patch(lo, h :: Nil, 0).dropRight(1)
    else v // ≥ current K-th minimum: cannot enter the sketch
  }

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Seq[String]): Seq[String] = r

  override def bufferEncoder: Encoder[Seq[String]] =
    Encoders.kryo[Seq[String]]
  override def outputEncoder: Encoder[Seq[String]] =
    Encoders.kryo[Seq[String]]
}
