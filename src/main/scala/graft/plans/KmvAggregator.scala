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

  override def zero: Seq[String] = Nil

  override def reduce(buf: Seq[String], h: String): Seq[String] =
    if (buf.contains(h)) buf
    else if (buf.length < k) (buf :+ h).sorted
    else if (h < buf.last) (buf.init :+ h).sorted
    else buf

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Seq[String]): Seq[String] = r

  override def bufferEncoder: Encoder[Seq[String]] =
    Encoders.kryo[Seq[String]]
  override def outputEncoder: Encoder[Seq[String]] =
    Encoders.kryo[Seq[String]]
}
