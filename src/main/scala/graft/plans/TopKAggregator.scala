package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-per-key aggregator (SURVEY.md §2.10 UDAF surface).
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(v))
  * WHERE rn <= k`) sorts every group in full; this Aggregator carries at
  * most k entries per group through partial aggregation, so per-group
  * work is O(n·log k) map-side and the shuffle moves k rows per key
  * instead of the whole group — the difference between feasible and not
  * when groups are millions of rows at 100 TB.
  *
  * Entries are (score, id); ranking is score DESC with id ASC as the
  * total-order tiebreak (same contract as the oracled window queries).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length < k) (buf :+ e).sorted(ord)
    else if (ord.lt(e, buf.last)) (buf.init :+ e).sorted(ord)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
}
