package graft

import graft.streaming.HeavyHitterStream
import graft.streaming.HeavyHitterStream.{Heavy, Hit, K}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Misra–Gries heavy hitters: bounded per-key state with the
  * deterministic frequency guarantee. */
class HeavyHitterStreamSpec extends SparkSuite {

  /** Skewed synthetic stream: per key, item i ∈ 0..4 appears with
    * multiplicity (5 − i) · 40, plus a long tail of singletons. */
  private def skewed(key: String, tailFrom: Long): Seq[Hit] = {
    val heavy = (0 until 5).flatMap(i => Seq.fill((5 - i) * 40)(Hit(key, i.toLong)))
    val tail = (0 until 100).map(j => Hit(key, tailFrom + j))
    // Deterministic interleave (hash order), so heavy items arrive
    // spread through the batch, not front-loaded.
    (heavy ++ tail).sortBy(h => (h.item * 2654435761L + h.key.hashCode) & 0xffffL)
  }

  test("true-heavy items survive with estimates inside the MG bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val hits = MemoryStream[Hit]
    val q = HeavyHitterStream.heavyHitters(hits.toDS())
      .writeStream.outputMode("update").format("memory").queryName("hh").start()
    val batch1 = skewed("view", 1000L) ++ skewed("click", 5000L)
    val batch2 = skewed("view", 2000L) ++ skewed("click", 6000L)
    try {
      hits.addData(batch1)
      q.processAllAvailable()
      hits.addData(batch2)
      q.processAllAvailable()

      val rows = spark.table("hh").as[Heavy].collect()
      // Update mode emits per batch; keep each key's final-batch rows.
      val last = rows.groupBy(_.key).map { case (k, rs) =>
        val nMax = rs.map(_.nSeen).max
        k -> rs.filter(_.nSeen == nMax)
      }
      val exact = HeavyHitterStream.exactCounts(batch1 ++ batch2)

      last.foreach { case (key, tracked) =>
        assert(tracked.length <= K)
        val n = tracked.head.nSeen
        val dec = tracked.head.maxUndercount
        assert(dec <= n / (K + 1), s"$key: dec $dec exceeds n/(K+1)")
        // Every item with true count > n/(K+1) MUST be tracked.
        val mustTrack = exact.collect {
          case ((k2, item), c) if k2 == key && c > n / (K + 1) => item }
        assert(mustTrack.toSet.subsetOf(tracked.map(_.item).toSet),
          s"$key: lost a guaranteed-heavy item")
        // Estimates never exceed truth and undercount by at most dec.
        tracked.foreach { h =>
          val truth = exact((key, h.item))
          assert(h.est <= truth, s"$key/${h.item}: overcount")
          assert(h.est >= truth - dec, s"$key/${h.item}: undercount beyond bound")
        }
        // Ranks are 1..m in estimate order.
        assert(tracked.sortBy(_.rank).map(_.rank).toSeq === (1 to tracked.length))
      }
      // The two keys' states are independent: both kept their top item 0.
      assert(last.keySet === Set("view", "click"))
      last.values.foreach(t => assert(t.minBy(_.rank).item === 0L))
    } finally q.stop()
  }

  test("state stays bounded under an all-distinct adversarial stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hits = MemoryStream[Hit]
    val q = HeavyHitterStream.heavyHitters(hits.toDS())
      .writeStream.outputMode("update").format("memory").queryName("hh2").start()
    try {
      hits.addData((0 until 2000).map(i => Hit("k", i.toLong)))
      q.processAllAvailable()
      val rows = spark.table("hh2").as[Heavy].collect()
      assert(rows.length <= K)               // never more than K slots
      assert(rows.forall(_.nSeen === 2000L)) // everything was observed
      // With no repetition nothing is heavy: n/(K+1) bound respected.
      assert(rows.head.maxUndercount <= 2000L / (K + 1))
    } finally q.stop()
  }
}
