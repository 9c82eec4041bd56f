package graft

import graft.streaming.QuantileStream
import graft.streaming.QuantileStream.Obs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming histogram quantiles: bounded state that lands exactly on
  * the batch sketch's numbers after any prefix of the stream. */
class QuantileStreamSpec extends SparkSuite {

  test("streaming estimates after N batches equal the batch quantile sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = Tables(spark, sf001, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect().map { case (g, v) => Obs(g, v) }
    val (b1, b2) = all.splitAt(all.length / 3)

    val obs = MemoryStream[Obs]
    val q = QuantileStream.estimates(obs.toDS())
      .writeStream.outputMode("update").format("memory").queryName("qh").start()
    try {
      obs.addData(b1.toSeq); q.processAllAvailable()
      obs.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()

    val last = spark.table("qh").as[QuantileStream.Quantiles].collect()
      .groupBy(_.g).map { case (g, rows) => g -> rows.maxBy(_.n) }
    val batch = SparkEntry.queries("sk_quantile_hist")(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(last.keySet === batch.keySet)
    last.foreach { case (g, s) =>
      val (n, p50, p95, p99) = batch(g)
      assert((s.n, s.p50Ub, s.p95Ub, s.p99Ub) === ((n, p50, p95, p99)), s"group $g")
    }
  }
}
