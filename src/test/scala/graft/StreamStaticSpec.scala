package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static enrichment (SURVEY.md §2.9 extended surface): a
  * streaming fact joined to a static dimension. The static side is
  * broadcast per micro-batch — no stateful join state, the standard
  * pattern for dimension enrich at scale. */
class StreamStaticSpec extends SparkSuite {

  test("streaming facts join a static dimension and aggregate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver"), (3L, "gold")).toDF("user_id", "tier")

    val mem = MemoryStream[(Long, Double)]
    val joined = mem.toDF().toDF("user_id", "amount")
      .join(broadcast(dim), Seq("user_id"))
      .groupBy($"tier").agg(sum($"amount").as("total"))

    val q = joined.writeStream.outputMode("complete")
      .format("memory").queryName("ss_out").start()
    mem.addData((1L, 10.0), (2L, 5.0), (4L, 99.0)) // user 4 has no dim row
    q.processAllAvailable()
    mem.addData((3L, 7.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ss_out").collect()
      .map(r => r.getAs[String]("tier") -> r.getAs[Double]("total")).toMap
    assert(out == Map("gold" -> 17.0, "silver" -> 5.0)) // 99.0 dropped by inner join
  }
}
