package graft

import graft.streaming.EnrichStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class StreamingSpec extends SparkSuite {

  private def wire(link: String, summary: String, updated: String): String =
    s"""{"author":"김기자","link":"$link","summary":"$summary","title":"t","updated":"$updated"}"""

  test("streaming enrich: parse → enrich → dual sink, dedup across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("stream").toString
    val (store, lake, ckpt) = (s"$tmp/store", s"$tmp/lake", s"$tmp/ckpt")

    val mem = MemoryStream[String]
    val enriched = EnrichStream.enrichParsed(mem.toDF().toDF("json"), embedDim = 8)
    val q = EnrichStream.start(enriched, store, lake, ckpt,
      trigger = Trigger.ProcessingTime(0L)) // drain via processAllAvailable

    // batch 1: two links, one in-batch duplicate
    mem.addData(
      wire("http://n/1", "코스피 상승 마감", "2025-05-24 09:00:00"),
      wire("http://n/1", "코스피 상승 마감 dup", "2025-05-24 09:01:00"),
      wire("http://n/2", "야구 개막전 흥행", "2025-05-24 10:00:00"))
    q.processAllAvailable()
    q.stop()

    // batch 2 (new query, same checkpoint lineage not needed — store dedup
    // is what guarantees exactly-once effect): replay link 1 + add link 3
    val q2 = EnrichStream.start(enriched, store, lake, s"$tmp/ckpt2",
      trigger = Trigger.ProcessingTime(0L))
    mem.addData(
      wire("http://n/1", "코스피 상승 마감", "2025-05-24 09:00:00"),
      wire("http://n/3", "전시회 개막", "2025-05-25 11:00:00"))
    q2.processAllAvailable()
    q2.stop()

    val stored = spark.read.parquet(store)
    assert(stored.count() == 3) // links 1,2,3 exactly once
    assert(stored.select("link").distinct().count() == 3)
    // enrichment columns present and typed
    val r = stored.where(col("link") === "http://n/2").collect().head
    assert(r.getAs[String]("category") == "스포츠")
    assert(r.getAs[scala.collection.Seq[Float]]("embedding").length == 8)
    // lake is date-partitioned by event date
    val dirs = new java.io.File(lake).list().filter(_.startsWith("year_month_day="))
    assert(dirs.contains("year_month_day=20250524"))
  }

  test("AvailableNow trigger drains the backlog and terminates on its own") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("streamAN").toString

    val mem = MemoryStream[String]
    mem.addData( // backlog exists BEFORE the query starts
      wire("http://an/1", "백로그 기사 하나", "2025-06-01 08:00:00"),
      wire("http://an/2", "백로그 기사 둘", "2025-06-01 09:00:00"))
    val enriched = EnrichStream.enrichParsed(mem.toDF().toDF("json"), embedDim = 8)
    val q = EnrichStream.start(enriched, s"$tmp/store", s"$tmp/lake", s"$tmp/ckpt",
      trigger = Trigger.AvailableNow())
    assert(q.awaitTermination(120000)) // stops by itself after the drain
    assert(spark.read.parquet(s"$tmp/store").count() == 2)
  }
}
