package graft

import graft.news.NewsSchema
import graft.sources.Rss
import graft.streaming.EnrichStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2–S4: the Kafka wire contract, pinned end-to-end WITHOUT a broker.
  *
  * This sandbox ships no Kafka artifacts (no kafka-clients, no
  * spark-sql-kafka connector, zero egress to fetch either), so an
  * embedded-broker integration test is not buildable here. What a
  * broker round-trip would prove about OUR code reduces to three
  * contracts, each pinned below against the reference instead:
  *
  *  1. producer wire shape (collect/producer.py:42-48): the serialized
  *     record's key and JSON value field set;
  *  2. sink column contract: `format("kafka")` requires key/value
  *     columns castable to binary — the shape `toKafkaJson` emits;
  *  3. consumer parse (collect/consumer2.py source DDL): the value
  *     bytes must round-trip through `NewsSchema.wireSchema` with no
  *     field lost — i.e. producer output IS valid consumer input.
  *
  * The byte-transport layer this file once left unpinned is now
  * implemented and tested too: [[graft.sources.KafkaWire]] speaks the
  * public protocol directly (murmur2-routed Produce, CRC-verified
  * Fetch, ListOffsets, message format v1) and KafkaProtocolSpec
  * drives it over real TCP against an in-JVM broker double, up
  * through the `graft-kafka` Structured Streaming source with
  * checkpointed resume. `fromKafka`'s option set (earliest,
  * subscribe) mirrors collect/consumer.py:154; `fromKafkaWire` is the
  * same entry on the library's own transport.
  */
class KafkaWireSpec extends SparkSuite {

  private val fake = new Rss.FeedFetcher {
    def fetch(url: String): Seq[Rss.FeedEntry] = Seq(
      Rss.FeedEntry("김기자", s"$url/1", "인공지능 기술이 발전했다", "AI 뉴스",
        "2025-05-24 09:00:00"),
      Rss.FeedEntry(null, s"$url/2", "코스피 상승", "증시", "2025-05-24 09:05:00"))
  }

  test("wire value carries exactly the producer's field set") {
    val wire = Rss.toKafkaJson(Rss.pollOnce(spark, Seq("http://f"), fake))
    // Contract 2: key/value, both string (castable to binary by the
    // Kafka sink; no extra columns that the sink would reject).
    assert(wire.schema == StructType(Seq(
      StructField("key", StringType, nullable = true),
      StructField("value", StringType, nullable = true))))
    val parsed = wire.select(col("key"),
      from_json(col("value"), NewsSchema.wireSchema).as("m")).select("key", "m.*")
    // Contract 1+3: every producer field survives the round-trip.
    assert(parsed.columns.toSeq ==
      Seq("key", "author", "link", "summary", "title", "updated"))
    val r = parsed.where(col("link") === "http://f/1").collect().head
    assert(r.getAs[String]("key") == "http://f/1")
    assert(r.getAs[String]("author") == "김기자")
    assert(r.getAs[String]("summary") == "인공지능 기술이 발전했다")
    assert(r.getAs[String]("title") == "AI 뉴스")
    assert(r.getAs[String]("updated") == "2025-05-24 09:00:00")
  }

  test("null fields serialize safely and parse back as nulls") {
    val wire = Rss.toKafkaJson(Rss.pollOnce(spark, Seq("http://f"), fake))
    val r = wire.select(from_json(col("value"), NewsSchema.wireSchema).as("m"))
      .select("m.*").where(col("link") === "http://f/2").collect().head
    assert(r.getAs[String]("author") == null)
    assert(r.getAs[String]("title") == "증시")
  }

  test("producer output feeds the consumer stream unchanged") {
    // The full S2→S3 hand-off minus the broker: the producer's wire
    // JSON strings stream through the consumer pipeline (the same
    // enrichParsed that fromKafka feeds) — proving the producer's
    // serialization IS the consumer's expected input format.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wireValues = Rss.toKafkaJson(Rss.pollOnce(spark, Seq("http://f"), fake))
      .collect().map(_.getAs[String]("value"))
    val in = MemoryStream[String]
    in.addData(wireValues.toIndexedSeq)
    val q = EnrichStream.enrichParsed(in.toDF().toDF("json"), embedDim = 8)
      .writeStream.format("memory").queryName("kwire")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("kwire").collect()
    assert(rows.length == 2)
    val byLink = rows.map(r => r.getAs[String]("link") -> r).toMap
    assert(NewsSchema.Categories.contains(
      byLink("http://f/1").getAs[String]("category")) ||
      byLink("http://f/1").getAs[String]("category") == NewsSchema.Unclassified)
    assert(byLink("http://f/1").getAs[scala.collection.Seq[Float]]("embedding").length == 8)
  }
}
