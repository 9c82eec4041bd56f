package graft

import java.sql.DriverManager

import graft.sources.{JdbcUpsert, KafkaWire, Rss}
import graft.streaming.EnrichStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The WHOLE reference topology in one run, every hop executing
  * in-sandbox: RSS poll → Kafka wire produce (producer.py) → broker →
  * `graft-kafka` streaming consume → parse + enrich (consumer.py /
  * ollama_consumer.py) → JDBC upsert (consumer.py's Postgres sink,
  * here embedded Derby) AND partitioned lake files (consumer2.py's
  * Flink HDFS sink) — with a second producer round proving the
  * resume + idempotence story across the full chain. */
class FullTopologySpec extends SparkSuite {

  private val jdbcUrl = "jdbc:derby:memory:topodb;create=true"

  test("RSS → wire Kafka → stream enrich → JDBC upsert + lake, resumable end to end") {
    val srv = new MiniKafkaServer(numPartitions = 2)
    val conn0 = DriverManager.getConnection(jdbcUrl)
    try conn0.createStatement().execute(
      """CREATE TABLE news_full (
        |  link VARCHAR(300) NOT NULL PRIMARY KEY,
        |  title VARCHAR(300),
        |  author VARCHAR(100),
        |  updated TIMESTAMP)""".stripMargin)
    finally conn0.close()
    try {
      def feed(n: Int) = new Rss.FeedFetcher {
        def fetch(url: String): Seq[Rss.FeedEntry] = (1 to n).map(i =>
          Rss.FeedEntry("김기자", s"$url/$i", s"본문 요약 $i", s"제목 $i",
            f"2025-05-24 09:$i%02d:00"))
      }
      def produce(n: Int): Unit = KafkaWire.produceDataFrame(
        Rss.toKafkaJson(Rss.pollOnce(spark, Seq("http://feed"), feed(n))),
        "localhost", srv.port, "article-topic", 1716500000000L)

      val ckpt = java.nio.file.Files.createTempDirectory("topo-ckpt").toString
      val lake = java.nio.file.Files.createTempDirectory("topo-lake").toString
      val jdbcWriter = JdbcUpsert.foreachBatchWriter(
        jdbcUrl, "news_full", Seq("link"), JdbcUpsert.DerbyUpsertDialect)

      def runOnce(): Unit = {
        val enriched = EnrichStream.enrichParsed(
          EnrichStream.fromKafkaWire(spark, "localhost", srv.port,
            "article-topic"), embedDim = 8)
        val q = enriched.writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            batch.persist()
            jdbcWriter(batch.select(col("link"), col("title"),
              col("author"), col("updated_ts").as("updated")), id)
            batch.withColumn("day", date_format(col("event_ts"), "yyyyMMdd"))
              .select("day", "link", "title", "summary")
              .write.mode("append").partitionBy("day").parquet(lake)
            batch.unpersist(); ()
          }
          .start()
        q.processAllAvailable(); q.stop()
      }

      def jdbcCount(): Long = {
        val c = DriverManager.getConnection(jdbcUrl)
        try {
          val rs = c.createStatement()
            .executeQuery("SELECT count(*) FROM news_full")
          rs.next(); rs.getLong(1)
        } finally c.close()
      }

      // Round 1: three articles travel the whole chain.
      produce(3)
      runOnce()
      assert(jdbcCount() == 3L)
      val lake1 = spark.read.parquet(lake)
      assert(lake1.count() == 3L)
      // partition values read back type-inferred (int here)
      assert(lake1.select("day").distinct().collect()
        .head.get(0).toString == "20250524")
      // Korean content arrived intact at the terminal store
      assert(lake1.where(col("link") === "http://feed/2")
        .select("title").head().getString(0) == "제목 2")

      // Round 2: the producer re-publishes 1-3 (at-least-once) plus
      // two fresh articles; the checkpointed consumer resumes past
      // its committed offsets, and the JDBC upsert absorbs what the
      // broker re-delivered — terminal state is exactly 5 rows.
      produce(5)
      runOnce()
      assert(jdbcCount() == 5L)
      assert(spark.read.parquet(lake).select("link").distinct().count() == 5L)
    } finally {
      srv.stop()
      val c = DriverManager.getConnection(jdbcUrl)
      try c.createStatement().execute("DROP TABLE news_full") finally c.close()
    }
  }

  test("both halves over the wire: streaming SINK → broker → streaming SOURCE → upsert, with a wire fault") {
    // The S2 declarative shape end to end: the producer is
    // writeStream.format("graft-kafka") (not the foreachPartition
    // helper), the consumer is the checkpointed graft-kafka source,
    // and a post-append connection drop on round 2 forces the wire
    // client's at-least-once retry — the duplicate batch must be
    // absorbed by the terminal J1 upsert, leaving exactly 5 rows.
    val srv = new MiniKafkaServer(numPartitions = 2)
    val url = "jdbc:derby:memory:topodb2;create=true"
    val conn0 = DriverManager.getConnection(url)
    try conn0.createStatement().execute(
      """CREATE TABLE news_wire2 (
        |  link VARCHAR(300) NOT NULL PRIMARY KEY,
        |  title VARCHAR(300),
        |  author VARCHAR(100),
        |  updated TIMESTAMP)""".stripMargin)
    finally conn0.close()
    try {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Rss.FeedEntry]
      val sinkCkpt = java.nio.file.Files.createTempDirectory("topo2-sink").toString
      val srcCkpt = java.nio.file.Files.createTempDirectory("topo2-src").toString
      val jdbcWriter = JdbcUpsert.foreachBatchWriter(
        url, "news_wire2", Seq("link"), JdbcUpsert.DerbyUpsertDialect)

      def produceOnce(): Unit = {
        val q = Rss.toKafkaJson(in.toDF())
          .writeStream.format("graft-kafka")
          .option("host", "localhost").option("port", srv.port.toString)
          .option("topic", "article-topic")
          .option("checkpointLocation", sinkCkpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }
      def consumeOnce(): Unit = {
        val enriched = EnrichStream.enrichParsed(
          EnrichStream.fromKafkaWire(spark, "localhost", srv.port,
            "article-topic"), embedDim = 8)
        val q = enriched.writeStream
          .option("checkpointLocation", srcCkpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            jdbcWriter(batch.select(col("link"), col("title"),
              col("author"), col("updated_ts").as("updated")), id)
            ()
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      def jdbcCount(): Long = {
        val c = DriverManager.getConnection(url)
        try {
          val rs = c.createStatement()
            .executeQuery("SELECT count(*) FROM news_wire2")
          rs.next(); rs.getLong(1)
        } finally c.close()
      }
      def entry(i: Int) = Rss.FeedEntry("김기자", s"http://w/$i",
        s"본문 $i", s"제목 $i", f"2025-05-24 10:$i%02d:00")

      in.addData(entry(1), entry(2), entry(3))
      produceOnce()
      consumeOnce()
      assert(jdbcCount() == 3L)

      // round 2 under a wire fault: the broker appends the batch but
      // drops the connection before the ack — the sink's retry lands
      // it twice on the broker
      srv.dropNextProduceAfterAppend.set(1)
      in.addData(entry(4), entry(5))
      produceOnce()
      val onWire = (0 until 2).map(p => srv.stored("article-topic", p).size).sum
      assert(onWire > 5, "the post-append drop must have duplicated a batch")
      consumeOnce()
      assert(jdbcCount() == 5L,
        "the J1 upsert must absorb the wire-level replay")
    } finally {
      srv.stop()
      val c = DriverManager.getConnection(url)
      try c.createStatement().execute("DROP TABLE news_wire2") finally c.close()
    }
  }

  test("EXACTLY-ONCE topology: transactional sink + read_committed source survive the same wire fault without the J1 absorber") {
    // The r14 capstone: the same both-halves topology, but the sink is
    // TRANSACTIONAL (one transaction per task, idempotent sequences
    // inside it) and the consumer reads COMMITTED — so the post-append
    // connection drop that the previous test absorbs downstream never
    // produces a duplicate at all: the retried batch is deduped
    // broker-side and the records flip visible atomically at commit.
    // The terminal table needs no ON CONFLICT to stay correct (the
    // upsert here is belt-and-braces, not the correctness mechanism —
    // the assertion on the WIRE proves the duplicate never landed).
    val srv = new MiniKafkaServer(numPartitions = 2)
    val url = "jdbc:derby:memory:topodb3;create=true"
    val conn0 = DriverManager.getConnection(url)
    try conn0.createStatement().execute(
      """CREATE TABLE news_wire3 (
        |  link VARCHAR(300) NOT NULL PRIMARY KEY,
        |  title VARCHAR(300),
        |  author VARCHAR(100),
        |  updated TIMESTAMP)""".stripMargin)
    finally conn0.close()
    try {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Rss.FeedEntry]
      val sinkCkpt = java.nio.file.Files.createTempDirectory("topo3-sink").toString
      val srcCkpt = java.nio.file.Files.createTempDirectory("topo3-src").toString
      val jdbcWriter = JdbcUpsert.foreachBatchWriter(
        url, "news_wire3", Seq("link"), JdbcUpsert.DerbyUpsertDialect)

      def produceOnce(): Unit = {
        val q = Rss.toKafkaJson(in.toDF())
          .writeStream.format("graft-kafka")
          .option("host", "localhost").option("port", srv.port.toString)
          .option("topic", "article-topic")
          .option("transactionalIdPrefix", "topo3")
          .option("checkpointLocation", sinkCkpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }
      def consumeOnce(): Unit = {
        val enriched = EnrichStream.enrichParsed(
          EnrichStream.fromKafkaWire(spark, "localhost", srv.port,
            "article-topic", isolationLevel = "read_committed"),
          embedDim = 8)
        val q = enriched.writeStream
          .option("checkpointLocation", srcCkpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            jdbcWriter(batch.select(col("link"), col("title"),
              col("author"), col("updated_ts").as("updated")), id)
            ()
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      def jdbcCount(): Long = {
        val c = DriverManager.getConnection(url)
        try {
          val rs = c.createStatement()
            .executeQuery("SELECT count(*) FROM news_wire3")
          rs.next(); rs.getLong(1)
        } finally c.close()
      }
      def entry(i: Int) = Rss.FeedEntry("김기자", s"http://x/$i",
        s"본문 $i", s"제목 $i", f"2025-05-24 10:$i%02d:00")

      in.addData(entry(1), entry(2), entry(3))
      produceOnce()
      consumeOnce()
      assert(jdbcCount() == 3L)

      // round 2 under the SAME wire fault: the broker appends the batch
      // then drops the connection before the ack — but the transactional
      // producer's retry re-sends the same sequence and the broker
      // DEDUPS it: the wire itself stays exactly-once now
      srv.dropNextProduceAfterAppend.set(1)
      in.addData(entry(4), entry(5))
      produceOnce()
      val onWire = (0 until 2).map(p => srv.stored("article-topic", p).size).sum
      assert(onWire == 5,
        "idempotent sequences must dedup the retried batch ON the broker")
      consumeOnce()
      assert(jdbcCount() == 5L)
    } finally {
      srv.stop()
      val c = DriverManager.getConnection(url)
      try c.createStatement().execute("DROP TABLE news_wire3") finally c.close()
    }
  }

  test("the whole topology rides a broker failure: RSS → replicated cluster → stream enrich → upsert + lake, exactly once") {
    // The same end-to-end chain as the first test, but the broker tier
    // is a 2-broker RF=2 cluster and the broker leading half the
    // partitions DIES between producer rounds — the acks=all produce
    // path made round 1 durable on both replicas, the checkpointed
    // consumer's offsets stay valid against the new leader, and the
    // terminal stores converge to exactly the published articles.
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    val url = "jdbc:derby:memory:topodb3;create=true"
    val conn0 = DriverManager.getConnection(url)
    try conn0.createStatement().execute(
      """CREATE TABLE news_rf2 (
        |  link VARCHAR(300) NOT NULL PRIMARY KEY,
        |  title VARCHAR(300),
        |  author VARCHAR(100),
        |  updated TIMESTAMP)""".stripMargin)
    finally conn0.close()
    try {
      def feed(n: Int) = new Rss.FeedFetcher {
        def fetch(url: String): Seq[Rss.FeedEntry] = (1 to n).map(i =>
          Rss.FeedEntry("김기자", s"$url/$i", s"본문 요약 $i", s"제목 $i",
            f"2025-05-24 09:$i%02d:00"))
      }
      // produceDataFrame's RetryingProducer defaults acks=all: the ack
      // means both replicas hold the record — the failover below can
      // lose nothing that was published
      def produce(n: Int): Unit = KafkaWire.produceDataFrame(
        Rss.toKafkaJson(Rss.pollOnce(spark, Seq("http://feed"), feed(n))),
        "localhost", cl.port(0), "article-topic", 1716500000000L)

      val ckpt = java.nio.file.Files.createTempDirectory("topo3-ckpt").toString
      val lake = java.nio.file.Files.createTempDirectory("topo3-lake").toString
      val jdbcWriter = JdbcUpsert.foreachBatchWriter(
        url, "news_rf2", Seq("link"), JdbcUpsert.DerbyUpsertDialect)
      def runOnce(): Unit = {
        val enriched = EnrichStream.enrichParsed(
          EnrichStream.fromKafkaWire(spark, "localhost", cl.port(0),
            "article-topic"), embedDim = 8)
        val q = enriched.writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            batch.persist()
            jdbcWriter(batch.select(col("link"), col("title"),
              col("author"), col("updated_ts").as("updated")), id)
            batch.withColumn("day", date_format(col("event_ts"), "yyyyMMdd"))
              .select("day", "link", "title", "summary")
              .write.mode("append").partitionBy("day").parquet(lake)
            batch.unpersist(); ()
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      def jdbcCount(): Long = {
        val c = DriverManager.getConnection(url)
        try {
          val rs = c.createStatement()
            .executeQuery("SELECT count(*) FROM news_rf2")
          rs.next(); rs.getLong(1)
        } finally c.close()
      }

      produce(3)
      runOnce()
      assert(jdbcCount() === 3L)

      // the broker leading partition 1 dies; the pipeline keeps
      // running against the survivor — the producer's routing view
      // refreshes, the consumer's checkpointed offsets stay valid
      cl.failBroker(1)
      produce(5) // re-publishes 1-3 (absorbed) + two fresh articles
      runOnce()
      assert(jdbcCount() === 5L)
      val lakeDf = spark.read.parquet(lake)
      assert(lakeDf.select("link").distinct().count() === 5L)
      assert(lakeDf.where(col("link") === "http://feed/5")
        .select("title").head().getString(0) === "제목 5")
    } finally {
      cl.stop()
      val c = DriverManager.getConnection(url)
      try c.createStatement().execute("DROP TABLE news_rf2") finally c.close()
    }
  }
}
