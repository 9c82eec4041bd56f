package graft

import java.sql.DriverManager

import graft.sources.JdbcUpsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** S5/S6: the JDBC upsert writer proven against a REAL JDBC engine —
  * embedded Derby (in /opt/spark/jars), so rows travel through actual
  * PreparedStatement batches and transactions, not a parquet stand-in.
  * The semantics under test are the reference's
  * `INSERT … ON CONFLICT (link) DO NOTHING` (collect/consumer.py:81). */
class JdbcUpsertSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withTable[T](name: String)(f: => T): T = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        s"""CREATE TABLE $name (
           |  link VARCHAR(300) NOT NULL PRIMARY KEY,
           |  title VARCHAR(300),
           |  author VARCHAR(100),
           |  updated TIMESTAMP)""".stripMargin)
    } finally conn.close()
    try f
    finally {
      val c = DriverManager.getConnection(url)
      try c.createStatement().execute(s"DROP TABLE $name") finally c.close()
    }
  }

  private def countRows(table: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT count(*) FROM $table")
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  private def batch(links: (String, String)*) = {
    import spark.implicits._
    links.toSeq.toDF("link", "title")
      .withColumn("author", when(col("link").endsWith("/1"), lit(null: String))
        .otherwise(lit("기자")))
      .withColumn("updated", current_timestamp())
  }

  test("Postgres dialect emits the reference's exact statement shape") {
    val (sql, bindCols) = JdbcUpsert.PostgresUpsertDialect.insertIgnore(
      "articles", Seq("title", "author", "link"), Seq("link"))
    assert(sql == "INSERT INTO articles (title, author, link) " +
      "VALUES (?, ?, ?) ON CONFLICT (link) DO NOTHING")
    assert(bindCols == Seq("title", "author", "link"))
  }

  test("batch upsert inserts, replays idempotently, skips conflicts") {
    withTable("news_a") {
      val b1 = batch("http://n/1" -> "첫 기사", "http://n/2" -> "둘째 기사")
      JdbcUpsert.upsert(b1, url, "news_a", Seq("link"), JdbcUpsert.DerbyUpsertDialect)
      assert(countRows("news_a") == 2)
      // Exact replay — at-least-once delivery must be a no-op.
      JdbcUpsert.upsert(b1, url, "news_a", Seq("link"), JdbcUpsert.DerbyUpsertDialect)
      assert(countRows("news_a") == 2)
      // Overlapping batch — only the genuinely new row lands, and the
      // conflicting row must NOT overwrite (DO NOTHING, not DO UPDATE).
      val b2 = batch("http://n/2" -> "다른 제목", "http://n/3" -> "셋째 기사")
      JdbcUpsert.upsert(b2, url, "news_a", Seq("link"), JdbcUpsert.DerbyUpsertDialect)
      assert(countRows("news_a") == 3)
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement()
          .executeQuery("SELECT title FROM news_a WHERE link = 'http://n/2'")
        rs.next()
        assert(rs.getString(1) == "둘째 기사")
      } finally conn.close()
    }
  }

  test("concurrent partitions racing the same key settle to one row") {
    withTable("news_b") {
      // The same link in two partitions: whichever partition loses the
      // race hits the PK through MERGE and must swallow it (the
      // row-by-row DO NOTHING fallback), never fail the task.
      val dup = batch("http://race/1" -> "같은 기사", "http://race/1" -> "같은 기사")
        .repartition(2)
      JdbcUpsert.upsert(dup, url, "news_b", Seq("link"), JdbcUpsert.DerbyUpsertDialect)
      assert(countRows("news_b") == 1)
    }
  }

  test("foreachBatch stream sink is exactly-once-effect across replays") {
    withTable("news_c") {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, String)]
      val writer = JdbcUpsert.foreachBatchWriter(
        url, "news_c", Seq("link"), JdbcUpsert.DerbyUpsertDialect)
      val q = in.toDF().toDF("link", "title")
        .withColumn("author", lit("기자"))
        .withColumn("updated", current_timestamp())
        .writeStream.outputMode("append")
        .foreachBatch(writer)
        .trigger(Trigger.AvailableNow()).start()
      in.addData("http://s/1" -> "스트림 기사", "http://s/2" -> "둘째")
      q.processAllAvailable(); q.stop()
      assert(countRows("news_c") == 2)
      // A re-delivered micro-batch (epoch replay after failure) runs the
      // same INSERT-ignore — table unchanged.
      val q2 = in.toDF().toDF("link", "title")
        .withColumn("author", lit("기자"))
        .withColumn("updated", current_timestamp())
        .writeStream.outputMode("append")
        .foreachBatch(writer)
        .trigger(Trigger.AvailableNow()).start()
      in.addData("http://s/1" -> "스트림 기사", "http://s/3" -> "셋째")
      q2.processAllAvailable(); q2.stop()
      assert(countRows("news_c") == 3)
    }
  }
}
