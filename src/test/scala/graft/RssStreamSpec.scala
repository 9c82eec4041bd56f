package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.streaming.Trigger

/** S1 streaming shape: `spark.readStream.format("graft-rss")` polls
  * live feeds per micro-batch with a per-feed dedup horizon carried in
  * the OFFSET — two polls over a real (in-JVM) HTTP server must yield
  * each link exactly once, including across a checkpoint restart
  * (where the reference producer's in-process deque would forget and
  * re-emit; collect/producer.py:7). */
class RssStreamSpec extends SparkSuite {

  @volatile private var feedBody: String = ""

  private def feedXml(items: Seq[(String, String)]): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<rss version="2.0"><channel><title>뉴스</title>
       |${items.map { case (t, l) =>
            s"<item><title>$t</title><link>$l</link><author>kim</author></item>"
          }.mkString("\n")}
       |</channel></rss>""".stripMargin

  test("two polls emit each link once; horizon survives checkpoint restart") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val bytes = feedBody.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/xml")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/feed"
    val ckpt = Files.createTempDirectory("rss-stream-ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-rss")
        .option("feeds", url).option("horizon", "10")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => got.synchronized {
            got += ((r.getAs[String]("link"), r.getAs[String]("title")))
          })
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    try {
      // Poll 1: the feed page repeats link 1 — it must count once.
      feedBody = feedXml(Seq(
        "첫 기사" -> "http://ex/1", "둘째 기사" -> "http://ex/2",
        "첫 기사 재송" -> "http://ex/1"))
      runOnce()
      assert(got.map(_._1).sorted.toSeq == Seq("http://ex/1", "http://ex/2"), got)

      // Poll 2, FRESH query against the same checkpoint: the feed has
      // rolled (2 still present, 3 new). Only 3 may come through — the
      // restored offset horizon dedups 2.
      feedBody = feedXml(Seq(
        "둘째 기사" -> "http://ex/2", "셋째 기사" -> "http://ex/3"))
      runOnce()
      assert(got.map(_._1).sorted.toSeq ==
        Seq("http://ex/1", "http://ex/2", "http://ex/3"), got)
      assert(got.map(_._1).distinct.length == got.length, s"duplicate links: $got")
    } finally server.stop(0)
  }
}
