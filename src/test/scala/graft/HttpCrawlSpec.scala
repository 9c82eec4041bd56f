package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.{Http, Rss}
import graft.udfs.Enrichers
import org.apache.spark.sql.Encoders

/** S11/U4: the executor-side HTTP path proven end-to-end against a real
  * (in-JVM) HTTP server — feed poll over the wire, article crawl with
  * the reference's ≥3-Hangul text extraction (collect/consumer.py:92-113),
  * and the mapPartitions enrich seam actually crawling. */
class HttpCrawlSpec extends SparkSuite {

  private def withServer[T](routes: Map[String, (Int, String, String)])(f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, (status, ctype, body)) =>
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit = {
          val bytes = body.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", ctype)
          ex.sendResponseHeaders(status, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private val rssXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<rss version="2.0"><channel><title>뉴스</title>
      |<item><title>첫 기사</title><link>http://ex/1</link>
      |  <description>인공지능 기술 발전</description>
      |  <author>kim</author><pubDate>2025-05-24 09:00:00</pubDate></item>
      |<item><title>둘째 기사</title><link>http://ex/2</link>
      |  <description>코스피 상승 마감</description>
      |  <author>lee</author><pubDate>2025-05-24 09:05:00</pubDate></item>
      |</channel></rss>""".stripMargin

  private val articleHtml =
    """<html><head><title>t</title>
      |<script>var x = "한글한글한글 in script must not leak";</script>
      |<style>.a { color: red }</style></head>
      |<body><nav>Home | About</nav>
      |<h1>대통령 기자회견 발표</h1>
      |<p>정부는 오늘 새로운 정책을 발표했다.</p>
      |<p>short ko: 한글</p>
      |<p>English only paragraph.</p>
      |<div>관계자는 &quot;시장 안정&quot;이라고 말했다.</div>
      |</body></html>""".stripMargin

  test("HttpFeedFetcher polls a live feed over the wire") {
    withServer(Map("/feed" -> (200, "application/xml", rssXml))) { base =>
      val entries = new Http.HttpFeedFetcher().fetch(s"$base/feed")
      assert(entries.map(_.link) == Seq("http://ex/1", "http://ex/2"))
      assert(entries.head.title == "첫 기사")
      assert(entries.head.summary == "인공지능 기술 발전")
      assert(entries.head.updated == "2025-05-24 09:00:00")
      // And through pollOnce: the full S1 path with the real fetcher.
      val df = Rss.pollOnce(spark, Seq(s"$base/feed"), new Http.HttpFeedFetcher())
      assert(df.count() == 2)
    }
  }

  test("Atom entries parse through the same fetcher") {
    val atom =
      """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
        |<entry><title>t1</title><link href="http://ex/a1"/>
        |<summary>요약 본문</summary><author><name>park</name></author>
        |<updated>2025-05-24T09:00:00Z</updated></entry></feed>""".stripMargin
    val entries = Http.parseFeed(atom)
    assert(entries == Seq(Rss.FeedEntry("park", "http://ex/a1",
      "요약 본문", "t1", "2025-05-24T09:00:00Z")))
  }

  test("crawlArticle extracts ≥3-Hangul text nodes, reference semantics") {
    withServer(Map("/article" -> (200, "text/html; charset=utf-8", articleHtml))) { base =>
      val text = Http.crawlArticle(s"$base/article")
      assert(text == "대통령 기자회견 발표 정부는 오늘 새로운 정책을 발표했다. " +
        "관계자는 \"시장 안정\"이라고 말했다.")
      // script/style/nav/short-Hangul/English nodes all filtered.
      assert(!text.contains("script") && !text.contains("English") &&
        !text.contains("Home"))
    }
  }

  test("crawl failures degrade to empty string, never throw") {
    withServer(Map("/gone" -> (404, "text/html", "nope"))) { base =>
      assert(Http.crawlArticle(s"$base/gone") == "")
    }
    assert(Http.crawlArticle("http://127.0.0.1:1/unreachable", timeoutSec = 1) == "")
  }

  test("enrichPartitions crawls per-row with a per-partition client") {
    withServer(Map("/article" -> (200, "text/html; charset=utf-8", articleHtml))) { base =>
      import spark.implicits._
      val urls = Seq(s"$base/article", s"$base/article", "http://127.0.0.1:1/dead")
        .toDS().repartition(2)
      val crawled = Enrichers.enrichPartitions(
        urls, () => new Http.CrawlClient(timeoutSec = 2))(
        (client, url) => (url, client.asInstanceOf[Http.CrawlClient].crawl(url)))(
        Encoders.product[(String, String)])
        .collect().toMap
      assert(crawled(s"$base/article").startsWith("대통령 기자회견 발표"))
      assert(crawled("http://127.0.0.1:1/dead") == "")
    }
  }
}
