package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.Try

import graft.functions.Text
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

/** S11/U4: the real HTTP side of ingest — feed polling and per-article
  * crawling (reference: collect/producer.py feedparser loop;
  * collect/consumer.py:92-113 `Crawl_Article`).
  *
  * Built on `java.net.http` (JDK-native, zero extra dependencies).
  * The shared client is a JVM-level lazy val: `HttpClient` is
  * thread-safe and pools connections, so executor tasks reuse one
  * client per JVM instead of opening a fresh socket pool per partition.
  * Nothing here is serialized — [[HttpFeedFetcher]] and [[CrawlClient]]
  * carry only config and resolve the client lazily on first use, which
  * is what makes them safe to ship into `mapPartitions`.
  *
  * Crawl semantics match the reference exactly (consumer.py:92-113):
  * browser User-Agent, 10 s timeout, empty string on any failure,
  * HTML → text nodes (`stripped_strings`), keep nodes containing ≥3
  * consecutive Hangul, join with a single space.
  */
object Http {

  /** consumer.py:94 sends a browser UA; news sites 403 default agents. */
  val UserAgent: String =
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/123.0.0.0 Safari/537.36"

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** GET → body; None on connect/read failure or non-2xx (the
    * reference's `raise_for_status` + catch-all → ''). */
  def get(url: String, timeoutSec: Int = 10): Option[String] = Try {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSec.toLong))
      .header("User-Agent", UserAgent)
      .GET().build()
    client.send(req, HttpResponse.BodyHandlers.ofString())
  }.toOption.filter(r => r.statusCode() >= 200 && r.statusCode() < 300).map(_.body())

  // ── Feed parsing (S1) ──────────────────────────────────────────────

  /** RSS 2.0 `<item>` and Atom `<entry>` → wire-schema entries
    * (producer.py:42-48 field set: author/link/summary/title/updated).
    * DOM parse with DTD/external-entity resolution disabled — feeds are
    * untrusted input and XXE through a news feed is a real channel. */
  def parseFeed(xml: String): Seq[Rss.FeedEntry] = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.setNamespaceAware(false)
    val doc = f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    def text(e: Element, tag: String): String = {
      val ns = e.getElementsByTagName(tag)
      if (ns.getLength == 0) null else ns.item(0).getTextContent.trim
    }
    def items(tag: String): Seq[Element] = {
      val ns = doc.getElementsByTagName(tag)
      (0 until ns.getLength).map(ns.item(_).asInstanceOf[Element])
    }
    val rss = items("item").map { e =>
      Rss.FeedEntry(author = text(e, "author"), link = text(e, "link"),
        summary = text(e, "description"), title = text(e, "title"),
        updated = Option(text(e, "pubDate")).getOrElse(text(e, "updated")))
    }
    val atom = items("entry").map { e =>
      val link = {
        val ns = e.getElementsByTagName("link")
        if (ns.getLength == 0) null
        else {
          val el = ns.item(0).asInstanceOf[Element]
          Option(el.getAttribute("href")).filter(_.nonEmpty)
            .getOrElse(el.getTextContent.trim)
        }
      }
      Rss.FeedEntry(author = text(e, "name"), link = link,
        summary = text(e, "summary"), title = text(e, "title"),
        updated = text(e, "updated"))
    }
    rss ++ atom
  }

  /** The default production [[Rss.FeedFetcher]]: HTTP GET + XML parse;
    * a failing feed contributes zero entries (poll cycles must survive
    * one dead feed out of 29). */
  class HttpFeedFetcher(timeoutSec: Int = 10) extends Rss.FeedFetcher {
    def fetch(url: String): Seq[Rss.FeedEntry] =
      get(url, timeoutSec).map(parseFeed).getOrElse(Nil)
  }

  // ── Article crawling (S11/U4) ──────────────────────────────────────

  /** HTML → stripped text nodes: drop script/style/comment blocks, then
    * every run of text between tags, trimmed, empties removed — the
    * `soup.stripped_strings` contract (consumer.py:102). Entity-decodes
    * the handful that matter in news prose. */
  def strippedStrings(html: String): Seq[String] = {
    val noBlocks = html
      .replaceAll("(?is)<script.*?</script>", " ")
      .replaceAll("(?is)<style.*?</style>", " ")
      .replaceAll("(?s)<!--.*?-->", " ")
    noBlocks.split("<[^>]*>")
      .iterator
      // &amp; must decode LAST: decoding it first would turn the
      // escaped literal "&amp;lt;" into "&lt;" and then corrupt it
      // into "<" (double-decoding).
      .map(_.replace("&nbsp;", " ")
        .replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'")
        .replace("&amp;", "&").trim)
      .filter(_.nonEmpty)
      .toSeq
  }

  private val hangul3 = java.util.regex.Pattern.compile("[가-힣]{3,}")

  /** `Crawl_Article` (consumer.py:92-113): fetch, strip to text nodes,
    * keep nodes with ≥3 consecutive Hangul, join with ' '. Empty string
    * on any failure. The same ≥3-Hangul semantics exist as a Catalyst
    * expression ([[Text.hangulFilter]]) for the declarative path —
    * [[CrawlSemantics]] in the spec pins the two against each other. */
  def crawlArticle(url: String, timeoutSec: Int = 10): String =
    get(url, timeoutSec) match {
      case None => ""
      case Some(html) =>
        strippedStrings(html).filter(t => hangul3.matcher(t).find()).mkString(" ")
    }

  /** Per-partition crawl client for [[graft.udfs.Enrichers.enrichPartitions]]
    * — the Flink RichFunction.open() seam: construct once per partition,
    * call per row. Holds only config; the HTTP client resolves lazily in
    * the executor JVM. */
  class CrawlClient(timeoutSec: Int = 10) extends Serializable {
    def crawl(url: String): String = crawlArticle(url, timeoutSec)
  }
}
