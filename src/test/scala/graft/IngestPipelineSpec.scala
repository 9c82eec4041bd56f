package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.streaming.{DecontamStream, IngestPipeline, SpanDedupStream}
import org.apache.spark.sql.functions._

/** The composed ingest pipeline end-to-end: RSS source → enrich →
  * chunk-span dedup gate → decontamination gate → lake upsert, as a
  * single readStream-to-sink query, across a checkpoint restart. The
  * lake contents are pinned against the BATCH operators replayed over
  * the same arrival order (the CdcStream-style equivalence). */
class IngestPipelineSpec extends SparkSuite {

  @volatile private var feedBody: String = ""

  private def feedXml(items: Seq[(String, String, String)]): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<rss version="2.0"><channel><title>뉴스</title>
       |${items.map { case (t, l, d) =>
            s"<item><title>$t</title><link>$l</link>" +
              s"<description>$d</description><author>kim</author></item>"
          }.mkString("\n")}
       |</channel></rss>""".stripMargin

  test("two polls through a restart: each link lands once, gate columns " +
      "equal the batch operators replayed in arrival order") {
    import spark.implicits._
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
    val base = Files.createTempDirectory("ingest-e2e").toString
    val (store, seenP, lshP, ckpt) =
      (s"$base/store", s"$base/seen", s"$base/lsh", s"$base/ckpt")

    val tClean = "alpha bravo charlie delta echo foxtrot golf hotel"
    val tEval = "quick brown fox jumps over the lazy dog tonight"
    val tFresh = "india juliet kilo lima mike november oscar papa"
    val evalShingles = Seq(tEval).toDF("text")
      .select(graft.functions.Text.tokens(col("text")).as("tok"))
      .select(explode(graft.functions.Text.shingles(col("tok"), 3)).as("s"))
      .distinct()

    def runOnce(): Unit = {
      val q = IngestPipeline.start(spark, url, store, seenP, lshP,
        evalShingles, ckpt, horizon = 50, embedDim = 8)
      q.awaitTermination()
    }

    try {
      // Poll 1: a clean doc, a contaminated doc (its text IS the eval
      // text), and a within-batch re-quote of the clean doc.
      feedBody = feedXml(Seq(
        ("첫 기사", "http://ex/a", tClean),
        ("오염 기사", "http://ex/b", tEval),
        ("재인용", "http://ex/c", tClean)))
      runOnce()
      // Poll 2, FRESH query on the same checkpoint (restart): link b
      // re-appears on the feed (horizon must dedup it), a CROSS-POLL
      // re-quote of the clean text arrives, and a fresh clean doc.
      feedBody = feedXml(Seq(
        ("오염 기사", "http://ex/b", tEval),
        ("재인용2", "http://ex/d", tClean),
        ("새 기사", "http://ex/e", tFresh)))
      runOnce()
    } finally server.stop(0)

    val lake = spark.read.parquet(store)
    val links = lake.select("link").as[String].collect().sorted.toSeq
    assert(links == Seq("http://ex/a", "http://ex/b", "http://ex/c",
      "http://ex/d", "http://ex/e"), links)
    // enrichment ran inside the same query
    assert(lake.columns.contains("category") && lake.columns.contains("embedding"))

    // ── Batch-computed equivalent over the same arrival order ──────────
    val poll1 = Seq(("http://ex/a", tClean), ("http://ex/b", tEval),
      ("http://ex/c", tClean)).toDF("doc_id", "text")
    val poll2 = Seq(("http://ex/d", tClean), ("http://ex/e", tFresh))
      .toDF("doc_id", "text")
    val empty = SpanDedupStream.emptySeen(spark)
    val seen1 = SpanDedupStream.freshHashes(poll1, empty)
    val spanExp = SpanDedupStream.score(poll1, empty)
      .unionByName(SpanDedupStream.score(poll2, seen1))
    val decExp = DecontamStream.score(poll1.unionByName(poll2), evalShingles)

    def spanKey(df: org.apache.spark.sql.DataFrame, id: String) =
      df.select(col(id), col("n_chunks"), col("n_dup"), col("dup_frac"))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup"),
            r.getAs[Double]("dup_frac"))).toMap
    assert(spanKey(lake, "link") == spanKey(spanExp, "doc_id"))

    def decKey(df: org.apache.spark.sql.DataFrame, id: String) =
      df.select(col(id), col("n_common"), col("train_sz"),
        col("contam_ratio"), col("contaminated"))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_common"), r.getAs[Long]("train_sz"),
            r.getAs[Double]("contam_ratio"), r.getAs[Boolean]("contaminated"))).toMap
    assert(decKey(lake, "link") == decKey(decExp, "doc_id"))

    // the semantics the flags exist for: the contaminated doc is the
    // ONLY contaminated one; both re-quotes are fully duplicate spans
    val byLink = decKey(lake, "link")
    assert(byLink("http://ex/b")._4 && byLink.count(_._2._4) == 1)
    val spans = spanKey(lake, "link")
    assert(spans("http://ex/c")._3 == 1.0 && spans("http://ex/d")._3 == 1.0)
    assert(spans("http://ex/a")._2 == 0L && spans("http://ex/e")._2 == 0L)

    // ── LSH near-dup gate: batch-vs-corpus-so-far semantics. Poll 1
    // ran against an empty corpus (a/b/c unique — within-batch copies
    // are the SPAN gate's domain); poll 2's re-quote of the clean text
    // near-matches the poll-1 corpus at Jaccard 1.0, with the lowest
    // qualifying link as the match. ───────────────────────────────────
    val lsh = lake.select(col("link"), col("near_dup"), col("match_id"),
        col("jacc")).collect()
      .map(r => r.getString(0) -> (r.getAs[Boolean]("near_dup"),
        Option(r.getAs[String]("match_id")),
        Option(r.get(r.fieldIndex("jacc"))).map(_.asInstanceOf[Double]))).toMap
    assert(!lsh("http://ex/a")._1 && !lsh("http://ex/b")._1 &&
      !lsh("http://ex/c")._1 && !lsh("http://ex/e")._1)
    assert(lsh("http://ex/d") == ((true, Some("http://ex/a"), Some(1.0))),
      lsh("http://ex/d").toString)
  }
}
