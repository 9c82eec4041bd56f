package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.udfs.RemoteEnrichers
import graft.udfs.RemoteEnrichers.{HttpChatClassifier, HttpChatClient, HttpTagExtractor}
import org.apache.spark.sql.functions._

/** The documented remote-enricher example (U1/U2 over a chat model):
  * proven end-to-end against an in-JVM fake LLM endpoint speaking the
  * Ollama /api/chat wire shape — request JSON with model + one user
  * message, answer at message.content — including closed-set
  * validation, failure-to-default degradation, and the
  * asNondeterministic marking on the UDFs. */
class RemoteEnricherSpec extends SparkSuite {

  /** Fake LLM: classification prompts are answered by keyword lookup on
    * the article text embedded in the prompt; keyword prompts get a
    * fixed comma list; anything else gets an out-of-set answer. */
  private def withFakeLlm[T](f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/chat", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val content =
          if (body.contains("키워드")) "코스피, 상승, 증시, 외국인, 매수"
          else if (body.contains("코스피")) "경제"
          else if (body.contains("야구")) "스포츠"
          else "자유형식으로답하는모델" // NOT in the closed set
        // the Ollama chat response shape: answer at message.content
        val resp =
          s"""{"model":"fake","message":{"role":"assistant","content":"$content"},"done":true}"""
        val bytes = resp.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("remote classify/tag enrich end-to-end against the fake endpoint") {
    withFakeLlm { endpoint =>
      import spark.implicits._
      val client = new HttpChatClient(endpoint, timeoutSec = 5)
      val classifier = new HttpChatClassifier(client, "fake")
      val tagger = new HttpTagExtractor(client, "fake")
      val docs = Seq(
        1L -> "코스피 지수가 상승 마감했다",
        2L -> "프로 야구 개막전이 열렸다",
        3L -> "모델이 카테고리를 모르는 글").toDF("id", "summary")

      val out = RemoteEnrichers.enrich(docs, classifier, tagger, dim = 8)
        .select(col("id"), col("category"), col("keywords"), size(col("embedding")).as("d"))
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getSeq[String](2), r.getInt(3))).toMap

      assert(out(1L)._1 == "경제")
      assert(out(2L)._1 == "스포츠")
      // out-of-set model answer must validate down to 미분류
      assert(out(3L)._1 == "미분류")
      // tags: comma-split + trim of the model answer
      assert(out(1L)._2 == Seq("코스피", "상승", "증시", "외국인", "매수"))
      // U3 default stays shape-faithful next to the remote columns
      assert(out.values.forall(_._3 == 8))
    }
  }

  test("a dead endpoint degrades to the reference defaults, not a job failure") {
    val client = new HttpChatClient("http://127.0.0.1:9", timeoutSec = 1) // closed port
    val classifier = new HttpChatClassifier(client, "fake")
    val tagger = new HttpTagExtractor(client, "fake")
    assert(classifier.classify("아무 기사") == "미분류")
    assert(tagger.keywords("아무 기사") == Nil)
  }

  test("the remote UDFs are marked nondeterministic") {
    withFakeLlm { endpoint =>
      val client = new HttpChatClient(endpoint, timeoutSec = 5)
      val classifier = new HttpChatClassifier(client, "fake")
      import spark.implicits._
      val df = Seq("기사").toDF("summary")
        .select(RemoteEnrichers.classifyUdf(classifier)(col("summary")).as("c"))
      // the ANALYZED invocation must carry deterministic = false, so
      // Catalyst won't collapse/reorder/re-execute the model call
      val analyzed = df.queryExecution.analyzed
      assert(analyzed.expressions.exists(_.exists(e => !e.deterministic)),
        analyzed.treeString)
    }
  }
}
