package graft.udfs

import graft.news.NewsSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Example REMOTE implementations of the U1/U2 enricher seams — the
  * model-backed path the reference runs against a local LLM server
  * (collect/ollama_consumer.py:295-333: `ollama_client.chat` with a
  * single user message, closed-set-or-미분류 validation for
  * categories, comma-split for tags).
  *
  * These are the documented example of "plug a real model in": the
  * deterministic expression defaults in [[Enrichers]] remain the
  * oracle-gated path; everything here is
  *
  *  - **nondeterministic** (a model may answer differently per call) —
  *    the UDF wrappers are marked `asNondeterministic()` so Catalyst
  *    never collapses, reorders past filters, or re-executes them on
  *    the assumption of purity;
  *  - **failure-isolating**: a failed call yields the same safe
  *    defaults as the reference (미분류 / empty tag list), so one dead
  *    endpoint degrades enrichment instead of failing the job;
  *  - **connection-scoped per executor**: the HTTP client is built
  *    lazily on first use after deserialization (the Flink
  *    RichFunction.open() pattern, collect/consumer2.py:81-95).
  *
  * The wire shape matches the Ollama REST API the reference's client
  * library speaks: `POST <endpoint>/api/chat` with
  * `{"model": m, "messages": [{"role": "user", "content": p}],
  * "stream": false}`, answer at `message.content`.
  */
object RemoteEnrichers {

  /** Minimal chat-completion client seam (the `ollama.Client.chat`
    * slot). Implementations must be Serializable and safe to use from
    * executor threads. */
  trait ChatModelClient extends Serializable {
    def chat(model: String, userContent: String): String
  }

  /** `java.net.http` implementation of the Ollama chat call. */
  class HttpChatClient(endpoint: String, timeoutSec: Int = 30)
      extends ChatModelClient {
    // Rebuilt per executor after deserialization; HttpClient itself is
    // thread-safe, so all partitions on an executor share it.
    @transient private lazy val http: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(timeoutSec.toLong))
        .build()

    def chat(model: String, userContent: String): String = {
      import org.json4s._
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods._
      val body = compact(render(
        ("model" -> model) ~
          ("messages" -> List(("role" -> "user") ~ ("content" -> userContent))) ~
          ("stream" -> false)))
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"$endpoint/api/chat"))
        .timeout(java.time.Duration.ofSeconds(timeoutSec.toLong))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body,
          java.nio.charset.StandardCharsets.UTF_8))
        .build()
      val resp = http.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString(
          java.nio.charset.StandardCharsets.UTF_8))
      require(resp.statusCode() == 200, s"chat endpoint: HTTP ${resp.statusCode()}")
      implicit val fmt: Formats = DefaultFormats
      (parse(resp.body()) \ "message" \ "content").extract[String].trim
    }
  }

  /** U1 via a chat model (ollama_consumer.py:295-313): prompt with the
    * closed category set, accept the answer only if it IS one of the
    * categories, else (or on any failure) 미분류. */
  class HttpChatClassifier(client: ChatModelClient, model: String)
      extends Serializable {
    def classify(text: String): String =
      try {
        val prompt =
          s"다음 뉴스 내용을 가장 적절한 카테고리 하나로 분류해줘: " +
            s"${NewsSchema.Categories.mkString(", ")}\n뉴스 내용:\n$text\n" +
            "답변은 카테고리 이름만 출력해줘."
        val out = client.chat(model, prompt)
        if (NewsSchema.Categories.contains(out)) out else NewsSchema.Unclassified
      } catch { case scala.util.control.NonFatal(_) => NewsSchema.Unclassified }
  }

  /** U2 via a chat model (ollama_consumer.py:316-326): ask for 5
    * comma-separated keywords, split and trim; empty list on failure. */
  class HttpTagExtractor(client: ChatModelClient, model: String)
      extends Serializable {
    def keywords(text: String): Seq[String] =
      try {
        val prompt = s"다음 뉴스에서 핵심 키워드 5개를 쉼표로 구분하여 출력해주세요.\n\n$text"
        client.chat(model, prompt).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Nondeterministic UDF wrappers — model answers are not pure
    * functions of their input, so Catalyst must not dedup or reorder
    * these calls. */
  def classifyUdf(c: HttpChatClassifier): Column => Column = {
    val u = udf((s: String) => c.classify(s)).asNondeterministic()
    col => u(col)
  }

  def keywordsUdf(t: HttpTagExtractor): Column => Column = {
    val u = udf((s: String) => t.keywords(s)).asNondeterministic()
    col => u(col)
  }

  /** The enrich projection with the remote U1/U2 plugged in (U3 keeps
    * the deterministic pseudo-embedding default — the reference's
    * sentence-transformer runs in-process, not over HTTP). Same output
    * schema as [[Enrichers.enrich]], so batch/streaming callers swap
    * freely between the deterministic and model-backed paths. */
  def enrich(df: DataFrame, classifier: HttpChatClassifier,
      tagger: HttpTagExtractor, textCol: String = "summary",
      dim: Int = 768): DataFrame =
    df.withColumn("category",
        NewsSchema.validCategory(classifyUdf(classifier)(col(textCol))))
      .withColumn("keywords", keywordsUdf(tagger)(col(textCol)))
      .withColumn("embedding", Enrichers.embedExpr(col(textCol), dim))
}
