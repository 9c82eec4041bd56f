package graft.udfs

import graft.functions.Text
import graft.news.NewsSchema
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._

/** The model-backed enrichment surface (SURVEY.md §2.10, U1–U4/U6/U7).
  *
  * Every enricher in the reference is an external model call (OpenAI /
  * Ollama / sentence-transformers / HuggingFace), i.e. nondeterministic
  * and side-effecting. Here each is a trait with:
  *
  *  - a pure, deterministic default built from Catalyst expressions
  *    (used by tests, golden runs, and the oracle gate) — these stay
  *    inside whole-stage codegen, so the enrich stage is a plain
  *    projection at scale: no UDF boundary, no shuffle;
  *  - a `mapPartitions` escape hatch ([[Enrichers.enrichPartitions]])
  *    matching the Flink RichScalarFunction `open()` pattern
  *    (collect/consumer2.py:81-95): model/connection initialized once
  *    per partition, rows processed in batches. Remote implementations
  *    plug in there and must be marked nondeterministic.
  */
object Enrichers {

  /** U1: category classification (collect/consumer.py:116-131).
    * Deterministic default: marker-keyword vote over the closed set,
    * first match wins; 미분류 when nothing matches. */
  def classifyExpr(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "IT_과학" -> Seq("AI", "인공지능", "반도체", "기술"),
      "경제" -> Seq("주식", "코스피", "금리", "경제"),
      "정치" -> Seq("국회", "대통령", "정당", "선거"),
      "스포츠" -> Seq("야구", "축구", "올림픽", "경기"),
      "문화" -> Seq("영화", "전시", "공연", "문화"),
      "사회일반" -> Seq("정부", "정책", "사회"))
    markers.foldRight(lit(NewsSchema.Unclassified)) { case ((cat, words), acc) =>
      when(words.map(w => text.contains(w)).reduce(_ || _), lit(cat)).otherwise(acc)
    }
  }

  /** U2: top-5 keywords by term frequency (collect/consumer.py:135-142).
    * Deterministic default: pure-expression TF ranking with
    * (-count, token) sort for a stable tiebreak. */
  def keywordsExpr(text: Column, k: Int = 5): Column = {
    val toks = Text.tokens(text)
    val uniq = array_distinct(toks)
    val scored = transform(uniq, t =>
      struct((-size(filter(toks, x => x === t))).as("neg"), t.as("tok")))
    transform(slice(array_sort(scored), 1, k), s => s.getField("tok"))
  }

  /** U3: embedding generation (collect/consumer2.py:81-95, stateful in
    * the reference). Deterministic default: seeded-hash pseudo-embedding
    * in [-0.5, 0.5)^dim — shape- and type-faithful (array<float>, fixed
    * dim), content-sensitive, reproducible. */
  def embedExpr(text: Column, dim: Int = 768): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      ((pmod(xxhash64(text, j), lit(1000L)).cast("double") / 1000.0d) - 0.5d)
        .cast("float"))

  /** U7: sentiment over the first 300 chars
    * (dags/scripts/spark_daily_report.py:122,177). Deterministic
    * default: lexicon vote. */
  def sentimentExpr(text: Column): Column = {
    val head = substring(text, 1, 300)
    val pos = Seq("상승", "성공", "호황", "개선", "흥행", "증가")
    val neg = Seq("하락", "실패", "불황", "악화", "사고", "감소")
    val posN = pos.map(w => when(head.contains(w), 1).otherwise(0)).reduce(_ + _)
    val negN = neg.map(w => when(head.contains(w), 1).otherwise(0)).reduce(_ + _)
    when(posN > negN, lit("positive"))
      .when(negN > posN, lit("negative"))
      .otherwise(lit("neutral"))
  }

  /** U6: Korean noun-ish tokenization for the word cloud
    * (spark_daily_report.py:31-36 — driver-side Okt loop in the
    * reference; here a distributed expression). Default: runs of >=2
    * Hangul chars. */
  def hangulNounsExpr(text: Column): Column =
    filter(split(regexp_replace(text, "[^가-힣]+", " "), " "),
      t => length(t) >= 2)

  /** U4: crawl-text post-filter (collect/consumer.py:92-113) — the HTTP
    * fetch itself is environment-dependent; its text-cleaning semantics
    * are [[Text.hangulFilter]]. */
  def crawlFilterExpr(raw: Column): Column = Text.hangulFilter(raw)

  /** The whole enrich projection shared by batch and streaming
    * (SURVEY §3.2): summary → category/keywords/embedding columns. */
  def enrich(df: DataFrame, textCol: String = "summary", dim: Int = 768): DataFrame =
    df.withColumn("category", NewsSchema.validCategory(classifyExpr(col(textCol))))
      .withColumn("keywords", keywordsExpr(col(textCol)))
      .withColumn("embedding", embedExpr(col(textCol), dim))

  /** Stateful per-partition enrichment — the U3/Flink-`open()` pattern
    * for real model clients: `init` runs once per partition (load model,
    * open connection), `fn` maps each row. Plug remote models here, not
    * into expressions. */
  def enrichPartitions[T, U: Encoder](ds: Dataset[T], init: () => AnyRef)(
      fn: (AnyRef, T) => U): Dataset[U] =
    ds.mapPartitions { it =>
      val model = init() // once per partition ≈ Flink RichFunction.open()
      it.map(fn(model, _))
    }
}
