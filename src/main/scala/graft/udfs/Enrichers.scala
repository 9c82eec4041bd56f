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

  // ── U6, morphological variant ──────────────────────────────────────
  // The reference runs KoNLPy Okt (spark_daily_report.py:31-36), a full
  // morphological analyzer. No Korean NLP library ships in this
  // environment, so the stemmed path is a heuristic analyzer: per
  // Hangul eojeol, strip one verbalizer ending (발표했다 → 발표 — the
  // X하다 Sino-Korean verb pattern), then one trailing josa (정부는 →
  // 정부), each only when ≥2 chars survive (회의 must NOT lose its 의).
  // Suffix lists are longest-first so the regex alternation picks the
  // longest match (에서는 before 에서 before 는). A real analyzer
  // (Okt/KOMORAN on the classpath) plugs in behind [[KoreanTokenizer]]
  // without touching callers; the expression default keeps the word
  // cloud distributed and codegen-friendly.

  /** Verbalizer endings (하다/되다 conjugations), longest-first. */
  private[udfs] val VerbEndings: Seq[String] = Seq(
    "했습니다", "됐습니다", "됩니다", "합니다", "하면서", "되면서",
    "하고는", "했다가", "했는데", "되는데", "하는데",
    "했으며", "되었으며", "하였으며", "되었다", "하였다",
    "했다", "한다", "하다", "됐다", "된다", "되다", "하여", "해서",
    "하는", "되는", "하며", "되며", "하고", "되고", "할", "된", "한")

  /** Post-nominal particles (josa), longest-first. */
  private[udfs] val Josa: Seq[String] = Seq(
    "에서부터", "으로부터", "이라고는", "에게서", "한테서", "으로서",
    "으로써", "이라고", "에서는", "에서도", "이라는", "까지는",
    "부터는", "에게는", "보다는", "라고", "로서", "로써", "라는",
    "에서", "에게", "한테", "처럼", "보다", "마다", "밖에", "조차",
    "마저", "까지", "부터", "든지", "이나", "이란", "과는", "와는",
    "으로", "에는", "에도", "은", "는", "이", "가", "을", "를", "의",
    "에", "와", "과", "도", "만", "나", "로", "란")

  private def stripSuffix(tok: Column, alt: Seq[String]): Column = {
    val stripped = regexp_replace(tok, s"(${alt.mkString("|")})$$", "")
    when(length(stripped) >= 2, stripped).otherwise(tok)
  }

  /** One eojeol → its noun-ish stem (expression form). */
  def nounStemExpr(tok: Column): Column =
    stripSuffix(stripSuffix(tok, VerbEndings), Josa)

  /** Dictionary-guarded stem (U6 hardening): surface forms in `dict`
    * are lexical entries — emitted as-is, never stripped. The guard
    * fixes the irregular nouns a dictionary-less heuristic must
    * over-stem: 어린이/고양이/바나나 end in josa-shaped syllables, and
    * only lexical knowledge (here: corpus frequency of the exact
    * surface form, [[mineNounDictionary]]) distinguishes them from
    * 정부는/경제를. With ~10²–10³ entries the literal in-set compiles
    * to a hash probe inside codegen. */
  def nounStemExpr(tok: Column, dict: Seq[String]): Column =
    if (dict.isEmpty) nounStemExpr(tok)
    else when(tok.isin(dict: _*), tok).otherwise(nounStemExpr(tok))

  /** U6 stemmed: Hangul runs with verb endings and josa stripped —
    * the word-cloud tokenization that approximates Okt.nouns(). */
  def hangulNounsStemmedExpr(text: Column): Column =
    hangulNounsStemmedExpr(text, Nil)

  /** Dictionary-guarded variant; `dict` entries pass through unstemmed. */
  def hangulNounsStemmedExpr(text: Column, dict: Seq[String]): Column =
    transform(hangulNounsExpr(text), t => nounStemExpr(t, dict))

  /** Mine the noun dictionary from a corpus: the top-N most frequent
    * exact Hangul surface forms (≥2 chars). A form that is itself
    * high-frequency standalone is a word in its own right — stripping
    * it would conflate distinct lemmas (어린이→어린). One distributed
    * count + a driver-sized top-N; the result ships back into the
    * stemmer as literals, so applying the dictionary adds no join. */
  def mineNounDictionary(docs: DataFrame, textCol: String,
      topN: Int = 200): Seq[String] =
    docs.select(explode(hangulNounsExpr(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t")).limit(topN)
      .collect().map(_.getString(0)).toSeq

  /** Pluggable morphological analyzer seam (the Okt slot). Must be
    * cheap per call and safe to construct per partition. */
  trait KoreanTokenizer extends Serializable {
    def nouns(text: String): Seq[String]
  }

  /** JVM-side twin of [[hangulNounsStemmedExpr]] — same suffix tables,
    * same ≥2-char guards, same dictionary pass-through — for the
    * `mapPartitions`/driver paths. The spec pins the two
    * implementations against each other. */
  class DictionaryNounTokenizer(dict: Set[String]) extends KoreanTokenizer {
    private val hangulRun = java.util.regex.Pattern.compile("[가-힣]+")
    // Longest matching suffix, to mirror the regex form exactly: an
    // anchored alternation's leftmost match IS the longest listed
    // suffix, whatever the list order.
    private def strip(tok: String, suffixes: Seq[String]): String =
      suffixes.filter(tok.endsWith).maxByOption(_.length) match {
        case Some(sfx) if tok.length - sfx.length >= 2 =>
          tok.substring(0, tok.length - sfx.length)
        case _ => tok
      }
    def nouns(text: String): Seq[String] = {
      val m = hangulRun.matcher(text)
      val out = Seq.newBuilder[String]
      while (m.find()) {
        val t = m.group()
        if (t.length >= 2)
          out += (if (dict.contains(t)) t else strip(strip(t, VerbEndings), Josa))
      }
      out.result()
    }
  }

  /** Dictionary-less twin (the historical default). */
  object HeuristicNounTokenizer extends DictionaryNounTokenizer(Set.empty)

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
