package graft

import graft.udfs.Enrichers
import graft.news.NewsSchema
import org.apache.spark.sql.functions._

class EnrichersSpec extends SparkSuite {
  import spark.implicits._

  test("classifyExpr maps marker words to categories, else 미분류") {
    val r = Seq("코스피가 상승했다", "야구 경기가 열렸다", "아무 관련 없는 글")
      .toDF("s").select(Enrichers.classifyExpr(col("s")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("경제", "스포츠", NewsSchema.Unclassified))
  }

  test("keywordsExpr returns top-5 TF tokens with stable tiebreak") {
    val r = Seq("b b b a a c d e f g").toDF("s")
      .select(Enrichers.keywordsExpr(col("s")).as("k"))
      .collect().head.getAs[scala.collection.Seq[String]]("k")
    assert(r.head == "b")       // highest count
    assert(r(1) == "a")         // second
    assert(r.drop(2) == Seq("c", "d", "e")) // count-1 ties broken lexicographically
  }

  test("embedExpr: fixed dim, bounded values, deterministic, content-sensitive") {
    val df = Seq("hello", "hello", "world").toDF("s")
      .select(Enrichers.embedExpr(col("s"), 16).as("e"))
      .collect().map(_.getAs[scala.collection.Seq[Float]]("e"))
    assert(df.forall(_.length == 16))
    assert(df.forall(_.forall(v => v >= -0.5f && v < 0.5f)))
    assert(df(0) == df(1) && df(0) != df(2))
  }

  test("sentimentExpr lexicon vote") {
    val r = Seq("시장이 상승 마감했다", "큰 사고가 발생해 피해가 악화됐다", "보통의 하루였다")
      .toDF("s").select(Enrichers.sentimentExpr(col("s")).as("x"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("positive", "negative", "neutral"))
  }

  test("hangulNounsExpr extracts >=2-char Hangul runs") {
    val r = Seq("오늘 AI 기술이 발전했다!").toDF("s")
      .select(Enrichers.hangulNounsExpr(col("s")).as("n"))
      .collect().head.getAs[scala.collection.Seq[String]]("n")
    assert(r == Seq("오늘", "기술이", "발전했다"))
  }

  test("stemmed nouns strip josa and verb endings, never over-strip") {
    val cases = Seq(
      "정부는 오늘 새로운 정책을 발표했다" ->
        Seq("정부", "오늘", "새로운", "정책", "발표"),
      // 회의/의자 keep their final syllable (remainder guard ≥2);
      // longest-suffix wins (학교에서는 → 학교, not 학교에서).
      "회의 의자 학교에서는" -> Seq("회의", "의자", "학교"),
      "반도체가 경제를 바꾼다" -> Seq("반도체", "경제", "바꾼다"))
    cases.foreach { case (text, expect) =>
      val got = Seq(text).toDF("s")
        .select(Enrichers.hangulNounsStemmedExpr(col("s")).as("n"))
        .collect().head.getAs[scala.collection.Seq[String]]("n")
      assert(got == expect, s"expr path on '$text'")
      // The JVM tokenizer (the Okt plug-in seam) must agree exactly.
      assert(Enrichers.HeuristicNounTokenizer.nouns(text) == expect,
        s"jvm path on '$text'")
    }
  }

  test("dictionary guard fixes irregular nouns the heuristic over-stems") {
    // Without lexical knowledge these LOOK like noun+josa: 어린이 →
    // 어린+이, 고양이 → 고양+이, 바나나 → 바나+나. The dictionary-less
    // stemmer must over-stem them (that's the documented tradeoff)…
    val text = "어린이 고양이 바나나 정부는 경제를"
    assert(Enrichers.HeuristicNounTokenizer.nouns(text) ==
      Seq("어린", "고양", "바나", "정부", "경제"))
    // …and the corpus-mined dictionary guard must fix exactly them,
    // while regular noun+josa forms still strip.
    val dict = Seq("어린이", "고양이", "바나나")
    val expect = Seq("어린이", "고양이", "바나나", "정부", "경제")
    val viaExpr = Seq(text).toDF("s")
      .select(Enrichers.hangulNounsStemmedExpr(col("s"), dict).as("n"))
      .collect().head.getAs[scala.collection.Seq[String]]("n")
    assert(viaExpr == expect, "expr path")
    assert(new Enrichers.DictionaryNounTokenizer(dict.toSet).nouns(text) == expect,
      "jvm path")
  }

  test("mined dictionary entries are frequent standalone surface forms") {
    val docs = spark.read.json("src/test/resources/news_archive_fixture.jsonl")
      .where(col("content").isNotNull)
    val dict = Enrichers.mineNounDictionary(docs, "content", topN = 20)
    assert(dict.nonEmpty && dict.size <= 20)
    assert(dict.forall(t => t.length >= 2 && t.matches("[가-힣]+")))
    // determinism: same corpus → same dictionary
    assert(dict == Enrichers.mineNounDictionary(docs, "content", topN = 20))
  }

  test("expr and JVM stemmers agree across the Korean fixture (with dictionary)") {
    val docs = spark.read.json("src/test/resources/news_archive_fixture.jsonl")
      .where(col("content").isNotNull)
    val dict = Enrichers.mineNounDictionary(docs, "content", topN = 50)
    val jvm = new Enrichers.DictionaryNounTokenizer(dict.toSet)
    val texts = docs.select(col("content")).collect().map(_.getString(0))
    texts.foreach { t =>
      val viaExpr = Seq(t).toDF("s")
        .select(Enrichers.hangulNounsStemmedExpr(col("s"), dict).as("n"))
        .collect().head.getAs[scala.collection.Seq[String]]("n").toSeq
      assert(viaExpr == jvm.nouns(t), s"on: $t")
    }
  }

  test("expr and JVM stemmers agree across the Korean fixture") {
    val texts = spark.read.json("src/test/resources/news_archive_fixture.jsonl")
      .select(col("content")).collect().map(_.getString(0)).filter(_ != null)
    assert(texts.nonEmpty)
    texts.foreach { t =>
      val viaExpr = Seq(t).toDF("s")
        .select(Enrichers.hangulNounsStemmedExpr(col("s")).as("n"))
        .collect().head.getAs[scala.collection.Seq[String]]("n").toSeq
      assert(viaExpr == Enrichers.HeuristicNounTokenizer.nouns(t), s"on: $t")
    }
  }

  test("enrich produces valid closed-set category and typed columns") {
    val df = Seq(("l1", "코스피 급등")).toDF("link", "summary")
    val out = Enrichers.enrich(df, "summary", 8)
    val row = out.collect().head
    assert(NewsSchema.Categories.contains(row.getAs[String]("category")))
    assert(row.getAs[scala.collection.Seq[Float]]("embedding").length == 8)
    assert(row.getAs[scala.collection.Seq[String]]("keywords").nonEmpty)
  }

  test("enrichPartitions initializes once per partition") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("inits")
    val ds = spark.range(100).repartition(4).as[Long]
    val out = Enrichers.enrichPartitions(ds, () => { acc.add(1); new Object })(
      (_, x) => x * 2)
    assert(out.collect().sorted.toSeq == (0L until 100L).map(_ * 2))
    assert(acc.value == 4) // one init per partition, not per row
  }
}
