package graft

import graft.functions.{Text, Vectors, Num}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("s").select(c.as("r")).collect().head.getAs[T]("r")

  test("tokens drops empty strings") {
    val r = one[scala.collection.Seq[String]](Text.tokens(col("s")), "a  b c ")
    assert(r == Seq("a", "b", "c"))
  }

  test("shingles of short docs are empty, not descending-sequence garbage") {
    assert(one[scala.collection.Seq[String]](Text.shingles(Text.tokens(col("s")), 3), "a b") == Seq())
    assert(one[scala.collection.Seq[String]](Text.shingles(Text.tokens(col("s")), 3), "a b c d") ==
      Seq("a b c", "b c d"))
  }

  test("hangulFilter keeps only tokens with a >=3-Hangul run") {
    val r = one[String](Text.hangulFilter(col("s")), "hello 대한민국 ab 뉴스 기사내용 x")
    assert(r == "대한민국 기사내용")
  }

  test("firstSentence cuts at 다. or falls back to 40 chars") {
    assert(one[String](Text.firstSentence(col("s")), "첫 문장이다. 둘째 문장이다.") == "첫 문장이다.")
    val long = "x" * 100
    assert(one[String](Text.firstSentence(col("s")), long) == "x" * 40)
  }

  test("fingerprint is whitespace/case invariant") {
    val a = one[String](Text.fingerprint(col("s")), "Hello   World\n")
    val b = one[String](Text.fingerprint(col("s")), "hello world")
    assert(a == b && a.length == 32)
  }

  test("scriptClass detects scripts") {
    val cases = Seq("안녕하세요" -> "hangul", "你好世界" -> "cjk",
      "Привет" -> "cyrillic", "hello" -> "latin", "12345" -> "other")
    cases.foreach { case (in, want) =>
      assert(one[String](Text.scriptClass(col("s")), in) == want, in)
    }
  }

  test("truncate255 bounds length") {
    assert(one[String](Text.truncate255(col("s")), "y" * 300).length == 255)
  }

  test("roundp rounds exact halves consistently with binary-double engines") {
    // 189/40 = 4.725 → binary double is 4.72499999…, so 4.72 (Spark's
    // round() would give 4.73 via BigDecimal.valueOf).
    val r = Seq((189.0, 40.0)).toDF("a", "b")
      .select(Num.roundp(col("a") / col("b"), 2).as("r")).collect().head.getDouble(0)
    assert(r == 4.72)
  }

  test("vector math: cosine and sqDist") {
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f)), (Seq(1f, 1f), Seq(1f, 1f)))
      .toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("cos"),
        Vectors.sqDist(col("a"), col("b")).as("d2"))
      .collect()
    assert(math.abs(df(0).getDouble(0)) < 1e-12 && df(0).getDouble(1) == 2.0)
    assert(math.abs(df(1).getDouble(0) - 1.0) < 1e-12 && df(1).getDouble(1) == 0.0)
  }

  test("unigram ppl: identical texts score identically; nll positive and consistent with ppl") {
    val d = SparkEntry.queries("text_unigram_ppl")(spark, sf001)
    val docs = Tables(spark, sf001, "documents")
    val joined = d.join(docs, "doc_id")
      .select(md5(col("text")).as("fp"), col("nll"), col("ppl"), col("n_tokens"))
    // Same normalized text => same (nll, ppl, n_tokens).
    val incoherent = joined.groupBy("fp")
      .agg(countDistinct(col("nll"), col("ppl"), col("n_tokens")).as("nv"))
      .where(col("nv") =!= 1).count()
    assert(incoherent === 0L)
    val bad = d.where(col("nll") <= 0 ||
      abs(exp(col("nll")) - col("ppl")) > col("ppl") * 0.001).count()
    assert(bad === 0L)
  }

  test("bigram LM: 3 continuations per head, valid probabilities, ranks dense") {
    val d = SparkEntry.queries("text_bigram_lm")(spark, sf001)
    val perHead = d.groupBy("w1").agg(count(lit(1)).as("n"),
      sum(col("rk")).as("rksum"), max(col("p")).as("pmax"), min(col("p")).as("pmin"))
    val bad = perHead.where(col("n") =!= 3 || col("rksum") =!= 6 ||
      col("pmax") > 1.0 || col("pmin") <= 0.0).count()
    assert(bad === 0L)
    assert(d.select("w1").distinct().count() === 20L)
    // Ranks order by probability: rk 1 has the max p of its head.
    val w1max = d.where(col("rk") === 1).select(col("w1"), col("p").as("p1"))
    val incoherent = d.join(w1max, "w1").where(col("p") > col("p1")).count()
    assert(incoherent === 0L)
  }

  test("BPE training learns monotone-frequency merges that compose") {
    val m = SparkEntry.queries("bpe_train_merges")(spark, sf001).collect()
    assert(m.length === 8)
    // Pair frequency is non-increasing EXCEPT where an earlier merge
    // creates a new high-count symbol — but a later round can never
    // beat round 1's global maximum.
    val ns = m.sortBy(_.getAs[Long]("round")).map(_.getAs[Long]("n"))
    assert(ns.tail.forall(_ <= ns.head), ns.mkString(","))
    m.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left") + r.getAs[String]("right"))
      assert(r.getAs[Long]("n") > 0)
    }
    // Determinism across invocations (argmax ties broken totally).
    val m2 = SparkEntry.queries("bpe_train_merges")(spark, sf001).collect()
    assert(m.map(_.toString).toSeq == m2.map(_.toString).toSeq)
  }

  test("BPE apply: fertility bounded and merges genuinely compress") {
    import org.apache.spark.sql.functions._
    val st = SparkEntry.queries("bpe_apply_stats")(spark, sf001)
    val rows = st.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (w, sw) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"))
      assert(sw >= w, s"doc ${r.getAs[Long]("doc_id")}: fewer subwords than words")
      assert(r.getAs[Double]("fertility") >= 1.0)
    }
    // Before any merge every word is one symbol per character — the 8
    // learned merges must strictly compress the corpus total.
    val totalChars = Tables(spark, sf001, "documents")
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .agg(sum(length(col("w")))).head().getLong(0)
    val totalSub = rows.map(_.getAs[Long]("n_subwords")).sum
    assert(totalSub < totalChars, s"$totalSub !< $totalChars")
  }
}
