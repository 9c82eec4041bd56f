package graft

import graft.functions.{Num, Text}
import graft.udfs.Enrichers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks (SURVEY.md §5.2.4) over the pure column
  * functions, run through a real local session so the properties hold
  * for the actual Catalyst evaluation, not a Scala re-implementation.
  */
object TextProperties extends Properties("graft.text") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-props")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def eval1(c: org.apache.spark.sql.Column, input: String): Any = {
    import spark.implicits._
    Seq(input).toDF("s").select(c.as("r")).collect().head.get(0)
  }

  private val mixedText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("대한민국", "뉴스", "기사내용이다.", "ab", " ", "\t", "다."),
  )).map(_.mkString(" ")).map(_.take(200))

  property("truncate255 output never exceeds 255 chars") =
    Prop.forAll(mixedText) { s =>
      eval1(Text.truncate255(col("s")), s).asInstanceOf[String].length <= 255
    }

  property("fingerprint is invariant under whitespace runs and case") =
    Prop.forAll(mixedText) { s =>
      val a = eval1(Text.fingerprint(col("s")), s)
      val b = eval1(Text.fingerprint(col("s")), s.toUpperCase.replace(" ", "  "))
      a == b
    }

  property("firstSentence is a prefix of the input ending in 다. or <=40 chars") =
    Prop.forAll(mixedText.suchThat(_.nonEmpty)) { s =>
      val r = eval1(Text.firstSentence(col("s")), s).asInstanceOf[String]
      s.startsWith(r) && (r.endsWith("다.") || r.length <= 40)
    }

  property("tokens never contains empties; shingles has max(0, n-2) entries") =
    Prop.forAll(mixedText) { s =>
      import spark.implicits._
      val row = Seq(s).toDF("s").select(
        Text.tokens(col("s")).as("t"),
        Text.shingles(Text.tokens(col("s")), 3).as("sh")).collect().head
      val toks = row.getAs[scala.collection.Seq[String]]("t")
      val sh = row.getAs[scala.collection.Seq[String]]("sh")
      toks.forall(_.nonEmpty) && sh.length == math.max(0, toks.length - 2)
    }

  property("chargrams equals the HOF formulation it replaces") =
    Prop.forAll(mixedText, Gen.oneOf("", "😀", "𝒳한")) { (s0, astral) =>
      // Include supplementary chars: both engines' substr counts CODE
      // POINTS, so the native offset walk must too.
      val s = s0 + astral
      import spark.implicits._
      val n = 3
      val hof = when(length(col("s")) >= n,
        array_distinct(transform(
          sequence(lit(0), length(col("s")) - lit(n)),
          i => substring(col("s"), i + 1, lit(n)))))
        .otherwise(array())
      val row = Seq(s).toDF("s").select(
        Text.chargrams(col("s"), n).as("native"), hof.as("hof")).collect().head
      row.getAs[scala.collection.Seq[String]]("native") ==
        row.getAs[scala.collection.Seq[String]]("hof")
    }

  property("keywordsExpr returns at most 5 distinct tokens from the text") =
    Prop.forAll(mixedText.suchThat(_.trim.nonEmpty)) { s =>
      val ks = eval1(Enrichers.keywordsExpr(col("s")), s)
        .asInstanceOf[scala.collection.Seq[String]]
      ks.length <= 5 && ks.distinct.length == ks.length &&
        ks.forall(s.split(" ").contains(_))
    }

  property("roundp is idempotent and within half a step of the input") =
    Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { d =>
      import spark.implicits._
      val row = Seq(d).toDF("d").select(
        Num.roundp(col("d"), 2).as("r1"),
        Num.roundp(Num.roundp(col("d"), 2), 2).as("r2")).collect().head
      val (r1, r2) = (row.getDouble(0), row.getDouble(1))
      r1 == r2 && math.abs(r1 - d) <= 0.005 + 1e-9
    }
}
