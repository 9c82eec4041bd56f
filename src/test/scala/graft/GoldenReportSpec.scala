package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.news.{DailyReport, ReportRender}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden end-to-end daily report over the REFERENCE's own committed
  * sample archive (`data/news_archive/sample.json`, 4 articles of
  * 2025-05-24 — the input behind the committed
  * `data/pdf/daily_report_2025-05-24.pdf`). Every report table is
  * rendered to a canonical CSV string and compared BYTE-STABLE against
  * goldens committed under `src/test/resources/golden_report_2025-05-24/`
  * — the whole chain (multiline JSON read → day slice → R1–R7 stages →
  * deterministic UDF defaults, KMeans seed 42) is pinned end to end, so
  * any drift in tokenization, sentiment lexicon, ordering, or schema
  * shows up as a golden diff, not a silent change.
  *
  * Regenerate after an INTENTIONAL semantic change with
  * `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.GoldenReportSpec"` and
  * review the diff like any other code change.
  *
  * Skips (assume) when the reference checkout is absent — the goldens
  * themselves are committed, so the pin travels with the repo.
  */
class GoldenReportSpec extends SparkSuite {

  private val sample = "/root/reference/data/news_archive/sample.json"
  private val goldenDir = "src/test/resources/golden_report_2025-05-24"
  private val date = "2025-05-24"

  private lazy val reports: Map[String, DataFrame] =
    DailyReport.run(spark, sample, date, multiline = true)

  /** Canonical TSV: header + rows; arrays join with '|'; floating
    * values print with java toString (deterministic per bit pattern).
    * Tab-separated because article titles legitimately carry commas;
    * quote-free by construction (asserted: no tabs/newlines in cells). */
  private def canonicalCsv(df: DataFrame): String = {
    val cols = df.columns
    def fmt(v: Any): String = v match {
      case null => ""
      case s: scala.collection.Seq[_] => s.map(fmt).mkString("|")
      case x => x.toString
    }
    val rows = df.collect().map { r =>
      val cells = cols.indices.map(i => fmt(r.get(i)))
      cells.foreach(c => assert(!c.exists("\t\n".contains(_)),
        s"cell needs quoting, canonical TSV contract broken: '$c'"))
      cells.mkString("\t")
    }
    (cols.mkString("\t") +: rows).mkString("", "\n", "\n")
  }

  private def checkGolden(name: String, body: => String): Unit = {
    val got = body
    val path = Paths.get(goldenDir, s"$name.csv")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.createDirectories(path.getParent)
      Files.write(path, got.getBytes(StandardCharsets.UTF_8))
    }
    assert(Files.exists(path), s"golden missing: $path (set GRAFT_REGEN_GOLDEN=1)")
    val want = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    assert(got == want, s"$name drifted from its golden")
  }

  private def assumeRef(): Unit =
    assume(Files.exists(Paths.get(sample)), "reference checkout not present")

  test("r1 category counts match the golden byte-for-byte") {
    assumeRef()
    checkGolden("r1_category_counts", canonicalCsv(reports("r1_category_counts")))
  }

  test("r2 keyword counts + top-k match the goldens") {
    assumeRef()
    checkGolden("r2_keyword_counts", canonicalCsv(reports("r2_keyword_counts")))
    checkGolden("r2b_top_keywords", canonicalCsv(reports("r2b_top_keywords")))
  }

  test("r3 article list (summary + sentiment) matches the golden") {
    assumeRef()
    checkGolden("r3_article_list",
      canonicalCsv(reports("r3_article_list").orderBy(col("id"))))
  }

  test("r4 clustering is empty on the sample (no embedding column values)") {
    assumeRef()
    // The sample archive carries no embeddings; the stage must degrade
    // to an empty frame, not fail — same branch the reference hits
    // when the day has no vectors (spark_daily_report.py:83).
    assert(reports("r4_clustering").isEmpty)
  }

  test("r5 noun frequencies match the golden") {
    assumeRef()
    checkGolden("r5_noun_frequencies", canonicalCsv(reports("r5_noun_frequencies")))
  }

  test("the sample report renders to a structurally valid PDF") {
    assumeRef()
    val bytes = ReportRender.pdf(date, reports)
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(raw.startsWith("%PDF-1.4\n") && raw.endsWith("%%EOF\n"))
    assert(bytes.length > 2000)
  }
}
