package graft

import java.nio.charset.StandardCharsets

import graft.news.{DailyReport, ReportRender}

/** S13: the PDF artifact — a structurally valid multi-page PDF built
  * from the daily-report datasets, section-for-section with the
  * reference (charts, paginated article list, word panel, cluster
  * scatter + table). Validated at the byte level: header/trailer, xref
  * offsets resolving to their object headers, page-tree consistency,
  * and the Korean section titles present as UTF-16BE text. */
class PdfReportSpec extends SparkSuite {

  private val fixture = "src/test/resources/news_archive_fixture.jsonl"

  private lazy val bytes: Array[Byte] = {
    val reports = DailyReport.run(spark, fixture, "2025-05-24")
    ReportRender.pdf("2025-05-24", reports)
  }
  private lazy val raw = new String(bytes, StandardCharsets.ISO_8859_1)

  test("document frame: header, trailer, startxref") {
    assert(raw.startsWith("%PDF-1.4\n"))
    assert(raw.endsWith("%%EOF\n"))
    val xrefPos = raw.linesIterator.toSeq.reverse
      .dropWhile(!_.forall(_.isDigit)).head.toInt
    assert(raw.substring(xrefPos).startsWith("xref\n"))
  }

  test("every xref entry resolves to its numbered object header") {
    val xref = raw.substring(raw.lastIndexOf("\nxref\n") + 1)
    val entries = xref.linesIterator.drop(3) // xref / section / free head
      .takeWhile(l => l.length >= 18 && l.endsWith("n "))
      .map(_.take(10).toInt).toSeq
    assert(entries.nonEmpty)
    entries.zipWithIndex.foreach { case (off, i) =>
      val head = raw.substring(off, math.min(off + 20, raw.length))
      assert(head.startsWith(s"${i + 1} 0 obj"),
        s"object ${i + 1} at offset $off starts with '$head'")
    }
  }

  test("page tree: /Count matches the page objects, all sections present") {
    val count = "/Count (\\d+)".r.findFirstMatchIn(raw).get.group(1).toInt
    val pageObjs = "/Type /Page[^s]".r.findAllIn(raw).length
    assert(count == pageObjs)
    // charts + >=1 article page + word panel + scatter + table
    assert(count >= 6, s"only $count pages")
    def hex(s: String) =
      s.getBytes(StandardCharsets.UTF_16BE).map("%02X".format(_)).mkString
    for (title <- Seq("뉴스 카테고리별 기사 수", "키워드별 빈도수 Top 10",
        "기사 목록 + 감성분석/요약", "워드클라우드", "KMeans 클러스터링"))
      assert(raw.contains(hex(title)), s"missing section: $title")
  }

  test("fonts are the non-embedded Adobe-Korea1 pair with UCS-2 CMap") {
    assert(raw.contains("/HYSMyeongJo-Medium-UniKS-UCS2-H"))
    assert(raw.contains("/HYGoThic-Medium-UniKS-UCS2-H"))
    assert(raw.contains("/Ordering (Korea1)"))
    // No embedded font program (none available in-sandbox) — the file
    // must rely on viewer substitution, not broken FontFile refs.
    assert(!raw.contains("/FontFile"))
  }

  test("word cloud: per-term font size is proportional to frequency") {
    // The reference renders matplotlib's WordCloud
    // (spark_daily_report.py:231-240) — frequency-proportional glyph
    // sizes. Decode the word-cloud page's content stream and check the
    // layout law: size = 10 + 26·count/max(count), so every term's
    // font size is an affine function of its frequency.
    val reports = DailyReport.run(spark, fixture, "2025-05-24")
    val nouns = reports("r5_noun_frequencies").limit(30).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(nouns.nonEmpty)
    val maxC = math.max(1L, nouns.map(_._2).max).toDouble
    def hex(s: String) =
      s.getBytes(StandardCharsets.UTF_16BE).map("%02X".format(_)).mkString
    val streams = raw.split("stream\n").toSeq
      .filter(s => s.contains(hex("워드클라우드")))
    assert(streams.size == 1, s"${streams.size} word-cloud streams")
    val op = "BT /F\\d ([0-9.]+) Tf [0-9.-]+ [0-9.-]+ Td <([0-9A-F]+)> Tj ET".r
    val sized = op.findAllMatchIn(streams.head).map { m =>
      val bytes = m.group(2).grouped(2)
        .map(h => Integer.parseInt(h, 16).toByte).toArray
      new String(bytes, StandardCharsets.UTF_16BE) -> m.group(1).toDouble
    }.toMap
    nouns.foreach { case (w, c) =>
      val want = 10.0 + 26.0 * c / maxC
      val got = sized.getOrElse(w, fail(s"word '$w' missing from the page"))
      // sizes are written with 1 decimal (Page.n1)
      assert(math.abs(got - want) <= 0.05 + 1e-9, s"'$w': size $got, want $want")
    }
    // and therefore: a strictly more frequent term is never smaller
    val byFreq = nouns.sortBy(-_._2)
    byFreq.zip(byFreq.tail).foreach { case ((w1, c1), (w2, c2)) =>
      if (c1 > c2) assert(sized(w1) > sized(w2), s"'$w1' vs '$w2'")
    }
  }

  test("empty day still renders a valid document") {
    val empty = DailyReport.run(spark, fixture, "1999-01-01")
    val b = ReportRender.pdf("1999-01-01", empty)
    val s = new String(b, StandardCharsets.ISO_8859_1)
    assert(s.startsWith("%PDF-1.4") && s.endsWith("%%EOF\n"))
    assert("/Count (\\d+)".r.findFirstMatchIn(s).get.group(1).toInt >= 4)
  }
}
