package graft.news

import org.apache.spark.sql.DataFrame

/** Thin driver-side consumer of the daily-report datasets (SURVEY.md
  * §2.1 S13): the engine contract is the R1–R6 *tables*; rendering is a
  * presentation detail kept out of the engine. This renderer collects
  * only render-sized results (top-N rows per section) — never full
  * article bodies — in contrast to the reference's toPandas of the whole
  * day (dags/scripts/spark_daily_report.py:77-79). Two renderers consume
  * the same map: markdown, and a real multi-page PDF ([[pdf]]) matching
  * the reference's section layout (:128-271).
  */
object ReportRender {

  /** Render the DailyReport.run output to markdown. `maxRows` bounds
    * what is collected to the driver per section. */
  def markdown(date: String, reports: Map[String, DataFrame], maxRows: Int = 10): String = {
    val sb = new StringBuilder
    sb ++= s"# Daily news report — $date\n"
    reports.toSeq.sortBy(_._1).foreach { case (name, df) =>
      sb ++= s"\n## $name\n\n"
      val cols = df.columns
      val rows = df.limit(maxRows).collect() // render-sized only
      sb ++= cols.mkString("| ", " | ", " |\n")
      sb ++= cols.map(_ => "---").mkString("| ", " | ", " |\n")
      rows.foreach { r =>
        sb ++= cols.indices.map { i =>
          val v = r.get(i)
          if (v == null) "" else v.toString.replace("|", "\\|").take(60)
        }.mkString("| ", " | ", " |\n")
      }
      if (rows.isEmpty) sb ++= "*(empty)*\n"
    }
    sb.toString
  }

  /** The reference's PDF, section for section
    * (dags/scripts/spark_daily_report.py:128-271): category bar chart,
    * top-10 keyword bar chart, paginated article list (30 lines/page,
    * title + wrapped first-sentence summary + sentiment), the word
    * cloud (rendered as a deterministic frequency-sized word panel —
    * no raster backend here), and the KMeans cluster scatter with its
    * assignment table. Collects are render-sized (`maxArticles` /
    * top-N caps), never the full day. */
  def pdf(date: String, reports: Map[String, DataFrame],
      maxArticles: Int = 40): Array[Byte] = {
    import graft.news.{Pdf => P}
    val pages = scala.collection.mutable.ArrayBuffer[P.Page]()

    // ── 1. 카테고리별 기사 수 (bar chart, :132-147) ───────────────────
    val cats = reports.get("r1_category_counts").map(_.limit(17).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq).getOrElse(Nil)
    pages += P.barChart(new P.Page(), 60, 480, 480, 260,
      s"뉴스 카테고리별 기사 수 ($date)", cats)

    // ── 2. 키워드별 빈도수 Top 10 (:150-166) ──────────────────────────
    val kws = reports.get("r2b_top_keywords").map(_.limit(10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq).getOrElse(Nil)
    pages += P.barChart(new P.Page(), 60, 480, 480, 260,
      s"키워드별 빈도수 Top 10 ($date)", kws)

    // ── 3. 기사 목록 + 감성/요약, 30 lines/page (:169-225) ────────────
    val articles = reports.get("r3_article_list")
      .map(_.limit(maxArticles).collect()).getOrElse(Array.empty)
    val blocks = articles.toSeq.map { r =>
      val title = s"[${r.getAs[String]("category")}] ${r.getAs[String]("title")}"
      val summary = Option(r.getAs[String]("summary")).getOrElse("")
      // Cap a single block below the page budget: a run-on "first
      // sentence" with no break could otherwise wrap past the page
      // bottom (the flush check only fires between blocks).
      val wrapped = wrap(s"요약: $summary", 44).take(24)
      (title, wrapped, s"감성: ${r.getAs[String]("sentiment")}")
    }
    val MaxLines = 30
    var cur = new P.Page(); var y = 760.0; var lines = 0; var open = false
    def headerOn(p: P.Page): Unit =
      p.text(100, 790, 17, s"기사 목록 + 감성분석/요약 ($date)", bold = true)
    blocks.foreach { case (title, wrapped, senti) =>
      val blockLines = 3 + wrapped.size
      if (open && lines + blockLines > MaxLines) {
        pages += cur; cur = new P.Page(); y = 760.0; lines = 0; open = false
      }
      if (!open) { headerOn(cur); open = true }
      cur.text(50, y, 11, title, bold = true); y -= 20; lines += 1
      wrapped.foreach { l => cur.text(50, y, 9.5, l); y -= 16; lines += 1 }
      cur.text(50, y, 9.5, senti); y -= 16 + 12; lines += 2
    }
    if (open || articles.isEmpty) { if (!open) headerOn(cur); pages += cur }

    // ── 4. 워드클라우드 (:228-239): frequency-sized word panel. ───────
    val nouns = reports.get("r5_noun_frequencies").map(_.limit(30).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq).getOrElse(Nil)
    val wc = new P.Page()
    wc.text(230, 790, 17, "워드클라우드", bold = true)
    if (nouns.nonEmpty) {
      val maxC = math.max(1L, nouns.map(_._2).max)
      var (wx, wy, rowH) = (55.0, 720.0, 0.0)
      nouns.zipWithIndex.foreach { case ((w, c), i) =>
        val size = 10 + 26.0 * c / maxC
        val wpt = (w.length + 1) * size
        if (wx + wpt > 540) { wx = 55.0; wy -= rowH + 14; rowH = 0.0 }
        wc.text(wx, wy, size, w, bold = i % 3 == 0)
        wx += wpt + 10; rowH = math.max(rowH, size)
      }
    }
    pages += wc

    // ── 5. KMeans 클러스터링 scatter + 할당 표 (:242-271) ─────────────
    val clus = reports.get("r4_clustering").filter(_.columns.nonEmpty)
      .map(_.limit(maxArticles).collect()).getOrElse(Array.empty)
    if (clus.nonEmpty) {
      val sc = new P.Page()
      sc.text(130, 790, 16, "KMeans 클러스터링 (임베딩 기반, MLlib)", bold = true)
      val (x0, y0, w, h) = (80.0, 300.0, 440.0, 420.0)
      sc.rect(x0, y0, w, h, (0.98, 0.98, 0.98))
      sc.rect(x0, y0, w, h, (0.6, 0.6, 0.6), fill = false)
      val xs = clus.map(_.getAs[Double]("pc1")); val ys = clus.map(_.getAs[Double]("pc2"))
      val (xmin, xmax) = (xs.min, xs.max); val (ymin, ymax) = (ys.min, ys.max)
      def sx(v: Double) = x0 + 14 + (w - 28) * (v - xmin) / math.max(1e-9, xmax - xmin)
      def sy(v: Double) = y0 + 14 + (h - 28) * (v - ymin) / math.max(1e-9, ymax - ymin)
      clus.foreach { r =>
        val c = r.getAs[Int]("cluster")
        sc.dot(sx(r.getAs[Double]("pc1")), sy(r.getAs[Double]("pc2")), 3.5,
          P.Tab10(c % P.Tab10.size))
        sc.text(sx(r.getAs[Double]("pc1")) + 5, sy(r.getAs[Double]("pc2")) - 3, 6,
          Option(r.getAs[String]("title")).getOrElse("").take(12))
      }
      sc.text(x0 + w / 2 - 12, y0 - 16, 10, "PC1")
      sc.text(x0 - 30, y0 + h / 2, 10, "PC2")
      pages += sc

      val tb = new P.Page()
      tb.text(60, 790, 14, "클러스터 할당 (KMeans, MLlib)", bold = true)
      var ty = 760.0
      tb.text(60, ty, 10, "기사", bold = true)
      tb.text(460, ty, 10, "클러스터", bold = true)
      ty -= 6; tb.line(55, ty, 540, ty); ty -= 14
      clus.take(45).foreach { r =>
        tb.text(60, ty, 9, Option(r.getAs[String]("title")).getOrElse("").take(40))
        tb.text(480, ty, 9, r.getAs[Int]("cluster").toString)
        ty -= 15
      }
      pages += tb
    }

    P.document(pages.toSeq)
  }

  /** Width-aware wrap (Hangul ≈ full-width): the textwrap.wrap(70)
    * analogue at :183 scaled to the PDF column. */
  private def wrap(s: String, emWidth: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var cur = new StringBuilder; var w = 0.0
    s.split(" ").foreach { word =>
      val ww = word.map(c => if (c < 0x2E80) 0.52 else 1.0).sum
      if (w + ww > emWidth && cur.nonEmpty) {
        out += cur.toString; cur = new StringBuilder; w = 0.0
      }
      if (cur.nonEmpty) { cur ++= " "; w += 0.52 }
      cur ++= word; w += ww
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }
}
