package graft.news

import org.apache.spark.sql.DataFrame

/** Thin driver-side consumer of the daily-report datasets (SURVEY.md
  * §2.1 S13): the engine contract is the R1–R6 *tables*; rendering is a
  * presentation detail kept out of the engine. This renderer collects
  * only render-sized results (top-N rows per section) — never full
  * article bodies — in contrast to the reference's toPandas of the whole
  * day (dags/scripts/spark_daily_report.py:77-79). The PDF layer of the
  * reference is replaced by markdown; any other renderer can consume the
  * same map.
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
}
