package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The DataSourceV2 batch path for S1: distributed parse of dumped feed
  * XML, one partition per file, pruning pushed into the reader. */
class RssDataSourceSpec extends SparkSuite {

  private val rss =
    """<?xml version="1.0"?>
      |<rss version="2.0"><channel><title>feed-a</title>
      |<item><title>경제 기사</title><link>http://n/1</link>
      |  <description>코스피 상승</description>
      |  <pubDate>Sat, 24 May 2025 09:00:00 +0900</pubDate>
      |  <author>김기자</author></item>
      |<item><title>스포츠 기사</title><link>http://n/2</link>
      |  <description>야구 개막</description></item>
      |</channel></rss>""".stripMargin

  private val atom =
    """<?xml version="1.0"?>
      |<feed xmlns="http://www.w3.org/2005/Atom"><title>feed-b</title>
      |<entry><title>문화 기사</title><link href="http://n/3"/>
      |  <summary>전시회 개막</summary><updated>2025-05-25T11:00:00Z</updated>
      |  <author><name>이기자</name></author></entry>
      |</feed>""".stripMargin

  test("graft-rss reads RSS and Atom files, one partition per file") {
    val dir = Files.createTempDirectory("rssv2")
    Files.writeString(dir.resolve("a.xml"), rss)
    Files.writeString(dir.resolve("b.xml"), atom)

    val df = spark.read.format("graft-rss").load(dir.toString)
    assert(df.columns.toSeq == Seq("author", "link", "summary", "title", "updated"))
    assert(df.rdd.getNumPartitions == 2)

    val rows = df.collect().map(r => r.getAs[String]("link") -> r).toMap
    assert(rows.keySet == Set("http://n/1", "http://n/2", "http://n/3"))
    assert(rows("http://n/1").getAs[String]("author") == "김기자")
    assert(rows("http://n/1").getAs[String]("summary") == "코스피 상승")
    assert(rows("http://n/2").getAs[String]("author") == null) // absent field
    assert(rows("http://n/3").getAs[String]("author") == "이기자")
    assert(rows("http://n/3").getAs[String]("updated") == "2025-05-25T11:00:00Z")
  }

  test("column pruning reaches the reader's schema") {
    val dir = Files.createTempDirectory("rssv2p")
    Files.writeString(dir.resolve("a.xml"), rss)
    val pruned = spark.read.format("graft-rss").load(dir.toString).select("link")
    // DSv2 BatchScan prints its (pruned) output attribute list
    val plan = pruned.queryExecution.executedPlan.toString
    assert("BatchScan graft-rss\\([^)]*\\)\\[link#\\d+\\]".r.findFirstIn(plan).isDefined, plan)
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq == Seq("http://n/1", "http://n/2"))
  }

  test("source feeds the streaming enrich shape end-to-end") {
    val dir = Files.createTempDirectory("rssv2e")
    Files.writeString(dir.resolve("a.xml"), rss)
    val wire = spark.read.format("graft-rss").load(dir.toString)
    val json = graft.sources.Rss.toKafkaJson(wire) // S2 projection
    val back = json.select(from_json(col("value"), graft.news.NewsSchema.wireSchema).as("m"))
      .select(col("m.*"))
    assert(back.where(col("link").isNotNull).count() == 2)
  }
}
