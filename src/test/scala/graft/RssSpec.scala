package graft

import graft.sources.Rss

class RssSpec extends SparkSuite {

  private val fake = new Rss.FeedFetcher {
    def fetch(url: String): Seq[Rss.FeedEntry] = Seq(
      Rss.FeedEntry("a", s"$url/1", "첫 기사", "t1", "2025-05-24 09:00:00"),
      Rss.FeedEntry("b", s"$url/2", "둘째 기사", "t2", "2025-05-24 09:05:00"),
      // duplicate of the FIRST entry later in the page: the reference's
      // break-on-duplicate would drop everything after it; we keep all
      Rss.FeedEntry("a", s"$url/1", "첫 기사", "t1", "2025-05-24 09:00:00"))
  }

  test("pollOnce dedups by link without dropping page tails") {
    val df = Rss.pollOnce(spark, Seq("http://f1", "http://f2"), fake)
    assert(df.count() == 4) // 2 unique links per feed × 2 feeds
    assert(df.columns.toSeq ==
      Seq("author", "link", "summary", "title", "updated"))
  }

  test("toKafkaJson produces key + JSON value in wire shape") {
    val out = Rss.toKafkaJson(Rss.pollOnce(spark, Seq("http://f1"), fake)).collect()
    assert(out.length == 2)
    val r = out.find(_.getAs[String]("key") == "http://f1/1").get
    val v = r.getAs[String]("value")
    assert(v.contains("\"link\":\"http://f1/1\"") && v.contains("\"title\":\"t1\""))
  }
}
