package graft.sources

import graft.news.NewsSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RSS ingest (SURVEY.md §2.1 S1/S2; reference: collect/producer.py).
  *
  * Spark has no RSS builtin, and feed polling is a low-volume driver-side
  * concern (29 feeds / 5 min in the reference): entries are fetched on
  * the driver through a pluggable [[FeedFetcher]] and parallelized into a
  * DataFrame of wire-schema rows. Dedup is set-based over the whole batch
  * plus the sink-side upsert (J1) — deliberately NOT the reference's
  * bounded deque with break-on-first-duplicate (collect/producer.py:34),
  * which silently drops the tail of a feed page (documented behavior
  * change, strictly more complete).
  *
  * The Kafka producer side (S2) is [[toKafkaJson]]: the wire projection
  * `to_json(struct(*))`, writable to any sink (`format("kafka")` when the
  * connector is on the classpath).
  */
object Rss {

  /** One parsed feed entry (collect/producer.py:42-48). */
  case class FeedEntry(author: String, link: String, summary: String,
      title: String, updated: String)

  /** Pluggable fetch+parse: the real impl does HTTP + XML; tests inject
    * a deterministic fake. Must be cheap to call per feed URL. */
  trait FeedFetcher extends Serializable {
    def fetch(url: String): Seq[FeedEntry]
  }

  /** Poll one cycle over the feed list → deduped wire-schema DataFrame. */
  def pollOnce(spark: SparkSession, feeds: Seq[String], fetcher: FeedFetcher): DataFrame = {
    import spark.implicits._
    val entries = feeds.flatMap(fetcher.fetch) // driver-side: ~29 small HTTP calls
    spark.createDataFrame(entries)
      .select(col("author"), col("link"), col("summary"), col("title"), col("updated"))
      .where(col("link").isNotNull)
      .dropDuplicates("link") // set-based (F12), no early-break loss
  }

  /** S2: serialize to the Kafka wire form. */
  def toKafkaJson(df: DataFrame): DataFrame =
    df.select(col("link").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
}
