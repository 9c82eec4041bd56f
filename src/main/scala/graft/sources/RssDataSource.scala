package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import graft.news.NewsSchema
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.w3c.dom.Element

/** DataSourceV2 batch source for RSS/Atom feed documents — the
  * production-scale path for S1 (SURVEY.md §2.1; reference:
  * collect/producer.py:20,32-48). The low-volume polling loop stays an
  * external concern that drops raw feed XML into a directory (or HDFS
  * prefix); THIS source distributes the parsing: one input partition
  * per feed file, entries parsed executor-side with the JDK DOM parser
  * (no extra dependency), column pruning pushed into the reader.
  *
  *   spark.read.format("graft-rss").load("/path/to/feeds")
  *
  * Schema = the Kafka wire schema (author, link, summary, title,
  * updated), so the stream and batch ingest paths are interchangeable
  * downstream of the source ([[Rss.pollOnce]] is the driver-side
  * variant for interactive/low-volume use).
  *
  * Handles both RSS 2.0 (`<item><title/><link/><description/>
  * <pubDate/><author/>`) and Atom (`<entry><title/><link href/>
  * <summary/><updated/><author><name/>`).
  */
class RssDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rss"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NewsSchema.wireSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RssTable(properties.get("path"), properties.get("feeds"))
}

private[sources] class RssTable(path: String, feeds: String)
    extends Table with SupportsRead {
  require(path != null || feeds != null,
    "graft-rss requires .load(dir) (batch over feed XML files) or " +
      ".option(\"feeds\", \"url1,url2\") (streaming poll)")
  override def name(): String = s"graft-rss(${if (path != null) path else feeds})"
  override def schema(): StructType = NewsSchema.wireSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RssScanBuilder(path, options)
}

private[sources] class RssScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NewsSchema.wireSchema
  // Column pruning: only the pruned fields are materialized per entry.
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new RssScan(path, options, required)
}

private[sources] class RssScan(path: String, options: CaseInsensitiveStringMap,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = {
    require(path != null, "graft-rss batch read requires a path")
    this
  }

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val feeds = Option(options.get("feeds")).getOrElse(
      sys.error("graft-rss streaming requires .option(\"feeds\", \"url1,url2\")"))
    new RssMicroBatchStream(
      feeds.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      options.getInt("horizon", 1000),
      options.getInt("timeoutSec", 10),
      required.fieldNames)
  }

  // One partition per feed file: feeds are independent documents, and a
  // single XML document is not splittable — file granularity IS the
  // natural parallelism (29 feeds → 29 partitions in the reference's
  // deployment; thousands of archived feed pages → full cluster fan-out).
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted
      else Array(path)
    files.map(f => RssInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RssReaderFactory(required.fieldNames)
}

private[sources] case class RssInputPartition(file: String) extends InputPartition

private[sources] class RssReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RssPartitionReader(partition.asInstanceOf[RssInputPartition].file, fields)
}

private[sources] class RssPartitionReader(file: String, fields: Array[String])
    extends PartitionReader[InternalRow] {

  private lazy val entries: Iterator[Map[String, String]] = {
    val p = new Path(file)
    val in = p.getFileSystem(new Configuration()).open(p)
    try RssXml.parse(in).iterator finally in.close()
  }
  private var current: Map[String, String] = _

  override def next(): Boolean =
    if (entries.hasNext) { current = entries.next(); true } else false

  override def get(): InternalRow =
    new GenericInternalRow(
      fields.map(f => current.get(f).map(UTF8String.fromString).orNull)
        .asInstanceOf[Array[Any]])

  override def close(): Unit = ()
}

/** Streaming offset: the per-feed dedup horizon — the most recent
  * `horizon` links seen per feed, in first-seen order. The horizon
  * lives IN the offset, so a checkpoint restart restores it and
  * already-delivered links are not re-emitted — this replaces the
  * reference producer's in-process bounded deque
  * (collect/producer.py:7), which forgot everything on restart. A
  * micro-batch is the per-feed SET DIFF between its end and start
  * offsets, which keeps batch contents well-defined no matter when the
  * engine interleaves offset restore with the first poll. */
private[sources] case class RssStreamOffset(seen: Map[String, Seq[String]])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods._
  override def json(): String = compact(render("seen" -> seen))
}

private[sources] object RssStreamOffset {
  import org.json4s._
  import org.json4s.jackson.JsonMethods._
  private implicit val fmt: Formats = DefaultFormats
  def fromJson(s: String): RssStreamOffset =
    RssStreamOffset((parse(s) \ "seen").extract[Map[String, Seq[String]]])
}

/** Micro-batch RSS poll source: each trigger polls every feed URL
  * driver-side (29 tiny HTTP GETs in the reference deployment — the
  * data-sized work, parsing/enriching/sinking, happens in the
  * executors downstream), advancing the horizon offset by the links
  * fetched. A feed that fails to fetch contributes zero entries that
  * round (poll cycles survive one dead feed).
  *
  * Replayability: within a run, planned-but-uncommitted batches replay
  * from the driver-side entry cache; across a restart the cache is
  * gone, so an uncommitted batch replans to only the entries the
  * post-restart polls re-fetched — the socket-source tradeoff,
  * acceptable because the downstream upsert sink (S5/J1) is idempotent
  * on link anyway.
  */
private[sources] class RssMicroBatchStream(feeds: Seq[String], horizon: Int,
    timeoutSec: Int, fields: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // Driver-side state: the poll base (last returned horizon) and the
  // entry payloads for every link still inside some live horizon.
  private var seen: Map[String, Seq[String]] = Map.empty
  private val cache = scala.collection.mutable.Map.empty[(String, String), Rss.FeedEntry]
  private var prepared = false
  private var availableNowTarget: Option[RssStreamOffset] = None

  private def merged(a: Map[String, Seq[String]], b: Map[String, Seq[String]]):
      Map[String, Seq[String]] =
    (a.keySet ++ b.keySet).map { f =>
      val av = a.getOrElse(f, Nil)
      val avSet = av.toSet
      f -> (av ++ b.getOrElse(f, Nil).filterNot(avSet)).takeRight(horizon)
    }.toMap

  private def poll(): RssStreamOffset = {
    for (f <- feeds) {
      val entries = Http.get(f, timeoutSec).map(Http.parseFeed).getOrElse(Nil)
        .filter(e => e.link != null && e.link.nonEmpty)
        .distinctBy(_.link) // a feed page repeating a link counts once
      val seenSet = seen.getOrElse(f, Nil).toSet
      // Links already inside the horizon are pending or recommitted;
      // (re)caching restores their payloads after a checkpoint restart
      // and commit() prunes them again by horizon membership.
      entries.filter(e => seenSet(e.link)).foreach(e => cache((f, e.link)) = e)
      // Cap per-poll intake at `horizon` fresh links. Without the cap, a
      // poll yielding more than `horizon` fresh links would takeRight-drop
      // the oldest of THEM from the offset before they were ever planned
      // (silent loss) while their payloads stayed cached forever (commit
      // prunes only by delivered-horizon membership). Capped-out links
      // stay un-seen AND un-cached: a later poll delivers them while they
      // remain on the feed page — so size `horizon` >= the feed page size
      // to never defer.
      val fresh = entries.filterNot(e => seenSet(e.link)).take(horizon)
      fresh.foreach(e => cache((f, e.link)) = e)
      if (fresh.nonEmpty)
        seen = seen.updated(f,
          (seen.getOrElse(f, Nil) ++ fresh.map(_.link)).takeRight(horizon))
    }
    RssStreamOffset(seen)
  }

  override def initialOffset(): Offset = RssStreamOffset(Map.empty)

  override def deserializeOffset(json: String): Offset =
    RssStreamOffset.fromJson(json)

  // AvailableNow: only ARM here — the target poll is taken lazily at
  // the first latestOffset(start, _) call, which runs after the engine
  // has restored the checkpointed start offset (polling eagerly here
  // would race the restore and lose the horizon merge below).
  override def prepareForTriggerAvailableNow(): Unit = prepared = true

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    synchronized {
      // Fold the (possibly checkpoint-restored) start horizon into the
      // poll base so links delivered by a previous run stay deduped.
      seen = merged(seen, start.asInstanceOf[RssStreamOffset].seen)
      if (prepared) {
        if (availableNowTarget.isEmpty) availableNowTarget = Some(poll())
        availableNowTarget.get
      } else poll()
    }

  override def commit(end: Offset): Unit = synchronized {
    // Links inside the committed horizon are DELIVERED — their payloads
    // can never be planned again, so drop them. Links outside it are
    // either pending (fetched for the next batch — keep!) or expired;
    // both are bounded by the feed page size. Note a restart re-commits
    // an OLD end offset after the first new poll has already cached
    // fresh entries — pruning by membership (not absence) keeps those.
    val delivered = end.asInstanceOf[RssStreamOffset].seen
    cache.filterInPlace { case ((f, link), _) =>
      !delivered.getOrElse(f, Nil).contains(link) }
  }

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[RssStreamOffset].seen
      val e = end.asInstanceOf[RssStreamOffset].seen
      feeds.flatMap { f =>
        val before = s.getOrElse(f, Nil).toSet
        val links = e.getOrElse(f, Nil).filterNot(before)
        val entries = links.flatMap(l => cache.get((f, l))).toArray
        if (entries.isEmpty) None
        else Some(RssEntriesPartition(entries): InputPartition)
      }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new RssEntriesReaderFactory(fields)
}

private[sources] case class RssEntriesPartition(entries: Array[Rss.FeedEntry])
    extends InputPartition

private[sources] class RssEntriesReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val entries = partition.asInstanceOf[RssEntriesPartition].entries
      private var i = -1
      override def next(): Boolean = { i += 1; i < entries.length }
      override def get(): InternalRow = {
        val e = entries(i)
        def f(name: String): Any = {
          val v = name match {
            case "author" => e.author
            case "link" => e.link
            case "summary" => e.summary
            case "title" => e.title
            case "updated" => e.updated
            case _ => null
          }
          if (v == null) null else UTF8String.fromString(v)
        }
        new GenericInternalRow(fields.map(f).asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
}

/** JDK-DOM RSS/Atom entry extraction (no external XML dependency). */
private[sources] object RssXml {

  def parse(in: java.io.InputStream): Seq[Map[String, String]] = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    // Feed XML is untrusted input: no DTDs, no external entities.
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder().parse(in)
    val out = ArrayBuffer.empty[Map[String, String]]
    val items = doc.getElementsByTagName("item")
    for (i <- 0 until items.getLength)
      out += rssItem(items.item(i).asInstanceOf[Element])
    val atomEntries = doc.getElementsByTagName("entry")
    for (i <- 0 until atomEntries.getLength)
      out += atomEntry(atomEntries.item(i).asInstanceOf[Element])
    out.toSeq
  }

  private def childText(e: Element, tag: String): Option[String] = {
    val nodes = e.getElementsByTagName(tag)
    if (nodes.getLength == 0) None
    else Option(nodes.item(0).getTextContent).map(_.trim).filter(_.nonEmpty)
  }

  private def rssItem(e: Element): Map[String, String] =
    Seq(
      "title" -> childText(e, "title"),
      "link" -> childText(e, "link"),
      "summary" -> childText(e, "description"),
      "updated" -> childText(e, "pubDate"),
      "author" -> childText(e, "author"))
      .collect { case (k, Some(v)) => k -> v }.toMap

  private def atomEntry(e: Element): Map[String, String] = {
    val linkHref = {
      val nodes = e.getElementsByTagName("link")
      if (nodes.getLength == 0) None
      else Option(nodes.item(0).asInstanceOf[Element].getAttribute("href")).filter(_.nonEmpty)
    }
    val author = {
      val nodes = e.getElementsByTagName("author")
      if (nodes.getLength == 0) None
      else childText(nodes.item(0).asInstanceOf[Element], "name")
    }
    Seq(
      "title" -> childText(e, "title"),
      "link" -> linkHref,
      "summary" -> childText(e, "summary"),
      "updated" -> childText(e, "updated"),
      "author" -> author)
      .collect { case (k, Some(v)) => k -> v }.toMap
  }
}
