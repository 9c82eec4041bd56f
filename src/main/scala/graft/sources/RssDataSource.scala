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
    new RssTable(properties.get("path"))
}

private[sources] class RssTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-rss requires a path: spark.read.format(\"graft-rss\").load(dir)")
  override def name(): String = s"graft-rss($path)"
  override def schema(): StructType = NewsSchema.wireSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RssScanBuilder(path)
}

private[sources] class RssScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NewsSchema.wireSchema
  // Column pruning: only the pruned fields are materialized per entry.
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new RssScan(path, required)
}

private[sources] class RssScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

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
