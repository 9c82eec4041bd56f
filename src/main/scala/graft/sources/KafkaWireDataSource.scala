package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `format("graft-kafka")` — the Structured Streaming source over the
  * from-scratch wire client ([[KafkaWire]]): T1's
  * `readStream.format("kafka").option("startingOffsets","earliest")`
  * shape (collect/consumer.py:152-159) with the connector replaced by
  * this library's own protocol implementation, since the sandbox
  * ships neither kafka-clients nor spark-sql-kafka.
  *
  * Offsets are the REAL thing rather than a simulation: a batch is
  * the per-partition range [start, end) where `end` comes from
  * ListOffsets(latest) at planning time, the ranges ride the
  * checkpoint as JSON, executors fetch their own ranges over TCP
  * (one task per topic partition — the connector's parallelism
  * shape), and a restart resumes from the checkpointed next-offset
  * map exactly once. Schema mirrors the connector's core columns:
  * (partition INT, offset LONG, timestamp LONG, key STRING,
  * value STRING).
  *
  * Options: host, port, topic. Batch reads (spark.read) scan
  * earliest..latest.
  */
class KafkaWireDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaWireDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaWireTable(properties.get("host"),
      Integer.parseInt(properties.get("port")), properties.get("topic"))
}

object KafkaWireDataSource {
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))
}

private[sources] class KafkaWireTable(host: String, port: Int, topic: String)
    extends Table with SupportsRead {
  require(host != null && topic != null, "options host, port, topic are required")
  override def name(): String = s"graft-kafka($topic@$host:$port)"
  override def schema(): StructType = KafkaWireDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaWireScan(host, port, topic)
    }
}

private[sources] class KafkaWireScan(host: String, port: Int, topic: String)
    extends Scan with Batch {
  override def readSchema(): StructType = KafkaWireDataSource.schema

  private def offsets(timestamp: Long): Map[Int, Long] = {
    val c = new KafkaWire.Conn(host, port)
    try {
      val n = KafkaWire.partitionCount(c, topic)
      (0 until n).map(p => p -> KafkaWire.listOffset(c, topic, p, timestamp)).toMap
    } finally c.close()
  }

  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val from = offsets(-2L); val until = offsets(-1L)
    from.keys.toArray.sorted.map(p =>
      KafkaRangePartition(host, port, topic, p, from(p), until(p)): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaRangeReaderFactory

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaWireMicroBatchStream(host, port, topic)
}

/** Next-offset-to-read per partition — the checkpointed position. */
private[sources] case class KafkaWireOffset(next: Map[Int, Long]) extends Offset {
  override def json(): String =
    next.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private[sources] object KafkaWireOffset {
  def fromJson(s: String): KafkaWireOffset = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    KafkaWireOffset(JsonMethods.parse(s).extract[Map[String, Long]]
      .map { case (k, v) => k.toInt -> v })
  }
}

private[sources] class KafkaWireMicroBatchStream(host: String, port: Int,
    topic: String) extends MicroBatchStream {

  private def endOffsets(): Map[Int, Long] = {
    val c = new KafkaWire.Conn(host, port)
    try {
      val n = KafkaWire.partitionCount(c, topic)
      (0 until n).map(p => p -> KafkaWire.listOffset(c, topic, p, -1L)).toMap
    } finally c.close()
  }

  // earliest, the reference's auto_offset_reset (collect/consumer.py:154)
  override def initialOffset(): Offset = {
    val c = new KafkaWire.Conn(host, port)
    try {
      val n = KafkaWire.partitionCount(c, topic)
      KafkaWireOffset((0 until n).map(p =>
        p -> KafkaWire.listOffset(c, topic, p, -2L)).toMap)
    } finally c.close()
  }

  override def latestOffset(): Offset = KafkaWireOffset(endOffsets())
  override def deserializeOffset(json: String): Offset =
    KafkaWireOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // positions live in the checkpoint

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaWireOffset].next
    val e = end.asInstanceOf[KafkaWireOffset].next
    e.keys.toArray.sorted.flatMap { p =>
      val from = s.getOrElse(p, 0L); val until = e(p)
      if (until > from)
        Some(KafkaRangePartition(host, port, topic, p, from, until): InputPartition)
      else None
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaRangeReaderFactory
  override def stop(): Unit = ()
}

/** One topic partition's [from, until) range — fetched by the task. */
private[sources] case class KafkaRangePartition(host: String, port: Int,
    topic: String, partition: Int, from: Long, until: Long) extends InputPartition

private[sources] class KafkaRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KafkaRangeReader(p.asInstanceOf[KafkaRangePartition])
}

private[sources] class KafkaRangeReader(p: KafkaRangePartition)
    extends PartitionReader[InternalRow] {
  private val conn = new KafkaWire.Conn(p.host, p.port)
  private var buf: Seq[KafkaWire.Record] = Seq.empty
  private var i = -1
  private var pos = p.from

  override def next(): Boolean = {
    i += 1
    if (i < buf.length) true
    else if (pos >= p.until) false
    else {
      val (recs, _) = KafkaWire.fetch(conn, p.topic, p.partition, pos)
      buf = recs.filter(_.offset < p.until) // the range end is exclusive
      if (buf.isEmpty) false
      else { pos = buf.last.offset + 1; i = 0; true }
    }
  }

  override def get(): InternalRow = {
    val r = buf(i)
    InternalRow(p.partition, r.offset, r.timestamp,
      if (r.key == null) null else UTF8String.fromBytes(r.key),
      if (r.value == null) null else UTF8String.fromBytes(r.value))
  }

  override def close(): Unit = conn.close()
}
