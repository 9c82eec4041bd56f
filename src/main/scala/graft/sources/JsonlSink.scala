package graft.sources

import java.io.{BufferedWriter, File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 batch SINK — the write-side complement of
  * [[RssDataSource]] (SURVEY §2.1 S5–S7): JSON-lines output with the
  * standard two-phase commit protocol, written against the connector
  * API rather than `foreachBatch`-style side effects:
  *
  *  - each task writes to an attempt-unique `.tmp` file and its
  *    `commit()` merely reports the file — task output is durable but
  *    INVISIBLE until the job commits (a re-attempted task leaves only
  *    an orphaned tmp that the job commit ignores and abort cleans up);
  *  - the driver-side `BatchWrite.commit` publishes atomically-per-file:
  *    renames every reported tmp to its final `part-*.jsonl` name and
  *    writes a `_GRAFT_MANIFEST` (file → row count) last, so a reader
  *    that trusts the manifest never observes a half-published job;
  *  - `abort` (task or job) deletes temporaries.
  *
  * Local-filesystem paths only (java.io) — the protocol shape, not the
  * storage client, is the point; swapping in an HDFS/S3 client changes
  * `open/rename/delete` and nothing else.
  *
  *   df.write.format("graft-jsonl").mode("append").save(dir)
  *
  * Atomic leaf types (string/long/int/double/boolean, timestamp as
  * epoch-micros) cover the wire schemas this engine emits.
  */
class JsonlDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"
  // Write-only source: the schema is external metadata — Spark hands the
  // written DataFrame's schema to getTable instead of asking us to infer.
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JsonlTable(properties.get("path"), schema)
}

private[sources] class JsonlTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  require(path != null, "graft-jsonl requires a path: df.write.format(\"graft-jsonl\").save(dir)")
  override def name(): String = s"graft-jsonl($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonlWriteBuilder(path, info.schema())
}

/** `SupportsStreamingUpdateAsAppend`: Update-mode queries (e.g. the CDC
  * emission stream) are legal against this sink — each update row is
  * appended to the log, which IS the changelog semantics a jsonl lake
  * wants; compaction to latest-per-key is the reader's move. */
private[sources] class JsonlWriteBuilder(path: String, schema: StructType) extends WriteBuilder
    with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new JsonlBatchWrite(path, schema)
    override def toStreaming: StreamingWrite = new JsonlStreamingWrite(path, schema)
  }
}

/** Streaming face of the sink: the same two-phase protocol per EPOCH.
  * Files carry the epoch id; each epoch's manifest is written last and
  * acts as the idempotence marker — a replayed epoch (restart between
  * sink commit and offset-log write) sees its manifest already present
  * and publishes nothing, so the lake stays exactly-once per epoch. */
private[sources] class JsonlStreamingWrite(path: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new JsonlStreamingWriterFactory(path, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    val manifest = new File(dir, f"_GRAFT_MANIFEST-$epochId%08d")
    if (manifest.exists()) { // replayed epoch: already published
      messages.collect { case m: JsonlCommit => new File(dir, m.tmpName).delete() }
      return
    }
    val entries = messages.collect { case m: JsonlCommit =>
      val ok = new File(dir, m.tmpName).renameTo(new File(dir, m.finalName))
      require(ok, s"publish failed for ${m.tmpName}")
      s"${m.finalName}\t${m.rows}"
    }
    val mf = new BufferedWriter(
      new OutputStreamWriter(new FileOutputStream(manifest), UTF_8))
    try entries.foreach { e => mf.write(e); mf.newLine() } finally mf.close()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: JsonlCommit => new File(new File(path), m.tmpName).delete() }
}

private[sources] class JsonlStreamingWriterFactory(path: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new JsonlWriter(path, schema, partitionId, taskId, Some(epochId))
}

private[sources] case class JsonlCommit(tmpName: String, finalName: String, rows: Long)
  extends WriterCommitMessage

private[sources] class JsonlBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonlWriterFactory(path, schema)

  /** Publish: rename reported tmps, then write the manifest LAST. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    val entries = messages.collect { case m: JsonlCommit =>
      val ok = new File(dir, m.tmpName).renameTo(new File(dir, m.finalName))
      require(ok, s"publish failed for ${m.tmpName}")
      s"${m.finalName}\t${m.rows}"
    }
    val mf = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(new File(dir, "_GRAFT_MANIFEST")), UTF_8))
    try entries.foreach { e => mf.write(e); mf.newLine() } finally mf.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: JsonlCommit => new File(new File(path), m.tmpName).delete() }
}

private[sources] class JsonlWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonlWriter(path, schema, partitionId, taskId, None)
}

private[sources] class JsonlWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long, epochId: Option[Long]) extends DataWriter[InternalRow] {

  // taskId in the tmp name keeps re-attempts from clobbering each other;
  // only the attempt whose commit message reaches the driver publishes.
  // Streaming writers carry the epoch so epochs never collide on names.
  private val epochTag = epochId.map(e => f"epoch-$e%08d-").getOrElse("")
  private val tmpName = f"$epochTag%spart-$partitionId%05d-attempt-$taskId.jsonl.tmp"
  private val finalName = f"$epochTag%spart-$partitionId%05d.jsonl"
  private val file = new File(new File(path), tmpName)
  file.getParentFile.mkdirs()
  // Explicit UTF-8: the row data carries Korean text, and FileWriter's
  // no-charset constructor uses the platform default — ANSI_X3.4-1968
  // in this container — which would silently write '?' for every
  // non-ASCII char (esc() passes non-ASCII through by design; JSON is
  // UTF-8 on the wire). Spec-pinned with a Hangul roundtrip.
  private val out = new BufferedWriter(
    new OutputStreamWriter(new FileOutputStream(file), UTF_8))
  private var rows = 0L

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  override def write(row: InternalRow): Unit = {
    val parts = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => "\"" + esc(row.getUTF8String(i).toString) + "\""
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType => row.getDouble(i).toString
          case BooleanType => row.getBoolean(i).toString
          case TimestampType => row.getLong(i).toString // epoch µs
          case dt => throw new IllegalArgumentException(
            s"graft-jsonl supports atomic leaf types only, got $dt for ${f.name}")
        }
      "\"" + esc(f.name) + "\":" + v
    }
    out.write(parts.mkString("{", ",", "}"))
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    JsonlCommit(tmpName, finalName, rows)
  }

  override def abort(): Unit = {
    out.close()
    file.delete()
  }

  override def close(): Unit = ()
}
