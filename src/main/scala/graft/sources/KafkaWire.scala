package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** From-scratch Kafka WIRE-PROTOCOL client — the byte-transport layer
  * the reference's producer/consumer pair rides
  * (collect/producer.py:26-29,50 publishes JSON records to
  * `article-topic`; collect/consumer.py:152-159 consumes from the
  * earliest offset). This sandbox ships no Kafka artifact (no
  * kafka-clients jar, no spark-sql-kafka connector, zero egress), so
  * the transport is implemented directly against the PUBLIC protocol
  * specification (kafka.apache.org/protocol) and driven in tests over
  * real TCP against an in-JVM broker double — the same pattern that
  * proves the S11 HTTP crawl against an in-JVM HTTP server.
  *
  * Pre-flexible encodings (INT16-length strings, INT32-length arrays,
  * no tagged fields) across the full modern surface (r14):
  *  - BOTH record formats, ApiVersions-negotiated: message v1
  *    (magic 1, CRC32 per record, compressed wrapper messages) and
  *    record-batch v2 (magic 2, varint/zigzag records, per-record
  *    timestamps + headers, CRC32C over attributes..end, batch-level
  *    compression) — one decode pass handles a mixed-format log (both
  *    put magic at entry offset 16); every CRC is VERIFIED on consume
  *    (corruption throws, never yields rows);
  *  - APIs: ApiVersions v0 (18), Metadata v0 (3), Produce v2/v3 (0),
  *    Fetch v2/v4 (1), ListOffsets v1/v2 (2), OffsetCommit v2 (8),
  *    OffsetFetch v1 (9), InitProducerId v0 (22), AddPartitionsToTxn
  *    v0 (24), EndTxn v0 (26);
  *  - the idempotent producer (pid/epoch/baseSequence, broker-side
  *    retry dedup) and TRANSACTIONS (control markers, last-stable-
  *    offset pinning, read_committed filtering, zombie fencing);
  *  - murmur2 key partitioning — Kafka's own default partitioner
  *    hash, so keyed records land on the same partition a stock
  *    client would pick;
  *  - big-endian framing: INT32 length prefix per request/response.
  *
  * Spark integration is executor-side and partition-parallel, the
  * shape the real connector has: the producer opens one connection
  * per dataframe partition (foreachPartition), the consumer runs one
  * fetch loop per topic partition (parallelized over the cluster),
  * so neither side funnels data through the driver.
  */
object KafkaWire {

  // ── primitive codec (big-endian, pre-flexible encodings) ───────────

  final class Writer {
    private var buf = new Array[Byte](256)
    private var n = 0
    private def ensure(k: Int): Unit = if (n + k > buf.length) {
      buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, n + k))
    }
    def int8(v: Int): Writer = { ensure(1); buf(n) = v.toByte; n += 1; this }
    def int16(v: Int): Writer = { ensure(2)
      buf(n) = (v >> 8).toByte; buf(n + 1) = v.toByte; n += 2; this }
    def int32(v: Int): Writer = { ensure(4)
      var i = 0; while (i < 4) { buf(n + i) = (v >> (24 - 8 * i)).toByte; i += 1 }
      n += 4; this }
    def int64(v: Long): Writer = { ensure(8)
      var i = 0; while (i < 8) { buf(n + i) = (v >> (56 - 8 * i)).toByte; i += 1 }
      n += 8; this }
    def raw(b: Array[Byte]): Writer = { ensure(b.length)
      System.arraycopy(b, 0, buf, n, b.length); n += b.length; this }
    /** NULLABLE_STRING: INT16 length (-1 = null) + UTF-8 bytes. */
    def str(s: String): Writer =
      if (s == null) int16(-1)
      else { val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        int16(b.length); raw(b) }
    /** BYTES: INT32 length (-1 = null) + bytes. */
    def bytes(b: Array[Byte]): Writer =
      if (b == null) int32(-1) else { int32(b.length); raw(b) }
    /** Zigzag VARINT — the record-batch-v2 (magic 2) integer encoding:
      * protobuf's wire form, signed via zigzag so -1 (null length)
      * costs one byte. */
    def varint(v: Int): Writer = uvarlong(((v << 1) ^ (v >> 31)).toLong & 0xffffffffL)
    def varlong(v: Long): Writer = uvarlong((v << 1) ^ (v >> 63))
    private def uvarlong(v0: Long): Writer = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { int8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      int8(v.toInt)
    }
    // ── KIP-482 flexible encodings (tagged fields / compact types) ──
    /** UNSIGNED varint — the flexible-version length/tag encoding
      * (NOT zigzag: lengths are never negative; null is length 0). */
    def uvarint(v: Int): Writer = uvarlong(v.toLong & 0xffffffffL)
    /** COMPACT_NULLABLE_STRING: uvarint(len + 1), 0 = null. */
    def compactStr(s: String): Writer =
      if (s == null) uvarint(0)
      else {
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        uvarint(b.length + 1); raw(b)
      }
    /** COMPACT_NULLABLE_BYTES: uvarint(len + 1), 0 = null. */
    def compactBytes(b: Array[Byte]): Writer =
      if (b == null) uvarint(0) else { uvarint(b.length + 1); raw(b) }
    /** COMPACT_ARRAY length prefix: uvarint(n + 1), 0 = null array. */
    def compactArrayLen(n: Int): Writer = uvarint(n + 1)
    /** An empty TAG_BUFFER (zero tagged fields) — every flexible
      * struct ends with one; senders with no tags write uvarint(0). */
    def tagsEmpty(): Writer = uvarint(0)
    def size: Int = n
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  final class Reader(buf: Array[Byte]) {
    private var p = 0
    def int8(): Int = { p += 1; buf(p - 1) }
    def int16(): Int = { p += 2
      ((buf(p - 2) & 0xff) << 8 | (buf(p - 1) & 0xff)).toShort.toInt }
    def int32(): Int = { p += 4
      (buf(p - 4) & 0xff) << 24 | (buf(p - 3) & 0xff) << 16 |
        (buf(p - 2) & 0xff) << 8 | (buf(p - 1) & 0xff) }
    def int64(): Long = ((int32().toLong & 0xffffffffL) << 32) |
      (int32().toLong & 0xffffffffL)
    def raw(k: Int): Array[Byte] = { p += k
      java.util.Arrays.copyOfRange(buf, p - k, p) }
    def str(): String = { val k = int16()
      if (k < 0) null
      else new String(raw(k), java.nio.charset.StandardCharsets.UTF_8) }
    def bytes(): Array[Byte] = { val k = int32(); if (k < 0) null else raw(k) }
    def varint(): Int = { val v = uvarlong(); (((v >>> 1) ^ -(v & 1)).toInt) }
    def varlong(): Long = { val v = uvarlong(); (v >>> 1) ^ -(v & 1) }
    private def uvarlong(): Long = {
      var v = 0L; var shift = 0
      var b = 0x80
      while ((b & 0x80) != 0) {
        b = int8() & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        if (shift > 70) throw new java.io.IOException("malformed varint")
      }
      v
    }
    // ── KIP-482 flexible decodings ──────────────────────────────────
    /** UNSIGNED varint (no zigzag) — flexible lengths and tags. */
    def uvarint(): Int = uvarlongRaw().toInt
    private def uvarlongRaw(): Long = {
      var v = 0L; var shift = 0
      var b = 0x80
      while ((b & 0x80) != 0) {
        b = int8() & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        if (shift > 70) throw new java.io.IOException("malformed uvarint")
      }
      v
    }
    /** COMPACT_NULLABLE_STRING: uvarint(len + 1), 0 = null. */
    def compactStr(): String = {
      val k = uvarint()
      if (k == 0) null
      else new String(raw(k - 1), java.nio.charset.StandardCharsets.UTF_8)
    }
    /** COMPACT_NULLABLE_BYTES: uvarint(len + 1), 0 = null. */
    def compactBytes(): Array[Byte] = {
      val k = uvarint()
      if (k == 0) null else raw(k - 1)
    }
    /** COMPACT_ARRAY length: uvarint(n + 1); -1 = null array. */
    def compactArrayLen(): Int = uvarint() - 1
    /** Walk past a TAG_BUFFER: uvarint count, then per field a
      * uvarint tag + uvarint size + that many bytes — unknown tags
      * MUST be skipped, not rejected (the KIP-482 forward-
      * compatibility contract). */
    def skipTags(): Unit = {
      val n = uvarint()
      var i = 0
      while (i < n) {
        uvarint() // tag
        val size = uvarint()
        raw(size)
        i += 1
      }
    }
    /** Byte at absolute position `i` without moving the cursor. */
    def peek(i: Int): Int = buf(i) & 0xff
    def position: Int = p
    def remaining: Int = buf.length - p
  }

  // ── murmur2 — Kafka's default-partitioner hash (public algorithm) ──

  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c; val m = 0x5bd1e995; val r = 24
    var h = seed ^ data.length
    val n4 = data.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    (data.length % 4) match {
      case 3 => h ^= (data((n4 * 4) + 2) & 0xff) << 16
        h ^= (data((n4 * 4) + 1) & 0xff) << 8
        h ^= data(n4 * 4) & 0xff; h *= m
      case 2 => h ^= (data((n4 * 4) + 1) & 0xff) << 8
        h ^= data(n4 * 4) & 0xff; h *= m
      case 1 => h ^= data(n4 * 4) & 0xff; h *= m
      case _ =>
    }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  /** Kafka's default keyed partitioning: toPositive(murmur2(key)) %
    * numPartitions; null keys here go to partition 0 (the stock
    * client round-robins — a fixed choice keeps the client
    * deterministic, and the reference keys every record by link). */
  def partitionFor(key: Array[Byte], numPartitions: Int): Int =
    if (key == null) 0 else (murmur2(key) & 0x7fffffff) % numPartitions

  // ── message format v1 (magic 1, CRC32 over magic..end) ─────────────

  /** One consumed record with its broker-assigned absolute offset.
    * `headers` exist only in record-batch v2 (magic 2) — the v1
    * codec ignores them on encode (a real broker's down-conversion
    * drops headers the same way). */
  final case class Record(offset: Long, timestamp: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])] = Nil)

  private def encodeMessage(timestamp: Long, key: Array[Byte],
      value: Array[Byte], attributes: Int = 0): Array[Byte] = {
    val body = new Writer()
      .int8(1)            // magic = 1
      .int8(attributes)   // bits 0-2 codec (0 none, 1 gzip), CreateTime
      .int64(timestamp)
      .bytes(key)
      .bytes(value)
      .result()
    val crc = new java.util.zip.CRC32(); crc.update(body)
    new Writer().int32(crc.getValue.toInt).raw(body).result()
  }

  /** Message-format v1 compression codecs (attribute bits 0-2), the
    * published constants: 0 none, 1 gzip, 2 snappy, 3 lz4. Snappy is
    * the xerial STREAM framing (SnappyOutputStream — what the stock
    * Java client wraps snappy batches in), lz4 the standard LZ4 FRAME
    * format (magic 0x184D2204 — v1 fixed the v0 descriptor-checksum
    * quirk, so the standard frame IS the wire format). */
  object Codec {
    val None = 0; val Gzip = 1; val Snappy = 2; val Lz4 = 3
    /** Option-string form (the sink's `codec` option / the stock
      * client's compression.type values). */
    def forName(n: String): Int = n match {
      case "none" => None
      case "gzip" => Gzip
      case "snappy" => Snappy
      case "lz4" => Lz4
      case other => throw new IllegalArgumentException(
        s"codec must be none|gzip|snappy|lz4, got '$other'")
    }
  }

  private def compress(codec: Int, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out: java.io.OutputStream = codec match {
      case Codec.Gzip => new java.util.zip.GZIPOutputStream(bos)
      case Codec.Snappy => new org.xerial.snappy.SnappyOutputStream(bos)
      case Codec.Lz4 =>
        // 64 KiB blocks: the frame default (4 MiB) allocates and zeroes
        // a full block buffer per batch — measured 5× slower than
        // uncompressed on ~150 KiB produce batches; 64 KiB matches the
        // stock client's block size choice
        new net.jpountz.lz4.LZ4FrameOutputStream(bos,
          net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB)
      case c => throw new java.io.IOException(s"unsupported codec $c")
    }
    try out.write(data) finally out.close()
    bos.toByteArray
  }

  private def decompress(codec: Int, data: Array[Byte]): Array[Byte] = {
    val bis = new java.io.ByteArrayInputStream(data)
    val in: java.io.InputStream = codec match {
      case Codec.Gzip => new java.util.zip.GZIPInputStream(bis)
      case Codec.Snappy => new org.xerial.snappy.SnappyInputStream(bis)
      case Codec.Lz4 => new net.jpountz.lz4.LZ4FrameInputStream(bis)
      case c => throw new java.io.IOException(s"unsupported codec $c")
    }
    try in.readAllBytes() finally in.close()
  }

  /** MessageSet v1 with compression: the records are encoded as an
    * INNER message set with RELATIVE offsets 0..n-1, compressed, and
    * wrapped in ONE outer message whose attributes carry the codec id
    * and whose timestamp is the max inner timestamp (the v1 wrapper
    * convention; the broker assigns the wrapper's offset to the LAST
    * inner message, and a consumer reconstructs the rest — see
    * [[decodeMessageSet]]). */
  def encodeMessageSetCompressed(records: Seq[(Array[Byte], Array[Byte])],
      timestamp: Long, codec: Int): Array[Byte] = {
    val inner = encodeMessageSet(records, timestamp)
    val wrapper =
      encodeMessage(timestamp, null, compress(codec, inner), attributes = codec)
    new Writer().int64(0L).int32(wrapper.length).raw(wrapper).result()
  }

  /** GZIP shorthand, kept for the original S2 call sites. */
  def encodeMessageSetGzip(records: Seq[(Array[Byte], Array[Byte])],
      timestamp: Long): Array[Byte] =
    encodeMessageSetCompressed(records, timestamp, Codec.Gzip)

  /** MessageSet v1: [offset INT64, size INT32, message]*. The producer
    * writes relative offsets 0..n-1 (the broker assigns absolutes);
    * the consumer reads the broker's absolutes back. */
  def encodeMessageSet(records: Seq[(Array[Byte], Array[Byte])],
      timestamp: Long): Array[Byte] = {
    val w = new Writer()
    records.zipWithIndex.foreach { case ((k, v), i) =>
      val msg = encodeMessage(timestamp, k, v)
      w.int64(i.toLong).int32(msg.length).raw(msg)
    }
    w.result()
  }

  /** MessageSet v1 with EXPLICIT absolute offsets — the Fetch-response
    * side of the codec (a broker serves stored records back with the
    * offsets it assigned at produce time). */
  def encodeMessageSetAt(records: Seq[Record]): Array[Byte] = {
    val w = new Writer()
    records.foreach { rec =>
      val msg = encodeMessage(rec.timestamp, rec.key, rec.value)
      w.int64(rec.offset).int32(msg.length).raw(msg)
    }
    w.result()
  }

  /** Decode + CRC-VERIFY a message set; a partial trailing message
    * (the broker may truncate at max_bytes) is dropped, a CRC mismatch
    * throws — corruption must never surface as data. */
  def decodeMessageSet(bytes: Array[Byte]): Seq[Record] = {
    // toIndexedSeq, NOT toSeq: 2.13's toSeq builds a List, making the
    // consumers' .length/.last O(n) on every fetch
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    val r = new Reader(bytes)
    while (r.remaining >= 12) {
      val offset = r.int64()
      val size = r.int32()
      if (r.remaining < size) return out.toIndexedSeq // truncated tail
      val msg = r.raw(size)
      val mr = new Reader(msg)
      val crc = mr.int32()
      val check = new java.util.zip.CRC32()
      check.update(msg, 4, msg.length - 4)
      if (check.getValue.toInt != crc)
        throw new java.io.IOException(
          s"CRC mismatch in message at offset $offset")
      val magic = mr.int8()
      require(magic == 1, s"unsupported message magic $magic")
      val attrs = mr.int8()
      val ts = mr.int64()
      val key = mr.bytes(); val value = mr.bytes()
      (attrs & 0x07) match {
        case 0 => out += Record(offset, ts, key, value)
        case codec @ (1 | 2 | 3) =>
          // compressed wrapper (gzip/snappy/lz4): the value is an
          // inner message set with RELATIVE offsets 0..n-1, and the
          // wrapper's offset is the absolute offset of the LAST inner
          // message (the v1 convention) — reconstruct absolutes as
          // wrapperOffset - (n-1) + innerOffset.
          val inner = decodeMessageSet(decompress(codec, value))
          val base = offset - (inner.length - 1)
          inner.foreach(r =>
            out += Record(base + r.offset, r.timestamp, r.key, r.value))
        case c =>
          throw new java.io.IOException(s"unsupported compression codec $c")
      }
    }
    out.toIndexedSeq
  }

  // ── record batch v2 (magic 2, varint records, CRC32C) ──────────────
  //
  // The modern on-wire/on-disk format (Kafka >= 0.11 / message.format
  // 2, the only one brokers >= 2.1 prefer): one batch header carrying
  // producerId/epoch/baseSequence (the idempotence fields) + CRC32C
  // over attributes..end, followed by varint-framed records with
  // RELATIVE offsets/timestamps and per-record headers. The records
  // section (count excluded) is what compression applies to — not a
  // wrapper-message like v1.
  //
  // Layout (kafka.apache.org/documentation #recordbatch):
  //   baseOffset int64 | batchLength int32 | partitionLeaderEpoch int32
  //   magic int8 (=2) | crc uint32 (CRC32C, attributes..end)
  //   attributes int16 (bits 0-2 codec, 3 timestampType, 4 transactional,
  //   5 control) | lastOffsetDelta int32 | baseTimestamp int64
  //   maxTimestamp int64 | producerId int64 | producerEpoch int16
  //   baseSequence int32 | recordsCount int32 | records (compressed)
  //
  // Record: length varint | attributes int8 | timestampDelta varlong |
  //   offsetDelta varint | keyLen varint (-1 null) | key | valueLen
  //   varint | value | headerCount varint | [keyLen|key|valLen|val]*
  //
  // Both formats put the MAGIC byte at entry offset 16 (v1: after
  // offset+size+crc; v2: after baseOffset+batchLength+leaderEpoch) —
  // the deliberate design overlap that lets one consumer decode a log
  // whose segments mix formats. [[decodeRecordSet]] dispatches on it.

  /** Batch-header size after the batchLength field, records excluded. */
  private val V2HeaderAfterLength = 49 // epoch 4 + magic 1 + crc 4 + attrs 2 +
    // lastOffsetDelta 4 + baseTs 8 + maxTs 8 + pid 8 + pEpoch 2 + baseSeq 4 + count 4

  /** One decoded v2 batch WITH its idempotence metadata — the broker
    * side of the codec (a client flattens to records via
    * [[decodeRecordSet]]). `raw` carries the verbatim wire bytes of
    * the batch: the v2 CRC32C deliberately covers attributes..end and
    * NOT baseOffset, so a broker can assign the base by patching the
    * first 8 bytes and re-serve the producer's exact bytes without
    * re-encoding (the real broker's zero-copy append→fetch path). */
  final case class RecordBatch(baseOffset: Long, producerId: Long,
      producerEpoch: Int, baseSequence: Int, codec: Int,
      records: IndexedSeq[Record], raw: Array[Byte] = null,
      transactional: Boolean = false, control: Boolean = false,
      lastOffsetDelta: Int = -1, partitionLeaderEpoch: Int = -1) {
    /** Exclusive end offset of the batch's OFFSET SPAN — control
      * records consume offset slots like data, so a reader advances
      * by this, never by record count. */
    def endOffset: Long =
      baseOffset + (if (lastOffsetDelta >= 0) lastOffsetDelta + 1
        else records.length)
    /** The wire bytes with `base` patched as the broker-assigned
      * baseOffset — CRC-valid by construction (see above). */
    def rawAt(base: Long): Array[Byte] = {
      val out = raw.clone()
      var i = 0
      while (i < 8) { out(i) = (base >> (56 - 8 * i)).toByte; i += 1 }
      out
    }
  }

  def crc32c(data: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(data, off, len)
    c.getValue
  }

  private def encodeRecordV2(offsetDelta: Int, timestampDelta: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Array[Byte] = {
    val body = new Writer()
      .int8(0) // record attributes: unused, must be 0
      .varlong(timestampDelta)
      .varint(offsetDelta)
    if (key == null) body.varint(-1) else { body.varint(key.length); body.raw(key) }
    if (value == null) body.varint(-1) else { body.varint(value.length); body.raw(value) }
    body.varint(headers.length)
    headers.foreach { case (hk, hv) =>
      val kb = hk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      body.varint(kb.length); body.raw(kb)
      if (hv == null) body.varint(-1) else { body.varint(hv.length); body.raw(hv) }
    }
    val b = body.result()
    new Writer().varint(b.length).raw(b).result()
  }

  /** Encode ONE v2 record batch. `records` carry ABSOLUTE offsets
    * (deltas are computed against `baseOffset` — a producer passes
    * baseOffset 0 and offsets 0..n-1, a broker re-serves with its
    * assigned base) and real per-record timestamps (v2 keeps them;
    * v1 flattened to the wrapper max). producerId/epoch/baseSequence
    * are the idempotence fields (-1/-1/-1 = not idempotent). */
  def encodeRecordBatch(baseOffset: Long, records: Seq[Record],
      codec: Int = Codec.None, producerId: Long = -1L,
      producerEpoch: Int = -1, baseSequence: Int = -1,
      transactional: Boolean = false, control: Boolean = false,
      lastOffsetDeltaOverride: Int = -1): Array[Byte] = {
    // EMPTY batches are legal on a compacted log: the cleaner removed
    // every record but keeps the batch header (original offset span
    // intact) so producer state and consumer cursors survive — then
    // lastOffsetDeltaOverride is REQUIRED to carry that span
    require(records.nonEmpty || lastOffsetDeltaOverride >= 0,
      "an empty record batch needs lastOffsetDeltaOverride (its offset span)")
    val baseTs = records.headOption.map(_.timestamp).getOrElse(0L)
    val maxTs =
      if (records.isEmpty) 0L else records.iterator.map(_.timestamp).max
    val recs = new Writer()
    records.foreach { r =>
      recs.raw(encodeRecordV2((r.offset - baseOffset).toInt,
        r.timestamp - baseTs, r.key, r.value, r.headers))
    }
    val payload =
      if (codec == Codec.None) recs.result() else compress(codec, recs.result())
    // attributes: bits 0-2 codec, 3 CreateTime(0), 4 isTransactional,
    // 5 isControlBatch
    val attrs = (codec & 0x07) |
      (if (transactional) 0x10 else 0) | (if (control) 0x20 else 0)
    // lastOffsetDelta: the batch's OFFSET SPAN end — equals the last
    // record's delta on a write path, but stays the ORIGINAL span on a
    // compacted batch whose inner records were removed
    val lastDelta =
      if (lastOffsetDeltaOverride >= 0) lastOffsetDeltaOverride
      else (records.last.offset - baseOffset).toInt
    // attributes..end — the CRC32C coverage
    val tail = new Writer()
      .int16(attrs)
      .int32(lastDelta)
      .int64(baseTs).int64(maxTs)
      .int64(producerId).int16(producerEpoch).int32(baseSequence)
      .int32(records.length)
      .raw(payload)
      .result()
    val crc = crc32c(tail, 0, tail.length)
    val afterLength = new Writer()
      .int32(-1)            // partitionLeaderEpoch
      .int8(2)              // magic
      .int32(crc.toInt)     // CRC32C (unsigned on the wire)
      .raw(tail)
      .result()
    new Writer().int64(baseOffset).int32(afterLength.length)
      .raw(afterLength).result()
  }

  /** Decode the v2 records payload (already decompressed) into
    * absolute-offset records. */
  private def decodeRecordsV2(payload: Array[Byte], count: Int,
      baseOffset: Long, baseTs: Long): IndexedSeq[Record] = {
    val r = new Reader(payload)
    val out = new scala.collection.mutable.ArrayBuffer[Record](count)
    var i = 0
    while (i < count) {
      val len = r.varint()
      val end = r.position + len
      r.int8() // record attributes
      val tsDelta = r.varlong()
      val offDelta = r.varint()
      val kLen = r.varint()
      val key = if (kLen < 0) null else r.raw(kLen)
      val vLen = r.varint()
      val value = if (vLen < 0) null else r.raw(vLen)
      val nHeaders = r.varint()
      val headers = (0 until nHeaders).map { _ =>
        val hkLen = r.varint()
        val hk = new String(r.raw(hkLen), java.nio.charset.StandardCharsets.UTF_8)
        val hvLen = r.varint()
        val hv = if (hvLen < 0) null else r.raw(hvLen)
        hk -> hv
      }
      require(r.position == end, s"record $i: decoded ${r.position - (end - len)} of $len bytes")
      out += Record(baseOffset + offDelta, baseTs + tsDelta, key, value, headers)
      i += 1
    }
    out.toIndexedSeq
  }

  /** Decode ONE v2 batch starting at `r`'s cursor (the 8-byte
    * baseOffset). CRC32C is VERIFIED over attributes..end — a
    * corrupted batch throws, never yields rows. Returns None when the
    * batch is truncated (the broker sliced at max_bytes). */
  private def decodeOneBatchV2(r: Reader): Option[RecordBatch] = {
    val baseOffset = r.int64()
    val batchLength = r.int32()
    if (r.remaining < batchLength) return None // truncated tail
    val body = r.raw(batchLength)
    val rawEntry = new Writer().int64(baseOffset).int32(batchLength)
      .raw(body).result()
    val br = new Reader(body)
    val partitionLeaderEpoch = br.int32() // broker-stamped (KIP-101)
    val magic = br.int8()
    require(magic == 2, s"decodeOneBatchV2 on magic $magic")
    val crc = br.int32()
    val crcGot = crc32c(body, 9, body.length - 9)
    if (crcGot.toInt != crc)
      throw new java.io.IOException(
        s"CRC32C mismatch in record batch at offset $baseOffset")
    val attrs = br.int16()
    val codec = attrs & 0x07
    val lastDelta = br.int32()
    val baseTs = br.int64()
    br.int64() // maxTimestamp
    val pid = br.int64()
    val pEpoch = br.int16()
    val baseSeq = br.int32()
    val count = br.int32()
    val payload = br.raw(body.length - V2HeaderAfterLength)
    val plain = if (codec == Codec.None) payload else decompress(codec, payload)
    Some(RecordBatch(baseOffset, pid, pEpoch, baseSeq, codec,
      decodeRecordsV2(plain, count, baseOffset, baseTs), rawEntry,
      transactional = (attrs & 0x10) != 0, control = (attrs & 0x20) != 0,
      lastOffsetDelta = lastDelta,
      partitionLeaderEpoch = partitionLeaderEpoch))
  }

  /** A transaction CONTROL batch (commit/abort marker): one control
    * record whose key is [version INT16 | type INT16] (type 0 = abort,
    * 1 = commit) — the published control-record schema. The marker
    * consumes exactly one offset slot. */
  def encodeControlBatch(offset: Long, producerId: Long,
      producerEpoch: Int, commit: Boolean, timestamp: Long): Array[Byte] = {
    val key = new Writer().int16(0).int16(if (commit) 1 else 0).result()
    val value = new Writer().int16(0).int32(0).result() // version, coordinator epoch
    encodeRecordBatch(offset, Seq(Record(offset, timestamp, key, value)),
      producerId = producerId, producerEpoch = producerEpoch,
      baseSequence = -1, transactional = true, control = true)
  }

  /** Broker-side decode of a produced v2 record set: the batches with
    * their idempotence metadata intact. */
  def decodeRecordBatches(bytes: Array[Byte]): Seq[RecordBatch] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RecordBatch]
    val r = new Reader(bytes)
    var done = false
    while (!done && r.remaining >= 12) {
      decodeOneBatchV2(r) match {
        case Some(b) => out += b
        case None => done = true
      }
    }
    out.toIndexedSeq
  }

  /** Client-side decode of a fetched record set of EITHER format —
    * v1 [offset|size|message] entries and v2 record batches may
    * coexist in one response (a log written across a format upgrade,
    * or a broker serving old segments to a new fetcher). Dispatches
    * on the magic byte, which both formats place at entry offset 16.
    * CRC-verified per entry (CRC32 for v1, CRC32C for v2); a partial
    * trailing entry is dropped (grow-and-retry recovers it).
    *
    * Transaction semantics (the consumer side of the published
    * contract): CONTROL batches (commit/abort markers) are never
    * surfaced as data — at either isolation level — but their offset
    * slots still advance the returned cursor. Under read_committed
    * (`aborted` = the fetch response's aborted_transactions list) a
    * transactional data batch whose producer has an aborted range
    * starting at or before it is dropped until that producer's abort
    * marker passes — the stock consumer's streaming filter.
    *
    * Returns (records, nextPos): nextPos is the offset AFTER the last
    * COMPLETE entry — the cursor a reader must advance to even when
    * every record in the response was a marker or aborted (else a
    * markers-only range would read as "nothing served" and grow
    * forever). -1 when no complete entry decoded. */
  def decodeRecordSetDetailed(bytes: Array[Byte],
      aborted: Seq[(Long, Long)] = Nil): (Seq[Record], Long) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    val pendingAborts = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.by[(Long, Long), Long](_._2).reverse) // by firstOffset, min first
    aborted.foreach { case (pid, first) => pendingAborts.enqueue((pid, first)) }
    val abortedPids = scala.collection.mutable.Set.empty[Long]
    var nextPos = -1L
    val r = new Reader(bytes)
    var done = false
    while (!done && r.remaining >= 17) {
      val magic = r.peek(r.position + 16)
      if (magic >= 2) {
        decodeOneBatchV2(r) match {
          case Some(b) =>
            while (pendingAborts.nonEmpty &&
                pendingAborts.head._2 <= b.baseOffset) {
              abortedPids += pendingAborts.dequeue()._1
            }
            if (b.control) {
              // marker: type 1 = commit, 0 = abort — either way the
              // producer's current transaction is resolved
              abortedPids -= b.producerId
            } else if (!(b.transactional && abortedPids(b.producerId))) {
              out ++= b.records
            }
            nextPos = b.endOffset
          case None => done = true
        }
      } else {
        // one v1/v0 entry: [offset int64 | size int32 | message]; lean
        // on the existing v1 decoder for the message-level logic
        // (CRC32 check, wrapper decompression, relative offsets)
        val start = r.position
        val outerOffset = r.int64()
        val size = r.int32()
        if (r.remaining < size) done = true
        else {
          r.raw(size)
          val recs = decodeMessageSet(
            java.util.Arrays.copyOfRange(bytes, start, start + 12 + size))
          out ++= recs
          // a COMPLETE entry always advances the cursor, records or not:
          // a wrapper whose inner set decoded empty still consumed its
          // offset slot (the v1 convention stamps the wrapper with the
          // LAST inner absolute, so +1 is the next slot either way) —
          // without this a complete-but-empty entry would be mistaken
          // for an over-max_bytes truncation and grow the fetch window
          // forever instead of advancing (format-independent cursor
          // invariant, same as the v2 branch's endOffset)
          nextPos =
            if (recs.nonEmpty) recs.last.offset + 1 else outerOffset + 1
        }
      }
    }
    (out.toIndexedSeq, nextPos)
  }

  def decodeRecordSet(bytes: Array[Byte]): Seq[Record] =
    decodeRecordSetDetailed(bytes)._1

  // ── framed request/response over TCP ────────────────────────────────

  /** One broker connection: INT32-framed request out, INT32-framed
    * response in, correlation ids checked. Single-threaded by design
    * (one task, one Conn); the read timeout bounds how long a hung
    * broker can block an executor task (request.timeout.ms's job). */
  final class Conn(val host: String, val port: Int,
      clientId: String = "graft", timeoutMs: Int = 30000) {
    private val sock = new java.net.Socket(host, port)
    sock.setSoTimeout(timeoutMs)
    // Request-response over one connection: Nagle + delayed ACK would
    // add ~40 ms to every sub-MSS request (measured in wireBench —
    // 26 k vs 1.2 M rows/s produce). The stock client sets TCP_NODELAY
    // for exactly this reason.
    sock.setTcpNoDelay(true)
    private val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16))
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream, 1 << 16))
    private var corr = 0

    def call(apiKey: Int, apiVersion: Int, body: Array[Byte]): Reader =
      callHeader(apiKey, apiVersion, body, flexible = false)

    /** A FLEXIBLE-version call (KIP-482): request header v2 (v1 plus
      * a trailing TAG_BUFFER; client_id stays a legacy nullable
      * string — the published header-v2 shape) and, when
      * `responseTags`, a response header v1 whose tag buffer is
      * consumed before the body is handed back. ApiVersions responses
      * keep header v0 regardless of version (the protocol's one
      * special case, so pre-flexible clients can still read the error
      * code) — its caller passes responseTags = false. */
    def callFlex(apiKey: Int, apiVersion: Int, body: Array[Byte],
        responseTags: Boolean = true): Reader = {
      val r = callHeader(apiKey, apiVersion, body, flexible = true)
      if (responseTags) r.skipTags()
      r
    }

    private def callHeader(apiKey: Int, apiVersion: Int,
        body: Array[Byte], flexible: Boolean): Reader = {
      corr += 1
      val hw = new Writer()
        .int16(apiKey).int16(apiVersion).int32(corr).str(clientId)
      if (flexible) hw.tagsEmpty()
      val header = hw.result()
      out.writeInt(header.length + body.length)
      out.write(header); out.write(body); out.flush()
      val len = in.readInt()
      val resp = new Array[Byte](len)
      in.readFully(resp)
      val r = new Reader(resp)
      val gotCorr = r.int32()
      require(gotCorr == corr, s"correlation mismatch: $gotCorr != $corr")
      r
    }
    def close(): Unit = sock.close()
  }

  /** ApiVersions v0: (errorCode, Map(apiKey -> (min, max))). */
  def apiVersions(c: Conn): (Int, Map[Int, (Int, Int)]) = {
    val r = c.call(18, 0, Array.emptyByteArray)
    val err = r.int16()
    val n = r.int32()
    (err, (0 until n).map(_ => r.int16() -> (r.int16(), r.int16())).toMap)
  }

  /** ApiVersions v3 — the FLEXIBLE handshake (KIP-482, KIP-511): the
    * request carries client_software_name/version as compact strings
    * with a tag buffer; the response is compact-encoded (tagged
    * fields after throttle_time). The RESPONSE header stays v0 — the
    * protocol's deliberate special case, so a client that guessed too
    * high a version can still read the error code. Same return shape
    * as [[apiVersions]]. */
  def apiVersionsV3(c: Conn): (Int, Map[Int, (Int, Int)]) = {
    val body = new Writer()
      .compactStr("graft").compactStr("0")
      .tagsEmpty()
      .result()
    val r = c.callFlex(18, 3, body, responseTags = false)
    val err = r.int16()
    val n = r.compactArrayLen()
    val apis = (0 until math.max(0, n)).map { _ =>
      val k = r.int16(); val lo = r.int16(); val hi = r.int16()
      r.skipTags()
      k -> (lo, hi)
    }.toMap
    r.int32() // throttle_time_ms (after the array in v1+)
    r.skipTags()
    (err, apis)
  }

  /** One topic's cluster view (Metadata v0): every broker's address
    * and each partition's LEADER — what a client routes the data path
    * by on a multi-broker cluster. */
  final case class ClusterView(brokers: Map[Int, (String, Int)],
      leaders: Map[Int, Int],
      epochs: Map[Int, Int] = Map.empty,
      isr: Map[Int, Seq[Int]] = Map.empty) {
    def partitions: Int = leaders.size
    def leaderAddr(partition: Int): (String, Int) =
      brokers(leaders(partition))
    /** The partition's leader epoch per this view, or -1 when the
      * view came from a pre-epoch Metadata version (v0): -1 opts the
      * fetch out of epoch fencing, the pre-KIP-320 behavior. */
    def epochOf(partition: Int): Int = epochs.getOrElse(partition, -1)
  }

  def clusterMetadata(c: Conn, topic: String): ClusterView = {
    val body = new Writer().int32(1).str(topic).result()
    val r = c.call(3, 0, body)
    val nBrokers = r.int32()
    val brokers = (0 until nBrokers).map { _ =>
      val id = r.int32(); val host = r.str(); val port = r.int32()
      id -> (host, port)
    }.toMap
    val nTopics = r.int32()
    require(nTopics == 1, s"expected 1 topic, got $nTopics")
    val err = r.int16(); require(err == 0, s"metadata error $err")
    val name = r.str(); require(name == topic)
    val nParts = r.int32()
    val leaders = (0 until nParts).map { _ =>
      r.int16() // partition error
      val p = r.int32(); val leader = r.int32()
      val nr = r.int32(); (0 until nr).foreach(_ => r.int32())
      val ni = r.int32(); (0 until ni).foreach(_ => r.int32())
      p -> leader
    }.toMap
    ClusterView(brokers, leaders)
  }

  /** Metadata v7 — the epoch-carrying cluster view (KIP-320): each
    * partition's leader AND its leader_epoch, which an epoch-aware
    * consumer pins its fetches to. Falls back structurally to the v0
    * shape ([[ClusterView]] with `epochs` filled). */
  def clusterMetadataV7(c: Conn, topic: String): ClusterView = {
    val body = new Writer().int32(1).str(topic)
      .int8(1) // allow_auto_topic_creation
      .result()
    val r = c.call(3, 7, body)
    r.int32() // throttle_time_ms
    val nBrokers = r.int32()
    val brokers = (0 until nBrokers).map { _ =>
      val id = r.int32(); val host = r.str(); val port = r.int32()
      r.str() // rack
      id -> (host, port)
    }.toMap
    r.str()   // cluster_id
    r.int32() // controller_id
    val nTopics = r.int32()
    require(nTopics == 1, s"expected 1 topic, got $nTopics")
    val err = r.int16(); require(err == 0, s"metadata error $err")
    val name = r.str(); require(name == topic)
    r.int8() // is_internal
    val nParts = r.int32()
    val rows = (0 until nParts).map { _ =>
      r.int16() // partition error
      val p = r.int32(); val leader = r.int32()
      val epoch = r.int32() // leader_epoch (v7+)
      val nr = r.int32(); (0 until nr).foreach(_ => r.int32())
      val ni = r.int32()
      val isr = (0 until ni).map(_ => r.int32())
      val no = r.int32(); (0 until no).foreach(_ => r.int32()) // offline
      (p, leader, epoch, isr)
    }
    ClusterView(brokers,
      rows.map(t => t._1 -> t._2).toMap,
      rows.map(t => t._1 -> t._3).toMap,
      rows.map(t => t._1 -> (t._4: Seq[Int])).toMap)
  }

  /** Metadata v9 — the FLEXIBLE encoding of the v7 view (KIP-482):
    * compact strings/arrays and tagged fields throughout, request
    * header v2, response header v1. Field-for-field the same cluster
    * view as [[clusterMetadataV7]] (plus the v8 authorized-operations
    * ints), so a negotiating client can take either generation. */
  def clusterMetadataV9(c: Conn, topic: String): ClusterView = {
    val body = new Writer()
      .compactArrayLen(1).compactStr(topic).tagsEmpty() // topics[{name}]
      .int8(1) // allow_auto_topic_creation
      .int8(0).int8(0) // include cluster/topic authorized ops (v8+)
      .tagsEmpty()
      .result()
    val r = c.callFlex(3, 9, body)
    r.int32() // throttle_time_ms
    val nBrokers = r.compactArrayLen()
    val brokers = (0 until nBrokers).map { _ =>
      val id = r.int32(); val host = r.compactStr(); val port = r.int32()
      r.compactStr() // rack
      r.skipTags()
      id -> (host, port)
    }.toMap
    r.compactStr() // cluster_id
    r.int32()      // controller_id
    val nTopics = r.compactArrayLen()
    require(nTopics == 1, s"expected 1 topic, got $nTopics")
    val err = r.int16(); require(err == 0, s"metadata error $err")
    val name = r.compactStr(); require(name == topic)
    r.int8() // is_internal
    val nParts = r.compactArrayLen()
    val rows = (0 until nParts).map { _ =>
      r.int16() // partition error
      val p = r.int32(); val leader = r.int32()
      val epoch = r.int32()
      val nr = r.compactArrayLen(); (0 until nr).foreach(_ => r.int32())
      val ni = r.compactArrayLen()
      val isr = (0 until ni).map(_ => r.int32())
      val no = r.compactArrayLen(); (0 until no).foreach(_ => r.int32())
      r.skipTags()
      (p, leader, epoch, isr)
    }
    r.int32() // topic_authorized_operations (v8+)
    r.skipTags()
    r.int32() // cluster_authorized_operations (v8+)
    r.skipTags()
    ClusterView(brokers,
      rows.map(t => t._1 -> t._2).toMap,
      rows.map(t => t._1 -> t._3).toMap,
      rows.map(t => t._1 -> (t._4: Seq[Int])).toMap)
  }

  /** The best cluster view the broker serves: flexible Metadata v9
    * when advertised, the epoch-carrying v7 below that, else v0
    * (epochs absent → fetches un-pinned, the pre-KIP-320
    * degradation). ONE ApiVersions round trip: the v0 response
    * already carries the whole (api → max version) table this choice
    * needs — re-handshaking at v3 would buy nothing and double the
    * negotiation latency on every refresh (and fencing recovery
    * refreshes on every FENCED_LEADER_EPOCH). The v3 encoding itself
    * is exercised by [[apiVersionsV3]]'s own callers and specs. */
  def bestClusterMetadata(c: Conn, topic: String): ClusterView =
    viewAndApis(c, topic)._1

  /** The ONE copy of the negotiate-then-pick chain: ApiVersions, then
    * the best Metadata version the broker serves (flexible v9 →
    * epoch-carrying v7 → v0). Returns the view AND the api table (for
    * callers that pass it on as [[GrowingFetcher]]'s handshake hint);
    * the table is null when the ApiVersions round errored. */
  private def viewAndApis(c: Conn,
      topic: String): (ClusterView, Map[Int, (Int, Int)]) = {
    val (err, apis) = apiVersions(c)
    val view =
      if (err == 0 && apis.get(3).exists(_._2 >= 9))
        clusterMetadataV9(c, topic)
      else if (err == 0 && apis.get(3).exists(_._2 >= 7))
        clusterMetadataV7(c, topic)
      else clusterMetadata(c, topic)
    (view, if (err == 0) apis else null)
  }

  /** Metadata v0 for one topic: number of partitions. */
  def partitionCount(c: Conn, topic: String): Int =
    clusterMetadata(c, topic).partitions

  /** A connection to `partition`'s LEADER, discovered through the
    * bootstrap broker's metadata — what every data-path consumer on a
    * multi-broker cluster must do before fetching. Returns the
    * bootstrap itself when it happens to lead. */
  def leaderConn(bootstrapHost: String, bootstrapPort: Int,
      topic: String, partition: Int): Conn = {
    val boot = new Conn(bootstrapHost, bootstrapPort)
    val (h, p) =
      try clusterMetadata(boot, topic).leaderAddr(partition)
      catch { case e: Throwable => boot.close(); throw e }
    if (h == bootstrapHost && p == bootstrapPort) boot
    else { boot.close(); new Conn(h, p) }
  }

  /** A leader-routed data connection PLUS the routing round's other
    * products: the partition's LEADER EPOCH (KIP-320 — the consumer
    * pins its fetches to the epoch it routed by, so a re-election it
    * hasn't seen answers FENCED_LEADER_EPOCH instead of silently
    * serving from a stale view; -1 against a pre-epoch broker) and
    * the negotiated api table, which [[GrowingFetcher]] accepts as a
    * hint so the data path costs the same two round trips the
    * un-pinned path did (the stock client caches ApiVersions per
    * node; the double's brokers are version-uniform, so the
    * bootstrap's table stands in for the leader's). */
  final case class LeaderRoute(conn: Conn, epoch: Int,
      apis: Map[Int, (Int, Int)])

  def leaderRoute(bootstrapHost: String, bootstrapPort: Int,
      topic: String, partition: Int): LeaderRoute = {
    val boot = new Conn(bootstrapHost, bootstrapPort)
    // EVERYTHING after the connect is guarded: a partition whose
    // leader died with no survivor resolves metadata fine but has no
    // address for its (dead) leader — the lookup must not leak the
    // bootstrap socket (reroute loops retry this path repeatedly
    // during an offline window)
    val (h, p, epoch, apis) =
      try {
        val (view, table) = viewAndApis(boot, topic)
        val (h0, p0) = view.leaderAddr(partition)
        (h0, p0, view.epochOf(partition), table)
      } catch { case e: Throwable => boot.close(); throw e }
    if (h == bootstrapHost && p == bootstrapPort)
      LeaderRoute(boot, epoch, apis)
    else { boot.close(); LeaderRoute(new Conn(h, p), epoch, apis) }
  }

  /** Produce v2 (acks=-1): one partition's records; returns the
    * broker-assigned base offset. A non-None `codec` sends the batch
    * as ONE compressed wrapper message (gzip/snappy/lz4, the v1
    * attribute bits) — the broker double, like a real broker
    * validating recompressed batches, decompresses through the same
    * [[decodeMessageSet]]. */
  def produce(c: Conn, topic: String, partition: Int,
      records: Seq[(Array[Byte], Array[Byte])], timestamp: Long,
      codec: Int = Codec.None, acks: Int = -1): Long = {
    val set = if (codec != Codec.None)
      encodeMessageSetCompressed(records, timestamp, codec)
      else encodeMessageSet(records, timestamp)
    val body = new Writer()
      .int16(acks).int32(30000) // acks (-1 = all ISR, 1 = leader only)
      .int32(1).str(topic)
      .int32(1).int32(partition)
      .int32(set.length).raw(set)
      .result()
    val r = c.call(0, 2, body)
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    r.int32() // partition
    val err = r.int16()
    if (err == Errors.NotLeaderForPartition)
      throw new NotLeaderException(topic, partition)
    if (err == Errors.NotEnoughReplicas)
      throw new NotEnoughReplicasException(topic, partition)
    if (err == Errors.NotEnoughReplicasAfterAppend)
      throw new NotEnoughReplicasAfterAppendException(topic, partition)
    require(err == 0, s"produce error $err")
    val baseOffset = r.int64()
    r.int64() // log_append_time
    r.int32() // throttle_time_ms
    baseOffset
  }

  // ── the modern (v2-format) protocol calls ──────────────────────────

  /** Error codes the idempotent-produce path can see (public
    * protocol constants). */
  object Errors {
    val OutOfOrderSequence = 45
    val DuplicateSequence = 46
    val InvalidProducerEpoch = 47
    // group-coordination codes (public protocol constants)
    val IllegalGeneration = 22
    val UnknownMemberId = 25
    val RebalanceInProgress = 27
    /** Fetch below the log-start offset (retention deleted the data). */
    val OffsetOutOfRange = 1
    /** The joiner shares no assignment protocol with the group. */
    val InconsistentGroupProtocol = 23
    /** The addressed broker does not lead this partition — refresh
      * metadata and re-route (the multi-broker data-path contract). */
    val NotLeaderForPartition = 6
    /** acks=all refused: fewer than min.insync.replicas in-sync copies
      * can take the write — durability is refused loudly, never
      * silently downgraded to fewer replicas. */
    val NotEnoughReplicas = 19
    /** acks=all waited for replication and the ISR shrank below
      * min.insync.replicas BEFORE the write was fully replicated: the
      * record IS in the leader's log (unlike 19's pre-append refusal)
      * but its durability was not achieved — a retry DUPLICATES. */
    val NotEnoughReplicasAfterAppend = 20
    /** The request's current_leader_epoch is OLDER than the
      * partition's: the caller's metadata predates a re-election —
      * refresh and re-route (KIP-320's fencing token; the protocol's
      * out-of-process equivalent of the broker's in-JVM election
      * monitor). */
    val FencedLeaderEpoch = 74
    /** The request's current_leader_epoch is NEWER than this broker
      * knows: the caller learned of an election this broker hasn't
      * processed yet — retry after the broker catches up. */
    val UnknownLeaderEpoch = 75
  }

  /** A fetch/lookup pinned to a superseded leader epoch was refused:
    * the client's cluster view predates a re-election. Refresh
    * metadata (which carries the new epoch) and re-route — same
    * recovery as [[NotLeaderException]], different detection: the
    * EPOCH catches a deposed broker that still believes it leads. */
  final class FencedLeaderEpochException(val topic: String,
      val partition: Int) extends RuntimeException(
    s"fetch fenced: the pinned leader epoch of $topic-$partition was " +
      "superseded by a re-election — refresh metadata")

  /** The broker knows a SMALLER epoch than the request pinned — the
    * client is ahead of this broker's view; retry after refresh. */
  final class UnknownLeaderEpochException(val topic: String,
      val partition: Int) extends RuntimeException(
    s"the pinned leader epoch of $topic-$partition is newer than the " +
      "addressed broker's view")

  /** Stamp `epoch` into a v2 record batch's partitionLeaderEpoch field
    * (bytes 12..15) IN PLACE — like baseOffset, the field sits outside
    * the CRC32C coverage precisely so the broker can stamp it on
    * append without re-encoding. Returns the same array. */
  def stampLeaderEpoch(batch: Array[Byte], epoch: Int): Array[Byte] = {
    var i = 0
    while (i < 4) { batch(12 + i) = (epoch >> (24 - 8 * i)).toByte; i += 1 }
    batch
  }

  /** The broker refused an acks=all produce: the partition's in-sync
    * replica set is below min.insync.replicas, so the requested
    * durability (every acked record on every in-sync copy) cannot be
    * provided. NOTHING was appended. The stock client retries this
    * until delivery.timeout.ms and then surfaces the same error; this
    * client surfaces it immediately — either way the producer LEARNS
    * the write is not durable instead of silently getting less. */
  final class NotEnoughReplicasException(val topic: String,
      val partition: Int) extends RuntimeException(
    s"not enough in-sync replicas for an acks=all write to " +
      s"$topic-$partition (min.insync.replicas unmet) — nothing appended")

  /** acks=all appended but could not be fully replicated before the
    * ISR shrank below min.insync.replicas — the AFTER-append variant:
    * the record is in the log, durability was not achieved, and a
    * blind retry duplicates it (the stock client surfaces the same
    * distinction for exactly this reason). */
  final class NotEnoughReplicasAfterAppendException(val topic: String,
      val partition: Int) extends RuntimeException(
    s"acks=all write to $topic-$partition was APPENDED but not fully " +
      "replicated before the ISR shrank below min.insync.replicas — " +
      "a retry duplicates")

  /** The broker answered NOT_LEADER_FOR_PARTITION: metadata is stale
    * (a re-election, or a bootstrap-only client on a multi-broker
    * cluster). Refresh and re-route — never retry the same broker. */
  final class NotLeaderException(val topic: String, val partition: Int)
    extends RuntimeException(
      s"this broker does not lead $topic-$partition — refresh metadata")

  /** The broker no longer has the requested offset — retention
    * advanced the log start past it. The data between the caller's
    * position and the new log start is GONE; only the caller knows
    * whether that is fatal (failOnDataLoss) or skippable. */
  final class OffsetOutOfRangeException(val topic: String,
      val partition: Int, val offset: Long)
    extends RuntimeException(
      s"offset $offset of $topic-$partition is below the log start " +
        "(retention deleted it)")

  /** Produce v3 (the first version carrying v2 record batches; adds
    * transactional_id before acks): sends one pre-encoded record
    * batch for one partition, returns the broker-assigned base
    * offset. Idempotence errors surface as [[ProducerFencedException]]
    * / [[OutOfOrderSequenceException]] so the retry loop can tell
    * retriable I/O faults from fatal protocol state. */
  def produceV3(c: Conn, topic: String, partition: Int,
      batch: Array[Byte], transactionalId: String = null,
      acks: Int = -1): Long = {
    val body = new Writer()
      .str(transactionalId)   // null = idempotent-only
      .int16(acks).int32(30000) // acks (-1 = all ISR, 1 = leader only)
      .int32(1).str(topic)
      .int32(1).int32(partition)
      .int32(batch.length).raw(batch)
      .result()
    val r = c.call(0, 3, body)
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    r.int32() // partition
    val err = r.int16()
    err match {
      case 0 =>
      case Errors.InvalidProducerEpoch =>
        throw new ProducerFencedException(topic, partition)
      case Errors.OutOfOrderSequence | Errors.DuplicateSequence =>
        throw new OutOfOrderSequenceException(topic, partition, err)
      case Errors.NotLeaderForPartition =>
        throw new NotLeaderException(topic, partition)
      case Errors.NotEnoughReplicas =>
        throw new NotEnoughReplicasException(topic, partition)
      case Errors.NotEnoughReplicasAfterAppend =>
        throw new NotEnoughReplicasAfterAppendException(topic, partition)
      case other => sys.error(s"produce error $other")
    }
    val baseOffset = r.int64()
    r.int64() // log_append_time
    r.int32() // throttle_time_ms
    baseOffset
  }

  /** A newer producer instance with the same id bumped our epoch —
    * this producer must STOP, not retry (the zombie-fencing
    * contract). */
  final class ProducerFencedException(topic: String, partition: Int)
    extends RuntimeException(
      s"producer fenced: a newer epoch exists for $topic-$partition")

  /** The broker saw a sequence gap — previous produce state was lost
    * or a resend raced; fatal for this producer session (the stock
    * client's OutOfOrderSequenceException). */
  final class OutOfOrderSequenceException(topic: String, partition: Int,
      code: Int) extends RuntimeException(
    s"sequence error $code on $topic-$partition")

  /** Isolation levels (public constants): 0 = read_uncommitted (the
    * default; everything below the high watermark), 1 = read_committed
    * (only below the last stable offset, aborted producers' records
    * filtered via the response's aborted_transactions index). */
  object Isolation {
    val ReadUncommitted = 0
    val ReadCommitted = 1
    def forName(n: String): Int = n match {
      case "read_uncommitted" => ReadUncommitted
      case "read_committed" => ReadCommitted
      case other => throw new IllegalArgumentException(
        s"isolationLevel must be read_uncommitted or read_committed, got '$other'")
    }
  }

  /** Fetch v4 with the full transactional read contract:
    * (records, watermark, nextPos). The watermark is the high
    * watermark under read_uncommitted and the LAST STABLE OFFSET under
    * read_committed (the published consumer contract — an open
    * transaction blocks committed readers). nextPos is the cursor
    * after the last complete entry (control markers and aborted
    * batches advance it without yielding records). The response may
    * carry EITHER record format — old segments are served as-stored. */
  def fetchV4Detailed(c: Conn, topic: String, partition: Int, offset: Long,
      maxBytes: Int = 1 << 20,
      isolation: Int = Isolation.ReadUncommitted): (Seq[Record], Long, Long) = {
    val body = new Writer()
      .int32(-1).int32(100).int32(0) // replica=-1, max_wait, min_bytes
      .int32(maxBytes)               // response max_bytes (v3+)
      .int8(isolation)
      .int32(1).str(topic)
      .int32(1).int32(partition).int64(offset).int32(maxBytes)
      .result()
    val r = c.call(1, 4, body)
    r.int32() // throttle_time_ms
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    r.int32() // partition
    val err = r.int16()
    if (err == Errors.OffsetOutOfRange)
      throw new OffsetOutOfRangeException(topic, partition, offset)
    if (err == Errors.NotLeaderForPartition)
      throw new NotLeaderException(topic, partition)
    require(err == 0, s"fetch error $err")
    val hw = r.int64()
    val lso = r.int64() // last_stable_offset (v4+)
    val nAborted = r.int32() // aborted_transactions (v4+)
    val aborted = (0 until math.max(0, nAborted)).map { _ =>
      (r.int64(), r.int64()) // (producer_id, first_offset)
    }
    val set = r.bytes()
    val watermark = if (isolation == Isolation.ReadCommitted) lso else hw
    if (set == null) (Seq.empty, watermark, -1L)
    else {
      val (recs, nextPos) = decodeRecordSetDetailed(set,
        if (isolation == Isolation.ReadCommitted) aborted else Nil)
      (recs, watermark, nextPos)
    }
  }

  /** Compatibility shape: (records, highWatermark). */
  def fetchV4(c: Conn, topic: String, partition: Int, offset: Long,
      maxBytes: Int = 1 << 20): (Seq[Record], Long) = {
    val (recs, hw, _) = fetchV4Detailed(c, topic, partition, offset, maxBytes)
    (recs, hw)
  }

  /** Fetch v9 — the epoch-PINNED fetch (KIP-320): the request carries
    * the leader epoch the client's metadata named, and a broker whose
    * partition has moved on answers FENCED_LEADER_EPOCH instead of
    * data — stale metadata is detected by the protocol itself, not by
    * luck. `currentLeaderEpoch` -1 opts out (pre-KIP-320 behavior).
    * Sessionless (session_id 0 / epoch -1, the protocol's full-fetch
    * degenerate case). Same return shape as [[fetchV4Detailed]]. */
  def fetchV9Detailed(c: Conn, topic: String, partition: Int, offset: Long,
      maxBytes: Int = 1 << 20,
      isolation: Int = Isolation.ReadUncommitted,
      currentLeaderEpoch: Int = -1,
      replicaId: Int = -1,
      logStartOffset: Long = -1L): (Seq[Record], Long, Long) = {
    val body = new Writer()
      .int32(replicaId).int32(100).int32(0) // replica, max_wait, min_bytes
      .int32(maxBytes)               // response max_bytes (v3+)
      .int8(isolation)
      .int32(0).int32(-1)            // session_id, session_epoch (sessionless)
      .int32(1).str(topic)
      .int32(1).int32(partition)
      .int32(currentLeaderEpoch)     // the fencing pin (v9+)
      .int64(offset)
      .int64(logStartOffset)         // follower's log start (v5+)
      .int32(maxBytes)
      .int32(0)                      // forgotten_topics_data
      .result()
    val r = c.call(1, 9, body)
    r.int32() // throttle_time_ms
    val topErr = r.int16(); require(topErr == 0, s"fetch error $topErr")
    r.int32() // session_id
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    r.int32() // partition
    val err = r.int16()
    err match {
      case 0 =>
      case Errors.OffsetOutOfRange =>
        throw new OffsetOutOfRangeException(topic, partition, offset)
      case Errors.NotLeaderForPartition =>
        throw new NotLeaderException(topic, partition)
      case Errors.FencedLeaderEpoch =>
        throw new FencedLeaderEpochException(topic, partition)
      case Errors.UnknownLeaderEpoch =>
        throw new UnknownLeaderEpochException(topic, partition)
      case other => sys.error(s"fetch error $other")
    }
    val hw = r.int64()
    val lso = r.int64()       // last_stable_offset (v4+)
    r.int64()                 // log_start_offset (v5+)
    val nAborted = r.int32()  // aborted_transactions (v4+)
    val aborted = (0 until math.max(0, nAborted)).map { _ =>
      (r.int64(), r.int64())
    }
    val set = r.bytes()
    val watermark = if (isolation == Isolation.ReadCommitted) lso else hw
    if (set == null) (Seq.empty, watermark, -1L)
    else {
      val (recs, nextPos) = decodeRecordSetDetailed(set,
        if (isolation == Isolation.ReadCommitted) aborted else Nil)
      (recs, watermark, nextPos)
    }
  }

  /** OffsetsForLeaderEpoch v2 (api 23) for one partition: the
    * leader's (largestEpochAtOrBelow, itsEndOffset) for `askedEpoch`
    * — the follower-truncation lookup (KIP-101). (-1, -1) = the
    * leader knows no epoch at or below the asked one (full resync). */
  def offsetsForLeaderEpoch(c: Conn, topic: String, partition: Int,
      askedEpoch: Int, currentLeaderEpoch: Int = -1): (Int, Long) = {
    val body = new Writer()
      .int32(1).str(topic)
      .int32(1).int32(partition).int32(currentLeaderEpoch).int32(askedEpoch)
      .result()
    val r = c.call(23, 2, body)
    r.int32() // throttle_time_ms
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    val err = r.int16()
    val p = r.int32()
    require(p == partition, s"partition mismatch: $p != $partition")
    err match {
      case 0 =>
      case Errors.NotLeaderForPartition =>
        throw new NotLeaderException(topic, partition)
      case Errors.FencedLeaderEpoch =>
        throw new FencedLeaderEpochException(topic, partition)
      case Errors.UnknownLeaderEpoch =>
        throw new UnknownLeaderEpochException(topic, partition)
      case other => sys.error(s"offsetsForLeaderEpoch error $other")
    }
    (r.int32(), r.int64())
  }

  /** One partition's regime for a [[leaderAndIsr]] push. */
  final case class PartitionRegime(topic: String, partition: Int,
      leader: Int, leaderEpoch: Int, isr: Set[Int], replicas: Seq[Int])

  /** LeaderAndIsr v0 (api 4): push partition regimes to a broker the
    * way the real controller does — the ONLY way leadership crosses a
    * process boundary (the epoch in each regime is the fencing
    * token). Returns per-partition error codes; FENCED_LEADER_EPOCH
    * marks a stale push the broker refused. */
  def leaderAndIsr(c: Conn, controllerEpoch: Int,
      regimes: Seq[PartitionRegime],
      liveBrokers: Seq[(Int, String, Int)]): Map[(String, Int), Int] = {
    val w = new Writer()
      .int32(0)                // controller_id
      .int32(controllerEpoch)
      .int32(regimes.length)
    regimes.foreach { s =>
      w.str(s.topic).int32(s.partition).int32(controllerEpoch)
        .int32(s.leader).int32(s.leaderEpoch)
      w.int32(s.isr.size); s.isr.toSeq.sorted.foreach(w.int32)
      w.int32(0)               // zk_version
      w.int32(s.replicas.length); s.replicas.foreach(w.int32)
    }
    w.int32(liveBrokers.length)
    liveBrokers.foreach { case (id, h, pt) => w.int32(id).str(h).int32(pt) }
    val r = c.call(4, 0, w.result())
    val err = r.int16(); require(err == 0, s"leaderAndIsr error $err")
    val n = r.int32()
    (0 until n).map { _ =>
      val topic = r.str(); val p = r.int32(); val e = r.int16()
      (topic, p) -> e
    }.toMap
  }

  /** The REPLICA fetcher's fetch (v9, replica_id >= 0): returns the
    * raw record-set bytes — the follower appends the leader's batches
    * VERBATIM (broker-assigned offsets, epoch stamps, producer state
    * intact), never re-encoded. (bytes may be null/empty when caught
    * up.) */
  def fetchV9Raw(c: Conn, topic: String, partition: Int, offset: Long,
      replicaId: Int, currentLeaderEpoch: Int,
      logStartOffset: Long = 0L,
      maxBytes: Int = 1 << 20): Array[Byte] = {
    val body = new Writer()
      .int32(replicaId).int32(100).int32(0)
      .int32(maxBytes)
      .int8(0) // replicas read uncommitted, always
      .int32(0).int32(-1)
      .int32(1).str(topic)
      .int32(1).int32(partition)
      .int32(currentLeaderEpoch)
      .int64(offset)
      .int64(logStartOffset)
      .int32(maxBytes)
      .int32(0)
      .result()
    val r = c.call(1, 9, body)
    r.int32() // throttle
    val topErr = r.int16(); require(topErr == 0, s"fetch error $topErr")
    r.int32() // session_id
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    r.int32() // partition
    val err = r.int16()
    err match {
      case 0 =>
      case Errors.OffsetOutOfRange =>
        throw new OffsetOutOfRangeException(topic, partition, offset)
      case Errors.NotLeaderForPartition =>
        throw new NotLeaderException(topic, partition)
      case Errors.FencedLeaderEpoch =>
        throw new FencedLeaderEpochException(topic, partition)
      case Errors.UnknownLeaderEpoch =>
        throw new UnknownLeaderEpochException(topic, partition)
      case other => sys.error(s"fetch error $other")
    }
    r.int64() // hw
    r.int64() // lso
    r.int64() // log_start_offset
    val nAborted = r.int32()
    (0 until math.max(0, nAborted)).foreach { _ => r.int64(); r.int64() }
    r.bytes()
  }

  /** AddPartitionsToTxn v0: declare the partitions the current
    * transaction will write — the coordinator needs them to fan the
    * commit/abort markers out at EndTxn. */
  def addPartitionsToTxn(c: Conn, transactionalId: String, producerId: Long,
      producerEpoch: Int, topic: String, partitions: Seq[Int]): Unit = {
    val w = new Writer()
      .str(transactionalId).int64(producerId).int16(producerEpoch)
      .int32(1).str(topic).int32(partitions.length)
    partitions.foreach(w.int32)
    val r = c.call(24, 0, w.result())
    r.int32() // throttle_time_ms
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32()
    (0 until nParts).foreach { _ =>
      r.int32()
      val err = r.int16()
      if (err == Errors.InvalidProducerEpoch)
        throw new ProducerFencedException(topic, -1)
      require(err == 0, s"addPartitionsToTxn error $err")
    }
  }

  /** AddOffsetsToTxn v0 (api 25): declare the transaction will also
    * commit `groupId`'s offsets — the EXACTLY-ONCE consume-transform-
    * produce handshake's first half. */
  def addOffsetsToTxn(c: Conn, transactionalId: String, producerId: Long,
      producerEpoch: Int, groupId: String): Unit = {
    val body = new Writer()
      .str(transactionalId).int64(producerId).int16(producerEpoch)
      .str(groupId).result()
    val r = c.call(25, 0, body)
    r.int32() // throttle_time_ms
    val err = r.int16()
    if (err == Errors.InvalidProducerEpoch)
      throw new ProducerFencedException(transactionalId, -1)
    require(err == 0, s"addOffsetsToTxn error $err")
  }

  /** TxnOffsetCommit v0 (api 28): stage `groupId`'s offsets INSIDE the
    * open transaction — they land in the group store only when EndTxn
    * commits, and vanish on abort. With the produced records riding
    * the same transaction, "records out" and "position moved" become
    * one atomic event: the consume-transform-produce loop can crash
    * anywhere and the retry reads exactly the unprocessed records. */
  def txnOffsetCommit(c: Conn, transactionalId: String, groupId: String,
      producerId: Long, producerEpoch: Int, topic: String,
      offsets: Map[Int, Long]): Unit = {
    val w = new Writer()
      .str(transactionalId).str(groupId)
      .int64(producerId).int16(producerEpoch)
      .int32(1).str(topic).int32(offsets.size)
    offsets.toSeq.sortBy(_._1).foreach { case (p, off) =>
      w.int32(p).int64(off).str(null)
    }
    val r = c.call(28, 0, w.result())
    r.int32() // throttle_time_ms
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32()
    (0 until nParts).foreach { _ =>
      r.int32()
      val err = r.int16()
      if (err == Errors.InvalidProducerEpoch)
        throw new ProducerFencedException(transactionalId, -1)
      require(err == 0, s"txnOffsetCommit error $err")
    }
  }

  /** EndTxn v0: commit (true) or abort (false) the open transaction —
    * the broker writes a control marker into every partition the
    * transaction touched, which is what flips its records visible (or
    * permanently invisible) to read_committed consumers. */
  def endTxn(c: Conn, transactionalId: String, producerId: Long,
      producerEpoch: Int, commit: Boolean): Unit = {
    val body = new Writer()
      .str(transactionalId).int64(producerId).int16(producerEpoch)
      .int8(if (commit) 1 else 0)
      .result()
    val r = c.call(26, 0, body)
    r.int32() // throttle_time_ms
    val err = r.int16()
    if (err == Errors.InvalidProducerEpoch)
      throw new ProducerFencedException(transactionalId, -1)
    require(err == 0, s"endTxn error $err")
  }

  /** InitProducerId v0: allocate (producerId, producerEpoch). A null
    * `transactionalId` gets a fresh id at epoch 0 (the idempotent
    * producer's handshake); a non-null id maps to a STABLE producerId
    * whose epoch bumps on each re-init — how a restarted producer
    * fences its zombie predecessor. */
  def initProducerId(c: Conn,
      transactionalId: String = null): (Long, Int) = {
    val body = new Writer().str(transactionalId).int32(60000).result()
    val r = c.call(22, 0, body)
    r.int32() // throttle_time_ms
    val err = r.int16(); require(err == 0, s"initProducerId error $err")
    (r.int64(), r.int16())
  }

  /** OffsetCommit v2 (api 8): persist per-partition consumer-group
    * positions on the broker — the reference consumer's pattern
    * (kafka-python with a group_id + commit; collect/consumer.py) for
    * NON-checkpointed consumers. Spark paths keep their checkpointed
    * offsets (exactly-once needs the position transactional with the
    * output); this is the simple-consumer parity surface. No group
    * MEMBERSHIP (Join/Sync/Heartbeat): generation -1 + empty member is
    * the standalone-consumer convention the protocol defines for
    * exactly this. */
  def commitOffsets(c: Conn, groupId: String, topic: String,
      offsets: Map[Int, Long], generation: Int = -1,
      memberId: String = ""): Unit = {
    val w = new Writer()
      .str(groupId).int32(generation).str(memberId) // -1/"" = standalone
      .int64(-1L)                     // retention_time: broker default
      .int32(1).str(topic).int32(offsets.size)
    offsets.toSeq.sortBy(_._1).foreach { case (p, off) =>
      w.int32(p).int64(off).str(null) // metadata
    }
    val r = c.call(8, 2, w.result())
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32()
    (0 until nParts).foreach { _ =>
      r.int32()
      r.int16() match {
        case 0 =>
        case e @ (Errors.IllegalGeneration | Errors.UnknownMemberId |
            Errors.RebalanceInProgress) =>
          // a fenced commit must FAIL the caller, never silently
          // no-op — a zombie that believes its commit landed would
          // re-consume or skip records after the real member resumes
          throw new CommitFailedException(groupId, e)
        case err => sys.error(s"offsetCommit error $err")
      }
    }
  }

  /** The coordinator rejected an offset commit: the member's
    * generation is stale (a rebalance completed without it) or its id
    * was evicted — the committing consumer is a ZOMBIE and must
    * re-join, not trust its position. */
  final class CommitFailedException(groupId: String, val code: Int)
    extends RuntimeException(
      s"offset commit to group '$groupId' fenced (error $code: " +
        (code match {
          case Errors.IllegalGeneration => "ILLEGAL_GENERATION"
          case Errors.UnknownMemberId => "UNKNOWN_MEMBER_ID"
          case Errors.RebalanceInProgress => "REBALANCE_IN_PROGRESS"
          case _ => "?"
        }) + ") — the member was superseded by a rebalance")

  /** OffsetFetch v1 (api 9): the group's committed position per
    * partition; None where the group never committed (the consumer
    * then falls to its auto.offset.reset policy). */
  def fetchOffsets(c: Conn, groupId: String, topic: String,
      partitions: Seq[Int]): Map[Int, Option[Long]] = {
    val w = new Writer().str(groupId)
      .int32(1).str(topic).int32(partitions.length)
    partitions.foreach(w.int32)
    val r = c.call(9, 1, w.result())
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32()
    (0 until nParts).map { _ =>
      val p = r.int32()
      val off = r.int64()
      r.str() // metadata
      val err = r.int16(); require(err == 0, s"offsetFetch error $err")
      p -> (if (off < 0) None else Some(off))
    }.toMap
  }

  /** DeleteRecords v0 (api 21): advance the partition's log-start
    * offset to `before` — retention as a first-class API call (what
    * `kafka-delete-records.sh` sends), not an out-of-band test hook.
    * Returns the new low watermark. Offsets below it are gone; a
    * consumer holding them hits OFFSET_OUT_OF_RANGE and its
    * failOnDataLoss policy. */
  def deleteRecords(c: Conn, topic: String, partition: Int,
      before: Long): Long = {
    val body = new Writer()
      .int32(1).str(topic)
      .int32(1).int32(partition).int64(before)
      .int32(30000) // timeout_ms
      .result()
    val r = c.call(21, 0, body)
    r.int32() // throttle_time_ms
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    r.int32() // partition
    val low = r.int64()
    val err = r.int16()
    if (err == Errors.NotLeaderForPartition)
      throw new NotLeaderException(topic, partition)
    require(err == 0, s"deleteRecords error $err")
    low
  }

  /** Consumer-group LAG per partition: log-end minus the group's
    * committed position (None committed counts the whole log) — the
    * ops number every pipeline watches to know whether consumers keep
    * up with producers. */
  def groupLag(c: Conn, groupId: String, topic: String,
      partitions: Seq[Int]): Map[Int, Long] = {
    val committed = fetchOffsets(c, groupId, topic, partitions)
    // offset lookups are LEADER-routed (c may be the coordinator,
    // which need not lead any of the partitions)
    val ends = listOffsetsAll(c, topic, -1L)
    val starts = listOffsetsAll(c, topic, -2L)
    partitions.map { p =>
      p -> math.max(0L,
        ends(p) - committed.getOrElse(p, None).getOrElse(starts(p)))
    }.toMap
  }

  /** Highest mutually-supported record format: 2 when the broker
    * advertises Produce >= 3 AND Fetch >= 4 (the versions that carry
    * v2 batches), else 1 — the stock client's
    * ApiVersions-then-downgrade handshake, collapsed to the one axis
    * this client varies. */
  def negotiateFormat(c: Conn): Int = {
    val (err, apis) = apiVersions(c)
    if (err == 0 && apis.get(0).exists(_._2 >= 3) &&
      apis.get(1).exists(_._2 >= 4)) 2
    else 1
  }

  /** ListOffsets v1: the log-end (timestamp = -1, "latest") or
    * log-start (-2, "earliest") offset of one partition — how a
    * consumer resolves its admission window without fetching data.
    * With `isolation` = read_committed the call upgrades to
    * ListOffsets v2 (the version that added isolation_level) and
    * "latest" resolves to the LAST STABLE OFFSET — a committed
    * reader's admission window must stop before open transactions.
    * A REAL timestamp with no record at/after it returns -1 (the
    * protocol's "no such offset") — the CALLER's
    * startingOffsetsByTimestampStrategy decides what that means. */
  def listOffset(c: Conn, topic: String, partition: Int,
      timestamp: Long = -1L,
      isolation: Int = Isolation.ReadUncommitted): Long = {
    val committed = isolation == Isolation.ReadCommitted
    val w = new Writer().int32(-1) // replica_id
    if (committed) w.int8(isolation)
    w.int32(1).str(topic)
      .int32(1).int32(partition).int64(timestamp)
    val r = c.call(2, if (committed) 2 else 1, w.result())
    if (committed) r.int32() // throttle_time_ms (v2+)
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    r.int32() // partition
    val err = r.int16()
    if (err == Errors.NotLeaderForPartition)
      throw new NotLeaderException(topic, partition)
    require(err == 0, s"listOffsets error $err")
    r.int64() // timestamp
    r.int64() // offset
  }

  /** ListOffsets for EVERY partition of `topic`, each lookup routed to
    * its LEADER (the real contract: the offset index lives with the
    * log; a one-broker cluster degenerates to the bootstrap). One
    * temporary connection per non-bootstrap leader. */
  def listOffsetsAll(bootstrap: Conn, topic: String, timestamp: Long = -1L,
      isolation: Int = Isolation.ReadUncommitted): Map[Int, Long] = {
    val view = clusterMetadata(bootstrap, topic)
    view.leaders.groupBy(_._2).flatMap { case (broker, parts) =>
      val (h, pt) = view.brokers(broker)
      val reuse = h == bootstrap.host && pt == bootstrap.port
      val c = if (reuse) bootstrap else new Conn(h, pt)
      try parts.keys.toSeq.map(p =>
        p -> listOffset(c, topic, p, timestamp, isolation))
      finally if (!reuse) c.close()
    }
  }

  /** Hard ceiling for the grow-on-truncation fetch retry (64 MiB) —
    * past this a single message is declared too large and the read
    * fails loudly instead of silently skipping the offset range. */
  val MaxFetchBytes: Int = 1 << 26

  /** Fetch v2 from `offset`: (records, highWatermark). */
  def fetch(c: Conn, topic: String, partition: Int, offset: Long,
      maxBytes: Int = 1 << 20): (Seq[Record], Long) = {
    val (recs, hw, _) = fetchV2WithSize(c, topic, partition, offset, maxBytes)
    (recs, hw)
  }

  /** Fetch v2 plus the WIRE SIZE of the served record set — the signal
    * that disambiguates "zero records decoded": 0 bytes below the high
    * watermark means the span had no v1 representation at all
    * (down-converted control markers leave an offset GAP — the old-
    * consumer contract), where a NON-empty undecodable set is a
    * message sliced at max_bytes (grow and retry). */
  private def fetchV2WithSize(c: Conn, topic: String, partition: Int,
      offset: Long, maxBytes: Int): (Seq[Record], Long, Int) = {
    val body = new Writer()
      .int32(-1).int32(100).int32(0) // replica=-1, max_wait, min_bytes
      .int32(1).str(topic)
      .int32(1).int32(partition).int64(offset).int32(maxBytes)
      .result()
    val r = c.call(1, 2, body)
    r.int32() // throttle_time_ms
    val nTopics = r.int32(); require(nTopics == 1)
    r.str()
    val nParts = r.int32(); require(nParts == 1)
    r.int32() // partition
    val err = r.int16()
    if (err == Errors.OffsetOutOfRange)
      throw new OffsetOutOfRangeException(topic, partition, offset)
    if (err == Errors.NotLeaderForPartition)
      throw new NotLeaderException(topic, partition)
    require(err == 0, s"fetch error $err")
    val hw = r.int64()
    val set = r.bytes()
    (if (set == null) Seq.empty else decodeMessageSet(set), hw,
      if (set == null) 0 else set.length)
  }

  /** ONE grow-on-truncation fetch cursor, shared by both consume paths
    * (the DSv2 range reader and [[pollOnce]]'s loop) so the recovery
    * algorithm cannot diverge between them. `fetchAt(pos)` returns
    * (records with offset >= pos, highWatermark): a compressed wrapper
    * batch containing `pos` decompresses to below-cursor records —
    * dropped here, they belong to an earlier range — and a fetch that
    * yields ZERO complete records while pos < hw means a single
    * message exceeded maxBytes (the broker slices at max_bytes), so
    * the window doubles and retries; past [[MaxFetchBytes]] it fails
    * LOUDLY (the stock consumer's RecordTooLargeException) instead of
    * silently skipping a committed range. */
  final class GrowingFetcher(c: Conn, topic: String, partition: Int,
      isolation: Int = Isolation.ReadUncommitted,
      currentLeaderEpoch: Int = -1,
      apisHint: Map[Int, (Int, Int)] = null) {
    private var maxBytes = 1 << 20
    // one ApiVersions round-trip per task connection (the stock
    // client's handshake), skipped when the caller already holds the
    // table from its routing round ([[leaderRoute]]): Fetch v9 when
    // the broker fences by leader epoch (KIP-320), v4 when it serves
    // v2 batches, v2 otherwise — decode handles either record format
    // per entry
    private val (format, fetchEpochAware) = {
      val apisOpt =
        if (apisHint != null) Some(apisHint)
        else {
          val (err, apis) = apiVersions(c)
          if (err == 0) Some(apis) else None
        }
      val fmt =
        if (apisOpt.exists(a => a.get(0).exists(_._2 >= 3) &&
          a.get(1).exists(_._2 >= 4))) 2
        else 1
      (fmt, apisOpt.exists(_.get(1).exists(_._2 >= 9)))
    }
    require(isolation == Isolation.ReadUncommitted || format >= 2,
      "read_committed needs a record-batch-v2 broker (Fetch v4 carries " +
        "the last-stable-offset/aborted-transactions contract)")
    def fetchAt(pos: Long): (Seq[Record], Long) = {
      // the internal cursor may run AHEAD of pos: control markers and
      // aborted transactions occupy offset slots but yield no records,
      // so a markers-only span must advance the fetch position — not
      // be mistaken for an over-max_bytes truncation
      var p = pos
      while (true) {
        val (recs, wm, nextPos) =
          if (fetchEpochAware)
            fetchV9Detailed(c, topic, partition, p, maxBytes, isolation,
              currentLeaderEpoch)
          else if (format >= 2)
            fetchV4Detailed(c, topic, partition, p, maxBytes, isolation)
          else {
            val (rs, hw, setLen) =
              fetchV2WithSize(c, topic, partition, p, maxBytes)
            // zero records + ZERO served bytes below the watermark: the
            // span has no v1 form (a down-converted control marker's
            // offset gap) — advance one slot, the marker's exact width;
            // zero records + nonempty bytes stays -1 (a sliced message:
            // grow). Keeps the cursor invariant format-independent even
            // though today's v1-negotiated brokers cannot host
            // transactions.
            val np =
              if (rs.nonEmpty) rs.last.offset + 1
              else if (setLen == 0 && p < hw) p + 1
              else -1L
            (rs, hw, np)
          }
        val kept = recs.filter(_.offset >= pos)
        if (kept.nonEmpty || p >= wm) return (kept, wm)
        if (nextPos > p) p = nextPos // skipped markers/aborted: advance
        else if (maxBytes >= MaxFetchBytes)
          throw new java.io.IOException(
            s"message at offset $p of $topic-$partition exceeds " +
              s"fetch cap $MaxFetchBytes")
        else maxBytes =
          math.min(maxBytes.toLong * 2, MaxFetchBytes.toLong).toInt
      }
      sys.error("unreachable")
    }
  }

  /** Produce with reconnect-and-retry — the client half of the
    * at-least-once contract. A connection that dies BEFORE the ack
    * leaves the client unable to know whether the batch landed (the
    * classic produce ambiguity), so the retry re-sends: a batch that
    * did land is DUPLICATED, never dropped — the downstream J1
    * anti-join upsert absorbs replays. I/O failures reconnect and
    * retry up to `maxAttempts`; protocol violations (correlation-id
    * mismatch) are NOT retried — a broker that mis-routes responses
    * must abort the task, not be trusted with a resend. */
  final class RetryingProducer(host: String, port: Int, topic: String,
      maxAttempts: Int = 3, format: String = "auto",
      idempotent: Boolean = false, transactionalId: String = null,
      acks: String = "all") {
    require(format == "auto" || format == "v1" || format == "v2",
      s"format must be auto|v1|v2, got '$format'")
    require(!(idempotent && format == "v1"),
      "idempotent produce needs record-batch v2 (format=v1 given)")
    /** acks="all" (-1): the broker acks only once every in-sync
      * replica persisted the batch — an acked record survives a clean
      * leader failover. acks="1": leader-only ack — faster, but a
      * record acked just before the leader dies can be LOST (its
      * replication never happened); consumers never see such records
      * (the high watermark bounds reads), so the loss is silent.
      * The stock client's acks config, same values, same trade. */
    require(acks == "all" || acks == "1",
      s"acks must be all|1, got '$acks'")
    private val acksCode = if (acks == "all") -1 else 1
    private var conn: Conn = null
    private var nParts = -1
    private var magic = -1
    // ── multi-broker routing: the data path goes to each partition's
    // LEADER (discovered via metadata); control calls (InitProducerId,
    // AddPartitionsToTxn, EndTxn, metadata itself) ride the bootstrap
    // connection. A NOT_LEADER answer refreshes the view and re-routes.
    private var view: ClusterView = null
    private val dataConns = scala.collection.mutable.Map.empty[Int, Conn]
    private def connFor(partition: Int): Conn = {
      if (view == null) { ensure(); view = clusterMetadata(conn, topic) }
      val leader = view.leaders(partition)
      dataConns.getOrElseUpdate(leader, {
        val (h, pt) = view.brokers(leader)
        new Conn(h, pt)
      })
    }
    private def dropView(): Unit = {
      view = null
      dataConns.values.foreach(c => try c.close() catch { case _: Exception => })
      dataConns.clear()
    }
    // producer identity is CLUSTER state, not connection state: the
    // pid/epoch survive reconnects so a retried batch re-sends with
    // the SAME baseSequence and the broker can dedup it
    private var pid = -1L
    private var pEpoch = -1
    private val seqs = scala.collection.mutable.Map.empty[Int, Int]
    // transactions: partitions added to the OPEN transaction (AddPartitionsToTxn
    // sent once per partition per transaction), and whether one is open
    private val txnParts = scala.collection.mutable.Set.empty[Int]
    private var inTxn = false
    /** True once the open transaction has anything to resolve beyond
      * produced partitions — an offsets-only transaction
      * (sendOffsetsToTransaction with no sends) still needs EndTxn. */
    private var txnHasWork = false
    private def ensure(): Unit = if (conn == null) {
      conn = new Conn(host, port)
      nParts = partitionCount(conn, topic)
      val negotiated = negotiateFormat(conn)
      magic = format match {
        case "v1" => 1
        case "v2" =>
          require(negotiated >= 2, "broker does not support record-batch v2")
          2
        case _ =>
          if (idempotent) require(negotiated >= 2,
            "idempotent produce needs a record-batch-v2 broker")
          negotiated
      }
      if (idempotent && pid < 0L) {
        val (p, e) = initProducerId(conn, transactionalId)
        pid = p; pEpoch = e
      }
    }
    private def reset(): Unit = {
      if (conn != null) { try conn.close() catch { case _: Exception => } }
      conn = null
      dropView()
    }
    def partitions: Int = { ensure(); nParts }
    /** The negotiated record format (1 or 2) — observable for tests. */
    def recordFormat: Int = { ensure(); magic }
    def producerIdentity: (Long, Int) = { ensure(); (pid, pEpoch) }

    // ── transactions (exactly-once produce) ──────────────────────────
    // Requires transactionalId + idempotent: the transaction rides the
    // same pid/epoch/sequence identity; InitProducerId on the stable
    // id bumps the epoch AND aborts any transaction a crashed
    // predecessor left open (the coordinator's recovery), so a
    // restarted writer starts clean and the zombie is fenced.

    /** Open a transaction: subsequent sends are transactional (LSO-
      * pinning, invisible to read_committed until commit). */
    def beginTransaction(): Unit = {
      require(transactionalId != null && idempotent,
        "transactions need transactionalId + idempotent=true")
      ensure()
      require(magic >= 2, "transactions need a record-batch-v2 broker")
      inTxn = true
      txnParts.clear()
      txnHasWork = false
    }

    /** Commit the open transaction: control markers land in every
      * partition it wrote; its records become stable atomically. */
    def commitTransaction(): Unit = finishTxn(commit = true)

    /** Abort it: the records stay in the log but are permanently
      * invisible to read_committed consumers. */
    def abortTransaction(): Unit = finishTxn(commit = false)

    /** Commit `groupId`'s consumed offsets INSIDE the open transaction
      * (the stock producer's sendOffsetsToTransaction): they move only
      * if the transaction commits — with the produced records — and
      * never if it aborts. The exactly-once consume-transform-produce
      * primitive. */
    def sendOffsetsToTransaction(groupId: String, srcTopic: String,
        offsets: Map[Int, Long]): Unit = {
      require(inTxn, "sendOffsetsToTransaction needs an open transaction")
      ensure()
      addOffsetsToTxn(conn, transactionalId, pid, pEpoch, groupId)
      txnOffsetCommit(conn, transactionalId, groupId, pid, pEpoch,
        srcTopic, offsets)
      txnHasWork = true
    }

    private def finishTxn(commit: Boolean): Unit = {
      if (inTxn && (txnParts.nonEmpty || txnHasWork)) {
        ensure()
        endTxn(conn, transactionalId, pid, pEpoch, commit)
      }
      inTxn = false
      txnParts.clear()
      txnHasWork = false
    }
    def send(partition: Int, records: Seq[(Array[Byte], Array[Byte])],
        timestamp: Long, codec: Int = Codec.None): Long =
      sendRecords(partition, records.zipWithIndex.map { case ((k, v), i) =>
        Record(i.toLong, timestamp, k, v) }, codec)
    /** Full-fidelity send: per-record timestamps and (v2-only)
      * headers. Record offsets are ignored — positions in the batch
      * define the relative offsets. I/O failures reconnect and
      * re-send with the SAME baseSequence (idempotent mode), so the
      * broker drops the duplicate; fencing/sequence errors are
      * RuntimeExceptions and NOT retried. */
    def sendRecords(partition: Int, records: Seq[Record],
        codec: Int = Codec.None): Long = {
      var attempt = 1
      while (true) {
        try {
          ensure()
          return if (magic >= 2) {
            if (inTxn && !txnParts.contains(partition)) {
              addPartitionsToTxn(conn, transactionalId, pid, pEpoch,
                topic, Seq(partition))
              txnParts += partition
            }
            val based = records.zipWithIndex.map { case (r, i) =>
              r.copy(offset = i.toLong) }
            val baseSeq = if (idempotent) seqs.getOrElse(partition, 0) else -1
            val batch = encodeRecordBatch(0L, based, codec, pid,
              if (idempotent) pEpoch else -1, baseSeq,
              transactional = inTxn)
            val off = produceV3(connFor(partition), topic, partition, batch,
              if (inTxn) transactionalId else null, acksCode)
            if (idempotent) seqs(partition) = baseSeq + records.length
            off
          } else {
            if (records.exists(_.headers.nonEmpty))
              throw new IllegalArgumentException(
                "record headers need record-batch v2; the broker/format " +
                  "negotiated v1")
            // v1 has no per-record timestamps: stamp the wrapper max,
            // the same loss a real broker's down-conversion accepts
            val ts = records.iterator.map(_.timestamp).max
            produce(connFor(partition), topic, partition,
              records.map(r => (r.key, r.value)), ts, codec, acksCode)
          }
        }
        catch {
          case e: NotLeaderException =>
            // a re-election moved the partition: refresh the view and
            // re-route — the broker-side sequence state is CLUSTER
            // state here, so the idempotent retry still dedups
            dropView()
            if (attempt >= maxAttempts) throw e
            attempt += 1
          case e: java.io.IOException =>
            reset()
            if (attempt >= maxAttempts) throw e
            attempt += 1
        }
      }
      -1L // unreachable
    }
    def close(): Unit = reset()
  }

  // ── Spark integration (executor-side, partition-parallel) ──────────

  /** S2, the producer sink: write a (key STRING, value STRING)
    * dataframe to `topic`, one broker connection per dataframe
    * partition on the executors, records routed to topic partitions
    * by murmur2(key) — the reference's `producer.send(topic,
    * key=entry.link, value=json)` loop (collect/producer.py:50),
    * distributed. */
  def produceDataFrame(df: DataFrame, host: String, port: Int,
      topic: String, timestamp: Long): Unit = {
    df.select(col("key").cast("string"), col("value").cast("string"))
      .foreachPartition { rows: Iterator[Row] =>
        // resolved inside the task: Charset instances don't serialize
        val u8 = java.nio.charset.StandardCharsets.UTF_8
        if (rows.nonEmpty) {
          val prod = new RetryingProducer(host, port, topic)
          try {
            val nParts = prod.partitions
            rows.grouped(500).foreach { chunk =>
              chunk
                .map { row =>
                  val k = Option(row.getString(0)).map(_.getBytes(u8)).orNull
                  val v = Option(row.getString(1)).map(_.getBytes(u8)).orNull
                  (partitionFor(k, nParts), k, v)
                }
                .groupBy(_._1)
                .foreach { case (p, recs) =>
                  prod.send(p, recs.map(t => (t._2, t._3)), timestamp)
                }
            }
          } finally prod.close()
        }
      }
  }

  /** A foreachBatch sink for the streaming (S2) shape — the
    * JdbcUpsert.foreachBatchWriter pattern on the Kafka wire. */
  def foreachBatchProducer(host: String, port: Int, topic: String,
      timestamp: Long): (Dataset[Row], Long) => Unit =
    (batch, _) => produceDataFrame(batch.toDF(), host, port, topic, timestamp)

  /** S3, the consumer source (batch form): read every record from
    * `fromOffset` (earliest = 0, the reference's
    * `auto_offset_reset="earliest"`) to the current high watermark,
    * one fetch loop per topic partition, parallelized over the
    * cluster. Returns (partition, offset, timestamp, key, value).
    *
    * With `groupId` set this is the reference consumer's exact shape
    * (kafka-python group + commit, collect/consumer.py): each
    * partition starts from the GROUP'S COMMITTED offset (falling to
    * `fromOffset` — the auto.offset.reset analogue — when the group
    * never committed) and commits its final position after the drain,
    * so successive polls of the same group consume each record once.
    * The commit is per-partition from the task that drained it —
    * at-least-once on task retry, the kafka-python contract. */
  def pollOnce(spark: SparkSession, host: String, port: Int,
      topic: String, fromOffset: Long = 0L,
      groupId: Option[String] = None): DataFrame = {
    val meta = new Conn(host, port)
    val nParts = try partitionCount(meta, topic) finally meta.close()
    val rows = spark.sparkContext
      .parallelize(0 until nParts, nParts)
      .flatMap { p =>
        val u8 = java.nio.charset.StandardCharsets.UTF_8
        val out = scala.collection.mutable.ArrayBuffer.empty[
          (Int, Long, Long, String, String)]
        // fetch from the partition's LEADER (= the bootstrap on a
        // one-broker cluster), epoch-pinned; coordinator calls
        // (offset fetch/commit) are served by any broker. A
        // mid-drain re-election (NOT_LEADER from a follower, FENCED/
        // UNKNOWN from an epoch-skewed broker — metadata can briefly
        // run ahead of a leader that hasn't processed the controller
        // push) re-resolves and resumes from the SAME offset, like
        // the stock consumer; bounded so a flapping cluster fails
        // loudly.
        var off = -1L
        var done = false
        var reroutes = 0
        while (!done) {
          var route: LeaderRoute = null
          try {
            // resolution INSIDE the retry: a leader CRASH surfaces as
            // a dead socket / refused reconnect / address-less leader
            // id, not a tidy NOT_LEADER — all of it reroutes, bounded
            route = leaderRoute(host, port, topic, p)
            val c = route.conn
            val fetcher = new GrowingFetcher(c, topic, p,
              currentLeaderEpoch = route.epoch, apisHint = route.apis)
            if (off < 0)
              off = groupId
                .flatMap(g =>
                  fetchOffsets(c, g, topic, Seq(p)).getOrElse(p, None))
                .getOrElse(fromOffset)
            while (!done) {
              val (kept, hw) = fetcher.fetchAt(off)
              if (kept.isEmpty) done = true // off >= hw: caught up
              else {
                kept.foreach { r =>
                  out += ((p, r.offset, r.timestamp,
                    if (r.key == null) null else new String(r.key, u8),
                    if (r.value == null) null else new String(r.value, u8)))
                }
                off = kept.last.offset + 1
                done = off >= hw
              }
            }
            groupId.foreach(g => commitOffsets(c, g, topic, Map(p -> off)))
          } catch {
            case e @ (_: NotLeaderException | _: FencedLeaderEpochException |
                _: UnknownLeaderEpochException |
                _: java.net.SocketException | _: java.io.EOFException |
                _: java.net.ConnectException |
                _: java.net.SocketTimeoutException |
                _: NoSuchElementException) =>
              reroutes += 1
              if (reroutes > 8) throw e
              Thread.sleep(25)
          } finally if (route != null) route.conn.close()
        }
        out.toSeq
      }
    spark.createDataFrame(rows)
      .toDF("partition", "offset", "timestamp", "key", "value")
  }
}
