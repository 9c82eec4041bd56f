package graft

import graft.sources.KafkaWire
import graft.sources.KafkaWire.{Reader, Record, Writer}

/** In-JVM broker DOUBLE for the Kafka wire-protocol client — the
  * S2/S3 analogue of the in-JVM HTTP server that proves the S11
  * crawl: a real TCP listener speaking the same pre-flexible subset
  * of the public protocol (ApiVersions v0, Metadata v0, Produce v2,
  * Fetch v2, message format v1), with an in-memory per-partition log.
  * Everything KafkaWire sends travels through actual sockets and
  * actual protocol bytes; only durability is simulated. Test-only. */
final class MiniKafkaServer(numPartitions: Int = 2) {

  private val logs = scala.collection.concurrent.TrieMap
    .empty[(String, Int), scala.collection.mutable.ArrayBuffer[Record]]
  private def logOf(topic: String, p: Int) =
    logs.getOrElseUpdate((topic, p),
      scala.collection.mutable.ArrayBuffer.empty[Record])

  private val server = new java.net.ServerSocket(0)
  def port: Int = server.getLocalPort
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s))
        t.setDaemon(true); t.start()
      } catch { case _: Exception => /* closed */ }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; server.close() }

  /** Records currently stored for (topic, partition) — test oracle. */
  def stored(topic: String, p: Int): Seq[Record] =
    logs.get((topic, p)).map(_.toSeq).getOrElse(Seq.empty)

  private def serve(sock: java.net.Socket): Unit = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))
    try {
      while (true) {
        val len = in.readInt()
        val req = new Array[Byte](len)
        in.readFully(req)
        val r = new Reader(req)
        val apiKey = r.int16(); val apiVersion = r.int16()
        val corr = r.int32(); r.str() // client_id
        val body: Array[Byte] = (apiKey, apiVersion) match {
          case (18, 0) => apiVersionsV0()
          case (3, 0) => metadataV0(r)
          case (0, 2) => produceV2(r)
          case (1, 2) => fetchV2(r)
          case (2, 1) => listOffsetsV1(r)
          case other => sys.error(s"unsupported api $other")
        }
        val framed = new Writer().int32(corr).raw(body).result()
        out.writeInt(framed.length); out.write(framed); out.flush()
      }
    } catch { case _: java.io.EOFException | _: java.net.SocketException => }
    finally sock.close()
  }

  private def apiVersionsV0(): Array[Byte] = {
    val apis = Seq((0, 2, 2), (1, 2, 2), (3, 0, 0), (18, 0, 0))
    val w = new Writer().int16(0).int32(apis.length)
    apis.foreach { case (k, lo, hi) => w.int16(k).int16(lo).int16(hi) }
    w.result()
  }

  private def metadataV0(r: Reader): Array[Byte] = {
    val n = r.int32()
    val topics = (0 until n).map(_ => r.str())
    val w = new Writer()
    w.int32(1).int32(0).str("localhost").int32(port) // one broker, id 0
    w.int32(topics.length)
    topics.foreach { t =>
      w.int16(0).str(t).int32(numPartitions)
      (0 until numPartitions).foreach { p =>
        w.int16(0).int32(p).int32(0)      // error, partition, leader
        w.int32(1).int32(0)               // replicas [0]
        w.int32(1).int32(0)               // isr [0]
      }
    }
    w.result()
  }

  private def produceV2(r: Reader): Array[Byte] = {
    r.int16(); r.int32() // acks, timeout
    val nTopics = r.int32()
    val acks = (0 until nTopics).flatMap { _ =>
      val topic = r.str()
      val nParts = r.int32()
      (0 until nParts).map { _ =>
        val p = r.int32()
        val set = r.bytes()
        val recs = KafkaWire.decodeMessageSet(set)
        val log = logOf(topic, p)
        val base = log.synchronized {
          val b = log.length.toLong
          recs.zipWithIndex.foreach { case (rec, i) =>
            log += Record(b + i, rec.timestamp, rec.key, rec.value)
          }
          b
        }
        (topic, p, base)
      }
    }
    val w = new Writer().int32(nTopics)
    acks.groupBy(_._1).foreach { case (topic, parts) =>
      w.str(topic).int32(parts.length)
      parts.foreach { case (_, p, base) =>
        w.int32(p).int16(0).int64(base).int64(-1L)
      }
    }
    w.int32(0) // throttle_time_ms
    w.result()
  }

  private def listOffsetsV1(r: Reader): Array[Byte] = {
    r.int32() // replica_id
    val nTopics = r.int32()
    val resp = (0 until nTopics).map { _ =>
      val topic = r.str()
      val nParts = r.int32()
      val parts = (0 until nParts).map { _ =>
        val p = r.int32(); val ts = r.int64()
        val log = logOf(topic, p)
        val off = if (ts == -2L) 0L else log.synchronized(log.length.toLong)
        (p, off)
      }
      (topic, parts)
    }
    val w = new Writer().int32(resp.length)
    resp.foreach { case (topic, parts) =>
      w.str(topic).int32(parts.length)
      parts.foreach { case (p, off) =>
        w.int32(p).int16(0).int64(-1L).int64(off)
      }
    }
    w.result()
  }

  private def fetchV2(r: Reader): Array[Byte] = {
    r.int32(); r.int32(); r.int32() // replica_id, max_wait, min_bytes
    val nTopics = r.int32()
    val resp = (0 until nTopics).map { _ =>
      val topic = r.str()
      val nParts = r.int32()
      val parts = (0 until nParts).map { _ =>
        val p = r.int32(); val off = r.int64(); val maxBytes = r.int32()
        val log = logOf(topic, p)
        val (slice, hw) = log.synchronized {
          (log.drop(off.toInt).toSeq, log.length.toLong)
        }
        // whole messages up to maxBytes (at least one so a reader
        // always makes progress, the broker's own rule)
        var total = 0
        val capped = slice.takeWhile { rec =>
          // offset 8 + size 4 + crc 4 + magic 1 + attr 1 + ts 8 +
          // key len 4 + value len 4 = 34 bytes of framing per message
          val sz = 34 + Option(rec.key).map(_.length).getOrElse(0) +
            Option(rec.value).map(_.length).getOrElse(0)
          total += sz; total <= maxBytes || total == sz
        }
        (p, hw, KafkaWire.encodeMessageSetAt(capped))
      }
      (topic, parts)
    }
    val w = new Writer().int32(0) // throttle_time_ms
    w.int32(resp.length)
    resp.foreach { case (topic, parts) =>
      w.str(topic).int32(parts.length)
      parts.foreach { case (p, hw, set) =>
        w.int32(p).int16(0).int64(hw).int32(set.length).raw(set)
      }
    }
    w.result()
  }
}
