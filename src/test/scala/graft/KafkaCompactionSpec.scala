package graft

import graft.sources.KafkaWire

/** LOG COMPACTION: `cleanup.policy=compact` topics (the CDC replay
  * shape — cdc_apply_latest / CdcStream consume exactly such logs)
  * keep only the latest record per key, leaving OFFSET GAPS where
  * earlier writes were. Pins the double's cleaner (latest-per-key,
  * original offsets and batch spans preserved, tombstone retention
  * and purge, fully-compacted batches kept as empty-span batches) and
  * the consumer's gap handling: cursors advance THROUGH gaps — mid-
  * batch, whole-batch, and at the tail — and a checkpointed resume
  * lands correctly past them. */
class KafkaCompactionSpec extends SparkSuite {

  private val u8 = java.nio.charset.StandardCharsets.UTF_8

  private def send(prod: KafkaWire.RetryingProducer,
      kvs: (String, String)*): Unit =
    prod.send(0, kvs.map { case (k, v) =>
      (k.getBytes(u8), if (v == null) null else v.getBytes(u8)) }, 1L)

  private def drainWire(srv: MiniKafkaServer, topic: String): Seq[KafkaWire.Record] = {
    val c = new KafkaWire.Conn("localhost", srv.port)
    try {
      val f = new KafkaWire.GrowingFetcher(c, topic, 0)
      val out = scala.collection.mutable.ArrayBuffer.empty[KafkaWire.Record]
      var pos = 0L
      var done = false
      while (!done) {
        val (recs, hw) = f.fetchAt(pos)
        if (recs.isEmpty) done = true
        else { out ++= recs; pos = recs.last.offset + 1; done = pos >= hw }
      }
      out.toSeq
    } finally c.close()
  }

  test("compaction keeps exactly the latest record per key at its original offset") {
    val srv = new MiniKafkaServer(numPartitions = 1)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", srv.port, "t")
      try {
        send(prod, "a" -> "a1", "b" -> "b1") // offsets 0,1
        send(prod, "a" -> "a2", "c" -> "c1") // offsets 2,3
        send(prod, "b" -> "b2")              // offset 4
      } finally prod.close()
      srv.compact("t", 0)
      val recs = drainWire(srv, "t")
      // batch 1 is FULLY compacted (both a@0 and b@1 superseded): a
      // whole-batch gap the cursor must cross; survivors keep their
      // original offsets
      assert(recs.map(r => (new String(r.key, u8), new String(r.value, u8),
        r.offset)) === Seq(("a", "a2", 2L), ("c", "c1", 3L), ("b", "b2", 4L)))
    } finally srv.stop()
  }

  test("tombstones: the latest null value stays visible until the purge pass removes the key") {
    val srv = new MiniKafkaServer(numPartitions = 1)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", srv.port, "t")
      try {
        send(prod, "a" -> "a1", "b" -> "b1") // 0,1
        send(prod, "a" -> null)              // 2: tombstone for a
      } finally prod.close()
      srv.compact("t", 0)
      val withTomb = drainWire(srv, "t")
      assert(withTomb.map(r => (new String(r.key, u8),
        Option(r.value).map(new String(_, u8)).orNull)) ===
        Seq(("b", "b1"), ("a", null)),
        "the tombstone IS the key's latest record until delete retention")
      // the later cleaner pass drops the tombstoned key entirely — the
      // TAIL batch becomes empty (span intact), and the consumer still
      // converges instead of spinning at the tail gap
      srv.compact("t", 0, purgeTombstones = true)
      val purged = drainWire(srv, "t")
      assert(purged.map(r => new String(r.key, u8)) === Seq("b"))
    } finally srv.stop()
  }

  test("a compacted log consumed through the DSv2 source resumes correctly across gaps") {
    import org.apache.spark.sql.streaming.Trigger
    val srv = new MiniKafkaServer(numPartitions = 1)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", srv.port, "t")
      val ckpt = java.nio.file.Files.createTempDirectory("cmp-ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("cmp-out").toString
      def drain(): Unit = {
        val q = spark.readStream.format("graft-kafka")
          .option("host", "localhost").option("port", srv.port.toString)
          .option("topic", "t").load()
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }
      try {
        send(prod, "k1" -> "v1", "k2" -> "v1") // 0,1
        drain() // checkpoint at 2
        assert(spark.read.parquet(outDir).count() === 2L)
        send(prod, "k1" -> "v2")               // 2
        send(prod, "k2" -> "v2", "k3" -> "v1") // 3,4
        srv.compact("t", 0) // offsets 0,1 are now gaps BELOW the checkpoint
        drain() // resume at 2: reads exactly the new records
        val rows = spark.read.parquet(outDir).select("key", "value", "offset")
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        assert(rows.length === 5)
        assert(rows.toSet.contains(("k1", "v2", 2L)))
        // a FRESH read of the compacted log (earliest) is the CDC
        // replay: exactly the latest-per-key records, offsets original
        val replay = spark.read.format("graft-kafka")
          .option("host", "localhost").option("port", srv.port.toString)
          .option("topic", "t").load()
          .select("key", "value", "offset").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        assert(replay.toSeq.sortBy(_._3) ===
          Seq(("k1", "v2", 2L), ("k2", "v2", 3L), ("k3", "v1", 4L)))
      } finally prod.close()
    } finally srv.stop()
  }

  test("the cleaner is transaction-aware: an aborted write never shadows its committed predecessor") {
    val srv = new MiniKafkaServer(numPartitions = 1)
    try {
      // committed k=v1
      val plain = new KafkaWire.RetryingProducer("localhost", srv.port, "t")
      try send(plain, "k" -> "v1", "other" -> "x") finally plain.close() // 0,1
      // an ABORTED transaction writes k=v2 (later offset)
      val txn = new KafkaWire.RetryingProducer("localhost", srv.port, "t",
        idempotent = true, transactionalId = "clean-abort")
      try {
        txn.beginTransaction()
        send(txn, "k" -> "v2") // offset 2, aborted below
        txn.abortTransaction() // marker at 3
      } finally txn.close()
      // an OPEN transaction above the LSO — the cleaner must not touch it
      val open = new KafkaWire.RetryingProducer("localhost", srv.port, "t",
        idempotent = true, transactionalId = "clean-open")
      open.beginTransaction()
      send(open, "other" -> "y") // offset 4, open: above the LSO
      try {
        srv.compact("t", 0)
        // naive latest-by-offset would keep aborted v2 and delete v1 —
        // k would vanish from a read_committed replay entirely
        val c = new KafkaWire.Conn("localhost", srv.port)
        try {
          val f = new KafkaWire.GrowingFetcher(c, "t", 0,
            KafkaWire.Isolation.ReadCommitted)
          val (recs, _) = f.fetchAt(0L)
          val byKey = recs.map(r =>
            new String(r.key, u8) -> new String(r.value, u8)).toMap
          assert(byKey("k") === "v1",
            "the committed write must survive the aborted shadow")
          assert(byKey("other") === "x")
        } finally c.close()
        // the uncleaned tail (open txn at offset 4) is physically intact
        assert(srv.stored("t", 0).exists(r =>
          new String(r.value, u8) == "y"), "the unstable tail is never cleaned")
      } finally { open.abortTransaction(); open.close() }
    } finally srv.stop()
  }

  test("broker compaction and the engine's CDC apply-latest agree on the table state") {
    import org.apache.spark.sql.functions.{col, max_by, struct}
    val srv = new MiniKafkaServer(numPartitions = 1)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", srv.port, "t")
      try {
        send(prod, "u1" -> "a", "u2" -> "b", "u3" -> "c") // 0,1,2
        send(prod, "u1" -> "a2", "u4" -> "d")             // 3,4
        send(prod, "u2" -> null)                          // 5: delete u2
        send(prod, "u3" -> "c2", "u1" -> "a3")            // 6,7
      } finally prod.close()
      def read() = spark.read.format("graft-kafka")
        .option("host", "localhost").option("port", srv.port.toString)
        .option("topic", "t").load()
      // engine-side collapse of the FULL changelog — the
      // cdc_apply_latest shape (Scale2.scala): latest row per key,
      // tombstones drop the key
      val applied = read().groupBy(col("key"))
        .agg(max_by(struct(col("value"), col("offset")), col("offset")).as("last"))
        .where(col("last.value").isNotNull)
        .select(col("key"), col("last.value").as("value"),
          col("last.offset").as("offset"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // broker-side cleaner with the tombstone purge pass
      srv.compact("t", 0, purgeTombstones = true)
      val replayed = read().select("key", "value", "offset").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(replayed === applied,
        "a compacted-topic replay must equal the applied changelog state")
      assert(replayed === Set(("u1", "a3", 7L), ("u4", "d", 4L),
        ("u3", "c2", 6L)))
    } finally srv.stop()
  }

  test("a checkpoint INSIDE a compacted gap resumes at the next surviving record") {
    import org.apache.spark.sql.streaming.Trigger
    val srv = new MiniKafkaServer(numPartitions = 1)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", srv.port, "t")
      val ckpt = java.nio.file.Files.createTempDirectory("gap-ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("gap-out").toString
      def drain(max: Option[Long]): Unit = {
        val r = spark.readStream.format("graft-kafka")
          .option("host", "localhost").option("port", srv.port.toString)
          .option("topic", "t")
        val q = max.fold(r)(m => r.option("maxOffsetsPerTrigger", m.toString))
          .load()
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }
      try {
        send(prod, "a" -> "a1") // 0
        send(prod, "b" -> "b1") // 1
        send(prod, "c" -> "c1") // 2
        drain(Some(1L)) // admission-capped run still drains ALL (3 batches)
        assert(spark.read.parquet(outDir).count() === 3L)
        // overwrite b and c; compact — the checkpoint's resume point 3
        // is fine, but offsets 1,2 below it become gaps and 3,4 arrive
        send(prod, "b" -> "b2", "c" -> "c2") // 3,4
        srv.compact("t", 0)
        drain(None)
        val keys = spark.read.parquet(outDir).select("key", "offset").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        assert(keys === Set(("a", 0L), ("b", 1L), ("c", 2L),
          ("b", 3L), ("c", 4L)))
      } finally prod.close()
    } finally srv.stop()
  }
}
