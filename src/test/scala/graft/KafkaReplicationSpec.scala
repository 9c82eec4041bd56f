package graft

import graft.sources.KafkaWire

/** REPLICATION on the multi-broker double: the durability contract a
  * real producer relies on when a broker dies holding unreplicated
  * data (r15 verdict #1 — the one place the multi-broker story
  * stopped short of the protocol it emulates). With
  * `replicationFactor` > 1 each broker holds an INDEPENDENT copy of
  * the partitions it replicates, so the contracts here are real, not
  * shared-state artifacts:
  *
  *  - acks=all is not acked until every in-sync replica persisted the
  *    batch → a clean leader failover loses NOTHING that was acked;
  *  - acks=1 acks on the leader alone → a record acked inside the
  *    replication-lag window dies with the leader (the documented
  *    loss window) — and because consumers are bounded by the HIGH
  *    WATERMARK (min log-end over the ISR), no consumer ever saw it:
  *    the loss is silent, never a non-repeatable read;
  *  - min.insync.replicas gates acks=all: too few in-sync copies →
  *    NOT_ENOUGH_REPLICAS, nothing appended — durability refused
  *    loudly, never silently downgraded;
  *  - a clean election only promotes ISR members; promoting a lagging
  *    replica must be explicit (allowUnclean), as
  *    unclean.leader.election.enable documents the same loss;
  *  - a revived broker runs follower recovery: any divergent suffix
  *    (its own acked-under-acks=1 tail) is TRUNCATED to the new
  *    leader's log — the loss is permanent and consistent everywhere;
  *  - transaction markers, LSO pins, aborted ranges, and producer
  *    sequence state REPLICATE, so a failed-over partition keeps its
  *    read_committed and idempotence behavior.
  *
  * Topology note: every spec works on partition 1 (leader broker 1,
  * follower broker 0 under the round-robin assignment), so broker 0 —
  * the bootstrap and group coordinator — survives the failovers. */
class KafkaReplicationSpec extends SparkSuite {

  private val u8 = java.nio.charset.StandardCharsets.UTF_8

  private def kv(s: String): (Array[Byte], Array[Byte]) =
    (s.getBytes(u8), s.getBytes(u8))

  /** Drain partition `p` from offset 0 through a fresh leader-routed
    * fetcher; returns the record values in order. */
  private def drain(bootstrapPort: Int, topic: String, p: Int,
      isolation: Int = KafkaWire.Isolation.ReadUncommitted): Seq[String] = {
    val c = KafkaWire.leaderConn("localhost", bootstrapPort, topic, p)
    try {
      val fetcher = new KafkaWire.GrowingFetcher(c, topic, p, isolation)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var off = 0L
      var done = false
      while (!done) {
        val (recs, wm) = fetcher.fetchAt(off)
        if (recs.isEmpty) done = true
        else {
          out ++= recs.map(r => new String(r.value, u8))
          off = recs.last.offset + 1
          done = off >= wm
        }
      }
      out.toSeq
    } finally c.close()
  }

  test("acks=all: a leader dying after the ack loses nothing — the new leader serves every acked record") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", idempotent = true, acks = "all")
      try {
        prod.send(1, (0 until 20).map(i => kv(s"a$i")), 1L)
        // the ack means BOTH replicas persisted it
        assert(cl.storedAt(0, "t", 1).length === 20)
        assert(cl.storedAt(1, "t", 1).length === 20)
        // ...and the duplicates-on-retry oracle counts ONE produce:
        // the follower's replication copy is not a second append
        assert(cl.servers(1).producesAppended.get === 1)
        assert(cl.isrOf("t", 1) === Set(0, 1))
        assert(cl.highWatermark("t", 1) === 20L)

        // the leader dies; the clean election promotes the in-sync
        // follower
        assert(cl.leaderOf("t", 1) === 1)
        cl.failBroker(1)
        assert(cl.leaderOf("t", 1) === 0)

        // every acked record is served by the new leader, same offsets
        val got = drain(cl.port(0), "t", 1)
        assert(got === (0 until 20).map(i => s"a$i"))

        // the SAME idempotent producer continues: its pid/sequence
        // state was replicated with the batches, so the new leader
        // accepts the next batch in sequence (no OutOfOrderSequence)
        prod.send(1, (0 until 10).map(i => kv(s"b$i")), 2L)
        assert(drain(cl.port(0), "t", 1) ===
          (0 until 20).map(i => s"a$i") ++ (0 until 10).map(i => s"b$i"))
      } finally prod.close()
    } finally cl.stop()
  }

  test("acks=1: records acked inside the replication-lag window die with the leader — and no consumer ever saw them") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", acks = "1")
      try {
        prod.send(1, (0 until 10).map(i => kv(s"a$i")), 1L)
        assert(cl.storedAt(0, "t", 1).length === 10)

        // the follower's replication fetch stalls — it STAYS in the
        // ISR (the window before replica.lag.time.max.ms fires)
        cl.pauseReplication(0)
        prod.send(1, (0 until 5).map(i => kv(s"b$i")), 2L) // acked!
        assert(cl.storedAt(1, "t", 1).length === 15, "leader acked 15")
        assert(cl.storedAt(0, "t", 1).length === 10, "follower missed 5")
        assert(cl.isrOf("t", 1) === Set(0, 1), "laggard still in ISR")

        // the HIGH WATERMARK protects consumers: the 5 acked-but-
        // unreplicated records are NOT served — a read above the HW
        // could be unwritten by a failover (a non-repeatable read)
        assert(cl.highWatermark("t", 1) === 10L)
        assert(drain(cl.port(0), "t", 1) === (0 until 10).map(i => s"a$i"))

        // the leader dies inside the window; the lagging follower is
        // still in the ISR, so the election is CLEAN — and the 5
        // acked records are gone. This is the loss acks=1 accepts.
        cl.failBroker(1)
        assert(cl.leaderOf("t", 1) === 0)
        assert(drain(cl.port(0), "t", 1) === (0 until 10).map(i => s"a$i"))
        assert(cl.stored("t", 1).length === 10)

        // the old leader revives and runs follower recovery: its
        // 5-record divergent suffix is TRUNCATED to the new leader's
        // log — the loss is permanent and consistent on every replica
        cl.reviveBroker(1)
        assert(cl.storedAt(1, "t", 1).map(r => new String(r.value, u8)) ===
          (0 until 10).map(i => s"a$i"))
        assert(cl.isrOf("t", 1) === Set(0, 1))

        // replication continues on the new regime: the revived broker
        // follows the new leader
        prod.send(1, (0 until 3).map(i => kv(s"c$i")), 3L)
        val expect = (0 until 10).map(i => s"a$i") ++ (0 until 3).map(i => s"c$i")
        assert(cl.storedAt(0, "t", 1).map(r => new String(r.value, u8)) === expect)
        assert(cl.storedAt(1, "t", 1).map(r => new String(r.value, u8)) === expect)
        assert(cl.highWatermark("t", 1) === 13L)
      } finally prod.close()
    } finally cl.stop()
  }

  test("min.insync.replicas: acks=all is REFUSED when too few in-sync copies can take the write") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2, minInsyncReplicas = 2)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", acks = "all")
      try {
        prod.send(1, (0 until 10).map(i => kv(s"a$i")), 1L)

        // the follower lags; an acks=all produce first collapses the
        // lag detection (the laggard leaves the ISR), then refuses:
        // 1 in-sync copy < min.insync.replicas 2 — NOTHING appended
        cl.pauseReplication(0)
        val e = intercept[KafkaWire.NotEnoughReplicasException] {
          prod.send(1, (0 until 5).map(i => kv(s"b$i")), 2L)
        }
        assert(e.partition === 1)
        assert(cl.stored("t", 1).length === 10, "refusal appends nothing")
        assert(cl.isrOf("t", 1) === Set(1), "the laggard was shrunk out")

        // catch-up restores the ISR and the write path
        cl.resumeReplication(0)
        assert(cl.isrOf("t", 1) === Set(0, 1))
        prod.send(1, (0 until 5).map(i => kv(s"b$i")), 2L)
        assert(cl.storedAt(0, "t", 1).length === 15)
        assert(cl.storedAt(1, "t", 1).length === 15)
      } finally prod.close()
    } finally cl.stop()
  }

  test("elections are clean by default: promoting an out-of-sync replica must say allowUnclean") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", acks = "all")
      val prod1 = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", acks = "1")
      try {
        prod.send(1, (0 until 10).map(i => kv(s"a$i")), 1L)
        cl.pauseReplication(0)
        prod1.send(1, (0 until 5).map(i => kv(s"b$i")), 2L) // window opens
        // an acks=all produce shrinks the laggard out of the ISR
        // (minInsync = 1, so it then proceeds on the leader alone) —
        // and the HW advances past the follower's end
        prod.send(1, (0 until 2).map(i => kv(s"c$i")), 3L)
        assert(cl.isrOf("t", 1) === Set(1))
        assert(cl.highWatermark("t", 1) === 17L)

        // broker 0 is now OUT of sync: a clean election refuses it
        val e = intercept[IllegalArgumentException] {
          cl.moveLeader("t", 1, 0)
        }
        assert(e.getMessage.contains("ISR") &&
          e.getMessage.contains("allowUnclean"))
        // ...and the explicit unclean election documents the loss:
        // the new leader's log ends at 10, the ISR collapses to it
        // (nothing else is in sync with the new truth), and the 7
        // acked records on the deposed leader are gone
        cl.moveLeader("t", 1, 0, allowUnclean = true)
        assert(cl.isrOf("t", 1) === Set(0))
        assert(cl.highWatermark("t", 1) === 10L)
        assert(drain(cl.port(0), "t", 1) === (0 until 10).map(i => s"a$i"))
        // the deposed leader re-enters as a follower: recovery
        // truncates its divergent suffix to the new leader's log
        cl.resumeReplication(1)
        assert(cl.storedAt(1, "t", 1).map(r => new String(r.value, u8)) ===
          (0 until 10).map(i => s"a$i"))
        assert(cl.isrOf("t", 1) === Set(0, 1))
      } finally { prod.close(); prod1.close() }
    } finally cl.stop()
  }

  test("transactions replicate: LSO pins, markers, and aborted ranges survive a leader failover") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      def txn(tid: String) = new KafkaWire.RetryingProducer("localhost",
        cl.port(0), "t", idempotent = true, transactionalId = tid,
        acks = "all")
      val pa = txn("txA")
      try {
        pa.beginTransaction()
        pa.send(1, (0 until 3).map(i => kv(s"a$i")), 1L)
        pa.commitTransaction() // offsets 0-2 + marker 3
      } finally pa.close()
      val pb = txn("txB")
      try {
        pb.beginTransaction()
        pb.send(1, (0 until 2).map(i => kv(s"b$i")), 2L)
        pb.abortTransaction() // offsets 4-5 + abort marker 6
      } finally pb.close()
      val pc = txn("txC")
      try {
        pc.beginTransaction()
        pc.send(1, (0 until 2).map(i => kv(s"c$i")), 3L) // OPEN: pins LSO at 7
        // both replicas agree on the stable horizon BEFORE failover
        assert(cl.servers(1).lastStable("t", 1) === 7L)
        assert(cl.servers(0).lastStable("t", 1) === 7L)

        cl.failBroker(1)
        assert(cl.leaderOf("t", 1) === 0)
        // the follower-turned-leader enforces the full transactional
        // read contract from ITS OWN replayed state: committed rows
        // only, the aborted range filtered, the open transaction's
        // rows held behind the LSO
        assert(drain(cl.port(0), "t", 1,
          KafkaWire.Isolation.ReadCommitted) === Seq("a0", "a1", "a2"))
        // resolving the transaction against the NEW leader releases it
        pc.commitTransaction()
        assert(drain(cl.port(0), "t", 1,
          KafkaWire.Isolation.ReadCommitted) ===
          Seq("a0", "a1", "a2", "c0", "c1"))
      } finally pc.close()
    } finally cl.stop()
  }

  test("the DSv2 sink's acks option reaches the wire, and an RF=2 cluster serves the source after failover") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      import spark.implicits._
      (1 to 100).map(i => (s"key$i", s"val$i")).toDF("key", "value")
        .repartition(4)
        .write.format("graft-kafka")
        .option("host", "localhost").option("port", cl.port(0).toString)
        .option("topic", "t").option("acks", "all")
        .mode("append").save()
      // acked under acks=all → on BOTH replicas of both partitions
      (0 until 2).foreach { p =>
        assert(cl.storedAt(0, "t", p).length === cl.storedAt(1, "t", p).length)
      }
      val before = spark.read.format("graft-kafka")
        .option("host", "localhost").option("port", cl.port(0).toString)
        .option("topic", "t").load()
        .select("key").as[String].collect().toSet
      assert(before === (1 to 100).map(i => s"key$i").toSet)

      // the broker leading partition 1 dies — every acked record is
      // still readable through the source (leader-routed readers
      // resolve the new leader from fresh metadata)
      cl.failBroker(1)
      val after = spark.read.format("graft-kafka")
        .option("host", "localhost").option("port", cl.port(0).toString)
        .option("topic", "t").load()
        .select("key").as[String].collect().toSet
      assert(after === before, "acks=all + clean failover loses nothing")

      // a bad acks value fails at PLAN time, loudly
      val e = intercept[IllegalArgumentException] {
        Seq(("k", "v")).toDF("key", "value")
          .write.format("graft-kafka")
          .option("host", "localhost").option("port", cl.port(0).toString)
          .option("topic", "t").option("acks", "2")
          .mode("append").save()
      }
      assert(e.getMessage.contains("acks"))
    } finally cl.stop()
  }
  test("a consumer group rides through a leader failover: committed positions stay valid, nothing lost or replayed") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", idempotent = true, acks = "all")
      try {
        (0 until 2).foreach(p =>
          prod.send(p, (0 until 10).map(i => kv(s"r1-$p-$i")), 1L))
        // first coordinated poll: everything, committed through the
        // group (the coordinator — broker 0 — survives the failover)
        val r1 = graft.sources.KafkaGroup.pollGroup(spark, "localhost",
          cl.port(0), "t", "gfail")
        assert(r1.count() === 20L)

        // partition 1's leader dies; its data was acked under acks=all
        // so the follower-turned-leader holds every committed-past row
        cl.failBroker(1)
        assert(cl.leaderOf("t", 1) === 0)
        (0 until 2).foreach(p =>
          prod.send(p, (0 until 5).map(i => kv(s"r2-$p-$i")), 2L))

        // the next poll joins fresh, routes p1's drain to the NEW
        // leader, and resumes from the group's committed positions —
        // exactly the new rows, nothing lost, nothing replayed
        val r2 = graft.sources.KafkaGroup.pollGroup(spark, "localhost",
          cl.port(0), "t", "gfail")
        assert(r2.select("value").collect().map(_.getString(0)).toSet ===
          (for (p <- 0 until 2; i <- 0 until 5) yield s"r2-$p-$i").toSet)
        assert(graft.sources.KafkaGroup.pollGroup(spark, "localhost",
          cl.port(0), "t", "gfail").count() === 0L)
      } finally prod.close()
    } finally cl.stop()
  }

  test("the checkpointed streaming source resumes exactly-once across a leader failover") {
    import org.apache.spark.sql.streaming.Trigger
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", idempotent = true, acks = "all")
      try {
        val ckpt = java.nio.file.Files.createTempDirectory("gkr-ckpt").toString
        val outDir = java.nio.file.Files.createTempDirectory("gkr-out").toString
        def runOnce(): Unit = {
          val q = spark.readStream.format("graft-kafka")
            .option("host", "localhost").option("port", cl.port(0).toString)
            .option("topic", "t").load()
            .writeStream.format("parquet")
            .option("path", outDir)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.processAllAvailable(); q.stop()
        }
        (0 until 2).foreach(p =>
          prod.send(p, (0 until 10).map(i => kv(s"r1-$p-$i")), 1L))
        runOnce()
        assert(spark.read.parquet(outDir).count() === 20L)

        // the broker leading p1 dies BETWEEN micro-batches: the
        // checkpointed offsets stay valid (acks=all data is byte-
        // complete on the new leader at the same offsets), and the
        // next batch's readers re-resolve leadership from metadata
        cl.failBroker(1)
        (0 until 2).foreach(p =>
          prod.send(p, (0 until 5).map(i => kv(s"r2-$p-$i")), 2L))
        runOnce()
        val all = spark.read.parquet(outDir).collect()
        assert(all.length === 30, "exactly once across the failover")
        assert(all.map(_.getAs[String]("value")).toSet ===
          ((for (p <- 0 until 2; i <- 0 until 10) yield s"r1-$p-$i") ++
            (for (p <- 0 until 2; i <- 0 until 5) yield s"r2-$p-$i")).toSet)
        // broker-real offsets, contiguous per partition — no gap, no
        // replay, across the leadership change
        all.groupBy(_.getAs[Int]("partition")).foreach { case (_, rows) =>
          val offs = rows.map(_.getAs[Long]("offset")).sorted.toSeq
          assert(offs === (0L until offs.length).toSeq)
        }
      } finally prod.close()
    } finally cl.stop()
  }

  test("compaction is per-replica: failover to a less-compacted follower serves a superset with identical latest-per-key state") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", idempotent = true, acks = "all")
      try {
        // three keyed rounds: 15 records, the last 5 are each key's
        // latest — acked on both replicas
        (1 to 3).foreach { r =>
          prod.send(1, (0 until 5).map(k =>
            (s"k$k".getBytes(u8), s"r$r-k$k".getBytes(u8))), r.toLong)
        }
      } finally prod.close()
      def kvDrain(): Seq[(String, String)] = {
        val c = KafkaWire.leaderConn("localhost", cl.port(0), "t", 1)
        try {
          val f = new KafkaWire.GrowingFetcher(c, "t", 1)
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var off = 0L; var done = false
          while (!done) {
            val (recs, hw) = f.fetchAt(off)
            if (recs.isEmpty) done = true
            else {
              out ++= recs.map(r =>
                (new String(r.key, u8), new String(r.value, u8)))
              off = recs.last.offset + 1; done = off >= hw
            }
          }
          out.toSeq
        } finally c.close()
      }
      def latest(kvs: Seq[(String, String)]): Map[String, String] =
        kvs.foldLeft(Map.empty[String, String])(_ + _)
      val want = (0 until 5).map(k => s"k$k" -> s"r3-k$k").toMap

      // the LEADER cleans its own segments (real cleaners run per
      // broker, asynchronously): its consumers cross the gaps and see
      // exactly each key's survivor
      cl.servers(1).compact("t", 1)
      val compacted = kvDrain()
      assert(compacted.length === 5)
      assert(latest(compacted) === want)

      // failover to the UNCOMPACTED follower: it serves a superset
      // (the duplicates its cleaner has not removed yet — exactly what
      // a real mixed-progress failover does), and replaying
      // latest-per-key lands in the IDENTICAL state
      cl.failBroker(1)
      val full = kvDrain()
      assert(full.length === 15, "the follower's cleaner has not run")
      assert(latest(full) === want)

      // the new leader cleans independently and converges to the same
      // 5 survivors
      cl.servers(0).compact("t", 1)
      val recompacted = kvDrain()
      assert(recompacted.length === 5)
      assert(latest(recompacted) === want)
    } finally cl.stop()
  }

  test("ListOffsets never admits a consumer past the high watermark") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", acks = "1")
      try {
        prod.send(1, (0 until 10).map(i => kv(s"a$i")), 100L)
        cl.pauseReplication(0)
        prod.send(1, (0 until 5).map(i => kv(s"b$i")), 200L) // above HW
        val c = KafkaWire.leaderConn("localhost", cl.port(0), "t", 1)
        try {
          // "latest" is the HW, not the leader's log end — an admission
          // window past it could include records a failover unwrites
          assert(KafkaWire.listOffset(c, "t", 1, -1L) === 10L)
          // a timestamp lookup matching only above-HW records answers
          // "no such offset" (-1), same as nothing-that-new
          assert(KafkaWire.listOffset(c, "t", 1, 200L) === -1L)
          // at/below the HW the time index answers normally
          assert(KafkaWire.listOffset(c, "t", 1, 100L) === 0L)
          assert(KafkaWire.listOffset(c, "t", 1, -2L) === 0L)
        } finally c.close()
        // catch-up closes the window: latest advances with the HW
        cl.resumeReplication(0)
        val c2 = KafkaWire.leaderConn("localhost", cl.port(0), "t", 1)
        try {
          assert(KafkaWire.listOffset(c2, "t", 1, -1L) === 15L)
          assert(KafkaWire.listOffset(c2, "t", 1, 200L) === 10L)
        } finally c2.close()
      } finally prod.close()
    } finally cl.stop()
  }

  test("RF=3 broker death: the elected survivor may be the shortest in-sync log — longer survivors truncate to it") {
    // partition 1's assignment is [1, 2, 0]; broker 0 lags (paused,
    // still in the ISR) while broker 2 replicates. When leader 1 dies,
    // the election picks the lowest-id live ISR member — broker 0, the
    // SHORT log — and broker 2's later appends (acks=1, above the HW,
    // never consumer-visible) must truncate to the new leader, exactly
    // like any clean handover.
    val cl = new MiniKafkaCluster(numBrokers = 3, numPartitions = 3,
      replicationFactor = 3)
    try {
      val prod = new KafkaWire.RetryingProducer("localhost", cl.port(0),
        "t", acks = "1")
      try {
        prod.send(1, (0 until 10).map(i => kv(s"a$i")), 1L)
        cl.pauseReplication(0)
        prod.send(1, (0 until 5).map(i => kv(s"b$i")), 2L)
        assert(cl.storedAt(1, "t", 1).length === 15)
        assert(cl.storedAt(2, "t", 1).length === 15)
        assert(cl.storedAt(0, "t", 1).length === 10)
        assert(cl.isrOf("t", 1) === Set(0, 1, 2))
        assert(cl.highWatermark("t", 1) === 10L, "the lagging ISR member pins the HW")

        cl.failBroker(1)
        assert(cl.leaderOf("t", 1) === 0)
        // broker 2's divergent suffix truncated at election time — the
        // next produce replicates cleanly instead of crashing on a
        // divergence check
        assert(cl.storedAt(2, "t", 1).length === 10)
        prod.send(1, (0 until 3).map(i => kv(s"c$i")), 3L)
        val expect = (0 until 10).map(i => s"a$i") ++ (0 until 3).map(i => s"c$i")
        assert(cl.storedAt(0, "t", 1).map(r => new String(r.value, u8)) === expect)
        assert(cl.storedAt(2, "t", 1).map(r => new String(r.value, u8)) === expect)
      } finally prod.close()
    } finally cl.stop()
  }

  test("a revived bootstrap broker serves on its new listener, and revival clears a pre-death replication stall") {
    val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
      replicationFactor = 2)
    try {
      val port0 = cl.bootstrapPort
      val prod0 = new KafkaWire.RetryingProducer("localhost", cl.port(1),
        "t", acks = "all")
      try prod0.send(0, (0 until 5).map(i => kv(s"a$i")), 1L)
      finally prod0.close()

      // broker 0 was ALSO paused before dying: a restarted broker's
      // fetcher is not stalled, so revival must clear the pause — or
      // it would rejoin the ISR yet miss every append, pinning the HW
      cl.pauseReplication(0)
      cl.failBroker(0)
      cl.reviveBroker(0)
      assert(cl.bootstrapPort !== port0,
        "bootstrapPort must follow the revived broker 0 to its new listener")
      // bootstrap through the NEW listener works end to end
      val prod = new KafkaWire.RetryingProducer("localhost", cl.bootstrapPort,
        "t", acks = "1")
      try {
        // p0's leadership moved to broker 1 at the death; the revived
        // broker follows it — and actually receives the replication
        prod.send(0, (0 until 5).map(i => kv(s"b$i")), 2L)
        val expect = (0 until 5).map(i => s"a$i") ++ (0 until 5).map(i => s"b$i")
        assert(cl.storedAt(0, "t", 0).map(r => new String(r.value, u8)) === expect)
        assert(cl.storedAt(1, "t", 0).map(r => new String(r.value, u8)) === expect)
        assert(cl.highWatermark("t", 0) === 10L)
      } finally prod.close()
    } finally cl.stop()
  }
}
