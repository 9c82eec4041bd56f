package graft

import graft.sources.KafkaWire
import org.scalacheck.{Gen, Prop, Properties, Test}

/** CHAOS pass on the REPLICATION state machine — the randomized
  * counterpart of KafkaReplicationSpec's scripted scenarios, the same
  * shape GroupChaosProperties gives the coordination protocol. Random
  * interleavings of acks=all produce / acks=1 produce / pause-
  * replication / resume+catch-up / fail-leader / revive over a
  * 2-broker RF=2 partition, asserting after every step (whenever the
  * partition has a live leader):
  *
  *  1. DURABILITY — every value ever acked under acks=all is present,
  *     in order, in the current leader's log AND in the consumer-
  *     visible range: clean elections (the only kind this walk
  *     performs) never lose acked-durable data, no matter where the
  *     failure lands;
  *  2. MONOTONIC READS — a drain from offset 0 is always an EXTENSION
  *     of the previous drain (the high watermark exists so a failover
  *     can never un-read something a consumer saw), and its length is
  *     exactly the high watermark;
  *  3. ISR COHERENCE — every in-sync replica's log is a prefix of the
  *     current leader's (a lagging-but-in-ISR follower is behind,
  *     never divergent), so any of them can take over cleanly.
  *
  * acks=1 values are deliberately unconstrained: they MAY be lost
  * (that is the contract), but only ever invisibly — invariant 2
  * guarantees no consumer observed a lost one. */
object ReplicationChaosProperties extends Properties("graft.replchaos") {

  // each case boots a 2-broker cluster (sockets + threads): 20
  // randomized walks of 10 ops on top of the scripted spec is plenty
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val u8 = java.nio.charset.StandardCharsets.UTF_8

  private sealed trait Op
  private final case class PAll(n: Int) extends Op
  private final case class P1(n: Int) extends Op
  private final case class Pause(b: Int) extends Op
  private final case class Resume(b: Int) extends Op
  private case object FailLeader extends Op
  private case object Revive extends Op
  private case object CleanElect extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.chooseNum(1, 5).map(PAll(_)),
    3 -> Gen.chooseNum(1, 5).map(P1(_)),
    2 -> Gen.chooseNum(0, 1).map(Pause(_)),
    2 -> Gen.chooseNum(0, 1).map(Resume(_)),
    2 -> Gen.const(FailLeader),
    2 -> Gen.const(Revive),
    2 -> Gen.const(CleanElect))

  private def isSubsequence(needle: Seq[String], hay: Seq[String]): Boolean = {
    var i = 0
    hay.foreach { h => if (i < needle.length && needle(i) == h) i += 1 }
    i == needle.length
  }

  property("random produce/pause/fail/revive walks never lose acked-durable data or un-read a consumed record") =
    Prop.forAll(Gen.listOfN(10, opGen)) { ops =>
      val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
        replicationFactor = 2)
      try {
        val topic = "t"; val P = 1 // leader broker 1, follower broker 0
        var seq = 0
        val durable = scala.collection.mutable.ArrayBuffer.empty[String]
        var lastVisible = Vector.empty[String]
        val dead = scala.collection.mutable.Set.empty[Int]
        var failure: Option[String] = None
        def check(cond: Boolean, msg: => String): Unit =
          if (failure.isEmpty && !cond) failure = Some(msg)

        def liveBootstrap: Int = cl.port((0 to 1).filterNot(dead).head)
        def leaderAlive: Boolean = !dead(cl.leaderOf(topic, P))

        def drainVisible(): Vector[String] = {
          val c = KafkaWire.leaderConn("localhost", liveBootstrap, topic, P)
          try {
            val f = new KafkaWire.GrowingFetcher(c, topic, P)
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var off = 0L; var done = false
            while (!done) {
              val (recs, hw) = f.fetchAt(off)
              if (recs.isEmpty) done = true
              else {
                out ++= recs.map(r => new String(r.value, u8))
                off = recs.last.offset + 1; done = off >= hw
              }
            }
            out.toVector
          } finally c.close()
        }

        def produceOnce(acks: Int, n: Int): Unit = if (leaderAlive) {
          val vals = (0 until n).map { _ => seq += 1; s"v$seq" }
          val c = KafkaWire.leaderConn("localhost", liveBootstrap, topic, P)
          try {
            try {
              KafkaWire.produce(c, topic, P,
                vals.map(v => (v.getBytes(u8), v.getBytes(u8))), 1L,
                acks = acks)
              if (acks == -1) durable ++= vals
            } catch {
              // a refusal appends NOTHING — legal whenever the ISR is
              // thin; the invariants below confirm nothing leaked
              case _: KafkaWire.NotEnoughReplicasException =>
            }
          } finally c.close()
        }

        // 4. EPOCH MONOTONICITY — the wire-visible fencing token
        // (KIP-320) never goes backwards, and every leadership change
        // is a NEW epoch: a client pinned to an old regime can always
        // be told apart from a current one
        var lastEpoch = cl.leaderEpochOf(topic, P)
        var lastLeader = cl.leaderOf(topic, P)
        def checkEpoch(): Unit = if (failure.isEmpty) {
          val e = cl.leaderEpochOf(topic, P)
          val l = cl.leaderOf(topic, P)
          check(e >= lastEpoch,
            s"leader epoch went BACKWARDS: $lastEpoch -> $e")
          check(l == lastLeader || e > lastEpoch,
            s"leadership moved $lastLeader -> $l without an epoch bump ($e)")
          lastEpoch = e; lastLeader = l
        }

        def checkInvariants(): Unit =
          if (leaderAlive && failure.isEmpty) {
            val leader = cl.leaderOf(topic, P)
            val leaderVals =
              cl.storedAt(leader, topic, P).map(r => new String(r.value, u8))
            check(isSubsequence(durable.toSeq, leaderVals),
              s"acks=all values missing from leader $leader: " +
                s"durable=$durable leader=$leaderVals")
            cl.isrOf(topic, P).foreach { b =>
              val vals =
                cl.storedAt(b, topic, P).map(r => new String(r.value, u8))
              check(vals == leaderVals.take(vals.length),
                s"ISR member $b diverged from leader $leader: " +
                  s"$vals vs $leaderVals")
            }
            val vis = drainVisible()
            check(vis.length.toLong == cl.highWatermark(topic, P),
              s"visible ${vis.length} != HW ${cl.highWatermark(topic, P)}")
            check(vis.take(lastVisible.length) == lastVisible,
              s"NON-REPEATABLE READ: previously saw $lastVisible, now $vis")
            check(isSubsequence(durable.toSeq, vis),
              s"acks=all values not consumer-visible: durable=$durable " +
                s"visible=$vis")
            lastVisible = vis
          }

        produceOnce(-1, 3) // every walk starts with durable seed data
        checkInvariants()
        ops.foreach { op =>
          if (failure.isEmpty) {
            op match {
              case PAll(n) => produceOnce(-1, n)
              case P1(n) => produceOnce(1, n)
              case Pause(b) => if (!dead(b)) cl.pauseReplication(b)
              case Resume(b) => if (!dead(b)) cl.resumeReplication(b)
              case FailLeader =>
                val l = cl.leaderOf(topic, P)
                // keep one broker alive: it is the bootstrap for
                // metadata (and a real operator would not chaos-test
                // a fully dead cluster's read path)
                if (!dead(l) && dead.isEmpty) { cl.failBroker(l); dead += l }
              case Revive =>
                dead.headOption.foreach { b =>
                  cl.reviveBroker(b); dead -= b
                }
              case CleanElect =>
                // a planned leadership move (preferred-leader election /
                // broker drain): any live ISR member may take over
                // without loss — the invariants below prove it
                val l = cl.leaderOf(topic, P)
                cl.isrOf(topic, P).filter(b => b != l && !dead(b))
                  .headOption.foreach(nl => cl.moveLeader(topic, P, nl))
            }
            checkEpoch()
            checkInvariants()
          }
        }
        // settle: revive + catch everything up — the walk must end
        // with every replica healthy and every durable value served
        if (failure.isEmpty) {
          dead.toSeq.foreach { b => cl.reviveBroker(b); dead -= b }
          (0 to 1).foreach(cl.resumeReplication)
          checkInvariants()
          check(cl.isrOf(topic, P) == Set(0, 1),
            s"full recovery must restore the ISR, got ${cl.isrOf(topic, P)}")
        }
        failure match {
          case None => Prop.passed
          case Some(msg) => Prop.falsified :| msg
        }
      } finally cl.stop()
    }

  /** The CONCURRENT walk: a producer thread hammers the partition
    * (alternating acks=all / acks=1, retrying through NOT_LEADER and
    * dead sockets) WHILE the main thread injects pauses, resumes,
    * leader failures, revivals, and clean elections. This is the walk
    * the election monitor exists for — without it an append in flight
    * on a deposed leader could interleave with the flip and diverge
    * the replicas. Invariants, observed live from the main thread:
    * drains stay extension-monotonic (no consumer ever un-reads), and
    * every acks=all value acked BEFORE a drain started is in that
    * drain, in order. At settle: full recovery, every durable value
    * served. */
  property("a producer racing elections, failures, and revivals never loses acked-durable data or breaks monotonic reads") =
    Prop.forAll(Gen.listOfN(8, Gen.frequency(
      2 -> Gen.chooseNum(0, 1).map(Pause(_)),
      2 -> Gen.chooseNum(0, 1).map(Resume(_)),
      2 -> Gen.const(FailLeader),
      2 -> Gen.const(Revive),
      2 -> Gen.const(CleanElect)))) { ops =>
      val cl = new MiniKafkaCluster(numBrokers = 2, numPartitions = 2,
        replicationFactor = 2)
      try {
        val topic = "t"; val P = 1
        val dead = scala.collection.mutable.Set.empty[Int]
        @volatile var bootstrap = cl.port(0)
        val durable = new java.util.concurrent.CopyOnWriteArrayList[String]()
        @volatile var stop = false
        var failure: Option[String] = None
        def check(cond: Boolean, msg: => String): Unit =
          if (failure.isEmpty && !cond) failure = Some(msg)

        def tryProduce(acks: Int, vals: Seq[String]): Boolean = {
          var attempts = 0
          while (attempts < 200 && !stop) {
            attempts += 1
            try {
              val c = KafkaWire.leaderConn("localhost", bootstrap, topic, P)
              try {
                KafkaWire.produce(c, topic, P,
                  vals.map(v => (v.getBytes(u8), v.getBytes(u8))), 1L,
                  acks = acks)
                return true
              } finally c.close()
            } catch {
              // refused cleanly: nothing appended, nothing to track
              case _: KafkaWire.NotEnoughReplicasException => return false
              // mid-election / dead socket: refresh and retry — the
              // broker-side idempotence is not engaged here, so a
              // post-append ambiguity duplicates (at-least-once), which
              // the subsequence invariants tolerate by design
              case _: KafkaWire.NotLeaderException => Thread.sleep(5)
              case _: java.io.IOException => Thread.sleep(5)
            }
          }
          false
        }

        val seq = new java.util.concurrent.atomic.AtomicInteger(0)
        val producer = new Thread(() => {
          var acksAll = true
          while (!stop) {
            val vals = (1 to 2).map(_ => s"v${seq.incrementAndGet()}")
            val acked = tryProduce(if (acksAll) -1 else 1, vals)
            // only an ACKED acks=all batch is durable by contract
            if (acksAll && acked) vals.foreach(durable.add)
            acksAll = !acksAll
          }
        }, "graft-chaos-producer")
        producer.setDaemon(true)

        var lastVisible = Vector.empty[String]
        def drainVisible(): Option[Vector[String]] = {
          var attempts = 0
          while (attempts < 100) {
            attempts += 1
            try {
              val c = KafkaWire.leaderConn("localhost", bootstrap, topic, P)
              try {
                val f = new KafkaWire.GrowingFetcher(c, topic, P)
                val out = scala.collection.mutable.ArrayBuffer.empty[String]
                var off = 0L; var done = false
                while (!done) {
                  val (recs, hw) = f.fetchAt(off)
                  if (recs.isEmpty) done = true
                  else {
                    out ++= recs.map(r => new String(r.value, u8))
                    off = recs.last.offset + 1; done = off >= hw
                  }
                }
                return Some(out.toVector)
              } finally c.close()
            } catch {
              case _: KafkaWire.NotLeaderException => Thread.sleep(5)
              case _: java.io.IOException => Thread.sleep(5)
            }
          }
          None
        }

        // epoch monotonicity holds under CONCURRENT traffic too
        var lastEpoch = cl.leaderEpochOf(topic, P)
        var lastLeader = cl.leaderOf(topic, P)
        def checkEpoch(): Unit = if (failure.isEmpty) {
          val e = cl.leaderEpochOf(topic, P)
          val l = cl.leaderOf(topic, P)
          check(e >= lastEpoch,
            s"leader epoch went BACKWARDS: $lastEpoch -> $e")
          check(l == lastLeader || e > lastEpoch,
            s"leadership moved $lastLeader -> $l without an epoch bump ($e)")
          lastEpoch = e; lastLeader = l
        }

        def checkLive(): Unit = if (failure.isEmpty && !dead(cl.leaderOf(topic, P))) {
          import scala.jdk.CollectionConverters._
          // snapshot durable BEFORE the drain: everything acked by now
          // must be in what we read next (later acks may also appear)
          val snap = durable.iterator().asScala.toVector
          drainVisible().foreach { vis =>
            check(vis.take(lastVisible.length) == lastVisible,
              s"NON-REPEATABLE READ: had ${lastVisible.length} rows, " +
                s"new drain diverges")
            check(isSubsequence(snap, vis),
              s"acks=all values missing from a drain: durable=${snap.length} " +
                s"visible=${vis.length}")
            lastVisible = vis
          }
        }

        producer.start()
        Thread.sleep(50) // let some produce traffic land first
        ops.foreach { op =>
          if (failure.isEmpty) {
            op match {
              case Pause(b) => if (!dead(b)) cl.pauseReplication(b)
              case Resume(b) => if (!dead(b)) cl.resumeReplication(b)
              case FailLeader =>
                val l = cl.leaderOf(topic, P)
                if (!dead(l) && dead.isEmpty) {
                  cl.failBroker(l); dead += l
                  bootstrap = cl.port(1 - l)
                }
              case Revive =>
                dead.headOption.foreach { b =>
                  cl.reviveBroker(b); dead -= b
                  bootstrap = cl.port(0)
                }
              case CleanElect =>
                val l = cl.leaderOf(topic, P)
                cl.isrOf(topic, P).filter(b => b != l && !dead(b))
                  .headOption.foreach(nl => cl.moveLeader(topic, P, nl))
              case _ => // produce ops not used in the concurrent walk
            }
            Thread.sleep(20) // let the producer race the new state
            checkEpoch()
            checkLive()
          }
        }
        // settle: stop the producer, recover everything, final audit
        stop = true
        producer.join(5000)
        if (failure.isEmpty) {
          dead.toSeq.foreach { b => cl.reviveBroker(b); dead -= b }
          (0 to 1).foreach(cl.resumeReplication)
          bootstrap = cl.port(0)
          import scala.jdk.CollectionConverters._
          val snap = durable.iterator().asScala.toVector
          drainVisible() match {
            case Some(vis) =>
              check(vis.take(lastVisible.length) == lastVisible,
                "settle drain un-read previously visible rows")
              check(isSubsequence(snap, vis),
                s"settled log lost acks=all values: durable=${snap.length} " +
                  s"visible=${vis.length}")
            case None => check(cond = false, "settled cluster would not serve a drain")
          }
          check(cl.isrOf(topic, P) == Set(0, 1),
            s"full recovery must restore the ISR, got ${cl.isrOf(topic, P)}")
        }
        failure match {
          case None => Prop.passed
          case Some(msg) => Prop.falsified :| msg
        }
      } finally cl.stop()
    }
}
