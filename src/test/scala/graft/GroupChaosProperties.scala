package graft

import graft.sources.{KafkaGroup, KafkaWire}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** CHAOS pass on the group-coordination state machine (r15 verdict
  * #6): the assignors have model-checked properties
  * (GroupAssignProperties), but the PROTOCOL — join barriers,
  * generations, evictions, fenced commits — only had scripted
  * single-fault specs. This drives randomized interleavings of
  * join / graceful-leave / session-timeout / produce / poll /
  * zombie-commit over 2–4 members against one live broker double
  * (real TCP, real barrier parking) and asserts the three safety
  * invariants after every membership change:
  *
  *  1. the stable generation's assignments are DISJOINT and
  *     EXHAUSTIVE over the topic's partitions, and every live member
  *     agrees on the generation;
  *  2. a commit carrying a SUPERSEDED generation (or an evicted
  *     member id) is fenced loudly and moves NO offsets;
  *  3. across every committed handover, NO record is lost and NONE is
  *     double-consumed: per partition, the offsets consumed by
  *     successful polls over the whole run are exactly
  *     0 until (number produced), each exactly once.
  *
  * One broker double serves every case (fresh topic + group per case);
  * members use JoinGroup v1 (long sessions, short rebalance deadline)
  * so a run never stalls on a coupled timeout. */
object GroupChaosProperties extends Properties("graft.groupchaos") {

  // real-TCP joins per case are milliseconds, but 100 cases x ~8 ops
  // adds up — 25 randomized interleavings is plenty on top of the
  // scripted specs
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val u8 = java.nio.charset.StandardCharsets.UTF_8
  private val state = new KafkaClusterState
  private val srv = new MiniKafkaServer(numPartitions = 4, serveFormat = 2,
    state = state)
  private val caseIds = new java.util.concurrent.atomic.AtomicInteger(0)

  private sealed trait Op
  private case object Join extends Op
  private final case class Leave(k: Int) extends Op
  private final case class Timeout(k: Int) extends Op
  private final case class Poll(k: Int) extends Op
  private final case class Produce(p: Int, n: Int) extends Op
  private final case class ZombieCommit(k: Int) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.const(Join),
    2 -> Gen.chooseNum(0, 3).map(Leave(_)),
    2 -> Gen.chooseNum(0, 3).map(Timeout(_)),
    4 -> Gen.chooseNum(0, 3).map(Poll(_)),
    4 -> Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(1, 4))
      .map { case (p, n) => Produce(p, n) },
    2 -> Gen.chooseNum(0, 3).map(ZombieCommit(_)))

  private def produceTo(topic: String, p: Int, values: Seq[String]): Unit = {
    val c = new KafkaWire.Conn("localhost", srv.port)
    try KafkaWire.produce(c, topic, p,
      values.map(v => (v.getBytes(u8), v.getBytes(u8))), 1L)
    finally c.close()
  }

  property("join/leave/timeout/commit interleavings preserve the three safety invariants") =
    Prop.forAll(Gen.listOfN(8, opGen)) { ops =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val id = caseIds.incrementAndGet()
      val topic = s"chaos-$id"
      val group = s"gchaos-$id"
      // members advertise DIFFERENT assignor preferences (everyone
      // includes range, so the group can always form): the
      // coordinator's protocol vote and BOTH assignors run under the
      // same chaos — the invariants don't care which one won
      val prefs = Seq(Seq("range"), Seq("roundrobin", "range"))
      var nth = 0
      def member() = {
        nth += 1
        new KafkaGroup.GroupMember("localhost", srv.port,
          group, Seq(topic), sessionTimeoutMs = 30000,
          assignors = prefs(nth % prefs.length),
          rebalanceTimeoutMs = 5000)
      }

      val live = scala.collection.mutable.ArrayBuffer.empty[KafkaGroup.GroupMember]
      // (generation, memberId) snapshots from earlier generations —
      // the zombie-commit ammunition
      val identities =
        scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      val produced = scala.collection.mutable.Map.empty[Int, Long]
        .withDefaultValue(0L)
      val consumed = scala.collection.mutable.Map
        .empty[Int, Vector[Long]].withDefaultValue(Vector.empty)
      var failure: Option[String] = None
      def check(cond: Boolean, msg: => String): Unit =
        if (failure.isEmpty && !cond) failure = Some(msg)

      /** Invariant 1 — everyone re-joins, then the stable generation's
        * assignments must be disjoint + exhaustive and gen-agreed. */
      def stabilize(): Unit = if (live.nonEmpty && failure.isEmpty) {
        def joinAll(): Unit = {
          val fs = live.toSeq.map(m => Future(m.ensureActive()))
          fs.foreach(Await.result(_, 30.seconds))
        }
        joinAll()
        // convergence loop: a BRAND-NEW member only becomes known to
        // the coordinator when its first join lands — the incumbents'
        // barrier may have completed without it, leaving them one
        // generation stale. A real consumer discovers this through its
        // heartbeat and re-joins; do the same until everyone is a
        // current member of one stable generation.
        var rounds = 0
        while (rounds < 8 && failure.isEmpty &&
            live.exists(!_.heartbeatOnce())) {
          joinAll()
          rounds += 1
        }
        val gens = live.map(_.generation).toSet
        check(gens.size == 1, s"generation disagreement: $gens")
        val shares = live.toSeq.map(_.assigned.getOrElse(topic, Seq.empty))
        val all = shares.flatten
        check(all.distinct.length == all.length,
          s"overlapping assignment: $shares")
        check(all.toSet == Set(0, 1, 2, 3),
          s"partitions dropped: $shares")
        live.foreach(m => identities += ((m.generation, m.memberId)))
      }

      def poll(m: KafkaGroup.GroupMember): Unit = {
        val got = m.pollAssigned(topic)
        got.foreach { case (p, r) => consumed(p) = consumed(p) :+ r.offset }
      }

      // every case starts as a live 2-member group
      live += member(); live += member()
      stabilize()

      ops.foreach {
        case _ if failure.isDefined =>
        case Join =>
          if (live.size < 4) { live += member(); stabilize() }
        case Leave(k) =>
          if (live.nonEmpty) {
            val m = live.remove(k % live.size)
            m.leave(); m.close()
            stabilize()
          }
        case Timeout(k) =>
          if (live.nonEmpty) {
            val m = live.remove(k % live.size)
            // silent death: no LeaveGroup — the test reaches into the
            // coordinator and expires the session deterministically
            // (the lazy sweep fires at the next join/heartbeat)
            val mid = m.memberId
            state.groups.get(group).foreach { g =>
              g.synchronized(g.members.get(mid).foreach(_.deadline = 0L))
            }
            m.close()
            stabilize()
          }
        case Produce(p, n) =>
          val start = produced(p)
          produceTo(topic, p, (0 until n).map(i => s"r-$p-${start + i}"))
          produced(p) = start + n
        case Poll(k) =>
          if (live.nonEmpty) poll(live(k % live.size))
        case ZombieCommit(k) =>
          val curGen = state.groups.get(group)
            .map(g => g.synchronized(g.generation)).getOrElse(-1)
          val stale = identities.filter(_._1 < curGen)
          if (stale.nonEmpty) {
            val (gen, mid) = stale(k % stale.size)
            val c = new KafkaWire.Conn("localhost", srv.port)
            try {
              val before = KafkaWire.fetchOffsets(c, group, topic, Seq(0, 1, 2, 3))
              // invariant 2: fenced LOUDLY...
              val fenced =
                try { KafkaWire.commitOffsets(c, group, topic,
                  Map(0 -> 999L), gen, mid); false }
                catch { case _: KafkaWire.CommitFailedException => true }
              check(fenced, s"stale (gen $gen, $mid) commit was accepted " +
                s"at generation $curGen")
              // ...and moved NOTHING
              val after = KafkaWire.fetchOffsets(c, group, topic, Seq(0, 1, 2, 3))
              check(before == after, s"fenced commit moved offsets: " +
                s"$before -> $after")
            } finally c.close()
          }
      }

      // drain the tail: whoever is live (or a fresh member if no one
      // is) consumes the remainder, so the END state is checkable
      if (failure.isEmpty) {
        if (live.isEmpty) { live += member() }
        stabilize()
        if (failure.isEmpty) live.foreach(poll)
      }
      live.foreach { m =>
        try { m.leave(); m.close() } catch { case _: Exception => m.close() }
      }

      // invariant 3: every produced record consumed EXACTLY once
      if (failure.isEmpty) (0 until 4).foreach { p =>
        check(consumed(p) == (0L until produced(p)).toVector,
          s"partition $p: produced ${produced(p)}, consumed ${consumed(p)}" +
            " — a committed handover lost or replayed records")
      }

      failure match {
        case None => Prop.passed
        case Some(msg) => Prop.falsified :| msg
      }
    }

  /** The COOPERATIVE walk (KIP-429, r16 directive #7): same op
    * machine, every member on "cooperative-sticky", and the
    * assignment TIMELINE (each member's per-generation history)
    * checked for the incremental-rebalance safety contract:
    *
    *  - per synced generation, assignments stay DISJOINT;
    *  - a partition NEVER changes owner directly between consecutive
    *    synced generations while the old owner is still a member —
    *    ownership moves only through an unowned (revoked) round, so
    *    two owners can never overlap;
    *  - under STABLE membership (the pure two-phase case), a
    *    partition is unowned for AT MOST ONE round — the revocation
    *    round — before its new owner picks it up;
    *  - and the end-to-end exactly-once invariant holds under the
    *    cooperative protocol too.
    *
    * Members surface revocations via [[KafkaGroup.GroupMember
    * .rejoinNeeded]]; the stabilize loop pumps ensureActive exactly
    * the way a real client's poll loop would. */
  property("cooperative walks: no direct handover, at most one unowned round, exactly-once intact") =
    Prop.forAll(Gen.listOfN(6, Gen.frequency(
      3 -> Gen.const(Join),
      2 -> Gen.chooseNum(0, 3).map(Leave(_)),
      2 -> Gen.chooseNum(0, 3).map(Timeout(_)),
      4 -> Gen.chooseNum(0, 3).map(Poll(_)),
      4 -> Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(1, 4))
        .map { case (p, n) => Produce(p, n) }))) { ops =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val id = caseIds.incrementAndGet()
      val topic = s"coop-$id"
      val group = s"gcoopchaos-$id"
      def member() = new KafkaGroup.GroupMember("localhost", srv.port,
        group, Seq(topic), sessionTimeoutMs = 30000,
        assignors = Seq("cooperative-sticky", "range"),
        rebalanceTimeoutMs = 5000)

      val live = scala.collection.mutable.ArrayBuffer.empty[KafkaGroup.GroupMember]
      // EVERY member ever created — departed members' histories still
      // belong to the timeline
      val everyone = scala.collection.mutable.ArrayBuffer.empty[KafkaGroup.GroupMember]
      def spawn(): KafkaGroup.GroupMember = {
        val m = member(); live += m; everyone += m; m
      }
      val produced = scala.collection.mutable.Map.empty[Int, Long]
        .withDefaultValue(0L)
      val consumed = scala.collection.mutable.Map
        .empty[Int, Vector[Long]].withDefaultValue(Vector.empty)
      var failure: Option[String] = None
      def check(cond: Boolean, msg: => String): Unit =
        if (failure.isEmpty && !cond) failure = Some(msg)

      def joinAll(): Unit = {
        val fs = live.toSeq.map(m => Future(m.ensureActive()))
        fs.foreach(Await.result(_, 30.seconds))
      }
      def stabilize(): Unit = if (live.nonEmpty && failure.isEmpty) {
        joinAll()
        // pump until nobody owes a rejoin (cooperative follow-up
        // rounds) and nobody's heartbeat reports supersession
        var rounds = 0
        while (rounds < 12 && failure.isEmpty &&
            live.exists(m => m.rejoinNeeded || !m.heartbeatOnce())) {
          joinAll()
          rounds += 1
        }
        val gens = live.map(_.generation).toSet
        check(gens.size == 1, s"generation disagreement: $gens")
        val shares = live.toSeq.map(_.assigned.getOrElse(topic, Seq.empty))
        val all = shares.flatten
        check(all.distinct.length == all.length,
          s"overlapping assignment: $shares")
        check(all.toSet == Set(0, 1, 2, 3), s"partitions dropped: $shares")
      }
      def poll(m: KafkaGroup.GroupMember): Unit = {
        val got = m.pollAssigned(topic)
        got.foreach { case (p, r) => consumed(p) = consumed(p) :+ r.offset }
      }

      spawn(); spawn()
      stabilize()
      ops.foreach {
        case _ if failure.isDefined =>
        case Join =>
          if (live.size < 4) { spawn(); stabilize() }
        case Leave(k) =>
          if (live.nonEmpty) {
            val m = live.remove(k % live.size)
            m.leave(); m.close()
            stabilize()
          }
        case Timeout(k) =>
          if (live.nonEmpty) {
            val m = live.remove(k % live.size)
            val mid = m.memberId
            state.groups.get(group).foreach { g =>
              g.synchronized(g.members.get(mid).foreach(_.deadline = 0L))
            }
            m.close()
            stabilize()
          }
        case Produce(p, n) =>
          val start = produced(p)
          produceTo(topic, p, (0 until n).map(i => s"r-$p-${start + i}"))
          produced(p) = start + n
        case Poll(k) =>
          if (live.nonEmpty) poll(live(k % live.size))
        case ZombieCommit(_) => // not generated in this walk
      }
      if (failure.isEmpty) {
        if (live.isEmpty) spawn()
        stabilize()
        if (failure.isEmpty) live.foreach(poll)
      }
      live.foreach { m =>
        try { m.leave(); m.close() } catch { case _: Exception => m.close() }
      }

      // ── the timeline checks ─────────────────────────────────────────
      if (failure.isEmpty) {
        val entries: Seq[(Int, Int, Set[Int])] =
          everyone.zipWithIndex.toSeq.flatMap { case (m, idx) =>
            m.assignmentHistory.toSeq.map { case (g, as) =>
              (g, idx, as.getOrElse(topic, Seq.empty).toSet) }
          }
        val byGen: Seq[(Int, Seq[(Int, Int, Set[Int])])] =
          entries.groupBy(_._1).toSeq.sortBy(_._1)
        byGen.foreach { case (g, es) =>
          val all = es.flatMap(_._3.toSeq)
          check(all.distinct.size == all.size,
            s"gen $g: overlapping cooperative assignment: $es")
        }
        byGen.sliding(2).foreach {
          case Seq((g1, e1), (g2, e2)) =>
            val own1 = e1.flatMap(e => e._3.toSeq.map(p => p -> e._2)).toMap
            val own2 = e2.flatMap(e => e._3.toSeq.map(p => p -> e._2)).toMap
            val members2 = e2.map(_._2).toSet
            own1.foreach { case (p, m1) =>
              own2.get(p).foreach { m2 =>
                check(m2 == m1 || !members2.contains(m1),
                  s"partition $p moved DIRECTLY member#$m1 -> member#$m2 " +
                    s"between gens $g1 -> $g2 (no unowned round)")
              }
            }
          case _ =>
        }
        // the unowned bound, asserted where it is meaningful: three
        // CONSECUTIVE generations (no barrier-retry gaps) over STABLE
        // membership — pure two-phase revocation traffic
        byGen.sliding(3).foreach {
          case Seq((g1, e1), (g2, e2), (g3, e3))
              if g2 == g1 + 1 && g3 == g2 + 1 &&
                e1.map(_._2).toSet == e2.map(_._2).toSet &&
                e2.map(_._2).toSet == e3.map(_._2).toSet =>
            val o1 = e1.flatMap(_._3).toSet
            val o2 = e2.flatMap(_._3).toSet
            val o3 = e3.flatMap(_._3).toSet
            (0 until 4).foreach { p =>
              check(!(o1.contains(p) && !o2.contains(p) && !o3.contains(p)),
                s"partition $p unowned for MORE than one rebalance round " +
                  s"(gens $g2 and $g3)")
            }
          case _ =>
        }
      }

      // exactly-once, the end-to-end invariant, under cooperative too
      if (failure.isEmpty) (0 until 4).foreach { p =>
        check(consumed(p) == (0L until produced(p)).toVector,
          s"partition $p: produced ${produced(p)}, consumed ${consumed(p)}" +
            " — a cooperative handover lost or replayed records")
      }

      failure match {
        case None => Prop.passed
        case Some(msg) => Prop.falsified :| msg
      }
    }
}
