package graft

import graft.sources.{KafkaGroup, KafkaWire}
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** COOPERATIVE incremental rebalance (KIP-429) — the r16 verdict's
  * #7. The eager protocol (range/roundrobin) revokes the WORLD on
  * every membership change: all members drop all partitions at the
  * join barrier and get fresh assignments. The cooperative protocol
  * moves ONLY what must move, in two phases: the assignor keeps each
  * member's currently-owned claims (carried in Subscription v1),
  * revokes the excess by assigning it to NOBODY for one round (the
  * revoked owner re-joins, surfacing [[KafkaGroup.GroupMember
  * .rejoinNeeded]]), and the follow-up round hands the freed
  * partitions to their new owners. A partition thus never has two
  * owners, never moves without an unowned round between, and a
  * member's retained partitions never leave its assignment. */
class CooperativeRebalanceSpec extends SparkSuite {

  private val coop = Seq("cooperative-sticky", "range")

  /** Drive one member like a real client: join, then stay responsive
    * (heartbeat + rejoin on signal) until `until` holds. */
  private def pump(m: KafkaGroup.GroupMember,
      until: () => Boolean): Future[Unit] = Future {
    val deadline = System.currentTimeMillis() + 20000
    m.ensureActive()
    var settled = false
    while (!settled && System.currentTimeMillis() < deadline) {
      if (m.rejoinNeeded || !m.heartbeatOnce()) m.ensureActive()
      else if (until()) settled = true
      else Thread.sleep(10)
    }
    assert(settled, "member did not settle in time")
  }

  test("a joining member moves only the excess partitions — two-phase, with an unowned round between") {
    val srv = new MiniKafkaServer(numPartitions = 4)
    try {
      def member() = new KafkaGroup.GroupMember("localhost", srv.port,
        "gcoop", Seq("t"), sessionTimeoutMs = 30000, assignors = coop,
        rebalanceTimeoutMs = 5000)
      val a = member()
      val first = a.ensureActive()
      assert(first("t").sorted === Seq(0, 1, 2, 3))
      assert(!a.rejoinNeeded, "a sole member loses nothing")

      // B joins; both members pump until the group settles balanced
      val b = member()
      def settled(): Boolean = {
        val as = a.assigned.getOrElse("t", Seq.empty).toSet
        val bs = b.assigned.getOrElse("t", Seq.empty).toSet
        as.nonEmpty && bs.nonEmpty && (as & bs).isEmpty &&
          (as | bs) == Set(0, 1, 2, 3) && !a.rejoinNeeded && !b.rejoinNeeded
      }
      Await.result(Future.sequence(Seq(pump(a, () => settled()),
        pump(b, () => settled()))), 25.seconds)

      val aFinal = a.assigned("t").toSet
      val bFinal = b.assigned("t").toSet
      assert(aFinal.size === 2 && bFinal.size === 2)
      // STICKINESS: A kept a subset of what it owned — nothing A
      // retained ever moved
      assert(aFinal.subsetOf(first("t").toSet))

      // the histories pin the two-phase contract exactly:
      val aH = a.assignmentHistory.toSeq.map { case (g, as) =>
        g -> as.getOrElse("t", Seq.empty).toSet }
      val bH = b.assignmentHistory.toSeq.map { case (g, as) =>
        g -> as.getOrElse("t", Seq.empty).toSet }
      // A only ever SHRANK from its original set (no stop-the-world
      // drop-and-reacquire), and its kept set was stable from the
      // revocation round on
      aH.map(_._2).sliding(2).foreach { case Seq(x, y) =>
        assert(y.subsetOf(x), s"A regained or churned: $aH")
      case _ => }
      assert(aH.last._2 === aFinal)
      // the revocation round: A already down to its final set while B
      // had nothing — the moved partitions were owned by NOBODY
      val revGen = aH.collectFirst {
        case (g, s) if s == aFinal => g }.get
      val bAtRev = bH.collectFirst { case (g, s) if g == revGen => s }
      assert(bAtRev.forall(_.isEmpty),
        s"moved partitions must be unowned for the revocation round: $bH")
      // ...and exactly one generation later B owned them
      assert(bH.last._2 === bFinal)
      assert(bH.last._1 === revGen + 1,
        s"the handover must complete one round after the revocation " +
          s"(rev gen $revGen, B's history $bH)")

      a.leave(); b.leave(); a.close(); b.close()
    } finally srv.stop()
  }

  test("a leaving member's partitions transfer immediately — no revocation round needed") {
    val srv = new MiniKafkaServer(numPartitions = 4)
    try {
      def member() = new KafkaGroup.GroupMember("localhost", srv.port,
        "gcoop2", Seq("t"), sessionTimeoutMs = 30000, assignors = coop,
        rebalanceTimeoutMs = 5000)
      val a = member()
      a.ensureActive()
      val b = member()
      def settled2(): Boolean = {
        val as = a.assigned.getOrElse("t", Seq.empty).toSet
        val bs = b.assigned.getOrElse("t", Seq.empty).toSet
        as.size == 2 && bs.size == 2 && (as & bs).isEmpty &&
          !a.rejoinNeeded && !b.rejoinNeeded
      }
      Await.result(Future.sequence(Seq(pump(a, () => settled2()),
        pump(b, () => settled2()))), 25.seconds)
      val aOwned = a.assigned("t").toSet

      // B leaves gracefully: its partitions have NO live claimant, so
      // the very next round hands them to A — one round, no unowned
      // interlude beyond the rebalance itself, and A's own partitions
      // never moved
      b.leave(); b.close()
      val deadline = System.currentTimeMillis() + 10000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        if (a.rejoinNeeded || !a.heartbeatOnce()) a.ensureActive()
        done = a.assigned.getOrElse("t", Seq.empty).toSet == Set(0, 1, 2, 3)
        if (!done) Thread.sleep(10)
      }
      assert(done, "the survivor must absorb the leaver's partitions")
      assert(aOwned.subsetOf(a.assigned("t").toSet),
        "the survivor's own partitions never moved")
      // and A never saw a revocation in the whole takeover
      val aH = a.assignmentHistory.toSeq.map(_._2.getOrElse("t", Seq.empty).toSet)
      aH.sliding(2).foreach {
        case Seq(x, y) => assert(x.subsetOf(y) || y.subsetOf(x))
        case _ => }
      a.leave(); a.close()
    } finally srv.stop()
  }

  test("heterogeneous subscriptions never orphan a partition, and rounds converge to a fixed point") {
    // m1 subscribes [A] only, m2 subscribes [A, B]; 2 partitions each.
    // A global quota of 2 per member must not leave B-1 unassignable
    // once m2 is 'full' — silent orphaning would be records nobody
    // consumes. Simulate the rebalance rounds the clients would run
    // (each round's claims = the previous round's output) and check
    // every round plus the fixed point.
    val counts = Map("A" -> 2, "B" -> 2)
    val subs = Map("m1" -> Seq("A"), "m2" -> Seq("A", "B"))
    var owned: Map[String, Map[String, Seq[Int]]] =
      Map("m1" -> Map.empty, "m2" -> Map.empty)
    var rounds = 0
    var prev: Map[String, Map[String, Seq[Int]]] = null
    var unownedStreak = Map.empty[(String, Int), Int]
    while (owned != prev && rounds < 8) {
      prev = owned
      rounds += 1
      owned = KafkaGroup.cooperativeStickyAssign(
        Seq(("m1", subs("m1"), owned("m1")), ("m2", subs("m2"), owned("m2"))),
        counts)
      val flat = owned.toSeq.flatMap { case (_, as) =>
        as.toSeq.flatMap { case (t, ps) => ps.map(p => (t, p)) } }
      assert(flat.distinct.size === flat.size, s"overlap at round $rounds")
      // unowned-at-most-one-round, tracked across the simulation
      val all = for (t <- Seq("A", "B"); p <- 0 until 2) yield (t, p)
      val ownedSet = flat.toSet
      unownedStreak = all.map { tp =>
        tp -> (if (ownedSet(tp)) 0 else unownedStreak.getOrElse(tp, 0) + 1)
      }.toMap
      assert(unownedStreak.values.forall(_ <= 1),
        s"a partition sat unowned for more than one round: $unownedStreak")
    }
    assert(owned == prev, s"no fixed point within $rounds rounds")
    // the fixed point: everything owned, B entirely on its only
    // subscriber, and A balanced
    val flat = owned.toSeq.flatMap { case (_, as) =>
      as.toSeq.flatMap { case (t, ps) => ps.map(p => (t, p)) } }
    assert(flat.sorted === Seq(("A", 0), ("A", 1), ("B", 0), ("B", 1)))
    assert(owned("m2").getOrElse("B", Seq.empty).sorted === Seq(0, 1))
    assert(owned("m1").getOrElse("A", Seq.empty).nonEmpty,
      "the A-only member shares topic A at the fixed point")
  }

  test("revocations are destination-bounded: never more than the under-quota capacity") {
    // m1 owns all 6 of one topic; m2 joins empty. Quotas 3/3: exactly
    // 3 partitions revoke (m2's capacity), never more — revoking
    // beyond capacity would bounce back next round through an extra
    // rebalance for nothing.
    val round1 = KafkaGroup.cooperativeStickyAssign(
      Seq(("m1", Seq("t"), Map("t" -> (0 until 6))),
        ("m2", Seq("t"), Map.empty)),
      Map("t" -> 6))
    assert(round1("m1")("t").sorted === Seq(0, 1, 2),
      "m1 keeps exactly its quota, sorted-first")
    assert(round1("m2").getOrElse("t", Seq.empty).isEmpty,
      "the moved partitions are unowned this round (two-phase)")
    val round2 = KafkaGroup.cooperativeStickyAssign(
      Seq(("m1", Seq("t"), round1("m1")), ("m2", Seq("t"), Map.empty)),
      Map("t" -> 6))
    assert(round2("m1")("t").sorted === Seq(0, 1, 2))
    assert(round2("m2")("t").sorted === Seq(3, 4, 5),
      "the freed partitions land on the joiner one round later")
  }

  test("cooperative and eager groups coexist: the protocol vote picks what all members support") {
    val srv = new MiniKafkaServer(numPartitions = 4)
    try {
      // one cooperative-preferring member + one range-only member:
      // the only COMMON protocol is range — the group forms eagerly
      val a = new KafkaGroup.GroupMember("localhost", srv.port, "gmix",
        Seq("t"), sessionTimeoutMs = 30000, assignors = coop,
        rebalanceTimeoutMs = 5000)
      val b = new KafkaGroup.GroupMember("localhost", srv.port, "gmix",
        Seq("t"), sessionTimeoutMs = 30000, assignors = Seq("range"),
        rebalanceTimeoutMs = 5000)
      def formed(): Boolean = {
        val as = a.assigned.getOrElse("t", Seq.empty).toSet
        val bs = b.assigned.getOrElse("t", Seq.empty).toSet
        as.size == 2 && bs.size == 2 && (as | bs) == Set(0, 1, 2, 3)
      }
      Await.result(Future.sequence(Seq(pump(a, () => formed()),
        pump(b, () => formed()))), 25.seconds)
      val c = new KafkaWire.Conn("localhost", srv.port)
      val desc = try KafkaGroup.describeGroup(c, "gmix") finally c.close()
      assert(desc.protocol === "range")
      a.leave(); b.leave(); a.close(); b.close()
    } finally srv.stop()
  }
}
