package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Randomized invariants of the consumer-group RANGE assignor — the
  * properties the spec's fixed cases cannot exhaust:
  *  - SAFETY: per topic, the members' partition sets are DISJOINT and
  *    their union is EXACTLY the topic's partitions restricted to its
  *    subscribers (an overlap double-consumes, a hole silently drops a
  *    partition from the group);
  *  - BALANCE: subscriber loads per topic differ by at most one
  *    partition (the range contract);
  *  - CONTIGUITY + DETERMINISM: each member's share is a contiguous
  *    run, identical across re-invocations and member-order shuffles
  *    (two leaders elected in different orders must compute the SAME
  *    assignment, or a rebalance would reshuffle everything).
  * Plus the embedded-protocol codec: Subscription/Assignment bytes
  * round-trip exactly. */
object GroupAssignProperties extends Properties("graft.groupassign") {

  private val topicsGen: Gen[Map[String, Int]] = for {
    n <- Gen.chooseNum(1, 4)
    counts <- Gen.listOfN(n, Gen.chooseNum(0, 12))
  } yield counts.zipWithIndex.map { case (c, i) => s"t$i" -> c }.toMap

  private def subsGen(topics: Seq[String]): Gen[Seq[(String, Seq[String])]] =
    for {
      m <- Gen.chooseNum(1, 6)
      subs <- Gen.listOfN(m,
        Gen.someOf(topics).map(_.toSeq).suchThat(_ => true))
    } yield subs.zipWithIndex.map { case (ts, i) =>
      s"member-$i" -> (if (ts.isEmpty) topics.take(1) else ts) }

  property("disjoint, exhaustive, balanced, contiguous, order-independent") =
    Prop.forAll(topicsGen) { topics =>
      Prop.forAll(subsGen(topics.keys.toSeq.sorted)) { subs =>
        val out = KafkaGroup.rangeAssign(subs, topics)
        val again = KafkaGroup.rangeAssign(scala.util.Random.shuffle(subs), topics)
        topics.forall { case (topic, nParts) =>
          val subscribers = subs.filter(_._2.contains(topic)).map(_._1)
          val shares = subscribers.map(m =>
            out.getOrElse(m, Map.empty).getOrElse(topic, Seq.empty))
          val all = shares.flatten
          // a topic NO ONE subscribes to is legitimately unassigned
          val exhaustive =
            if (subscribers.isEmpty) all.isEmpty
            else all.sorted == (0 until nParts).toList
          val disjoint = all.distinct.length == all.length
          val balanced = shares.isEmpty ||
            (shares.map(_.length).max - shares.map(_.length).min) <= 1
          val contiguous = shares.forall(s =>
            s.isEmpty || s == (s.head to s.last))
          // non-subscribers never receive the topic
          val scoped = out.forall { case (m, byTopic) =>
            !byTopic.contains(topic) ||
              subs.find(_._1 == m).exists(_._2.contains(topic))
          }
          val deterministic = subscribers.forall(m =>
            again.getOrElse(m, Map.empty).getOrElse(topic, Seq.empty) ==
              out.getOrElse(m, Map.empty).getOrElse(topic, Seq.empty))
          exhaustive && disjoint && balanced && contiguous && scoped &&
            deterministic
        }
      }
    }

  property("roundrobin: disjoint, exhaustive, global balance on uniform subscriptions") =
    Prop.forAll(topicsGen, Gen.chooseNum(1, 6)) { (topics, m) =>
      // uniform subscriptions (every member subscribes to everything):
      // roundrobin's contract is balance over the TOTAL load
      val subs = (0 until m).map(i => s"member-$i" -> topics.keys.toSeq.sorted)
      val out = KafkaGroup.roundRobinAssign(subs, topics)
      val again = KafkaGroup.roundRobinAssign(
        scala.util.Random.shuffle(subs), topics)
      val perTopicOk = topics.forall { case (t, nParts) =>
        val all = subs.map(_._1).flatMap(mm =>
          out.getOrElse(mm, Map.empty).getOrElse(t, Seq.empty))
        all.sorted == (0 until nParts).toList &&
          all.distinct.length == all.length
      }
      val loads = subs.map(_._1).map(mm =>
        out.getOrElse(mm, Map.empty).values.map(_.length).sum)
      val balanced = loads.isEmpty || loads.max - loads.min <= 1
      val deterministic = out == again
      perTopicOk && balanced && deterministic
    }

  property("Subscription and Assignment codecs round-trip") =
    Prop.forAll(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { topics =>
      KafkaGroup.decodeSubscription(
        KafkaGroup.encodeSubscription(topics)) == topics
    } && Prop.forAll(for {
      n <- Gen.chooseNum(0, 4)
      entries <- Gen.listOfN(n, for {
        t <- Gen.alphaNumStr.suchThat(_.nonEmpty)
        ps <- Gen.listOf(Gen.chooseNum(0, 64))
      } yield t -> (ps.toSeq: Seq[Int]))
    } yield entries.toMap) { m =>
      KafkaGroup.decodeAssignment(KafkaGroup.encodeAssignment(m)) == m
    }
}
