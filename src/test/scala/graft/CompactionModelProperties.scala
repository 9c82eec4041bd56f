package graft

import graft.sources.KafkaWire
import org.scalacheck.{Gen, Prop, Properties}

/** Randomized model check of the log cleaner: for ANY write sequence
  * (small key space, random batch boundaries, random tombstones) the
  * compacted log drained over real TCP must equal the trivially-
  * correct model — last value per key, at the offset of the key's
  * last write, tombstoned keys visible (retention pass off) or gone
  * (purge pass on), all surviving offsets strictly increasing. The
  * fixed-case spec (KafkaCompactionSpec) pins the shapes; this pins
  * the space between them. */
object CompactionModelProperties extends Properties("graft.compaction") {

  private val u8 = java.nio.charset.StandardCharsets.UTF_8

  // a write sequence over <=5 keys, ~1/5 tombstones, sliced into
  // random produce batches of 1..4 records
  private val writesGen: Gen[List[(String, Option[String])]] = for {
    n <- Gen.chooseNum(1, 24)
    ws <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0, 4).map(i => s"k$i")
      v <- Gen.frequency(4 -> Gen.chooseNum(0, 999).map(i => Some(s"v$i")),
        1 -> Gen.const(None))
    } yield (k, v))
  } yield ws

  private val slicesGen: Gen[List[Int]] =
    Gen.infiniteLazyList(Gen.chooseNum(1, 4)).map(_.take(24).toList)

  property("compacted drain == latest-per-key model (both tombstone modes)") =
    Prop.forAll(writesGen, slicesGen, Gen.oneOf(true, false)) {
      (writes, slices, purge) =>
        val srv = new MiniKafkaServer(numPartitions = 1)
        try {
          val prod = new KafkaWire.RetryingProducer("localhost", srv.port, "t")
          try {
            var rest = writes
            var i = 0
            while (rest.nonEmpty) {
              val take = math.min(slices(i % slices.length), rest.length)
              val chunk = rest.take(take)
              prod.send(0, chunk.map { case (k, v) =>
                (k.getBytes(u8), v.map(_.getBytes(u8)).orNull) }, i.toLong)
              rest = rest.drop(take)
              i += 1
            }
          } finally prod.close()
          srv.compact("t", 0, purgeTombstones = purge)
          // the model: last write per key, at its ORIGINAL offset
          val lastByKey = writes.zipWithIndex
            .groupBy(_._1._1).map { case (k, ws) => k -> ws.last }
          val expected = lastByKey.collect {
            case (k, ((_, v), off)) if v.isDefined || !purge =>
              (k, v.orNull, off.toLong)
          }.toSet
          val c = new KafkaWire.Conn("localhost", srv.port)
          try {
            val f = new KafkaWire.GrowingFetcher(c, "t", 0)
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(String, String, Long)]
            var pos = 0L
            var done = false
            while (!done) {
              val (recs, hw) = f.fetchAt(pos)
              if (recs.isEmpty) done = true
              else {
                recs.foreach(r => out += ((new String(r.key, u8),
                  Option(r.value).map(new String(_, u8)).orNull, r.offset)))
                pos = recs.last.offset + 1
                done = pos >= hw
              }
            }
            val offs = out.map(_._3).toList
            val increasing = offs.zip(offs.drop(1)).forall { case (a, b) => a < b }
            Prop.all(
              Prop(out.toSet == expected) :| s"drained ${out.toSet} != model $expected",
              Prop(increasing) :| "surviving offsets must stay strictly increasing")
          } finally c.close()
        } finally srv.stop()
    }
}
