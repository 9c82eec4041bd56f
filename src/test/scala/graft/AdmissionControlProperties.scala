package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** The maxOffsetsPerTrigger proration, fuzzed — including the Long
  * ranges where the naive `max * lag / total` overflows (the r13
  * review fix: proration runs in double and clamps at zero). Four
  * invariants, for ANY lag distribution and ANY positive cap:
  * per-partition ends never regress below start and never exceed the
  * real end; a cap that covers the whole backlog passes it through
  * unchanged; a binding cap admits at most `max` records. */
object AdmissionControlProperties
    extends Properties("graft.admissioncontrol") {

  private val partitionGen: Gen[(Int, (Long, Long))] = for {
    p <- Gen.chooseNum(0, 63)
    start <- Gen.oneOf(Gen.chooseNum(0L, 10000L),
      Gen.chooseNum(0L, Long.MaxValue / 4))
    lag <- Gen.oneOf(Gen.chooseNum(0L, 10000L),
      Gen.chooseNum(0L, Long.MaxValue / 64)) // huge lags: the overflow range
  } yield (p, (start, start + lag))

  private val logGen: Gen[Map[Int, (Long, Long)]] =
    Gen.chooseNum(1, 16).flatMap(n => Gen.listOfN(n, partitionGen)).map(_.toMap)

  private val maxGen: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(1L, 100000L),
    Gen.chooseNum(1L, Long.MaxValue / 2)) // huge caps: the overflow range

  private def stream = new KafkaWireMicroBatchStream("unused", 0, "t")

  property("caps never regress, never exceed, and admit at most max") =
    Prop.forAll(logGen, maxGen) { (log, max) =>
      val start = log.map { case (p, (s, _)) => p -> s }
      val end = log.map { case (p, (_, e)) => p -> e }
      val out = stream.capByRows(start, end, max)
      val bounds = out.forall { case (p, o) => o >= start(p) && o <= end(p) }
      val admitted = out.map { case (p, o) => o - start(p) }.sum
      val total = end.map { case (p, e) => e - start(p) }.sum
      val passThrough = total > max || out == end
      // r14 (running-budget allocation): a binding cap is used EXACTLY
      // — never overshot (the 2^53 double-rounding hazard) and never
      // left partially unfilled while lag remains
      val exact =
        if (total > max) admitted == max else admitted == total
      bounds && admitted <= math.max(max, 0L) && passThrough && exact
    }
}
