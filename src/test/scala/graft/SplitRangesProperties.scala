package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Randomized invariants of minPartitions' offset-range splitting —
  * the property that matters is EXACT TILING: the slices of each topic
  * partition concatenate back to its original [from, until) with no
  * gap, overlap, or reorder (a gap loses committed records, an overlap
  * double-reads them). Sizing is best-effort proportional (the stock
  * connector's contract — tiny ranges cannot be split below one offset
  * per slice). */
object SplitRangesProperties extends Properties("graft.splitranges") {

  private val rangesGen: Gen[Seq[(Int, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 8)
    rs <- Gen.listOfN(n, for {
      from <- Gen.oneOf(Gen.chooseNum(0L, 1000L),
        Gen.chooseNum(0L, Long.MaxValue / 4))
      size <- Gen.frequency(4 -> Gen.chooseNum(0L, 100000L),
        1 -> Gen.const(0L), 1 -> Gen.const(1L))
    } yield (from, from + size))
  } yield rs.zipWithIndex.map { case ((f, u), p) => (p, f, u) }

  private val minTasksGen: Gen[Int] = Gen.chooseNum(0, 64)

  property("slices tile each partition's range exactly: no gap, overlap, or reorder") =
    Prop.forAll(rangesGen, minTasksGen) { (ranges, minTasks) =>
      val out = KafkaWireScan.splitRanges(ranges, minTasks)
      ranges.forall { case (p, from, until) =>
        val slices = out.filter(_._1 == p)
        if (until <= from) slices.forall { case (_, lo, hi) => hi <= lo } ||
          slices == Seq((p, from, until))
        else {
          val sorted = slices.sortBy(_._2)
          sorted.nonEmpty &&
            sorted.head._2 == from && sorted.last._3 == until &&
            sorted.forall { case (_, lo, hi) => hi > lo } &&
            sorted.sliding(2).forall {
              case Seq((_, _, hi), (_, lo2, _)) => lo2 == hi
              case _ => true
            }
        }
      }
    }

  property("never fewer tasks than input ranges; splitting only when asked") =
    Prop.forAll(rangesGen, minTasksGen) { (ranges, minTasks) =>
      val out = KafkaWireScan.splitRanges(ranges, minTasks)
      val noSplitNeeded = minTasks <= ranges.size
      if (noSplitNeeded) out == ranges
      else out.size >= ranges.count { case (_, f, u) => u > f }
    }
}
