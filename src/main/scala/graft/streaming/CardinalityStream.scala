package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count per key with HyperLogLog state — the
  * streaming face of the batch sketch family (operators/Sketches.scala).
  *
  * `dropDuplicates` on a stream keeps one state entry per distinct value
  * — state grows with cardinality, which is exactly what an unbounded
  * 100 TB stream cannot afford. Holding the *sketch* as the state
  * instead caps every key at m integers (256 here, ≈ 1 KiB) forever,
  * at the price of the usual 1.04/√m relative error.
  *
  * The register update is the same md5-derived (register, rank) rule as
  * the batch sketch, and registers merge by max — so a streaming state,
  * a batch DataFrame sketch, and a DuckDB SQL replica of either all
  * agree bit-for-bit on the estimate for the same observed set. The
  * spec pins that equality, which is also the exactly-once story: a
  * replayed record maxes into the registers idempotently, so retries
  * never inflate the count.
  */
object CardinalityStream {

  case class Hit(eventType: String, userId: Long)
  case class HllState(n: Long, mx: Array[Int])
  case class Estimate(eventType: String, nEvents: Long, hllEst: Double)

  private val M = 256

  /** Per-batch updated cardinality estimates, one row per key per batch
    * in Update mode. No timeout: the state is a fixed-size summary, so
    * there is nothing to expire — an idle key just stops emitting. */
  def estimates(hits: Dataset[Hit]): Dataset[Estimate] = {
    implicit val outEnc = Encoders.product[Estimate]
    implicit val stateEnc = Encoders.product[HllState]
    hits.groupByKey(_.eventType)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  private def update(key: String, events: Iterator[Hit],
      state: GroupState[HllState]): Iterator[Estimate] = {
    val s = state.getOption.getOrElse(HllState(0L, new Array[Int](M)))
    val mx = s.mx.clone()
    var n = s.n
    events.foreach { e =>
      val (reg, rho) = regRho(e.userId)
      if (rho > mx(reg)) mx(reg) = rho
      n += 1
    }
    state.update(HllState(n, mx))
    Iterator(Estimate(key, n, estimate(mx)))
  }

  /** (register, rank) of one value — must stay in lockstep with
    * Sketches.hllRegisters/rho (md5("hll|<decimal>"), first byte =
    * register, leading-zero rank of the next 52 bits). */
  def regRho(value: Long): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hll|$value".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val reg = Integer.parseInt(hex.substring(0, 2), 16)
    val tail = hex.substring(2, 15).dropWhile(_ == '0')
    val extra = tail.headOption match {
      case Some('1') => 3
      case Some('2') | Some('3') => 2
      case Some(c) if c >= '4' && c <= '7' => 1
      case _ => 0
    }
    (reg, (13 - tail.length) * 4 + extra + 1)
  }

  /** The estimator, arithmetically identical (operation order included)
    * to Sketches.hllEstimate so streaming and batch agree bit-for-bit:
    * integer harmonic sum, exact power-of-two numerator scaling, then
    * linear counting below 2.5·m. */
  def estimate(mx: Array[Int]): Double = {
    var zp = 0L
    var zeros = 0
    mx.foreach { r =>
      zp += 1L << (53 - r)
      if (r == 0) zeros += 1
    }
    val rawE = 0.7213 / (1.0 + 1.079 / M) * (M.toLong * M) * 9007199254740992.0 / zp.toDouble
    if (rawE <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
    else rawE
  }
}
