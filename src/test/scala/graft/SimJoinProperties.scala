package graft

import graft.operators.SimJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Randomized losslessness of the prefix-filtered similarity join: for
  * ANY generated corpus of small element sets, the candidate pruning
  * (prefix + length + positional filters) must reproduce the quadratic
  * all-pairs result exactly. Runs through a real local session so the
  * property holds for the actual Catalyst plan, not a re-implementation.
  */
object SimJoinProperties extends Properties("graft.simjoin") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-props")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Corpora drawn from a small vocabulary so overlaps (and exact
  // duplicates) are common — the regime where pruning bugs would show.
  private val corpus: Gen[List[Set[String]]] = {
    val tok = Gen.choose('a', 'p').map(_.toString)
    val set = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, tok)).map(_.toSet)
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, set))
  }

  private def pairs(sets: List[Set[String]], tau: Double): Set[(Long, Long)] =
    (for {
      (a, i) <- sets.zipWithIndex
      (b, j) <- sets.zipWithIndex
      if i < j
      inter = (a & b).size.toDouble
      if inter / (a.size + b.size - inter) >= tau
    } yield (i.toLong, j.toLong)).toSet

  property("prefix join == brute force for any corpus, τ ∈ {0.5, 0.8}") =
    Prop.forAll(corpus, Gen.oneOf(0.5, 0.8)) { (sets, tau) =>
      import spark.implicits._
      val ex = sets.zipWithIndex
        .flatMap { case (s, i) => s.map(t => (i.toLong, t)) }
        .toDF("doc_id", "tok")
      val got = SimJoin.prefixJoin(ex, tau)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got == pairs(sets, tau)
    }
}
