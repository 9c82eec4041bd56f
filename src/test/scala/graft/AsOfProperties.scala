package graft

import graft.operators.AsOf
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}

/** Property checks for the as-of join against a direct per-row
  * reference implementation: for every left row, the carried payload is
  * that of the right row with the greatest time <= left time for the
  * same key; NULL when no such row exists OR the matched row's payload
  * is genuinely NULL (row-wholesale semantics — never back-filled from
  * an older row). Runs through the real Catalyst evaluation on
  * randomized inputs, covering duplicate left times, missing keys, and
  * NULL payloads — cases the fixtures don't. Keys and times are
  * deduplicated where the semantics would otherwise be tie-ambiguous. */
object AsOfProperties extends Properties("graft.asof") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-asof-props")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genLeft: Gen[List[(Long, Long)]] = Gen.listOfN(12,
    for { k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 20L) } yield (k, t))

  private val genRight: Gen[List[(Long, Long, Option[Long])]] = Gen.listOfN(8,
    for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 20L)
      v <- Gen.option(Gen.choose(0L, 99L))
    } yield (k, t, v))

  private def boxed(v: Option[Long]): java.lang.Long =
    v.map(Long.box).orNull

  property("matches the per-row reference (incl. NULL payloads)") =
    Prop.forAll(genLeft, genRight) { (left, rightRaw) =>
      import spark.implicits._
      val l = left.distinct
      // unique (k,t) on the right: equal-time right rows would make the
      // window's carried row order-dependent
      val right = rightRaw.groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val ldf = l.toDF("k", "t")
      val rdf = right.map { case (k, t, v) => (k, t, boxed(v)) }.toDF("k", "t", "v")

      val out = AsOf.join(ldf, rdf, "k", "t", Seq("v")).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("t")) ->
          Option(r.getAs[java.lang.Long]("asof_v")).map(_.longValue)).toMap

      out.size == l.size && l.forall { case (k, t) =>
        val expected = right.filter { case (rk, rt, _) => rk == k && rt <= t }
          .maxByOption(_._2).flatMap(_._3)
        out((k, t)) == expected
      }
    }

  property("forward join matches the per-row reference (min time >= t)") =
    Prop.forAll(genLeft, genRight) { (left, rightRaw) =>
      import spark.implicits._
      val l = left.distinct
      val right = rightRaw.groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val ldf = l.toDF("k", "t")
      val rdf = right.map { case (k, t, v) => (k, t, boxed(v)) }.toDF("k", "t", "v")

      val out = AsOf.joinForward(ldf, rdf, "k", "t", Seq("v")).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("t")) ->
          Option(r.getAs[java.lang.Long]("asof_v")).map(_.longValue)).toMap

      out.size == l.size && l.forall { case (k, t) =>
        val expected = right.filter { case (rk, rt, _) => rk == k && rt >= t }
          .minByOption(_._2).flatMap(_._3)
        out((k, t)) == expected
      }
    }

  property("left row count is preserved") =
    Prop.forAll(genLeft, genRight) { (left, right) =>
      import spark.implicits._
      val l = left.distinct
      val rdf = right.map { case (k, t, v) => (k, t, boxed(v)) }.toDF("k", "t", "v")
      AsOf.join(l.toDF("k", "t"), rdf, "k", "t", Seq("v")).count() == l.size
    }
}
