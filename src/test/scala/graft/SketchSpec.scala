package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Portable sketches: CMS / HLL guarantees, mergeability, determinism. */
class SketchSpec extends SparkSuite {

  test("CMS never undercounts; overshoot stays within the collision budget") {
    val li = Tables(spark, sf001, "lineitem")
    val n = li.count()
    val rows = SparkEntry.queries("sk_cms_heavy")(spark, sf001).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS undercounted: $est < $exact")
      // Expected collision mass is n/w per seed; min over 4 seeds sits
      // far below 8× that. A violation means the hash went degenerate.
      assert(est - exact <= math.max(8.0 * n / Sketches.CmsWidth, 8.0),
        s"overshoot ${est - exact} beyond budget")
    }
  }

  test("CMS sketches merge by cell-wise sum into exactly the full sketch") {
    val li = Tables(spark, sf001, "lineitem")
    val h0 = Sketches.cmsSketch(li.where(col("l_orderkey") % 2 === 0), "l_suppkey")
    val h1 = Sketches.cmsSketch(li.where(col("l_orderkey") % 2 === 1), "l_suppkey")
    val merged = h0.union(h1).groupBy("seed", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = Sketches.cmsSketch(li, "l_suppkey")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === full)
  }

  test("HLL registers merge by cell-wise max; merged estimate is bit-identical") {
    val li = Tables(spark, sf001, "lineitem")
    val grp = Seq("l_returnflag")
    val r0 = Sketches.hllRegisters(li.where(col("l_orderkey") % 2 === 0), grp, "l_partkey")
    val r1 = Sketches.hllRegisters(li.where(col("l_orderkey") % 2 === 1), grp, "l_partkey")
    val merged = r0.union(r1).groupBy("l_returnflag", "reg").agg(max("mx").as("mx"))
    val estM = Sketches.hllEstimate(merged, grp)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val estF = Sketches.hllEstimate(Sketches.hllRegisters(li, grp, "l_partkey"), grp)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(estM === estF) // exact double equality: max-merge is lossless
  }

  test("HLL estimates land within the 1.04/sqrt(m) error regime") {
    val rows = SparkEntry.queries("sk_hll_groups")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("hll_est")
      val rel = math.abs(est - exact) / exact
      // 3σ at m=256 is ~19.5 %.
      assert(rel < 0.2, s"${r.getString(0)}: est $est vs exact $exact (rel $rel)")
    }
  }

  test("sketch build shuffles sketch-sized data, not input-sized data") {
    val li = Tables(spark, sf001, "lineitem")
    val sk = Sketches.cmsSketch(li, "l_suppkey")
    // The sketch is bounded by d·w cells no matter the input row count…
    assert(sk.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    // …and the plan carries a partial_count below the exchange, so only
    // pre-combined cells cross the wire.
    val plan = sk.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"no map-side combine in:\n$plan")
  }
}
