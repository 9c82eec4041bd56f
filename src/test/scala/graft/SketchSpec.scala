package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Portable sketches: CMS / HLL guarantees, mergeability, determinism. */
class SketchSpec extends SparkSuite {

  test("KMV aggregator is mergeable: any partition of the input yields the K smallest distinct values") {
    val agg = new plans.KmvAggregator(8)
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      // Random multiset (duplicates included) split at random points,
      // reduced shard-wise and merged in shuffled order — must equal
      // the K smallest distinct values regardless of partitioning.
      val xs = Seq.fill(rnd.nextInt(60) + 1)(f"${rnd.nextInt(40)}%04d")
      val expected = xs.distinct.sorted.take(8)
      val shards = rnd.shuffle(xs).grouped(rnd.nextInt(9) + 1).toSeq
      val partials = shards.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === expected)
    }
  }

  test("KMV estimates sit next to their exact twins within a loose error band") {
    val r = SparkEntry.queries("sk_kmv_intersect")(spark, sf001).collect()(0)
    val (eu, ei) = (r.getAs[Double]("est_union"), r.getAs[Double]("est_intersect"))
    val (xu, xi) = (r.getAs[Long]("exact_union"), r.getAs[Long]("exact_intersect"))
    // 1/sqrt(256) ~ 6% std error; 4 sigma keeps the test stable while
    // still catching an estimator that is structurally wrong.
    assert(math.abs(eu - xu) <= 0.25 * xu + 8, s"union est $eu vs exact $xu")
    assert(math.abs(ei - xi) <= 0.35 * xi + 8, s"intersect est $ei vs exact $xi")
  }

  test("KMV diff estimate is consistent: diff + intersect partitions the A-side") {
    val d = SparkEntry.queries("sk_kmv_diff")(spark, sf001).collect()(0)
    val i = SparkEntry.queries("sk_kmv_intersect")(spark, sf001).collect()(0)
    // Same sketches, same union estimate.
    assert(d.getAs[Double]("est_union") === i.getAs[Double]("est_union"))
    // Every u-hash in A is either also in B (intersect) or not (diff),
    // so the two estimates must sum to A's below-theta share of the
    // union estimate — and A's exact cardinality within the band.
    val estA = d.getAs[Double]("est_diff") + i.getAs[Double]("est_intersect")
    val exactA = i.getAs[Long]("exact_intersect") + d.getAs[Long]("exact_diff")
    assert(math.abs(estA - exactA) <= 0.25 * exactA + 8, s"A est $estA vs exact $exactA")
    assert(d.getAs[Double]("est_diff") >= 0.0)
  }

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

  test("quantile histograms merge additively; quantiles bound the exact values") {
    val li = Tables(spark, sf001, "lineitem")
    val ps = Seq("p50_ub" -> 0.5, "p95_ub" -> 0.95, "p99_ub" -> 0.99)
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_returnflag").as("g"),
          floor(col("l_extendedprice") / 256).cast("long").as("bin"))
        .groupBy("g", "bin").agg(count(lit(1)).as("c"))
    // Merge three arbitrary partials bin-wise, re-derive quantiles from
    // the merged histogram — must equal the one-pass sketch exactly.
    val parts = (0 until 3).map(i => hist(li.where(abs(hash(col("l_orderkey"))) % 3 === i)))
    val merged = parts.reduce(_ union _).groupBy("g", "bin").agg(sum("c").as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val mq = merged
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .groupBy(col("g")).agg(
        min(when(col("cum") >= ceil(col("n") * 0.5), (col("bin") + 1) * 256)).as("p50_ub"),
        min(when(col("cum") >= ceil(col("n") * 0.95), (col("bin") + 1) * 256)).as("p95_ub"),
        min(when(col("cum") >= ceil(col("n") * 0.99), (col("bin") + 1) * 256)).as("p99_ub"),
        max(col("n")).as("n"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val full = rows(SparkEntry.queries("sk_quantile_hist")(spark, sf001))
    assert(rows(mq) === full)
    // Sketch bound: the ⌈p·n⌉-th order statistic (what the histogram
    // ranks — NOT the interpolated percentile) lies in the reported
    // bin: x ≤ ub ≤ x + width.
    val exact = li.groupBy(col("l_returnflag").as("g"))
      .agg(sort_array(collect_list(col("l_extendedprice"))).as("xs")).collect()
      .map { r =>
        val xs = r.getSeq[Double](1)
        r.getString(0) -> xs(math.ceil(0.5 * xs.length).toInt - 1)
      }.toMap
    exact.foreach { case (g, x) =>
      val ub = full(g)._1.toDouble
      assert(x <= ub && ub <= x + 256, s"$g: p50 stat $x vs ub $ub")
    }
  }

  test("leakage split: no duplicate cluster straddles folds; folds tile the corpus") {
    import graft.operators.{Dedup, DedupCluster}
    val docs = Tables(spark, sf001, "documents")
    val cc = DedupCluster.connectedComponents(Dedup.lshCandidatesRaw(spark, sf001))
      .select(col("node").as("doc_id"), col("cluster_id"))
    val grp = coalesce(col("cluster_id"), col("doc_id"))
    val h = substring(md5(concat(lit("gsplit|"), grp.cast("string"))), 1, 1)
    val tagged = docs.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), grp.as("grp"),
        when(h <= "b", "train").when(h <= "d", "val").otherwise("test").as("split"))
    // Every group lands in exactly one fold.
    val straddlers = tagged.groupBy("grp")
      .agg(countDistinct(col("split")).as("nf")).where(col("nf") > 1).count()
    assert(straddlers === 0L)
    // Folds partition the corpus.
    assert(tagged.count() === docs.count())
    val q = SparkEntry.queries("samp_leakage_split")(spark, sf001)
    assert(q.agg(sum("n_docs")).head().getLong(0) === docs.count())
  }

  test("sketch build shuffles sketch-sized data, not input-sized data") {
    val li = Tables(spark, sf001, "lineitem")
    val sk = Sketches.cmsSketch(li, "l_suppkey")
    // The sketch is bounded by d·w cells no matter the input row count…
    assert(sk.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    // …and the plan carries a partial aggregate below the exchange, so
    // only pre-combined cells cross the wire (partial_sum since the
    // sketch build went through the weighted form).
    val plan = sk.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial_count") ||
      plan.contains("Partial"), s"no map-side combine in:\n$plan")
  }
}
