package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSuite {

  test("bucketed tables join and aggregate without a shuffle") {
    val li = Tables(spark, sf001, "lineitem")
    val o = Tables(spark, sf001, "orders")
    Scale.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Scale.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "b_orders", "l_orderkey", 8)

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), "l_orderkey")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: no Exchange below the join; the only exchange allowed
    // is the final 5-row aggregation
    assert(!plan.contains("SortMergeJoin") || !plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    // result equality vs the unbucketed join
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap)

    spark.sql("DROP TABLE b_lineitem")
    spark.sql("DROP TABLE b_orders")
  }

  test("salted join equals plain join") {
    val li = Tables(spark, sf001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val saltedN = Scale.saltedJoin(li, o, "l_orderkey", 4).count()
    val plainN = li.join(o, "l_orderkey").count()
    assert(saltedN == plainN)
  }

  test("hive-partitioned layout prunes partitions at the scan (S7/F5)") {
    val tmp = java.nio.file.Files.createTempDirectory("prune").toString + "/t"
    Tables(spark, sf001, "events")
      .withColumn("event_date", date_format(col("ts"), "yyyyMMdd"))
      .write.partitionBy("event_date").parquet(tmp)

    val d0 = Tables(spark, sf001, "events")
      .select(date_format(min(col("ts")), "yyyyMMdd")).collect().head.getString(0)
    val one = spark.read.parquet(tmp).where(col("event_date") === d0)
    val plan = one.queryExecution.executedPlan.toString
    // the date predicate must land in PartitionFilters (directory
    // pruning), NOT as a row-level data filter over all partitions
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"), plan)
    assert(!plan.contains("PushedFilters: [IsNotNull(event_date"), plan)
    val expected = Tables(spark, sf001, "events")
      .where(date_format(col("ts"), "yyyyMMdd") === d0).count()
    assert(one.count() == expected && expected > 0)
  }

  test("maxPartitionBytes controls scan parallelism") {
    // Partition sizing is the lever that keeps scan tasks executor-sized
    // at 100 TB: the same file must split into more tasks under a
    // smaller target split size.
    val saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val path = s"$sf001/../sf0.01/lineitem.parquet" // ~1 MB file
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "128MB")
      val coarse = spark.read.parquet(path).rdd.getNumPartitions
      spark.conf.set("spark.sql.files.maxPartitionBytes", "131072") // 128 KB
      val fine = spark.read.parquet(path).rdd.getNumPartitions
      assert(coarse <= 2, s"coarse=$coarse")
      assert(fine > coarse, s"fine=$fine coarse=$coarse")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
  }

  test("CBO table statistics drive the plan: rowCount known, dim broadcast") {
    // At 100 TB, ANALYZE'd catalog tables let the cost-based optimizer
    // size joins from statistics instead of file sizes.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      Tables(spark, sf001, "nation").write.mode("overwrite").saveAsTable("cbo_nation")
      Tables(spark, sf001, "supplier").write.mode("overwrite").saveAsTable("cbo_supplier")
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_supplier COMPUTE STATISTICS")
      val nStats = spark.table("cbo_nation").queryExecution.optimizedPlan.stats
      assert(nStats.rowCount.contains(BigInt(25)), nStats)
      val j = spark.table("cbo_supplier")
        .join(spark.table("cbo_nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      assert(j.collect().map(_.getAs[Long]("n")).sum == 10) // all suppliers
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_nation")
      spark.sql("DROP TABLE IF EXISTS cbo_supplier")
      spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // At 100 TB a selective dimension predicate should reach the fact
    // scan as a runtime bloom filter when the join isn't broadcast-able.
    // The size thresholds are tuned for clusters; drop them so the local
    // fixture triggers the same plan rewrite.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables(spark, sf001, "lineitem")
      val o = Tables(spark, sf001, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus")).agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized)
      assert(optimized.contains("bloom_filter_agg"), optimized)
      assert(j.collect().map(_.getAs[Long]("n")).sum > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
