package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning (SURVEY.md §4.2): the two behaviors the
  * engine leans on at 100 TB — post-shuffle partition coalescing (so
  * `spark.sql.shuffle.partitions` can be sized for the big stages
  * without penalizing the small ones) and skew-join splitting (so one
  * hot key cannot stall a stage). The executed plan itself is asserted:
  * the plan must come from the SAME QueryExecution that ran — a fresh
  * action (count/noop) re-plans from scratch and shows the initial,
  * un-adapted plan. */
class AqeSpec extends SparkSuite {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true") {
      val df = spark.range(100000).toDF("id")
        .withColumn("k", col("id") % 10).groupBy("k").count()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("AQEShuffleRead coalesced"), plan)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 280k of 300k rows share key 0 → one hot shuffle partition
      val skewed = spark.range(300000).toDF("id")
        .withColumn("k", when(col("id") < 280000, 0L).otherwise(col("id")))
        .withColumn("pad", lpad(col("id").cast("string"), 64, "x"))
      val dim = spark.range(1000).toDF("k").withColumn("v", col("k") * 2)
      val jdf = skewed.join(dim, "k")
      jdf.queryExecution.toRdd.foreach(_ => ()) // execute THIS QueryExecution
      val plan = jdf.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)"), plan)
      assert(plan.contains("skewed"), plan)
    }
  }
}
