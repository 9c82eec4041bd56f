package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every inventory query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is materialized through the `noop` sink — `count()` would
  * let Catalyst prune projections and undercount the real work; noop
  * executes the full plan and discards rows (no disk in the timing).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // Dev knobs for scale experiments: SPARK_GRAFT_SHUFFLE_PARTITIONS
    // overrides the partition count; SPARK_GRAFT_INIT_PARTITIONS sets
    // AQE's pre-coalesce partition number (size-based partitioning —
    // big shuffles keep many partitions, small ones coalesce down).
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_INIT_PARTITIONS").foreach(n => builder
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen paths so the first measured query isn't
    // charged for session startup.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    // Dev-only subset filter: SPARK_GRAFT_ONLY=q1,q2 benches just those.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Cache hygiene: session-lifetime memos (Dedup.materialized, the CC
    // memo, SimJoin persists) are useful WITHIN a query family but were
    // found to pressure the heap for the alphabetically-later scalar
    // batteries. Drop everything at each family boundary (prefix before
    // the first '_') so no query is charged for another family's cache.
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = os.getSystemLoadAverage
    // The ML twins (m1/m1b/m2/m2b) deliberately share one cached
    // embeddings view — grouping them keeps the boundary clear from
    // evicting the cache they were built to share.
    def family(name: String): String = {
      val f = name.takeWhile(_ != '_')
      if (f.startsWith("m1") || f.startsWith("m2")) "ml" else f
    }
    var prevFam = ""
    val results = selected.map { case (name, fn) =>
      val fam = family(name)
      if (prevFam.nonEmpty && fam != prevFam) spark.catalog.clearCache()
      prevFam = fam
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val loadEnd = os.getSystemLoadAverage
    // Millisecond precision: the artifact consumer keeps only a bounded
    // tail of this line, and full-double formatting halves how many
    // per-query timings fit in it. 1 ms ≪ the VM's run-to-run noise.
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","load_avg_start":$loadStart,"load_avg_end":$loadEnd}""")
    // The artifact consumer preserves only a bounded TAIL of stdout, so
    // the per-query map above gets truncated to its alphabetical tail —
    // the most expensive queries (dedup_*, graph_*, idx_*) never reach
    // the durable record. This compact summary is the LAST line for
    // exactly that reason: total, median, and the worst-10 by time
    // always survive the truncation, keeping round-over-round
    // comparison of the head families possible from driver artifacts.
    val times = results.map(_._2).sorted
    val median =
      if (times.isEmpty) 0.0
      else if (times.size % 2 == 1) times(times.size / 2)
      else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
    val worst10 = results.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"summary","value":${ms(total)},"unit":"sec","n_queries":${results.size},"median":${ms(median)},"worst10":$worst10,"sf":"$sfDir","load_avg_start":$loadStart,"load_avg_end":$loadEnd}""")
    spark.stop()
  }
}
