package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-scale proof for the lake-maintenance planners: the
  * compaction planner's packing window and the snapshot-diff join are
  * justified as "manifest-sized, not data-sized" — a 100 TB lake at
  * 128 MB/file lists ~800 K files. This main measures exactly that
  * claim: synthesize manifests of N files (no data behind them — the
  * planners only ever see (file, bytes) metadata), run the packing
  * plan and a manifest-level diff, and report wall seconds + driver
  * peak heap per decade. One JSON line per N, same consumption
  * contract as [[Bench]].
  *
  * The planner's single-partition running-sum window is the measured
  * risk: it must stay seconds-scale and fit the driver-side window
  * buffer at 100-TB file counts, which this proves rather than argues.
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(100000, 1000000, 4000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    /** Synthetic manifest: deterministic size mix spanning tiny JSON
      * rolls (the reference's 1-minute file roll) through near-target
      * parquet — sizes from a hash so every decade has the same
      * distribution shape. */
    def manifest(n: Int, salt: Int): DataFrame =
      spark.range(n.toLong).select(
        concat(lit("day="), (col("id") % 3650).cast("string"), lit("/part-"),
          format_string("%08d", col("id")), lit(".parquet")).as("file"),
        (pmod(xxhash64(col("id"), lit(salt)), lit(134217728L)) + 1024L).as("bytes"))

    val target = 128L * 1024 * 1024
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def peakHeapMb(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
        .map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
    }

    sizes.foreach { n =>
      // Reset peak-usage counters so each decade reports its own peak.
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .foreach(_.resetPeakUsage())

      val m = manifest(n, 1)
      // The packing plan: global running-sum window + groupBy — the
      // single-partition span under test. Aggregate to force full
      // execution without collecting plan rows to the driver.
      val (planStats, planSec) = timed {
        graft.operators.Maintenance.compactionPlan(m, target)
          .agg(count(lit(1)).as("bins"), sum(col("n_files")).as("files"),
            sum(col("bin_bytes")).as("bytes"))
          .collect()(0)
      }
      // Manifest-level snapshot diff: release N vs N' (drops on one
      // residue, size-changes on another, adds beyond the old range) —
      // one full-outer hash join on the file key, the same shape as
      // maint_snapshot_diff but at listing scale. v1 IS the planned
      // manifest above (same binding, so plan and diff measure the
      // same release by construction).
      val v1 = m
      val v2 = manifest(n + n / 50, 1)
        .where(xxhash64(col("file")) % 97 =!= 0)
        .withColumn("bytes",
          when(xxhash64(col("file")) % 31 === 0, col("bytes") + 7).otherwise(col("bytes")))
      val (diffStats, diffSec) = timed {
        v1.as("a").join(v2.as("b"), Seq("file"), "full_outer")
          .select(when(col("a.bytes").isNull, "added")
            .when(col("b.bytes").isNull, "removed")
            .when(col("a.bytes") === col("b.bytes"), "unchanged")
            .otherwise("changed").as("status"))
          .groupBy(col("status")).agg(count(lit(1)).as("n"))
          .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}")
          .sorted.mkString(",")
      }
      println(s"""{"metric":"manifest_scale","n_files":$n,"plan_sec":${f"$planSec%.2f"},"plan_bins":${planStats.getLong(0)},"diff_sec":${f"$diffSec%.2f"},"diff":"$diffStats","driver_peak_heap_mb":${peakHeapMb()}}""")
    }
    spark.stop()
  }
}
