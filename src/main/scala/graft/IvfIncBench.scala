package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-curve driver for the incremental IVF index (dev tool,
  * BASELINE.md evidence): on any corpus dir, times the base build
  * (codebook train + assign + write), the frozen-codebook APPEND of
  * the residue-19 arrivals, and the full same-codebook rebuild over
  * the union that the append replaces. One JSON line per run.
  *
  * Usage: IvfIncBench <dir>
  */
object IvfIncBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables(spark, dir, "embeddings")
    val base = e.where(not(expr(IvfIndex.IncArrivalsWhere)))
    val arrivals = e.where(expr(IvfIndex.IncArrivalsWhere))
    val nBase = base.count()
    val nArr = arrivals.count()
    val root = java.nio.file.Files.createTempDirectory("ivfinc-bench").toFile
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val path = new java.io.File(root, "idx").toString
    val baseS = timed(IvfIndex.build(spark, base, path))
    val appendS = timed(IvfIndex.append(spark, path, arrivals))
    // The cost the append avoids: re-assign + rewrite EVERYONE under
    // the same (already-trained) codebook — the no-retrain rebuild.
    val cb = IvfIndex.readCodebook(spark, path)
    val rebuildPath = new java.io.File(root, "rebuild").toString
    val rebuildS = timed(IvfIndex.build(spark, e, rebuildPath, Some(cb)))
    // Steady-state probe over the appended index (5 queries, probe-1).
    var rows = 0L
    val searchS = timed {
      rows = IvfIndex.search(spark, path,
        e.where(col("vec_id") < 5), k = 3, nprobe = 1).count()
    }
    def r3(v: Double) = math.rint(v * 1000) / 1000
    println(s"""{"metric":"ivfinc","dir":"$dir","n_base":$nBase,"n_arrivals":$nArr,"base_build_s":${r3(baseS)},"append_s":${r3(appendS)},"full_rebuild_s":${r3(rebuildS)},"search_s":${r3(searchS)},"search_rows":$rows}""")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root.toString), true)
    spark.stop()
  }
}
