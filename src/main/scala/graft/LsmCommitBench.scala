package graft

import graft.operators.{IncPostings, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-contention evidence for the optimistic LSM protocol (dev
  * tool, BASELINE.md): W concurrent delta writers × C commits each,
  * plus an optional compactor thread, against one index root. Reports
  * wall seconds, committed generations, lost-race rebases, and the
  * final merged-view row count — the cost of optimistic concurrency
  * is the REBASE RATE, and this measures it instead of arguing it.
  *
  * Usage: LsmCommitBench [writers] [commitsPerWriter] [withCompactor]
  */
object LsmCommitBench {
  def main(args: Array[String]): Unit = {
    val writers = args.headOption.map(_.toInt).getOrElse(4)
    val commits = if (args.length > 1) args(1).toInt else 10
    val withCompactor = if (args.length > 2) args(2).toBoolean else true
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("lsm-commit-bench").toFile
    IncPostings.commitBase(root,
      TextOps.trigramRowsOf(Seq(1L -> "base doc text").toDF("doc_id", "text")))
    IncPostings.contentionRetries.set(0L)

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def writer(w: Int): Thread = new Thread(() => {
      try (0 until commits).foreach { i =>
        val id = 1000L * (w + 1) + i
        IncPostings.commitDelta(root,
          TextOps.trigramRowsOf(Seq(id -> s"doc $id body").toDF("doc_id", "text")),
          spark.emptyDataset[Long].toDF("doc_id"))
      } catch { case t: Throwable => failures.add(t) }
    })
    @volatile var stop = false
    val compactor = new Thread(() => {
      try while (!stop) {
        if (IncPostings.liveSegmentCount(root) >= 4)
          IncPostings.compact(spark, root)
        Thread.sleep(20)
      } catch { case t: Throwable => failures.add(t) }
    })

    val t0 = System.nanoTime()
    val ws = (0 until writers).map(writer)
    ws.foreach(_.start())
    if (withCompactor) compactor.start()
    ws.foreach(_.join())
    stop = true
    if (withCompactor) compactor.join()
    val wallS = (System.nanoTime() - t0) / 1e9

    require(failures.isEmpty, failures.toString)
    val gen = IncPostings.committedGen(root)
    val rows = IncPostings.readCurrent(spark, root).count()
    val retries = IncPostings.contentionRetries.get()
    def r3(v: Double) = math.rint(v * 1000) / 1000
    println(s"""{"metric":"lsm_commit_contention","writers":$writers,"commits_per_writer":$commits,"with_compactor":$withCompactor,"wall_s":${r3(wallS)},"committed_gens":$gen,"lost_race_rebases":$retries,"commits_per_s":${r3(writers * commits / wallS)},"merged_rows":$rows}""")
    val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    lfs.delete(new org.apache.hadoop.fs.Path(root.toString), true)
    spark.stop()
  }
}
