package graft.news

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The parquet lake layer (SURVEY.md §7.1 module 5).
  *
  * Layout: date-partitioned by `year_month_day` = yyyyMMdd (X12,
  * collect/consumer2.py:205,220) so the daily-report date filter (F5)
  * becomes Catalyst partition pruning — one directory scanned per day
  * instead of the reference's full glob scan
  * (dags/scripts/spark_daily_report.py:50,63).
  */
object Lake {

  val PartitionCol = "year_month_day"

  def withPartitionKey(df: DataFrame, ts: String): DataFrame =
    df.withColumn(PartitionCol, date_format(col(ts), "yyyyMMdd"))

  /** Append a batch, date-partitioned. zstd: best scan-speed/size
    * tradeoff for a lake that is written once and scanned daily. */
  def append(df: DataFrame, path: String, ts: String = "updated"): Unit =
    withPartitionKey(df, ts).write.mode(SaveMode.Append)
      .option("compression", "zstd")
      .partitionBy(PartitionCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** J1: dedup-on-write = the reference's `INSERT … ON CONFLICT (link)
    * DO NOTHING` (collect/consumer.py:81) as a left-anti join against
    * the existing store + in-batch dropDuplicates. Idempotent-effect:
    * re-appending the same batch is a no-op, which is what makes
    * at-least-once delivery exactly-once-effect (T1/T5).
    *
    * Returns the rows actually written. */
  def upsertByLink(spark: SparkSession, batch: DataFrame, storePath: String): DataFrame = {
    val deduped = batch.dropDuplicates("link")
    val fresh =
      if (pathExists(spark, storePath)) {
        val existing = spark.read.parquet(storePath).select("link")
        deduped.join(existing, Seq("link"), "left_anti")
      } else deduped
    // Two jobs on `fresh` (count + write) — persist to avoid recompute.
    fresh.persist()
    if (fresh.head(1).nonEmpty)
      fresh.write.mode(SaveMode.Append).parquet(storePath)
    val out = fresh
    fresh.unpersist(blocking = false)
    out
  }

  /** S12: post-report archival — move one day's partition directory from
    * the realtime lake into the archive (reference: webhdfs renames at
    * dags/scripts/spark_daily_report.py:285-293). A filesystem rename,
    * not a data rewrite: O(1) metadata on HDFS-like stores. Returns the
    * number of entries moved. */
  def archivePartition(spark: SparkSession, lakePath: String,
      archivePath: String, ymd: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$lakePath/$PartitionCol=$ymd")
    val fs = src.getFileSystem(conf)
    if (!fs.exists(src)) 0
    else {
      val dstDir = new org.apache.hadoop.fs.Path(archivePath)
      if (!fs.exists(dstDir)) fs.mkdirs(dstDir)
      val dst = new org.apache.hadoop.fs.Path(dstDir, s"$PartitionCol=$ymd")
      val n = fs.listStatus(src).length
      fs.rename(src, dst)
      n
    }
  }

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
