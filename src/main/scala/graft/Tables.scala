package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables under a
  * scale-factor directory (see TESTDATA.md). One parquet file per table.
  *
  * Parquet carries its own schema, so no inference pass happens here —
  * the reference's schema-inference-on-every-read anti-pattern
  * (dags/scripts/spark_daily_report.py:55) is avoided by construction.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
    // (micros) cannot represent — read the raw int64 nanos and convert.
    // Integer `div` (not `/`): ns-epoch ~1.7e18 overflows double's 53-bit
    // mantissa, so float division would corrupt timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
