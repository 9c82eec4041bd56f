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
    // events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    // across testdata generations. nanosAsLong=true makes a NANOS column
    // surface as raw int64 (Spark's TimestampType is micros and cannot
    // hold nanos); MICROS surfaces as a timestamp type directly. Branch on
    // what the file actually gave us instead of assuming a generation.
    // Integer `div` (not `/`): ns-epoch ~1.7e18 overflows double's 53-bit
    // mantissa, so float division would corrupt timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          // Session TZ is UTC everywhere (Verify/Bench/specs), so NTZ→TZ
          // is a type tag change, not a wall-clock shift.
          df.withColumn("ts", col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else df
  }
}
