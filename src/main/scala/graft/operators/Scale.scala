package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale layout and skew tooling (SURVEY.md §4.2, §7): the
  * physical choices that decide whether a plan survives a 100× scale-up.
  *
  *  - Bucketing: pre-shuffle fact tables on the join key once at write
  *    time; every subsequent equi-join/aggregation on that key is
  *    shuffle-free (co-located). At 100 TB this converts the dominant
  *    recurring cost (fact-fact shuffle) into a one-time layout cost.
  *  - Salting: for skewed keys, spread one hot key over N sub-keys and
  *    replicate the small side N ways; AQE's skew-join handles moderate
  *    skew automatically, salting is the explicit fallback for extreme
  *    single-key skew (one key > executor memory).
  */
object Scale {

  /** Write `df` bucketed (and sorted) by `key` as a managed table.
    * Reading it back joins/aggregates on `key` without an Exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join with the left side's hot keys salted: `left`'s key k
    * becomes (k, salt∈[0,n)); `right` is replicated n ways so every
    * salted partition finds its match. Result equals a plain inner join
    * on `key` — only the partitioning differs. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, n: Int): DataFrame = {
    val salted = left.withColumn("_salt", (rand(seed = 42) * n).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
