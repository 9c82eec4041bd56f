package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module inventories (one entry per
  * operator from SURVEY.md §2 plus the LLM-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent SQL for every entry that is
  * ANSI-SQL-expressible. Keys without an oracle get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A fact-fact join + grouped agg: the daily-report shape (SURVEY §3.1)
    * on the synthetic star schema. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        functions.Num.roundp(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Extended.queries ++
      operators.Extended2.queries ++
      operators.Extended3.queries ++
      operators.TpchExtra.queries ++
      operators.AsOf.queries ++
      operators.TextOps.queries ++
      operators.Curation.queries ++
      operators.Dedup.queries ++
      operators.DedupCluster.queries ++
      operators.Graph.queries ++
      operators.Sketches.queries ++
      operators.Layout.queries ++
      operators.Maintenance.queries ++
      operators.Similarity.queries ++
      operators.Events.queries ++
      operators.Multimodal.queries ++
      operators.MLOps.queries ++
      operators.Scale2.queries ++
      operators.SimJoin.queries ++
      operators.PostingsIndex.queries ++
      operators.IncPostings.queries ++
      operators.IvfIndex.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Extended.oracles ++
      operators.Extended2.oracles ++
      operators.Extended3.oracles ++
      operators.TpchExtra.oracles ++
      operators.AsOf.oracles ++
      operators.TextOps.oracles ++
      operators.Curation.oracles ++
      operators.Dedup.oracles ++
      operators.DedupCluster.oracles ++
      operators.Graph.oracles ++
      operators.Sketches.oracles ++
      operators.Layout.oracles ++
      operators.Maintenance.oracles ++
      operators.Similarity.oracles ++
      operators.Events.oracles ++
      operators.Multimodal.oracles ++
      operators.MLOps.oracles ++
      operators.Scale2.oracles ++
      operators.SimJoin.oracles ++
      operators.IvfIndex.oracles ++
      operators.PostingsIndex.oracles ++
      operators.IncPostings.oracles
}
