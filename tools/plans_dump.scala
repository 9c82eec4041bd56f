import graft.SparkEntry
import org.apache.spark.sql.execution.ExplainMode
val dir = "/root/testdata/sf0.01"
val keys = Seq("a1_pricing_summary", "j2_dim_broadcast", "j2_fact_join", "o2_topk_parts",
  "dedup_minhash_lsh", "sim_topk_bruteforce", "t5_sessionize", "f5_date_range_agg",
  "sql_q5_region_revenue", "sql_q10_returned", "text_tfidf_topterms", "samp_stratified",
  "sql_q4_priority", "sql_q21_waiting_supplier", "sql_q19_disjunctive",
  "t6_sliding_window", "sim_label_centroids", "text_repetition",
  "j3_asof_native", "bloom_prefilter", "layout_zorder", "sk_hll_groups",
  "ev_funnel", "scd2_history", "inc_rollup_merge", "idx_inverted_and", "t8_twap",
  "cdc_apply_latest", "iv_overlap_join", "skew_salted_agg", "skew_salted_join",
  "simjoin_prefix", "sk_quantile_hist", "samp_leakage_split", "inc_join_merge",
  "text_unigram_ppl", "sim_quantize_int8", "sim_quantized_recall", "scd2_asof_snapshot")
val sb = new StringBuilder
sb ++= "# PLANS — formatted physical plans of headline queries (sf0.01)\n\n"
sb ++= "Generated from `df.queryExecution.explainString(FormattedMode)`; regenerate with tools/plans_dump.scala.\n"
sb ++= "Reviewed for: parquet filter pushdown + ReadSchema pruning, broadcast vs shuffle join choice,\n"
sb ++= "TakeOrderedAndProject top-k, partial+final aggregation, and whole-stage codegen spans.\n\n"
keys.foreach { k =>
  val plan = SparkEntry.queries(k)(spark, dir).queryExecution.explainString(ExplainMode.fromString("formatted"))
  sb ++= s"## $k\n\n```\n$plan```\n\n"
}
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE PLANS.md " + sb.length)
