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
  "text_unigram_ppl", "sim_quantize_int8", "sim_quantized_recall", "scd2_asof_snapshot",
  "graph_triangles", "decontam_ngram", "pii_pseudonymize", "m1b_pca_power",
  "m2b_kmeans_lloyd", "sim_ivf_assign", "sim_ivf_pq_search", "idx_bm25_topk",
  "idx_hybrid_rrf", "dedup_chunk_spans", "decontam_embed",
  "dedup_semantic", "idx_bm25_persisted", "dedup_substr_spans", "dsir_select",
  "m3_logreg_quality", "sim_hard_negatives", "sim_binary_hamming",
  "sim_mrl_recall", "mix_token_budget", "text_dedup_intradoc",
  // dedup_lsh_inc is appended tree-only with cached subtrees elided (its
  // formatted dump re-inlines each persisted plan per scan, ~200 KB) —
  // see the section's note; keep it out of the full-dump key list.
  "dedup_incremental", "dedup_cdc_chunks", "samp_dedup_aware",
  "idx_bm25_negatives", "idx_eval_ndcg", "pack_padding_waste",
  "sim_label_outliers", "quality_gopher", "dedup_keep_longest",
  "j3_asof_tolerance", "curate_domain_cap", "priv_k_anonymity",
  "samp_ess", "text_ttr", "graph_link_predict", "ev_retention_cohorts",
  "t10_mad_outliers", "sim_ivf_persisted", "maint_compact_plan",
  "graph_link_predict_capped", "sk_cms_heavy", "maint_snapshot_diff",
  "sim_ivf_lsm", "sim_ivf_lsm_retrain", "pipe_vector_lifecycle")
// One-line reviewed finding per plan: what the physical plan must show
// (and does — PlanSpec pins the load-bearing ones as assertions).
val notes: Map[String, String] = Map(
  "a1_pricing_summary" -> "PushedFilters carries the shipdate bound into the parquet scan; partial+final HashAggregate around one exchange.",
  "j2_dim_broadcast" -> "Dimension side builds a BroadcastExchange — no shuffle of the fact table.",
  "j2_fact_join" -> "Fact-fact join shuffles both sides on the key once; AQE coalesces post-shuffle partitions.",
  "o2_topk_parts" -> "TakeOrderedAndProject — engine-side top-k, not sort-the-world + limit.",
  "dedup_minhash_lsh" -> "Band self-join keys on (band, key): only bucket collisions meet; minhash build is map-side partial-aggregated.",
  "sim_topk_bruteforce" -> "Query set broadcast; VecDot codegen expressions inline in the scan stage; per-query rank via WindowGroupLimit.",
  "t5_sessionize" -> "One exchange on user_id serves both session windows (gap detection + rollup).",
  "f5_date_range_agg" -> "Both date bounds reach PushedFilters; ReadSchema prunes to the aggregated columns.",
  "sql_q5_region_revenue" -> "Region predicate pushed into the region scan; dims broadcast up the join tree.",
  "sql_q10_returned" -> "Top-20 via TakeOrderedAndProject with the returnflag filter at the lineitem scan.",
  "text_tfidf_topterms" -> "WindowGroupLimit prunes to top-3 per doc before the full sort would materialize.",
  "samp_stratified" -> "md5-threshold filter evaluates in the scan stage — sampling never shuffles.",
  "j3_asof_native" -> "Custom AsOfJoinExec: ClusteredDistribution on the key + (key, time) sort per side, then a streaming sorted merge.",
  "bloom_prefilter" -> "The bit-set build aggregates to <= BloomBits rows and broadcasts back over the probe side.",
  "layout_zorder" -> "Morton interleave is pure shift/mask projection — WholeStageCodegen, no exchange.",
  "sk_hll_groups" -> "Register table partial-aggregates map-side; the estimate derives from a sketch-sized exchange.",
  "ev_funnel" -> "All three stages cluster on user_id — a single hashpartitioning key throughout.",
  "scd2_history" -> "Both window passes + the rollup sit inside ONE user_id exchange (PlanSpec-pinned).",
  "inc_rollup_merge" -> "Base and delta rollups partial-aggregate independently; the merge is a re-aggregation of rollup-sized input.",
  "cdc_apply_latest" -> "No Window operator: max_by(struct) plans as partial+final SortAggregate around one user_id exchange (PlanSpec-pinned).",
  "iv_overlap_join" -> "The theta predicate never reaches a BNL: binning makes it an equi-join on bin (PlanSpec-pinned), exact predicate re-checked after.",
  "skew_salted_agg" -> "Two-phase aggregation: the (k, salt) partial splits the hot group across tasks before the final k-only exchange.",
  "skew_salted_join" -> "The salt-replicated dim broadcasts; the fact side's probe spreads over NumSalts hash slots.",
  "simjoin_prefix" -> "Verify side joins collected arrays through the codegen'd sorted_intersect_count_str merge kernel (PlanSpec-pinned) — no candidate x token explode; windows run per doc / per token partition.",
  "sk_quantile_hist" -> "The cumulative window runs over the histogram (bins per group), never the data; the histogram build is one map-side-combined exchange.",
  "samp_leakage_split" -> "The cluster map joins the corpus as the small side; split hashing is scan-stage arithmetic.",
  "inc_join_merge" -> "Three delta-term joins reuse the o_orderkey clustering; A0 x B0 is never rejoined.",
  "text_unigram_ppl" -> "Vocabulary join left unhinted — AQE broadcasts it at these SFs; degrades to a shuffle join when the vocab outgrows the driver.",
  "sim_quantize_int8" -> "64-row dim stats broadcast; code arithmetic is codegen'd scan-stage math; per-vector rollup is one exchange.",
  "sim_quantized_recall" -> "Quantized dot as join-aggregate over exploded dims; both rankings via WindowGroupLimit.",
  "scd2_asof_snapshot" -> "The point-in-time filter applies over the history windows — no second event-log scan.",
  "graph_triangles" -> "Edge-iterator census: src-side adjacency join co-partitioned with its groupBy; dst-side adjacency broadcast below the 100M-edge ceiling; the codegen'd sorted_intersect_count merge kernel evaluates in the join stage — no wedge materialization.",
  "decontam_ngram" -> "Eval shingle set broadcast (benchmark-sized); the exploded train side never shuffles — only colliding rows reach the pair aggregation.",
  "pii_pseudonymize" -> "Pure map-side projection over the customer scan — zero exchanges at any scale.",
  "m1b_pca_power" -> "Returned plan is a literal-projection over the cached 2-column view: the one distributed pass (wide covariance aggregate) ran eagerly; no join or shuffle remains in the consumer plan.",
  "m2b_kmeans_lloyd" -> "Assignment is a broadcast map (centroid literals in a least-of-structs projection) over the cached view — no join, no shuffle.",
  "sim_ivf_assign" -> "Fixed-K codebook as driver literals: assignment is ONE projection over the embeddings scan — no Exchange, no Join anywhere (PlanSpec-pinned); broadcast size is K-proportional, corpus-independent.",
  "sim_ivf_pq_search" -> "Probed cells only: the ADC scoring joins cell members against the broadcast query set; exact re-rank touches the shortlist, never the corpus.",
  "idx_bm25_topk" -> "Postings filter evaluates in the explode stage; term stats (|terms| rows) broadcast; final ranking is TakeOrderedAndProject (PlanSpec-pinned).",
  "idx_hybrid_rrf" -> "Each tower is an independent top-20 TakeOrderedAndProject; the fusion full-outer join runs over 20∪20 rows — list-sized regardless of corpus.",
  "dedup_chunk_spans" -> "Content-addressed: chunk explode is map-side; ownership is a partial-aggregated groupBy(hash) + hash-keyed join back — no pairwise compare (PlanSpec-pinned: no BNL/cartesian).",
  "decontam_embed" -> "Eval slice broadcast (benchmark-sized); the train side is one scan-stage pass + per-vector aggregation — mirrors decontam_ngram's shape in embedding space.",
  "dedup_semantic" -> "Adaptive-K codebook (K ~ sqrt(n/2)) bounds cells so the within-cell self-join is O(n^1.5) total; coarse assignment is the O(1)-in-K centroid_structs kernel, one projection over the scan.",
  "idx_bm25_persisted" -> "Search reads the PERSISTED postings bucketed by token: the partition filter keeps only the query terms' buckets; doclen/stats come from the tiny persisted side tables, broadcast.",
  "dedup_substr_spans" -> "Overlapping shingle windows hash map-side; ownership is the same groupBy(hash)+join-back shape as chunk spans — no pairwise compare at any window offset.",
  "dsir_select" -> "Both unigram models ride ONE vocab-sized aggregate (target counts as a conditional sum); scoring joins candidate tokens to the vocab (AQE-broadcastable); top-k is TakeOrderedAndProject (PlanSpec-pinned).",
  "m3_logreg_quality" -> "Each GD round is one map-side-combined 5-aggregate pass; weights are driver literals, so the returned scoring plan is a pure projection over the cached feature view.",
  "sim_hard_negatives" -> "Anchor batch capped at HardNegAnchors rows and broadcast (PlanSpec-pinned); candidate side is one linear scan with VecDot codegen — O(B*n), never O(n^2).",
  "sim_binary_hamming" -> "Sign-bit packing is scan-stage fold arithmetic (one long per vector, 32x smaller); ranking is popcount(xor) against 5 broadcast query codes + WindowGroupLimit.",
  "sim_mrl_recall" -> "Two linear passes (full-dim and prefix-dim cosine) against the same 5-anchor broadcast; recall join runs over two 25-row tops.",
  "mix_token_budget" -> "One corpus-sized token count per source (map-side combined); every downstream step runs on the sources-sized frame against a broadcast scalar.",
  "text_dedup_intradoc" -> "Every window and aggregate keys on doc_id (PlanSpec-pinned: no off-key exchange) — per-doc repair work, embarrassingly parallel.",
  "dedup_incremental" -> "Asymmetric LSH: batch-side band rows meet only colliding corpus buckets — O(batch*collisions); the corpus is never self-joined; Jaccard verify touches candidate ids only.",
  "dedup_lsh_inc" -> "Same asymmetric shape over the LSM-maintained band view: arrival bands (delta-sized, broadcastable) meet the merged parquet scan; tombstone anti-join is broadcast; shingles are computed only for candidate docs (semi-join into v2).",
  "dedup_cdc_chunks" -> "Rolling-hash boundary detection and chunk assembly are per-doc windows keyed on doc_id; chunk hashes feed the content-addressed span-dedup machinery.",
  "samp_dedup_aware" -> "Only the duplicate subgraph shuffles (CC build); the weights attach via a broadcastable left join — the clean majority of the corpus passes through untouched.",
  "idx_bm25_negatives" -> "idx_bm25_topk's plan plus one anti-join against the (small) relevant set; ranking stays TakeOrderedAndProject.",
  "idx_eval_ndcg" -> "All metric arithmetic runs on the 10-row ranked frame crossed with a 1-row relevant-count broadcast — the corpus-sized work is the ranking itself.",
  "pack_padding_waste" -> "Per-doc arithmetic exploded over a constant 4-row window-size dimension; one 4-key map-side-combined aggregate.",
  "sim_label_outliers" -> "Three aggregate passes (centroids, distances, moments), each broadcast back — labels x Dim rows, never corpus-to-corpus.",
  "quality_gopher" -> "Pure integer-arithmetic gate per doc; zero-token docs restored by a left join — one explode + one combine, no shuffle beyond doc_id.",
  "dedup_keep_longest" -> "Survivor choice is one window over duplicate-cluster members only; the CC build's exchanges are the only corpus-sized shuffles.",
  "j3_asof_tolerance" -> "Same AsOfJoinExec merge as j3_asof_native; the tolerance is a post-join CASE projection — no second pass, no extra exchange.",
  "curate_domain_cap" -> "TopKAggregator: ObjectHashAggregate partial+final on source — each group ships <= k entries through the exchange, never the domain's rows.",
  "priv_k_anonymity" -> "Two chained HashAggregates; the second runs on |classes| rows — the corpus shuffles once on the quasi-identifier.",
  "samp_ess" -> "Single partial+final HashAggregate of two integer sums per lang; ReadSchema prunes to (lang, n_chars).",
  "text_ttr" -> "Pure per-doc expression work in one WholeStageCodegen span over the scan — zero exchanges.",
  "graph_link_predict" -> "md5 sample filter evaluates in the lineitem scan; wedge fan-out is in-list expansion (no self-join); anti-join against edges + TakeOrderedAndProject for the top-20.",
  "ev_retention_cohorts" -> "Distinct, first-week, and activity aggregates all exchange on user_id once; the cohort-size join is broadcastable (|cohorts| rows).",
  "t10_mad_outliers" -> "Both median selections are rank windows on the same user_id partitioning; one exchange serves windows and the final aggregate.",
  "sim_ivf_persisted" -> "Scan of the versioned assignments table carries PartitionFilters on the probed centroid_id cells (directory pruning); the query set broadcasts; one rank window for top-k.",
  "maint_compact_plan" -> "Manifest build is one partial+final HashAggregate over (day, type); the packing window and bin aggregate run on file-count-sized rows — the single-partition sort is metadata-bounded by design.",
  "graph_link_predict_capped" -> "Wedge fan-out is in-list expansion over Q-capped neighbor lists (N·C(Q,2) hard bound, full graph, no sample); the anti-join probes the edge artifact scan; TakeOrderedAndProject for the top-20.",
  "sk_cms_heavy" -> "One map-side-combined aggregate over lineitem, localCheckpointed; sketch build, probe and ranking all run on the |suppliers| keyed frame — the sketch broadcast-joins the 10-row probe.",
  "maint_snapshot_diff" -> "One full-outer SortMergeJoin on doc_id comparing md5 fingerprints — only the 32-char hash crosses the shuffle, never the text; the status rollup is a partial+final aggregate.",
  "sim_ivf_lsm" -> "Merge-on-read: union of segment scans minus BROADCAST tombstone anti-joins; the query x probed-cell set broadcasts against the view; exact cosine ranks via a window over query-sized partitions — no corpus shuffle anywhere.",
  "sim_ivf_lsm_retrain" -> "Post-recluster the live generation is ONE cid-laid-out segment under its own codebook (manifest meta), so the probe is a single parquet scan + broadcast query join — the read-optimized shape recovered after drift handling.",
  "pipe_vector_lifecycle" -> "Probes the RETAINED index: one compacted cid-laid-out segment scan; the drift guard cross-joins two candidate-sized exceptAll aggregates; the terminal generation constants are literals.")
val sb = new StringBuilder
sb ++= "# PLANS — formatted physical plans of headline queries (sf0.01)\n\n"
sb ++= "Generated from `df.queryExecution.explainString(FormattedMode)`; regenerate with tools/plans_dump.scala.\n"
sb ++= "Reviewed for: parquet filter pushdown + ReadSchema pruning, broadcast vs shuffle join choice,\n"
sb ++= "TakeOrderedAndProject top-k, partial+final aggregation, and whole-stage codegen spans.\n\n"
keys.foreach { k =>
  val plan = SparkEntry.queries(k)(spark, dir).queryExecution.explainString(ExplainMode.fromString("formatted"))
  sb ++= s"## $k\n\n"
  notes.get(k).foreach(n => sb ++= s"_Reviewed: ${n}_\n\n")
  sb ++= s"```\n$plan```\n\n"
}
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE PLANS.md " + sb.length)
