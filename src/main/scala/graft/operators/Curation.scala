package graft.operators

import graft.Tables
import graft.functions.{Num, Text}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Round-3 corpus-curation operators — the remaining standard
  * pretraining-data filters (Gopher/C4 family) not yet covered by
  * TextOps/Extended2:
  *
  *  - repetition scoring: top-token dominance and duplicate-2-gram
  *    fraction per document (the Rae et al. "Gopher" repetition rules —
  *    high dominance or high n-gram duplication marks boilerplate and
  *    degenerate text);
  *  - weighted source mixing: per-source deterministic keep fractions by
  *    md5-hash threshold — the reproducible way to hit a target corpus
  *    mixture (e.g. 4:2:1 web:news:forum) without `sample()`'s
  *    seed-and-partitioning dependence.
  *
  * Scale notes: repetition scoring is two explode→partial-aggregate
  * passes keyed on doc_id (map-side combine carries most of the
  * reduction; no row ever leaves its doc's key partition), joined on the
  * shared key. The mixing filter is a pure map-side predicate — zero
  * shuffle, pushdown-friendly, and stable under repartitioning, retries,
  * and cluster size (unlike rand()-based sampling).
  */
object Curation {

  private def toks = Text.tokens(col("text"))

  val queries: Map[String, Relational.Q] = Map[String, Relational.Q](

    // ── Gopher-style repetition profile per document. ─────────────────
    "text_repetition" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val tokRows = docs.select(col("doc_id"), explode(toks).as("tok"))
      val dominance = tokRows
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_tok"))
      val grams = docs
        .select(col("doc_id"), explode(Text.shingles(toks, 2)).as("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_2g"), count_distinct(col("g")).as("n_2g_uniq"))
      dominance.join(grams, "doc_id").select(
        col("doc_id"),
        Num.roundp(col("top_c").cast("double") / col("n_tok"), 4)
          .as("top_tok_frac"),
        Num.roundp(lit(1.0) - col("n_2g_uniq").cast("double") / col("n_2g"), 4)
          .as("dup_2gram_frac"),
        (col("top_c").cast("double") / col("n_tok") <= 0.2 &&
          (lit(1.0) - col("n_2g_uniq").cast("double") / col("n_2g")) <= 0.6)
          .as("rep_ok"))
    }),

    // ── Importance-resampling data selection (the DSIR recipe, Xie et
    // al. 2023, re-expressed as two aggregation passes): score every
    // candidate document by its average per-token log importance ratio
    // ln p_target(t) − ln p_corpus(t) under add-one-smoothed unigram
    // models, where the target model is estimated from a small
    // held-out "domain" slice (stand-in here: doc_id % 7 == 0 — a
    // fixed benchmark-sized input in a real deployment) and the raw
    // model from the whole corpus; keep the top-k. High ratio = "looks
    // like the target domain, unlike generic corpus text" — the
    // standard cheap proxy for quality/domain selection at pretraining
    // scale. Scale shape: both models live in ONE vocab-sized
    // aggregate (map-side combined; the target slice's counts ride
    // along as a conditional sum, so the corpus is read once); scoring
    // joins candidate tokens to the vocab (unhinted — broadcastable
    // while Heaps' law holds, degrades to a shuffle join when the
    // vocabulary outgrows the driver) and the global top-k is
    // TakeOrderedAndProject, never a full sort. ──────────────────────
    "dsir_select" -> ((s, dir) => {
      val tk = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(toks).as("term"))
      val isTarget = col("doc_id") % 7 === 0
      val cnt = tk.groupBy(col("term")).agg(
        count(lit(1)).as("c_all"),
        sum(when(isTarget, 1L).otherwise(0L)).as("c_t"))
      val tot = cnt.agg(sum(col("c_all")).as("t_all"),
        sum(col("c_t")).as("t_t"), count(lit(1)).as("v"))
      val ratio =
        log((col("c_t") + 1).cast("double") / (col("t_t") + col("v"))) -
          log((col("c_all") + 1).cast("double") / (col("t_all") + col("v")))
      tk.where(!isTarget)
        .join(cnt, "term").crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), Num.roundp(avg(ratio), 6).as("lr"))
        .orderBy(col("lr").desc, col("doc_id")).limit(20)
    }),

    // ── Token-budget mixture planning (the "how many epochs of each
    // source under a fixed training budget" question — the repeated-
    // data regime of Muennighoff et al. 2023): per-source token counts
    // → temperature-flattened target weights (α = 0.5, the standard
    // multilingual/multi-source flattening) → token allocation under a
    // budget of half the corpus → epochs = allocation / source size,
    // with epochs > 4 flagged (past ~4 repeats, marginal value decays
    // to noise). Everything after the ONE corpus-sized aggregate
    // (per-source token counts, map-side combined) runs on a
    // sources-sized frame — the plan is corpus-size-independent, and
    // the weights are quantized before allocation so both engines
    // split the identical budget. ────────────────────────────────────
    "mix_token_budget" -> ((s, dir) => {
      val bySrc = Tables(s, dir, "documents")
        .select(col("source"), explode(toks).as("t"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_tokens"))
      val tot = bySrc.agg(sum(col("n_tokens")).as("corpus_tokens"),
        sum(sqrt(col("n_tokens"))).as("z"))
      val weight = Num.roundp(sqrt(col("n_tokens")) / col("z"), 6)
      bySrc.crossJoin(broadcast(tot))
        .withColumn("budget", floor(col("corpus_tokens") / 2).cast("long"))
        .withColumn("weight", weight)
        .withColumn("alloc_tokens",
          floor(col("weight") * col("budget")).cast("long"))
        .withColumn("epochs",
          Num.roundp(col("alloc_tokens").cast("double") / col("n_tokens"), 6))
        .select(col("source"), col("n_tokens"), col("weight"),
          col("alloc_tokens"), col("epochs"),
          (col("epochs") > 4.0).as("over_repeat"))
    }),

    // ── Gopher-style composite quality gate (Rae et al. 2021, Table A1
    // family): one pass/fail decision per document with machine-readable
    // reason codes — the shape a production pipeline actually runs (one
    // gate, audit trail of WHY each doc was dropped). Every rule is
    // INTEGER arithmetic (mean-word-length bounds as 3n ≤ chars ≤ 10n,
    // dominance ≤ 1/5 as 5·top ≤ n, dup-2gram ≤ 3/5 as 5·dups ≤ 3·n2g),
    // so both engines agree exactly with no float quantization anywhere.
    // Scale: two explode→partial-agg passes keyed on doc_id (map-side
    // combine does most of the reduction), then pure map-side rule
    // evaluation; `concat_ws` skips NULLs in Spark and DuckDB alike, so
    // the reasons string is engine-stable. Zero-token docs are restored
    // by the left join (they fail `len`, not vanish). ─────────────────
    "quality_gopher" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val counts = docs.select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      val stats = counts.groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_tok"),
        max(col("c")).as("top_c"),
        sum(when(col("tok").isin("the", "a"), col("c")).otherwise(lit(0L)))
          .as("n_stop"),
        sum(col("c") * length(col("tok"))).as("n_chars"))
      val grams = docs
        .select(col("doc_id"), explode(Text.shingles(toks, 2)).as("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_2g"), count_distinct(col("g")).as("n_2g_uniq"))
      val j = docs.select(col("doc_id"))
        .join(stats, Seq("doc_id"), "left")
        .join(grams, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tok"), lit(0L)).as("n_tok"),
          coalesce(col("top_c"), lit(0L)).as("top_c"),
          coalesce(col("n_stop"), lit(0L)).as("n_stop"),
          coalesce(col("n_chars"), lit(0L)).as("n_chars"),
          col("n_2g"), col("n_2g_uniq"))
      val rLen = col("n_tok").between(30, 1000)
      val rWordlen = col("n_chars") >= lit(3) * col("n_tok") &&
        col("n_chars") <= lit(10) * col("n_tok")
      val rStop = col("n_stop") >= 2
      val rDom = lit(5) * col("top_c") <= col("n_tok")
      val rRep = coalesce(
        lit(5) * (col("n_2g") - col("n_2g_uniq")) <= lit(3) * col("n_2g"),
        lit(true))
      j.select(col("doc_id"), col("n_tok").as("n_tokens"),
        (rLen && rWordlen && rStop && rDom && rRep).as("pass"),
        concat_ws(",",
          when(!rLen, "len"), when(!rWordlen, "wordlen"),
          when(!rStop, "stop"), when(!rDom, "dominance"),
          when(!rRep, "repetition")).as("reasons"))
    }),

    // ── Token-distribution entropy per document (nats): H = ln n −
    // Σ c·ln c / n. Low entropy ⇒ repetitive/degenerate text, the
    // information-theoretic companion to the rule-based repetition
    // profile. Same two-pass explode→partial-agg shape; the ~1-ulp
    // libm ln() divergence across engines vanishes under roundp(4). ───
    "text_token_entropy" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"))
        .select(col("doc_id"), col("n").as("n_tokens"),
          Num.roundp(log(col("n").cast("double")) - col("clc") / col("n"), 4)
            .as("entropy"))),

    // ── Deterministic weighted source mixing: src0-4 keep all, src5-9
    // keep 1/2, the rest keep 1/4 — by md5-hex-prefix threshold. ──────
    "pipe_mix_weighted" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), mixTier.as("tier"), mixKeep.as("kept"))
        .groupBy(col("source"), col("tier"))
        .agg(count(lit(1)).as("n_total"), count_if(col("kept")).as("n_kept"))),

    // ── End-to-end curation: quality gate → near-dup purge (connected
    // components over LSH pairs) → weighted source mix → deterministic
    // train/val/test split, reported as per-(lang, split) counts. One
    // composite proving the curation pieces compose: the gates and the
    // mix/split hashes are map-side predicates, the only shuffles are
    // the dedup subgraph's and the final small aggregate, and the purge
    // set joins anti against the corpus — the whole pipeline is the
    // shape it would be at 100 TB. ────────────────────────────────────
    "pipe_curate_e2e" -> ((s, dir) => {
      val toksC = Text.tokens(col("text"))
      val quality = Tables(s, dir, "documents")
        .withColumn("n_tok", size(toksC).cast("long"))
        .withColumn("avg_tok",
          length(regexp_replace(col("text"), "\\s+", "")).cast("double") / col("n_tok"))
        .where(col("n_chars") >= 150 && col("n_tok") >= 20 &&
          col("avg_tok") >= 3.0 && col("avg_tok") <= 12.0)
        .select(col("doc_id"), col("lang"), col("source"))
      val dupDrop = DedupCluster.lshClusters(s, dir)
        .where(col("node") =!= col("cluster_id"))
        .select(col("node").as("doc_id"))
      quality
        .join(dupDrop, Seq("doc_id"), "left_anti")
        .where(mixKeep)
        .groupBy(col("lang"), splitOf.as("split"))
        .agg(count(lit(1)).as("n"))
    }),

    // ── Weighted reservoir sample (Efraimidis–Spirakis A-Res), k=100,
    // weight = n_chars: each doc gets key ln(u)/w with u a deterministic
    // md5-derived uniform in (0,1); the k largest keys ARE a weighted
    // sample without replacement. Distributed shape: the key is a pure
    // projection and top-k is TakeOrderedAndProject — O(k) heap per
    // partition + O(k·parts) on the driver, no global sort, no shuffle
    // of the corpus. The deterministic uniform makes the sample
    // reproducible across engines, re-runs, and cluster sizes —
    // sample() is none of those. ──────────────────────────────────────
    // ── Poisson(λ=1) bootstrap resample: each doc gets a deterministic
    // replication count k drawn by inverting the Poisson CDF on an
    // md5-derived uniform. E[k]=1, so the resample is corpus-sized;
    // aggregates over it estimate the sampling distribution (here: the
    // bootstrap mean of n_chars next to the plain mean). Per-row
    // independence means zero coordination at any scale — the classic
    // trick for bootstrap CIs over data too big to resample by index.
    // Integer sums keep the means deterministic cross-engine. ────────
    "samp_bootstrap" -> ((s, dir) => {
      val u = (conv(substring(md5(concat(lit("boot|"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("double") + 0.5) / lit(4294967296.0)
      val k = when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
      Tables(s, dir, "documents")
        .select(col("n_chars"), k.as("k"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("k")).as("n_resampled"),
          Num.roundp(sum(col("k") * col("n_chars")).cast("double") /
            sum(col("k")).cast("double"), 4).as("mean_chars_boot"),
          Num.roundp(sum(col("n_chars")).cast("double") /
            count(lit(1)).cast("double"), 4).as("mean_chars"))
    }),

    "samp_weighted_reservoir" -> ((s, dir) => {
      val u = (conv(substring(md5(concat(lit("res|"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("double") + 0.5) / lit(4294967296.0)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (log(u) / col("n_chars")).as("wkey"))
        .orderBy(col("wkey").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("n_chars"), Num.roundp(col("wkey"), 6).as("wkey"))
    }),

    // ── Eval-set decontamination: report every (train doc, eval doc)
    // pair sharing a 3-gram shingle, with the contaminated fraction of
    // the train doc — the pre-training hygiene step that keeps
    // benchmark text out of the corpus. Eval membership is the
    // deterministic doc_id % 97 == 0 slice (stands in for the external
    // benchmark list). Scale shape: the eval shingle set is benchmark-
    // sized — BROADCAST it; the train side then never shuffles its
    // exploded shingles (map-side semi-filter), and only the rare
    // colliding rows reach the pair aggregation. Reuses the dedup
    // family's cached distinct-shingle view. ─────────────────────────
    "decontam_ngram" -> ((s, dir) => {
      val ex = Dedup.shingleRows(s, dir)
      val ev = ex.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("eval_id"), col("s"))
      val tr = ex.where(col("doc_id") % 97 =!= 0)
        .select(col("doc_id").as("train_id"), col("s"))
      val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("train_sz"))
      val ratio = col("n_common").cast("double") / col("train_sz").cast("double")
      tr.join(broadcast(ev), "s")
        .groupBy(col("train_id"), col("eval_id"))
        .agg(count(lit(1)).as("n_common"))
        .join(sizes.withColumnRenamed("doc_id", "train_id"), "train_id")
        .select(col("train_id"), col("eval_id"), col("n_common"),
          col("train_sz"), Num.roundp(ratio, 4).as("contam_ratio"),
          (ratio >= 0.1).as("contaminated"))
    }),

    // ── Context-window packing — the GPT-style pretraining batch
    // layout: concatenate every document's token stream in doc_id
    // order and cut the stream into fixed 256-token windows; emit one
    // row per (window, document) span, flagging document starts.
    // Scale shape: the global token prefix-sum is computed TWO-PHASE —
    // within-bucket window cumsum (buckets of 100 doc ids, each a
    // normal partitioned window) plus a bucket-offset table that is
    // bucket-count-sized, cumsum'd at that tiny cardinality and
    // broadcast back. A naive `Window.orderBy` with no partition key
    // would drag the whole corpus into one task — the classic
    // prefix-sum scale trap this formulation exists to avoid. ────────
    "pack_context_windows" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val N = 256L // context window, tokens
      val B = 100L // doc_ids per cumsum bucket
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tok"))
        .where(col("n_tok") > 0)
        .withColumn("bucket", expr(s"doc_id DIV $B"))
      val wIn = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      val local = docs.withColumn("local_end", sum(col("n_tok")).over(wIn))
      // Bucket totals: one row per bucket — the only orderBy-without-
      // partition window runs at THIS cardinality, not the corpus's.
      val wB = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = local.groupBy(col("bucket")).agg(max(col("local_end")).as("btot"))
        .withColumn("prev_total", coalesce(sum(col("btot")).over(wB), lit(0L)))
        .select(col("bucket"), col("prev_total"))
      val glob = local.join(broadcast(offsets), "bucket")
        .withColumn("cum_end", col("prev_total") + col("local_end"))
        .withColumn("cum_start", col("cum_end") - col("n_tok"))
      glob.select(col("doc_id"), col("cum_start"), col("cum_end"),
          explode(sequence(expr(s"cum_start DIV $N"), expr(s"(cum_end - 1) DIV $N")))
            .as("bin"))
        .select(col("bin"), col("doc_id"),
          (least(col("cum_end"), (col("bin") + 1) * N) -
            greatest(col("cum_start"), col("bin") * N)).as("span_tokens"),
          (col("cum_start") >= col("bin") * N).as("is_doc_start"))
    }),

    // ── Overlapping-window chunking — the RAG-ingest chunker (window
    // 64 tokens, stride 48, so consecutive chunks share a 16-token
    // overlap and no retrieval hit dies on a chunk boundary): emits
    // one row per (doc, window) with offsets, token count and the
    // chunk fingerprint the embedding/index stages key on. Pure
    // per-doc arithmetic (sequence + slice over the token array) —
    // no window functions, no shuffle before the explode, linear at
    // any scale. ─────────────────────────────────────────────────────
    "chunk_sliding_text" -> ((s, dir) => {
      val W = 64
      val S = 48
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), toks.as("tok"))
        .where(size(col("tok")) > 0)
        // window starts: 0, S, 2S, … while start < n (last window may
        // be short; a doc shorter than W yields exactly one window)
        .select(col("doc_id"), col("tok"),
          explode(sequence(lit(0),
            (greatest(size(col("tok")) - 1, lit(0)) / S).cast("int"))).as("w"))
        .where(col("w") * S < size(col("tok")))
      d.select(col("doc_id"), col("w").cast("long").as("chunk_id"),
          (col("w") * S).cast("long").as("start_tok"),
          slice(col("tok"), col("w") * S + 1, lit(W)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"), col("start_tok"),
          size(col("chunk")).cast("long").as("n_tok"),
          md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_md5"))
    }),

    // ── Padding-waste profile: for each candidate context length N,
    // the token-slot waste of DOC-LEVEL batching (every doc padded up
    // to a multiple of N — the no-packing baseline) — the measurement
    // that justifies pack_context_windows' concat packing, whose waste
    // is one partial window total. Per-doc arithmetic + one aggregate
    // over a constant 4-row window-size dimension: corpus-size-linear,
    // no shuffle beyond the 4-key final combine. ─────────────────────
    "pack_padding_waste" -> ((s, dir) => {
      val sizes = Seq(128, 256, 512, 1024)
      val d = Tables(s, dir, "documents")
        .select(size(toks).cast("long").as("n_tok"))
        .where(col("n_tok") > 0)
        .select(col("n_tok"), explode(lit(sizes.toArray)).as("n"))
        .withColumn("n", col("n").cast("long"))
        .withColumn("wins", expr("(n_tok + n - 1) DIV n"))
      d.groupBy(col("n")).agg(
          sum(col("wins")).as("n_windows"),
          sum(col("n_tok")).as("used_tokens"),
          sum(col("wins") * col("n") - col("n_tok")).as("padded_slots"))
        .withColumn("waste_frac", Num.roundp(
          col("padded_slots").cast("double") / (col("n_windows") * col("n")), 6))
    }),

    // ── Temperature-scaled language sampling (the XLM-R / mT5 corpus
    // balancing rule): sampling weight pᵢ ∝ cᵢ^α with α = 0.7 — low-
    // resource languages are upsampled relative to their raw share,
    // high-resource ones damped. Emits per-language raw share, scaled
    // share, the up/down-sampling factor, and the document budget each
    // language receives out of a 10 000-doc epoch. One aggregation;
    // the normalization constant is a scalar broadcast. ───────────────
    "samp_temperature" -> ((s, dir) => {
      val alpha = 0.7
      val byLang = Tables(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val tot = byLang.agg(sum(col("n_docs")).as("total"),
        sum(pow(col("n_docs"), alpha)).as("z"))
      val share = col("n_docs").cast("double") / col("total").cast("double")
      val p = pow(col("n_docs"), alpha) / col("z")
      byLang.crossJoin(tot)
        .select(col("lang"), col("n_docs"),
          Num.roundp(share, 6).as("raw_share"),
          Num.roundp(p, 6).as("sample_share"),
          Num.roundp(p / share, 6).as("boost"),
          // Budget from the QUANTIZED share: a bare floor(p * 10000)
          // would let a last-ulp pow() disagreement between engines
          // flip the bucket when p*1e4 sits on an integer boundary.
          floor(Num.roundp(p, 6) * 10000).cast("long").as("epoch_budget"))
    }),

    // ── PII hygiene: redact numeric identifiers, deterministically
    // pseudonymize the key (salted md5 — re-joinable across tables,
    // irreversible without the salt), and generalize the account
    // balance into 1000-unit bands (k-anonymity-style coarsening).
    // Pure map-side projection: zero shuffle at any scale. ───────────
    "pii_pseudonymize" -> ((s, dir) =>
      Tables(s, dir, "customer").select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]{4,}", "<ID>").as("masked_name"),
        substring(md5(concat(lit("pii|"), col("c_custkey").cast("string"))), 1, 12)
          .as("pseudonym"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("long").as("bal_band"),
        col("c_mktsegment")))
  ) ++ extraQueries

  /** Round-7 curation additions (split keeps the main map readable). */
  private def extraQueries: Map[String, Relational.Q] = Map(

    // ── Per-domain cap (the RefinedWeb / C4 "domain frequency" rule):
    // keep at most 10 docs per source, preferring longer ones. Ranked
    // with the bounded-heap [[graft.plans.TopKAggregator]] rather than a
    // window sort: each group carries ≤10 entries through partial
    // aggregation, so a pathological million-doc domain costs O(n·log k)
    // map-side and ships 10 rows — the window formulation would sort the
    // whole domain on one reducer (the exact skew a domain cap exists to
    // handle). ───────────────────────────────────────────────────────
    "curate_domain_cap" -> ((s, dir) => {
      import s.implicits._
      val agg = new graft.plans.TopKAggregator(10)
      Tables(s, dir, "documents")
        .select(col("source"), col("n_chars").cast("double"), col("doc_id"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(agg.toColumn.name("top"))
        .flatMap { case (src, top) =>
          top.zipWithIndex.map { case ((nc, id), i) =>
            (src, id, nc.toLong, (i + 1).toLong) }
        }
        .toDF("source", "doc_id", "n_chars", "rk")
    }),

    // ── k-anonymity audit over the quasi-identifier (nation, segment):
    // class sizes, k (the smallest class), and how many rows sit in
    // classes below k=5 — the release gate a privacy review runs after
    // pii_pseudonymize's generalization. Two aggregations, the second
    // over |classes| rows. ───────────────────────────────────────────
    "priv_k_anonymity" -> ((s, dir) => {
      val g = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      g.agg(count(lit(1)).as("n_classes"),
        min(col("n")).as("k_anonymity"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("n") < 5, col("n")).otherwise(0L)).as("rows_at_risk"))
    }),

    // ── Laplace count-release MECHANISM DEMO (the "_demo" suffix is
    // the contract): per-category counts + Laplace noise via the
    // inverse CDF, noise = −b·sign(u−½)·ln(1−2|u−½|) with b = 1/ε,
    // ε = 1, sensitivity 1. The uniform u here is 32 bits of
    // md5('dp|'||key) — a PUBLIC function of the PUBLIC category
    // value, so any reader can recompute and subtract the noise: this
    // release carries NO actual ε-guarantee. What the seeding buys is
    // engine-replayability (the oracle reproduces the release bit-
    // exactly) and idempotent re-derivation. A production deployment
    // swaps u for a SECRET-KEYED PRF over the same mechanism — the
    // sensitivity analysis and release shape are unchanged, and only
    // then does the ε = 1 claim hold. One aggregation + per-row
    // scalar math. ───────────────────────────────────────────────────
    "priv_dp_count_demo" -> ((s, dir) => {
      val h = md5(concat(lit("dp|"), col("event_type")))
      val u = conv(substring(h, 1, 8), 16, 10).cast("double") / lit(4294967296.0)
      val c = u - lit(0.5)
      val noise = -signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          Num.roundp(col("n") + noise, 4).as("released"))
    }),

    // ── Effective sample size of the per-language char-weighted mix:
    // ESS = (Σw)²/Σw² — how many "equivalent uniform docs" the weighting
    // leaves (ESS ≪ n flags a mixture dominated by a few huge docs).
    // Weights are integral chars, so both sums are exact integers (no
    // float-order sensitivity) until the final division. ─────────────
    "samp_ess" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("w_sum"),
          sum(col("n_chars") * col("n_chars")).as("w2_sum"))
        .select(col("lang"), col("n_docs"),
          Num.roundp(col("w_sum").cast("double") * col("w_sum").cast("double") /
            col("w2_sum").cast("double"), 4).as("ess"),
          Num.roundp(col("w_sum").cast("double") * col("w_sum").cast("double") /
            (col("w2_sum").cast("double") * col("n_docs").cast("double")), 6)
            .as("ess_ratio"))),

    // ── Divergence of the temperature-sampled language mix from the
    // raw corpus mix (the samp_temperature policy, α = 0.7): forward
    // and reverse KL plus total variation — the report a mixture change
    // ships with. All per-language terms are deterministic functions of
    // integer counts; the final sums run over |langs| rows. ──────────
    "samp_kl_mix" -> ((s, dir) => {
      val alpha = 0.7
      val byLang = Tables(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      // Every float sum here folds sequentially over the lang-sorted
      // array: a distributed `sum` has nondeterministic partial-agg
      // order, and a kl/tv value landing exactly on the 1e-6
      // quantization grid could flip between runs (same flake class as
      // the r7 foldDot fix in Similarity).
      val packed = byLang.agg(sort_array(collect_list(
        struct(col("lang"), col("n").cast("double").as("n")))).as("rs"))
      def fold(f: Column => Column): Column =
        aggregate(col("rs"), lit(0.0d), (acc, x) => acc + f(x))
      val staged = packed.select(col("rs"),
        fold(x => x.getField("n")).as("total"),
        fold(x => pow(x.getField("n"), alpha)).as("z"))
      def p(x: Column) = pow(x.getField("n"), alpha) / col("z")
      def q(x: Column) = x.getField("n") / col("total")
      staged.select(
        size(col("rs")).cast("long").as("n_langs"),
        Num.roundp(fold(x => p(x) * log(p(x) / q(x))), 6).as("kl_fwd"),
        Num.roundp(fold(x => q(x) * log(q(x) / p(x))), 6).as("kl_rev"),
        Num.roundp(fold(x => abs(p(x) - q(x))) / 2.0, 6).as("tv_dist"))
    })
  )

  /** Source-weight tier: full / half / quarter keep rates. */
  private def mixTier =
    when(col("source").isin("src0", "src1", "src2", "src3", "src4"), "full")
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), "half")
      .otherwise("quarter")

  /** Deterministic keep decision for the weighted mix (md5 threshold). */
  private def mixKeep = {
    val h = substring(md5(concat(lit("mix|"), col("doc_id").cast("string"))), 1, 1)
    when(mixTier === "full", true)
      .when(mixTier === "half", h <= "7")
      .otherwise(h <= "3")
  }

  /** Deterministic 12/2/2-sixteenths train/val/test assignment — the
    * same hash family as samp_hash_split. */
  private def splitOf = {
    val h = substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 1)
    when(h <= "b", "train").when(h <= "d", "val").otherwise("test")
  }

  private val sqlToks = "list_filter(string_split(text, ' '), t -> t <> '')"

  val oracles: Map[String, String] = Map(
    "text_repetition" ->
      s"""WITH tokrows AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
         |dom AS (
         |  SELECT doc_id, max(c) AS top_c, sum(c) AS n_tok FROM (
         |    SELECT doc_id, tok, count(*) AS c FROM tokrows GROUP BY 1, 2)
         |  GROUP BY doc_id),
         |gsrc AS (
         |  SELECT doc_id, unnest(list_transform(range(len(tok) - 1),
         |    i -> tok[i+1] || ' ' || tok[i+2])) AS g
         |  FROM (SELECT doc_id, $sqlToks AS tok FROM documents)
         |  WHERE len(tok) >= 2),
         |grams AS (
         |  SELECT doc_id, count(*) AS n_2g, count(DISTINCT g) AS n_2g_uniq
         |  FROM gsrc GROUP BY doc_id)
         |SELECT d.doc_id,
         |  floor(CAST(top_c AS DOUBLE) / n_tok * 10000 + 0.5) / 10000 AS top_tok_frac,
         |  floor((1.0 - CAST(n_2g_uniq AS DOUBLE) / n_2g) * 10000 + 0.5) / 10000 AS dup_2gram_frac,
         |  (CAST(top_c AS DOUBLE) / n_tok <= 0.2
         |   AND (1.0 - CAST(n_2g_uniq AS DOUBLE) / n_2g) <= 0.6) AS rep_ok
         |FROM dom d JOIN grams USING (doc_id)""".stripMargin,

    "dsir_select" ->
      s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |cnt AS MATERIALIZED (
         |  SELECT term, CAST(count(*) AS BIGINT) AS c_all,
         |    CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_t
         |  FROM tk GROUP BY term),
         |tot AS MATERIALIZED (
         |  SELECT CAST(sum(c_all) AS BIGINT) AS t_all,
         |    CAST(sum(c_t) AS BIGINT) AS t_t,
         |    CAST(count(*) AS BIGINT) AS v FROM cnt),
         |sc AS (
         |  SELECT tk.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    floor(avg(ln((c_t + 1) / CAST(t_t + v AS DOUBLE))
         |        - ln((c_all + 1) / CAST(t_all + v AS DOUBLE))) * 1000000 + 0.5)
         |      / 1000000 AS lr
         |  FROM tk JOIN cnt USING (term) CROSS JOIN tot
         |  WHERE doc_id % 7 <> 0
         |  GROUP BY tk.doc_id)
         |SELECT doc_id, n_tokens, lr FROM sc
         |ORDER BY lr DESC, doc_id LIMIT 20""".stripMargin,

    "chunk_sliding_text" ->
      s"""WITH d AS (
         |  SELECT doc_id, $sqlToks AS tok FROM documents
         |  WHERE len($sqlToks) > 0),
         |w AS (
         |  SELECT doc_id, tok, unnest(range(0,
         |    CAST((len(tok) - 1) // 48 AS BIGINT) + 1)) AS w
         |  FROM d)
         |SELECT doc_id, CAST(w AS BIGINT) AS chunk_id,
         |  CAST(w * 48 AS BIGINT) AS start_tok,
         |  CAST(len(list_slice(tok, w * 48 + 1, w * 48 + 64)) AS BIGINT) AS n_tok,
         |  md5(array_to_string(list_slice(tok, w * 48 + 1, w * 48 + 64), ' '))
         |    AS chunk_md5
         |FROM w WHERE w * 48 < len(tok)""".stripMargin,

    "pack_padding_waste" ->
      s"""WITH d AS (
         |  SELECT CAST(len($sqlToks) AS BIGINT) AS n_tok FROM documents
         |  WHERE len($sqlToks) > 0),
         |x AS (
         |  SELECT n_tok, CAST(u AS BIGINT) AS n,
         |    CAST((n_tok + u - 1) // u AS BIGINT) AS wins
         |  FROM d, (SELECT unnest([128, 256, 512, 1024]) AS u) s)
         |SELECT n,
         |  CAST(sum(wins) AS BIGINT) AS n_windows,
         |  CAST(sum(n_tok) AS BIGINT) AS used_tokens,
         |  CAST(sum(wins * n - n_tok) AS BIGINT) AS padded_slots,
         |  floor(CAST(sum(wins * n - n_tok) AS DOUBLE)
         |    / (sum(wins) * n) * 1000000 + 0.5) / 1000000 AS waste_frac
         |FROM x GROUP BY n""".stripMargin,

    "mix_token_budget" ->
      s"""WITH bysrc AS MATERIALIZED (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
         |  FROM (SELECT source, unnest($sqlToks) AS t FROM documents)
         |  GROUP BY source),
         |tot AS MATERIALIZED (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens,
         |    sum(sqrt(n_tokens)) AS z FROM bysrc),
         |w AS (
         |  SELECT source, n_tokens,
         |    CAST(floor(corpus_tokens / 2) AS BIGINT) AS budget,
         |    floor(sqrt(n_tokens) / z * 1000000 + 0.5) / 1000000 AS weight
         |  FROM bysrc CROSS JOIN tot),
         |a AS (
         |  SELECT source, n_tokens, weight,
         |    CAST(floor(weight * budget) AS BIGINT) AS alloc_tokens
         |  FROM w)
         |SELECT source, n_tokens, weight, alloc_tokens,
         |  floor(CAST(alloc_tokens AS DOUBLE) / n_tokens * 1000000 + 0.5)
         |    / 1000000 AS epochs,
         |  floor(CAST(alloc_tokens AS DOUBLE) / n_tokens * 1000000 + 0.5)
         |    / 1000000 > 4.0 AS over_repeat
         |FROM a""".stripMargin,

    "quality_gopher" ->
      s"""WITH tokrows AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
         |cnt AS (SELECT doc_id, tok, count(*) AS c FROM tokrows GROUP BY 1, 2),
         |stats AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, max(c) AS top_c,
         |    CAST(sum(CASE WHEN tok IN ('the', 'a') THEN c ELSE 0 END) AS BIGINT) AS n_stop,
         |    CAST(sum(c * length(tok)) AS BIGINT) AS n_chars
         |  FROM cnt GROUP BY doc_id),
         |gsrc AS (
         |  SELECT doc_id, unnest(list_transform(range(len(tok) - 1),
         |    i -> tok[i+1] || ' ' || tok[i+2])) AS g
         |  FROM (SELECT doc_id, $sqlToks AS tok FROM documents)
         |  WHERE len(tok) >= 2),
         |grams AS (
         |  SELECT doc_id, count(*) AS n_2g, count(DISTINCT g) AS n_2g_uniq
         |  FROM gsrc GROUP BY doc_id),
         |j AS (
         |  SELECT d.doc_id,
         |    coalesce(s.n_tok, 0) AS n_tok, coalesce(s.top_c, 0) AS top_c,
         |    coalesce(s.n_stop, 0) AS n_stop, coalesce(s.n_chars, 0) AS n_chars,
         |    g.n_2g, g.n_2g_uniq
         |  FROM documents d
         |  LEFT JOIN stats s USING (doc_id) LEFT JOIN grams g USING (doc_id)),
         |rules AS (
         |  SELECT doc_id, n_tok,
         |    n_tok BETWEEN 30 AND 1000 AS r_len,
         |    (n_chars >= 3 * n_tok AND n_chars <= 10 * n_tok) AS r_wordlen,
         |    n_stop >= 2 AS r_stop,
         |    5 * top_c <= n_tok AS r_dom,
         |    coalesce(5 * (n_2g - n_2g_uniq) <= 3 * n_2g, TRUE) AS r_rep
         |  FROM j)
         |SELECT doc_id, n_tok AS n_tokens,
         |  (r_len AND r_wordlen AND r_stop AND r_dom AND r_rep) AS pass,
         |  concat_ws(',',
         |    CASE WHEN NOT r_len THEN 'len' END,
         |    CASE WHEN NOT r_wordlen THEN 'wordlen' END,
         |    CASE WHEN NOT r_stop THEN 'stop' END,
         |    CASE WHEN NOT r_dom THEN 'dominance' END,
         |    CASE WHEN NOT r_rep THEN 'repetition' END) AS reasons
         |FROM rules""".stripMargin,

    "text_token_entropy" ->
      s"""WITH tc AS (
         |  SELECT doc_id, tok, count(*) AS c FROM (
         |    SELECT doc_id, unnest($sqlToks) AS tok FROM documents)
         |  GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  floor((ln(CAST(sum(c) AS DOUBLE))
         |         - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
         |           / CAST(sum(c) AS DOUBLE)) * 10000 + 0.5) / 10000 AS entropy
         |FROM tc GROUP BY doc_id""".stripMargin,

    "pipe_curate_e2e" ->
      s"""${DedupCluster.sqlCc},
         |q AS (
         |  SELECT doc_id, lang, source FROM (
         |    SELECT doc_id, lang, source, n_chars,
         |      len($sqlToks) AS n_tok,
         |      CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) AS n_nonws
         |    FROM documents)
         |  WHERE n_chars >= 150 AND n_tok >= 20
         |    AND n_nonws / n_tok >= 3.0 AND n_nonws / n_tok <= 12.0),
         |dd AS (
         |  SELECT * FROM q
         |  WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)),
         |kept AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'full'
         |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 'half'
         |         ELSE 'quarter' END AS tier,
         |    substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 1) AS hmix,
         |    substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 1) AS hsplit
         |  FROM dd)
         |SELECT lang,
         |  CASE WHEN hsplit <= 'b' THEN 'train'
         |       WHEN hsplit <= 'd' THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n
         |FROM kept
         |WHERE tier = 'full' OR (tier = 'half' AND hmix <= '7')
         |   OR (tier = 'quarter' AND hmix <= '3')
         |GROUP BY 1, 2""".stripMargin,

    "pipe_mix_weighted" ->
      """WITH t AS (
        |  SELECT source,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'full'
        |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 'half'
        |         ELSE 'quarter' END AS tier,
        |    substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 1) AS hx
        |  FROM documents)
        |SELECT source, tier, count(*) AS n_total,
        |  count(*) FILTER (WHERE tier = 'full' OR (tier = 'half' AND hx <= '7')
        |                   OR (tier = 'quarter' AND hx <= '3')) AS n_kept
        |FROM t GROUP BY 1, 2""".stripMargin,

    "samp_bootstrap" ->
      """WITH d AS (
        |  SELECT n_chars,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         ELSE 5 END AS k
        |  FROM (SELECT n_chars,
        |          (('0x' || substr(md5('boot|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |           + 0.5) / 4294967296.0 AS u
        |        FROM documents))
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(k) AS BIGINT) AS n_resampled,
        |  floor(CAST(sum(k * n_chars) AS DOUBLE) / CAST(sum(k) AS DOUBLE) * 10000 + 0.5) / 10000
        |    AS mean_chars_boot,
        |  floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
        |    AS mean_chars
        |FROM d""".stripMargin,

    "samp_weighted_reservoir" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |    ln((('0x' || substr(md5('res|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |        + 0.5) / 4294967296.0) / n_chars AS wkey
        |  FROM documents),
        |topk AS (SELECT * FROM s ORDER BY wkey DESC, doc_id LIMIT 100)
        |SELECT doc_id, n_chars,
        |  CAST(FLOOR(wkey * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS wkey
        |FROM topk""".stripMargin,

    "decontam_ngram" ->
      s"""${Dedup.sqlShingles},
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS train_sz
         |          FROM ex GROUP BY doc_id),
         |ev AS (SELECT doc_id AS eval_id, s FROM ex WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id AS train_id, s FROM ex WHERE doc_id % 97 <> 0),
         |ov AS (
         |  SELECT tr.train_id, ev.eval_id, CAST(count(*) AS BIGINT) AS n_common
         |  FROM tr JOIN ev ON tr.s = ev.s GROUP BY 1, 2)
         |SELECT ov.train_id, ov.eval_id, ov.n_common, sz.train_sz,
         |  floor(CAST(ov.n_common AS DOUBLE) / sz.train_sz * 10000 + 0.5) / 10000
         |    AS contam_ratio,
         |  CAST(ov.n_common AS DOUBLE) / sz.train_sz >= 0.1 AS contaminated
         |FROM ov JOIN sizes sz ON sz.doc_id = ov.train_id""".stripMargin,

    "pack_context_windows" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum_end
        |  FROM d WHERE n_tok > 0),
        |x AS (SELECT doc_id, cum_end - n_tok AS cum_start, cum_end FROM c),
        |sp AS (
        |  SELECT doc_id, cum_start, cum_end,
        |    CAST(unnest(range(cum_start // 256, (cum_end - 1) // 256 + 1)) AS BIGINT) AS bin
        |  FROM x)
        |SELECT bin, doc_id,
        |  CAST(least(cum_end, (bin + 1) * 256) - greatest(cum_start, bin * 256) AS BIGINT)
        |    AS span_tokens,
        |  cum_start >= bin * 256 AS is_doc_start
        |FROM sp""".stripMargin,

    "samp_temperature" ->
      """WITH l AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang),
        |t AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS total,
        |         sum(pow(n_docs, 0.7)) AS z FROM l)
        |SELECT lang, n_docs,
        |  floor(CAST(n_docs AS DOUBLE) / total * 1000000 + 0.5) / 1000000 AS raw_share,
        |  floor(pow(n_docs, 0.7) / z * 1000000 + 0.5) / 1000000 AS sample_share,
        |  floor(pow(n_docs, 0.7) / z / (CAST(n_docs AS DOUBLE) / total) * 1000000 + 0.5)
        |    / 1000000 AS boost,
        |  CAST(floor(floor(pow(n_docs, 0.7) / z * 1000000 + 0.5) / 1000000 * 10000)
        |    AS BIGINT) AS epoch_budget
        |FROM l, t""".stripMargin,

    "pii_pseudonymize" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]{4,}', '<ID>', 'g') AS masked_name,
        |  substr(md5('pii|' || CAST(c_custkey AS VARCHAR)), 1, 12) AS pseudonym,
        |  CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
        |  c_mktsegment
        |FROM customer""".stripMargin,

    "curate_domain_cap" ->
      """SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, rk FROM (
        |  SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
        |  FROM documents) WHERE rk <= 10""".stripMargin,

    "priv_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  min(n) AS k_anonymity,
        |  CAST(coalesce(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS n_small_classes,
        |  CAST(coalesce(sum(CASE WHEN n < 5 THEN n ELSE 0 END), 0) AS BIGINT)
        |    AS rows_at_risk
        |FROM g""".stripMargin,

    "priv_dp_count_demo" ->
      """WITH c AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    md5('dp|' || event_type) AS h
        |  FROM events GROUP BY 1),
        |u AS (
        |  SELECT event_type, n,
        |    list_sum(list_transform(range(8),
        |      i -> (strpos('0123456789abcdef', substr(h, CAST(i + 1 AS INT), 1)) - 1)
        |        * 16 ** (7 - i))) / 4294967296.0 AS u
        |  FROM c)
        |SELECT event_type, n,
        |  floor((n + (-sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)))) * 10000 + 0.5)
        |    / 10000 AS released
        |FROM u""".stripMargin,

    "samp_ess" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  floor(CAST(sum(n_chars) AS DOUBLE) * sum(n_chars) / sum(n_chars * n_chars)
        |    * 10000 + 0.5) / 10000 AS ess,
        |  floor(CAST(sum(n_chars) AS DOUBLE) * sum(n_chars)
        |    / (CAST(sum(n_chars * n_chars) AS DOUBLE) * count(*))
        |    * 1000000 + 0.5) / 1000000 AS ess_ratio
        |FROM documents GROUP BY 1""".stripMargin,

    "samp_kl_mix" ->
      """WITH l AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, sum(pow(n, 0.7)) AS z FROM l),
        |pq AS (
        |  SELECT pow(n, 0.7) / z AS p, CAST(n AS DOUBLE) / total AS q
        |  FROM l, t)
        |SELECT CAST(count(*) AS BIGINT) AS n_langs,
        |  floor(sum(p * ln(p / q)) * 1000000 + 0.5) / 1000000 AS kl_fwd,
        |  floor(sum(q * ln(q / p)) * 1000000 + 0.5) / 1000000 AS kl_rev,
        |  floor(sum(abs(p - q)) / 2.0 * 1000000 + 0.5) / 1000000 AS tv_dist
        |FROM pq""".stripMargin
  )
}
