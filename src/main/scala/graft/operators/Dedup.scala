package graft.operators

import graft.Tables
import graft.functions.Num
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a 100 TB training-data pipeline, over the
  * `documents` table:
  *
  *  - exact dedup: hash-groupBy on a key (one shuffle on the dedup key);
  *  - fingerprint dedup: md5 of normalized text (near-exact);
  *  - MinHash + LSH: shingle → k minhashes → banded keys → bucket
  *    self-join. The self-join is on (band, key), i.e. only documents
  *    sharing a bucket ever meet — this is the scale path: candidate
  *    generation is O(collisions), never O(n²);
  *  - n-gram Jaccard verify: exact similarity computed only for LSH
  *    candidates (the standard candidate-then-verify pipeline);
  *  - SimHash: 32-bit signature via per-bit majority vote over shingle
  *    md5 bits.
  *
  * The minhash functions are min(md5(seed || shingle)) — a deterministic
  * lexicographic min over hex strings, chosen so an ANSI-SQL oracle
  * (DuckDB) reproduces the exact same signatures byte-for-byte.
  */
object Dedup {

  val NumHashes = 6
  val BandSize = 2 // 3 bands of 2 hashes → candidates at jaccard ≳ 0.5

  /** doc_id → exploded 3-token shingles, duplicates included.
    *
    * Tokens are materialized as a column BEFORE the shingle transform:
    * higher-order functions are interpreted, so an inline
    * `element_at(tokens(text), i)` would re-split the whole document for
    * every shingle element (quadratic per doc — measured 5× the whole
    * bench). No shuffle here: explode is pipeline-parallel. */
  /** Raw 3-gram shingle stream for ANY `(doc_id, text)` frame — shared
    * with the streaming LSH gate, which computes the same signatures
    * over micro-batches. */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Text.tokens(col("text")).as("tok"))
      .select(col("doc_id"), explode(Text.shingles(col("tok"), 3)).as("s"))

  private def rawShingleRows(s: SparkSession, dir: String): DataFrame =
    shinglesOf(Tables(s, dir, "documents"))

  /** Persist AND materialize eagerly. Lazy persist is a trap when one
    * action has several consumers of the cached plan: the stages scan
    * concurrently before any partition is cached and each recomputes
    * the full lineage (measured 47 s vs 12 s on the jaccard query).
    * Re-invocation goes through [[Caching.owned]]: an equal-plan frame
    * already in the cache manager passes through without a second
    * persist call (one owner per cache entry, no CacheManager WARN). */
  private def materialized(df: DataFrame): DataFrame = Caching.owned(df)

  /** Disk-backed corpus artifacts (see [[ArtifactCache]]): the
    * shingle/signature views are pure functions of the documents
    * table, and recomputing the tokenize→shingle→md5 stream was every
    * cold session's single heaviest repeated cost. First touch builds
    * and writes parquet; later sessions read the artifact — the
    * deployment shape of any derived corpus table. */
  private def diskCached(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    ArtifactCache.parquet(s, dir, name, Seq("documents"))(build)

  /** doc_id → distinct shingles (the set view, for Jaccard/SimHash).
    * One distinct-shuffle materialization serves every consumer in the
    * dedup family; across sessions it reads back from the disk
    * artifact. */
  private[operators] def shingleRows(s: SparkSession, dir: String): DataFrame =
    materialized(diskCached(s, dir, "shingle-set")(
      rawShingleRows(s, dir).distinct()))

  /** doc_id → minhash signature columns h0..h{k-1}.
    *
    * Computed from the RAW shingle stream: min() is duplicate-insensitive,
    * so skipping distinct trades a full shuffle for map-side partial
    * aggregation (per-partition per-doc mins → tiny exchange). Persisted
    * because bands and candidate pairs both derive from it. */
  private[graft] def minhashesOf(shingles: DataFrame): DataFrame =
    shingles.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("0|"), col("s")))).as("h0"),
      (1 until NumHashes).map(j =>
        min(md5(concat(lit(s"$j|"), col("s")))).as(s"h$j")): _*)

  private def minhashes(s: SparkSession, dir: String): DataFrame =
    materialized(diskCached(s, dir, "minhashes")(
      minhashesOf(rawShingleRows(s, dir))))

  /** doc_id → the 32 simhash vote sums v0..v31, persisted AND
    * materialized: both the signature query and the pairing query
    * derive from it, and recomputing the shingle+md5 stream twice was
    * the single heaviest duplicated work in the bench.
    *
    * md5 is computed ONCE per shingle in a projection below the
    * aggregate — the 32 vote expressions each reference it, and leaving
    * 32 copies of md5(s) in the agg would lean on codegen subexpression
    * elimination that partial aggregates don't guarantee. ascii >= '8'
    * tests the hex digit's high nibble bit (hex alphabet 0-9a-f:
    * '8','9','a'..'f' are the >= 56 codes). */
  private def simhashVotes(s: SparkSession, dir: String): DataFrame = {
    val votes = (0 until 32).map(i =>
      sum(when(ascii(substring(col("h"), i + 1, 1)) >= 56, 1).otherwise(-1)).as(s"v$i"))
    materialized(diskCached(s, dir, "simhash-votes")(rawShingleRows(s, dir)
      .select(col("doc_id"), md5(col("s")).as("h"))
      .groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)))
  }

  /** doc_id → (band, key) rows; key = concat of the band's hashes. */
  private[graft] def bandRowsOf(mh: DataFrame): DataFrame = {
    val bands = (0 until NumHashes / BandSize).map { b =>
      val key = concat((0 until BandSize).map(i => col(s"h${b * BandSize + i}")): _*)
      struct(lit(b).as("band"), key.as("key"))
    }
    mh.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  private[operators] def bandRows(s: SparkSession, dir: String): DataFrame =
    bandRowsOf(minhashes(s, dir))

  /** Exact-Jaccard verify shared by the incremental dedup gates: for
    * candidate pairs (a, b) and a (doc_id, s) distinct-shingle view,
    * keep pairs with Jaccard >= 0.5 and return each a's smallest
    * matching b as (doc_id, outCol). One copy of the sizes /
    * intersection / union-size arithmetic serves dedup_incremental
    * and dedup_lsh_inc, so a threshold or formula fix reaches both.
    * The shingle view is semi-joined down to the candidate docs
    * FIRST — only their sizes are ever consulted, and at 100 TB a
    * corpus-sized size aggregation for a candidate-sized verify is
    * the wrong shape (a no-op when the caller pre-filtered, as
    * dedup_lsh_inc's persisted candidate shingles already are). */
  private def jaccardNearest(cand: DataFrame, exAll: DataFrame,
      outCol: String): DataFrame = {
    val candDocs = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id"))).distinct()
    val ex = exAll.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(ex.toDF("a", "s"), "a").join(ex.toDF("b", "s"), Seq("b", "s"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("i"))
    val j = col("i").cast("double") /
      (col("sa.sz") + col("sb.sz") - col("i")).cast("double")
    inter
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .where(j >= 0.5)
      .groupBy(col("a")).agg(min(col("b")).as(outCol))
      .withColumnRenamed("a", "doc_id")
  }

  /** Candidate pairs (a < b) sharing at least one LSH band bucket.
    * Self-join on (band, key): only bucket collisions ever meet. */
  private[operators] def lshCandidates(s: SparkSession, dir: String): DataFrame =
    lshCandidatesRaw(s, dir).distinct()

  /** Candidate pairs WITHOUT the distinct shuffle — for consumers that
    * are insensitive to duplicate edges (connected components: extra
    * copies of an edge change nothing about connectivity), skipping the
    * dedup exchange entirely. */
  private[graft] def lshCandidatesRaw(s: SparkSession, dir: String): DataFrame = {
    val b = bandRows(s, dir)
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
  }

  /** (a, b, i, sza, szb): exact shingle-intersection counts plus both
    * sides' set sizes over the LSH candidate pairs — the SHARED verify
    * input for the jaccard and containment passes. One copy of the
    * candidate/intersection scaffolding means the two verifies see the
    * same pair set and counts by construction (the dominance property
    * OperatorSpec pins, containment ≥ jaccard pairwise, depends on
    * that). Postings-shaped join, never all-pairs. */
  private def candidateIntersections(s: SparkSession, dir: String): DataFrame =
    intersectionsOf(s, dir, lshCandidates(s, dir))

  /** The exact-verify scaffolding over ANY candidate pair set: one
    * postings-shaped intersection join + both sides' set sizes. Shared
    * by the jaccard/containment verifies (LSH candidates) and the
    * containment-complete verify (widened candidates) so every verify
    * sees identical counts by construction. */
  private def intersectionsOf(s: SparkSession, dir: String,
      cand: DataFrame): DataFrame = {
    val ex = shingleRows(s, dir)
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val ea = ex.toDF("a", "s")
    val eb = ex.toDF("b", "s")
    cand.join(ea, "a").join(eb, Seq("b", "s"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
  }

  /** Shingle-sample size of the containment candidate pass. */
  val SampleK = 10

  /** Bottom-K shingle sample per doc (K smallest by md5 — a
    * deterministic pseudo-random sample both engines reproduce). */
  private[graft] def shingleSamplesOf(ex: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(md5(col("s")), col("s"))
    ex.withColumn("rn", row_number().over(w))
      .where(col("rn") <= SampleK)
      .select(col("doc_id"), col("s"))
  }

  /** Containment-complete candidate pairs — the pass the
    * dedup_containment comment prescribes: MinHash-LSH banding is
    * tuned for JACCARD, and the pairs containment exists for (short
    * doc embedded in a long one, Jaccard ≪ τ) are exactly the pairs
    * least likely to collide there. Instead, probe each doc's
    * bottom-K shingle SAMPLE against the full shingle postings: a doc
    * B containing ≥ ⌈0.5·min(K,|A|)⌉ of A's sampled shingles is a
    * candidate. Recall: DETERMINISTIC for |A| ≤ K (the sample is the
    * whole set, and containment ≥ 0.8 forces a majority match);
    * P(miss) ≈ Binom(K, 0.8) < K/2 ≈ 0.006 at K = 10 otherwise.
    * Scale shape: postings-probe join keyed on the shingle (sample
    * rows ≪ corpus shingles), never all-pairs; ultra-common shingles
    * are the skew axis — a production pass additionally drops
    * stop-shingles above a df cap, the same knob as the trigram
    * index's gram postings. */
  private[graft] def sampleCandidatesOf(ex: DataFrame): DataFrame =
    shingleSamplesOf(ex).toDF("pa", "s")
      .join(ex.toDF("pb", "s"), "s")
      .where(col("pa") =!= col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("m"))
      .join(ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        .select(col("doc_id").as("pa"), col("sz").as("szp")), "pa")
      .where(col("m") >= ceil(lit(0.5) * least(lit(SampleK), col("szp"))))
      .select(least(col("pa"), col("pb")).as("a"),
        greatest(col("pa"), col("pb")).as("b"))
      .distinct()

  val queries: Map[String, Relational.Q] = Map(

    // ── exact dedup: canonical row per key group ──────────────────────
    "dedup_exact" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang"), col("n_chars"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))),

    // ── fingerprint dedup: md5-of-normalized-text groups ──────────────
    "dedup_fingerprint" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(Text.fingerprint(col("text")).as("fp"), col("doc_id"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))),

    // ── MinHash + LSH candidate pairs ─────────────────────────────────
    "dedup_minhash_lsh" -> ((s, dir) => lshCandidates(s, dir)),

    // ── LSH band-parameter tuning: for each (bands, band_size) layout
    // of the 6 minhashes — (3,2) the production config, (2,3) stricter,
    // (6,1) looser — the bucket census an operator reads BEFORE running
    // the pair join at a new threshold: candidate workload Σ C(n,2),
    // bucket count, and the largest bucket (the skew bound on the
    // self-join). Computed entirely from bucket SIZES — no pair is ever
    // materialized, so tuning costs one aggregation per config over
    // the shared memoized signatures even when the workload it predicts
    // would be quadratic. ────────────────────────────────────────────
    "dedup_lsh_tuning" -> ((s, dir) => {
      val mh = minhashes(s, dir)
      val frames = TuneConfigs.map { case (nb, bs) =>
        val bands = (0 until nb).map { b =>
          val key = concat((0 until bs).map(i => col(s"h${b * bs + i}")): _*)
          struct(lit(b).as("band"), key.as("key"))
        }
        mh.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
          .groupBy(col("bk.band").as("band"), col("bk.key").as("key"))
          .agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(expr("n * (n - 1) div 2")).as("n_candidates"),
            max(col("n")).as("max_bucket"))
          .select(lit(nb).cast("long").as("n_bands"),
            lit(bs).cast("long").as("band_size"),
            col("n_buckets"), col("n_candidates"), col("max_bucket"))
      }
      frames.reduce(_ unionByName _)
    }),

    // ── Content-defined chunking (the FastCDC/Rabin recipe over
    // tokens): a chunk boundary falls wherever the rolling 4-token
    // window's hash lands in a 1/16 target band (4th md5 hex digit =
    // '0'), so boundaries are determined by CONTENT, not offsets — an
    // insertion early in a document shifts every fixed-stride chunk
    // (breaking dedup against the unshifted copy) but leaves all CDC
    // boundaries after it intact; chunk_md5 feeds the same
    // content-addressed span-dedup machinery as dedup_chunk_spans.
    // Expected chunk length 16 tokens. All windows keyed by doc_id —
    // per-doc work only, corpus-size-linear. ─────────────────────────
    "dedup_cdc_chunks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tk = Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("p"), col("col").as("tok"))
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val g = concat_ws(" ", lag(col("tok"), 3).over(wd),
        lag(col("tok"), 2).over(wd), lag(col("tok"), 1).over(wd), col("tok"))
      val boundary = when(col("p") >= 3 &&
        substring(md5(g.cast("binary")), 4, 1) === "0", 1L).otherwise(0L)
      val marked = tk.withColumn("b", boundary)
        .withColumn("chunk_id", coalesce(sum(col("b")).over(
          wd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      marked.groupBy(col("doc_id"), col("chunk_id"))
        .agg(count(lit(1)).as("n_tok"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("p"), col("tok")))),
            x => x.getField("tok")), " ").cast("binary")).as("chunk_md5"))
    }),

    // ── Incremental cross-batch dedup — the daily-increment gate: an
    // arriving batch (stand-in: doc_id % 10 == 7) is deduped AGAINST
    // the standing corpus, never corpus-vs-corpus. Verdict per batch
    // doc: exact_dup (normalized-fingerprint match), else near_dup
    // (shares an LSH band bucket with a corpus doc AND exact 3-gram
    // Jaccard ≥ 0.5), else unique; match_id = the lowest qualifying
    // corpus doc. Scale shape: this is the asymmetric form of the LSH
    // join — band rows of the (small) batch side meet only the corpus
    // rows in colliding buckets, so cost is O(batch·collisions) and
    // the standing corpus is never self-joined; at 100 TB the corpus
    // band table is the persisted artifact (same build-once contract
    // as IvfIndex/PostingsIndex) and each increment reads only its
    // bucket keys. ───────────────────────────────────────────────────
    "dedup_incremental" -> ((s, dir) => {
      val isBatch = col("doc_id") % 10 === 7
      val docs = Tables(s, dir, "documents")
      val fps = docs.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      val exact = fps.where(isBatch)
        .join(fps.where(!isBatch).select(col("doc_id").as("c_id"), col("fp")), "fp")
        .groupBy(col("doc_id")).agg(min(col("c_id")).as("exact_id"))
      val bands = bandRows(s, dir)
      val cand = bands.where(isBatch).as("x")
        .join(bands.where(!isBatch).as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      val near = jaccardNearest(cand, shingleRows(s, dir), "near_id")
      docs.where(isBatch).select(col("doc_id"))
        .join(exact, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("exact_id").isNotNull, lit("exact_dup"))
            .when(col("near_id").isNotNull, lit("near_dup"))
            .otherwise(lit("unique")).as("verdict"),
          coalesce(col("exact_id"), col("near_id")).as("match_id"))
    }),

    // ── incremental dedup against the LSM-MAINTAINED band index: the
    // arrivals (edits + adds of the v1→v2 release) probe the MERGED
    // (base∪delta minus tombstones) corpus band view for bucket
    // collisions, then exact-Jaccard-verify only the candidate docs.
    // This is dedup_incremental's asymmetric shape with the corpus
    // side upgraded from a rebuild-only artifact to the delta-
    // maintained timeline — at 100 TB the band index absorbs corpus
    // churn at delta cost (generations/tombstones/compaction/
    // retention/time-travel all apply; same machinery as the
    // trigram/positional/BM25 kinds). The oracle recomputes the
    // answer from the v2 corpus directly, so a hash match proves the
    // timeline preserved CANDIDATE-GENERATION semantics end to end —
    // a lost band row surfaces as a missed near_dup verdict.
    // Non-vacuity: MOST adds (% 89, original kept unedited — the
    // ~96% whose id is not also % 97 or % 31) copy a still-live
    // original's text verbatim (Jaccard 1.0) and must hit; an add
    // whose original was itself dropped (% 97) has no live copy and
    // may legitimately verdict unique, and one whose original was
    // edited (% 31) faces Jaccard < 1.0 against the " v2" text. An
    // edited arrival must NOT match its own tombstoned v1 rows. ──────
    "dedup_lsh_inc" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val arrivals = IncPostings.deltaDocs(docs, Maintenance.AddShift)
      val arrBands = IncPostings.lshBandRowsOf(arrivals)
      // Materialized eagerly: cand feeds THREE consumers (both verify
      // sides + the candidate-doc semi-join) and ex two — lazy persist
      // would let concurrent stages each recompute the full
      // band-probe lineage (the materialized() trap above).
      // Candidate-sized frames, never corpus-sized.
      val cand = arrBands.as("x")
        .join(IncPostings.mergedLshBands(s, dir).as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
        .persist()
      cand.count()
      // Exact verify shingles ONLY the candidate docs (semi-join into
      // the v2 snapshot) — candidate-sized, never corpus-sized.
      val v2 = Maintenance.snapshotV2(docs).select(col("doc_id"), col("text"))
      val candDocs = cand.select(col("a").as("doc_id"))
        .union(cand.select(col("b").as("doc_id"))).distinct()
      val ex = shinglesOf(v2.join(candDocs, "doc_id")).distinct().persist()
      ex.count()
      val near = jaccardNearest(cand, ex, "match_id")
      arrivals.select(col("doc_id"))
        .join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("match_id").isNotNull, lit("near_dup"))
            .otherwise(lit("unique")).as("verdict"),
          col("match_id"))
    }),

    // ── structural parity: the merged band view must equal a fresh
    // v2 band rebuild as a MULTISET of (doc_id, band, key) rows —
    // exceptAll both ways plus the rebuild's own summary stats (the
    // idx_postings_inc_parity pattern on the dedup layout). ──────────
    "dedup_lsh_inc_parity" -> ((s, dir) => {
      val merged = IncPostings.mergedLshBands(s, dir)
      val fresh = IncPostings.freshV2LshBands(s, dir)
      val onlyM = merged.exceptAll(fresh).agg(count(lit(1)).as("only_merged"))
      val onlyF = fresh.exceptAll(merged).agg(count(lit(1)).as("only_fresh"))
      val stats = fresh.agg(count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(concat(col("band").cast("string"), lit("#"),
          col("key"))).as("n_buckets"))
      onlyM.crossJoin(onlyF).crossJoin(stats)
    }),

    // ── candidate-then-verify: exact 3-gram Jaccard on LSH candidates ─
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val j = col("i").cast("double") /
        (col("sza") + col("szb") - col("i")).cast("double")
      candidateIntersections(s, dir)
        .where(j >= 0.5)
        .select(col("a"), col("b"), Num.roundp(j, 4).as("jacc"))
    }),

    // ── candidate-then-verify: asymmetric n-gram CONTAINMENT on LSH
    // candidates — |A∩B| / min(|A|,|B|), the truncation/quotation
    // detector: a short doc fully embedded in a longer one has low
    // Jaccard (the union is big-doc-sized) but containment ≈ 1, so the
    // jaccard verify drops exactly the pairs keep-longest exists for.
    // Same bucketed candidate set and postings-shaped intersection
    // join as dedup_ngram_jaccard — never all-pairs. Honest recall
    // note: candidates come from the MinHash-LSH stage, which is tuned
    // for JACCARD; a production containment pass additionally LSHes
    // the smaller side's shingle sample so low-Jaccard containments
    // still collide. The verify math here is exact. ──────────────────
    "dedup_containment" -> ((s, dir) => {
      val cont = col("i").cast("double") /
        least(col("sza"), col("szb")).cast("double")
      candidateIntersections(s, dir)
        .where(cont >= 0.8)
        .select(col("a"), col("b"),
          Num.roundp(cont, 4).as("containment"),
          when(col("sza") <= col("szb"), lit("a")).otherwise(lit("b"))
            .as("contained_side"))
    }),

    // ── containment with the COMPLETE candidate stage: the LSH pairs
    // UNIONED with the shingle-sample postings probe (sampleCandidatesOf
    // above), then the same exact verify. Supersedes dedup_containment's
    // honest recall caveat — the planted truncation/quotation pairs
    // Jaccard-LSH misses now collide via the sample probe
    // (DedupContainmentSpec), and the result dominates dedup_containment
    // row-wise by construction (same verify over a superset of pairs).
    // Still never all-pairs: both candidate passes are postings-shaped. ─
    "dedup_containment_full" -> ((s, dir) => {
      val cont = col("i").cast("double") /
        least(col("sza"), col("szb")).cast("double")
      val widened = lshCandidates(s, dir)
        .unionByName(sampleCandidatesOf(shingleRows(s, dir)))
        .distinct()
      intersectionsOf(s, dir, widened)
        .where(cont >= 0.8)
        .select(col("a"), col("b"),
          Num.roundp(cont, 4).as("containment"),
          when(col("sza") <= col("szb"), lit("a")).otherwise(lit("b"))
            .as("contained_side"))
    }),

    // ── SimHash 32-bit signatures ─────────────────────────────────────
    // Frequency-weighted (votes over the raw shingle stream, the
    // standard formulation): no distinct shuffle — the 32 per-doc vote
    // sums partial-aggregate map-side into a tiny exchange.
    "dedup_simhash" -> ((s, dir) => {
      val bits = (0 until 32).map(i => when(col(s"v$i") > 0, "1").otherwise("0"))
      simhashVotes(s, dir)
        .select(col("doc_id"), concat(bits: _*).as("simhash"))
    }),

    // ── SimHash near-dup PAIRS: integer signature → 4 one-byte bands →
    // bucket self-join → Hamming verify via bit_count(xor).
    // Pigeonhole-complete: ≤3 differing bits across 4 bands leave at
    // least one band identical, so banding loses no qualifying pair —
    // candidate generation stays O(bucket collisions), never O(n²). ──
    "dedup_simhash_pairs" -> ((s, dir) => {
      val sigExpr = (0 until 32).map(i =>
        when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
      val sig = simhashVotes(s, dir)
        .select(col("doc_id"), sigExpr.as("sig"))
      val bandStructs = (0 until 4).map(b =>
        struct(lit(b).as("band"), shiftright(col("sig"), 8 * b).bitwiseAND(lit(255L)).as("bv")))
      val bands = sig.select(col("doc_id"), col("sig"),
        explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.bv").as("bv"))
      val ham = bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("long")
      bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
        .where(ham <= 3)
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), ham.as("hamming"))
        .distinct()
    }),

    // ── Chunk-span dedup (sub-document granularity): the standard
    // pretraining pass that removes REPEATED SPANS across documents
    // (boilerplate, quoted text) that doc-level dedup can't see. Docs
    // are cut into non-overlapping 8-token chunks; a chunk occurrence
    // is duplicate unless it is the globally-first occurrence of its
    // hash (first = min doc_id, then min offset within that doc).
    // Scale shape: chunks are content-addressed — the only shuffles
    // are a groupBy(hash) (map-side combined) and a hash-keyed join
    // back; no pairwise comparison anywhere, so cost is O(corpus
    // chunks), independent of how many documents share a span. ───────
    "dedup_chunk_spans" -> ((s, dir) => {
      val ch = chunkRows(s, dir)
      val own = ownerRows(ch)
      ch.join(own, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("doc_id") === col("d0") && col("idx") === col("i0"),
            0L).otherwise(1L)).as("n_dup"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup"),
          Num.roundp(col("n_dup").cast("double") / col("n_chunks"), 4)
            .as("dup_frac"))
    }),

    // ── Chunk-span purge: reconstruct each document from only its
    // KEPT (globally-first) chunks — the emit side of span dedup.
    // Per-doc reassembly is one partial-aggregated collect_list sorted
    // by offset; documents whose every chunk is owned elsewhere drop
    // out entirely (fully-duplicated docs). ──────────────────────────
    "dedup_chunk_purge" -> ((s, dir) => {
      val ch = chunkRows(s, dir)
      val own = ownerRows(ch)
      ch.join(own, Seq("h"))
        .where(col("doc_id") === col("d0") && col("idx") === col("i0"))
        .groupBy(col("doc_id"))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("idx"), col("chunk")))),
            x => x.getField("chunk")), " ").as("clean_text"),
          count(lit(1)).as("n_kept"))
    }),

    // ── Exact-substring duplicated spans (the suffix-array dedup pass
    // of the training-data literature, re-expressed shuffle-native):
    // every OVERLAPPING SubstrW-token window is hashed (stride 1 —
    // unlike the chunk pass above, alignment cannot hide a duplicate);
    // a window occurring more than once corpus-wide is duplicated
    // text, and per document the duplicated window STARTS are merged
    // into MAXIMAL token spans (two hits merge while their token
    // intervals touch: start gap ≤ SubstrW). Output is the per-doc
    // duplicated-span profile a purge/trim pass consumes.
    //
    // Scale shape: the occurrence stream is O(total tokens) rows;
    // duplicate detection is one map-side-combined groupBy(h) and a
    // hash-keyed join back (NOT a count-over-window by h, which would
    // materialize hyper-duplicated boilerplate hashes on one
    // partition; the join side stays AQE-skew-splittable). The merge
    // is a per-document window — bounded by doc length, never corpus
    // size. ──────────────────────────────────────────────────────────
    "dedup_substr_spans" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("tok"))
      val occ = docs
        .select(col("doc_id"), posexplode(Text.shingles(col("tok"), SubstrW)))
        .select(col("doc_id"), col("pos").cast("long").as("idx"),
          md5(col("col")).as("h"))
      val dup = occ.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1).select(col("h"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      val spans = occ.join(dup, Seq("h"))
        .select(col("doc_id"), col("idx"))
        .withColumn("brk",
          when(lag(col("idx"), 1).over(w).isNull ||
            col("idx") - lag(col("idx"), 1).over(w) > SubstrW, 1L).otherwise(0L))
        .withColumn("g", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("g"))
        .agg((max(col("idx")) - min(col("idx")) + SubstrW).as("span_tokens"))
      val agg = spans.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), sum(col("span_tokens")).as("dup_tokens"))
      docs.select(col("doc_id"), size(col("tok")).cast("long").as("n_tokens"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          when(col("n_tokens") === 0, lit(0.0)).otherwise(Num.roundp(
            coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"),
            4)).as("dup_frac"))
    })
  )

  /** Window width of the exact-substring pass: a duplicated region
    * shorter than this many tokens is ignored (the match-length
    * threshold of the suffix-array formulation). */
  private[graft] val SubstrW = 8

  private[graft] val ChunkLen = 8

  /** doc_id → (offset, chunk text, chunk hash) for non-overlapping
    * [[ChunkLen]]-token blocks (last block may be short). The block
    * list is built with one `transform` over the token array — no
    * per-chunk re-tokenization. */
  private def chunkRows(s: SparkSession, dir: String): DataFrame =
    chunkRowsOf(Tables(s, dir, "documents"))

  /** Same, over any (doc_id, text, …) frame — shared with the
    * streaming ingest-time twin. */
  private[graft] def chunkRowsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Text.tokens(col("text")).as("tok"))
      .where(size(col("tok")) > 0)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, (size(tok) + ${ChunkLen - 1}) div $ChunkLen - 1), " +
          s"i -> struct(CAST(i AS BIGINT) AS idx, " +
          s"array_join(slice(tok, i * $ChunkLen + 1, $ChunkLen), ' ') AS chunk))"))
        .as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"), col("c.chunk").as("chunk"),
        md5(col("c.chunk")).as("h"))

  /** Per chunk hash: the canonical (first) occurrence — min doc_id,
    * then min offset within that doc. Two map-side-combined
    * aggregations over the chunk stream; the result is
    * distinct-hash-sized (≤ corpus chunks, typically ≪). */
  private[graft] def ownerRows(ch: DataFrame): DataFrame = {
    val own = ch.groupBy(col("h")).agg(min(col("doc_id")).as("d0"))
    ch.select(col("h"), col("doc_id"), col("idx"))
      .join(own, Seq("h"))
      .where(col("doc_id") === col("d0"))
      .groupBy(col("h"), col("d0")).agg(min(col("idx")).as("i0"))
  }

  // ── Oracle SQL (DuckDB). Shared CTE fragments mirror the Spark plan. ─

  private[operators] val sqlShingles =
    """WITH toksrc AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, list_transform(range(len(tok) - 2),
      |    i -> tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3]) AS shingles
      |  FROM toksrc WHERE len(tok) >= 3),
      |ex AS (
      |  SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh)""".stripMargin

  private val sqlMinhashCols =
    (0 until NumHashes).map(j => s"min(md5('$j|' || s)) AS h$j").mkString(", ")

  private val sqlBands =
    (0 until NumHashes / BandSize).map { b =>
      val key = (0 until BandSize).map(i => s"h${b * BandSize + i}").mkString(" || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM mh"
    }.mkString(" UNION ALL ")

  /** Band layouts probed by dedup_lsh_tuning (bands × band_size ≤ 6). */
  private val TuneConfigs = Seq((3, 2), (2, 3), (6, 1))

  private def sqlTuneCfg(nb: Int, bs: Int): String = {
    val bands = (0 until nb).map { b =>
      val key = (0 until bs).map(i => s"h${b * bs + i}").mkString(" || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM mh"
    }.mkString(" UNION ALL ")
    s"""SELECT CAST($nb AS BIGINT) AS n_bands, CAST($bs AS BIGINT) AS band_size,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_candidates,
       |  max(n) AS max_bucket
       |FROM (SELECT band, key, CAST(count(*) AS BIGINT) AS n
       |      FROM ($bands) GROUP BY band, key)""".stripMargin
  }

  private[operators] val sqlCandidates =
    s"""$sqlShingles,
       |mh AS (SELECT doc_id, $sqlMinhashCols FROM ex GROUP BY doc_id),
       |bands AS ($sqlBands),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)""".stripMargin

  /** The shingle CTE chain re-targeted at the v1→v2 release snapshot
    * (spliced after IncPostings.sqlV2) — the oracle side of the
    * LSM-band-index queries. */
  private val sqlShinglesV2 =
    sqlShingles.stripPrefix("WITH ").replace("FROM documents", "FROM v2")

  /** Arrival predicate over the v2 snapshot: edits keep their natural
    * id (multiples of 31 that survived the drop), adds live at the
    * disjoint shifted ids (≥ AddShift) — exactly
    * IncPostings.deltaDocs' membership. */
  private def sqlArrivalPred(a: String) =
    s"($a.doc_id >= ${Maintenance.AddShift} OR $a.doc_id % 31 = 0)"

  /** Asymmetric (batch-vs-corpus) candidate CTE for the incremental
    * gate: same minhash/band recurrence, join restricted to batch-side
    * x meeting corpus-side y. */
  private val sqlCandidatesInc =
    s"""$sqlShingles,
       |mh AS (SELECT doc_id, $sqlMinhashCols FROM ex GROUP BY doc_id),
       |bands AS ($sqlBands),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.key = y.key
       |   AND x.doc_id % 10 = 7 AND y.doc_id % 10 <> 7)""".stripMargin

  private val sqlFpExpr =
    """md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))"""

  private val sqlSimhashVotes = (0 until 32).map(i =>
    s"sum(CASE WHEN substr(md5(s), ${i + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v$i"
  ).mkString(", ")

  private val sqlSimhashBits = (0 until 32).map(i =>
    s"CASE WHEN v$i > 0 THEN '1' ELSE '0' END").mkString(" || ")

  private val sqlChunks =
    s"""WITH tk AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
       |  FROM documents),
       |ch AS MATERIALIZED (
       |  SELECT doc_id, CAST(u.idx AS BIGINT) AS idx, u.chunk AS chunk,
       |    md5(u.chunk) AS h
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      range(0, (len(tok) + ${ChunkLen - 1}) // $ChunkLen),
       |      i -> {'idx': i,
       |            'chunk': array_to_string(
       |              list_slice(tok, i * $ChunkLen + 1, i * $ChunkLen + $ChunkLen), ' ')})) AS u
       |    FROM tk WHERE len(tok) > 0)),
       |own AS MATERIALIZED (
       |  SELECT ch.h AS h, o.d0 AS d0, min(ch.idx) AS i0
       |  FROM ch JOIN (SELECT h, min(doc_id) AS d0 FROM ch GROUP BY h) o
       |    ON ch.h = o.h AND ch.doc_id = o.d0
       |  GROUP BY ch.h, o.d0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_chunk_spans" ->
      s"""$sqlChunks
         |SELECT doc_id, n_chunks, n_dup,
         |  floor(CAST(n_dup AS DOUBLE) / n_chunks * 10000 + 0.5) / 10000 AS dup_frac
         |FROM (
         |  SELECT ch.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |    CAST(sum(CASE WHEN ch.doc_id = own.d0 AND ch.idx = own.i0
         |      THEN 0 ELSE 1 END) AS BIGINT) AS n_dup
         |  FROM ch JOIN own ON ch.h = own.h
         |  GROUP BY ch.doc_id)""".stripMargin,

    "dedup_chunk_purge" ->
      s"""$sqlChunks
         |SELECT ch.doc_id AS doc_id,
         |  string_agg(ch.chunk, ' ' ORDER BY ch.idx) AS clean_text,
         |  CAST(count(*) AS BIGINT) AS n_kept
         |FROM ch JOIN own ON ch.h = own.h
         |WHERE ch.doc_id = own.d0 AND ch.idx = own.i0
         |GROUP BY ch.doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT lang, n_chars, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY lang, n_chars""".stripMargin,

    "dedup_fingerprint" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""$sqlCandidates
         |SELECT a, b FROM cand""".stripMargin,

    "dedup_lsh_tuning" ->
      s"""$sqlShingles,
         |mh AS (SELECT doc_id, $sqlMinhashCols FROM ex GROUP BY doc_id)
         |${TuneConfigs.map { case (nb, bs) =>
             s"SELECT * FROM (${sqlTuneCfg(nb, bs)})" }.mkString(" UNION ALL ")}
         |""".stripMargin,

    "dedup_cdc_chunks" ->
      s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, CAST(u.p AS BIGINT) AS p, u.tok AS tok
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(range(len(tk0)),
         |      i -> {'p': i, 'tok': tk0[i+1]})) AS u
         |    FROM (SELECT doc_id,
         |            list_filter(string_split(text, ' '), t -> t <> '') AS tk0
         |          FROM documents)
         |    WHERE len(tk0) > 0)),
         |m AS (
         |  SELECT doc_id, p, tok,
         |    CASE WHEN p >= 3 AND substr(md5(
         |        lag(tok, 3) OVER w || ' ' || lag(tok, 2) OVER w || ' ' ||
         |        lag(tok, 1) OVER w || ' ' || tok), 4, 1) = '0'
         |      THEN 1 ELSE 0 END AS b
         |  FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
         |c AS (
         |  SELECT doc_id, p, tok,
         |    CAST(coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY p
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS chunk_id
         |  FROM m)
         |SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_tok,
         |  md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5
         |FROM c GROUP BY doc_id, chunk_id""".stripMargin,

    "dedup_incremental" ->
      s"""$sqlCandidatesInc,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
         |inter AS (
         |  SELECT cand.a, cand.b, count(*) AS i FROM cand
         |  JOIN ex ea ON ea.doc_id = cand.a
         |  JOIN ex eb ON eb.doc_id = cand.b AND eb.s = ea.s
         |  GROUP BY cand.a, cand.b),
         |near AS (
         |  SELECT a AS doc_id, min(b) AS near_id FROM inter
         |  JOIN sizes sa ON sa.doc_id = a
         |  JOIN sizes sb ON sb.doc_id = b
         |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
         |  GROUP BY a),
         |fp AS (SELECT doc_id, $sqlFpExpr AS fp FROM documents),
         |ext AS (
         |  SELECT b.doc_id AS doc_id, min(c.doc_id) AS exact_id
         |  FROM fp b JOIN fp c ON b.fp = c.fp
         |   AND b.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
         |  GROUP BY b.doc_id)
         |SELECT d.doc_id AS doc_id,
         |  CASE WHEN e.exact_id IS NOT NULL THEN 'exact_dup'
         |       WHEN n.near_id IS NOT NULL THEN 'near_dup'
         |       ELSE 'unique' END AS verdict,
         |  coalesce(e.exact_id, n.near_id) AS match_id
         |FROM documents d
         |LEFT JOIN ext e ON e.doc_id = d.doc_id
         |LEFT JOIN near n ON n.doc_id = d.doc_id
         |WHERE d.doc_id % 10 = 7""".stripMargin,

    "dedup_lsh_inc" ->
      s"""${IncPostings.sqlV2},
         |$sqlShinglesV2,
         |mh AS (SELECT doc_id, $sqlMinhashCols FROM ex GROUP BY doc_id),
         |bands AS ($sqlBands),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
         |  JOIN bands y ON x.band = y.band AND x.key = y.key
         |   AND x.doc_id <> y.doc_id
         |  WHERE ${sqlArrivalPred("x")}),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
         |inter AS (
         |  SELECT cand.a, cand.b, count(*) AS i FROM cand
         |  JOIN ex ea ON ea.doc_id = cand.a
         |  JOIN ex eb ON eb.doc_id = cand.b AND eb.s = ea.s
         |  GROUP BY cand.a, cand.b),
         |near AS (
         |  SELECT a AS doc_id, min(b) AS match_id FROM inter
         |  JOIN sizes sa ON sa.doc_id = a
         |  JOIN sizes sb ON sb.doc_id = b
         |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
         |  GROUP BY a)
         |SELECT d.doc_id AS doc_id,
         |  CASE WHEN n.match_id IS NOT NULL THEN 'near_dup'
         |       ELSE 'unique' END AS verdict,
         |  n.match_id AS match_id
         |FROM v2 d LEFT JOIN near n ON n.doc_id = d.doc_id
         |WHERE ${sqlArrivalPred("d")}""".stripMargin,

    "dedup_lsh_inc_parity" ->
      s"""${IncPostings.sqlV2},
         |$sqlShinglesV2,
         |mh AS (SELECT doc_id, $sqlMinhashCols FROM ex GROUP BY doc_id),
         |bands AS ($sqlBands)
         |SELECT CAST(0 AS BIGINT) AS only_merged,
         |  CAST(0 AS BIGINT) AS only_fresh,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT (CAST(band AS VARCHAR) || '#' || key))
         |    AS BIGINT) AS n_buckets
         |FROM bands""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""$sqlCandidates,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
         |inter AS (
         |  SELECT cand.a, cand.b, count(*) AS i FROM cand
         |  JOIN ex ea ON ea.doc_id = cand.a
         |  JOIN ex eb ON eb.doc_id = cand.b AND eb.s = ea.s
         |  GROUP BY cand.a, cand.b)
         |SELECT a, b,
         |  floor((CAST(i AS DOUBLE) / (sa.sz + sb.sz - i)) * 10000 + 0.5) / 10000 AS jacc
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5""".stripMargin,

    "dedup_containment" ->
      s"""$sqlCandidates,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
         |inter AS (
         |  SELECT cand.a, cand.b, count(*) AS i FROM cand
         |  JOIN ex ea ON ea.doc_id = cand.a
         |  JOIN ex eb ON eb.doc_id = cand.b AND eb.s = ea.s
         |  GROUP BY cand.a, cand.b)
         |SELECT a, b,
         |  floor((CAST(i AS DOUBLE) / least(sa.sz, sb.sz)) * 10000 + 0.5) / 10000
         |    AS containment,
         |  CASE WHEN sa.sz <= sb.sz THEN 'a' ELSE 'b' END AS contained_side
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(i AS DOUBLE) / least(sa.sz, sb.sz) >= 0.8""".stripMargin,

    "dedup_containment_full" ->
      s"""$sqlCandidates,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
         |samp AS (
         |  SELECT doc_id, s FROM (
         |    SELECT doc_id, s,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY md5(s), s) AS rn
         |    FROM ex)
         |  WHERE rn <= $SampleK),
         |scand AS (
         |  SELECT least(pa, pb) AS a, greatest(pa, pb) AS b FROM (
         |    SELECT sa.doc_id AS pa, eb.doc_id AS pb, count(*) AS m
         |    FROM samp sa JOIN ex eb ON eb.s = sa.s AND eb.doc_id <> sa.doc_id
         |    GROUP BY 1, 2) j
         |  JOIN sizes za ON za.doc_id = j.pa
         |  WHERE m >= ceil(0.5 * least($SampleK, za.sz))
         |  GROUP BY 1, 2),
         |wide AS (SELECT a, b FROM cand UNION SELECT a, b FROM scand),
         |inter AS (
         |  SELECT wide.a, wide.b, count(*) AS i FROM wide
         |  JOIN ex ea ON ea.doc_id = wide.a
         |  JOIN ex eb ON eb.doc_id = wide.b AND eb.s = ea.s
         |  GROUP BY wide.a, wide.b)
         |SELECT a, b,
         |  floor((CAST(i AS DOUBLE) / least(sa.sz, sb.sz)) * 10000 + 0.5) / 10000
         |    AS containment,
         |  CASE WHEN sa.sz <= sb.sz THEN 'a' ELSE 'b' END AS contained_side
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a
         |JOIN sizes sb ON sb.doc_id = b
         |WHERE CAST(i AS DOUBLE) / least(sa.sz, sb.sz) >= 0.8""".stripMargin,

    "dedup_simhash" ->
      s"""$sqlShingles,
         |exall AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |votes AS (SELECT doc_id, $sqlSimhashVotes FROM exall GROUP BY doc_id)
         |SELECT doc_id, $sqlSimhashBits AS simhash FROM votes""".stripMargin,

    "dedup_simhash_pairs" -> {
      val sigSql = (0 until 32).map(i =>
        s"CASE WHEN v$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END").mkString(" + ")
      s"""$sqlShingles,
         |exall AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |votes AS (SELECT doc_id, $sqlSimhashVotes FROM exall GROUP BY doc_id),
         |sig AS (SELECT doc_id, $sigSql AS sig FROM votes),
         |bands AS (
         |  SELECT doc_id, sig, b.band, (sig >> (8 * b.band)) & 255 AS bv
         |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band) b),
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |    bit_count(xor(x.sig, y.sig)) AS hamming
         |  FROM bands x
         |  JOIN bands y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM pairs
         |WHERE hamming <= 3""".stripMargin
    },

    "dedup_substr_spans" ->
      s"""WITH tk AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
         |  FROM documents),
         |occ AS MATERIALIZED (
         |  SELECT doc_id, CAST(u.i AS BIGINT) AS idx,
         |    md5(array_to_string(list_slice(tok, u.i + 1, u.i + $SubstrW), ' ')) AS h
         |  FROM (SELECT doc_id, unnest(range(len(tok) - ${SubstrW - 1})) AS i
         |        FROM tk WHERE len(tok) >= $SubstrW) u
         |  JOIN tk USING (doc_id)),
         |dup AS MATERIALIZED (SELECT h FROM occ GROUP BY h HAVING count(*) > 1),
         |hits AS MATERIALIZED (
         |  SELECT doc_id, idx,
         |    CASE WHEN lag(idx) OVER (PARTITION BY doc_id ORDER BY idx) IS NULL
         |      OR idx - lag(idx) OVER (PARTITION BY doc_id ORDER BY idx) > $SubstrW
         |      THEN 1 ELSE 0 END AS brk
         |  FROM occ JOIN dup USING (h)),
         |spans AS MATERIALIZED (
         |  SELECT doc_id, g, max(idx) - min(idx) + $SubstrW AS span_tokens
         |  FROM (SELECT doc_id, idx, sum(brk) OVER (
         |          PARTITION BY doc_id ORDER BY idx
         |          ROWS UNBOUNDED PRECEDING) AS g FROM hits)
         |  GROUP BY doc_id, g),
         |agg AS MATERIALIZED (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
         |  FROM spans GROUP BY doc_id)
         |SELECT tk.doc_id AS doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CASE WHEN len(tok) = 0 THEN 0.0 ELSE
         |    floor(CAST(coalesce(dup_tokens, 0) AS DOUBLE) / len(tok) * 10000 + 0.5)
         |      / 10000 END AS dup_frac
         |FROM tk LEFT JOIN agg ON tk.doc_id = agg.doc_id""".stripMargin
  )
}
