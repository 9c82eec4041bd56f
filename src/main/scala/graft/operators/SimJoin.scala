package graft.operators

import graft.Tables
import graft.functions.{Num, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (AllPairs /
  * PPJoin family — Bayardo et al. WWW'07, Chaudhuri et al. ICDE'06).
  *
  * Complements the MinHash-LSH pipeline in [[Dedup]]: LSH is
  * probabilistic (a pair can miss every band), prefix filtering is
  * LOSSLESS — it returns exactly the pairs the quadratic all-pairs scan
  * would, so it is the tool when the contract is "every duplicate above
  * τ, guaranteed". The price is exactness of candidate generation, paid
  * in shuffle volume, never in recall. Same 3-shingle sets and the same
  * τ = 0.5 as the LSH path, so the two pipelines are directly
  * comparable: `simjoin_prefix` ⊇ the verified LSH pairs by
  * construction, and equals the brute-force join exactly.
  *
  * (Shingles, not word sets: on this corpus word-set Jaccard is
  * non-discriminative — the shared synthetic vocabulary puts >50 % of
  * ALL document pairs above 0.6 — while order-sensitive shingles
  * separate true near-dups from topical overlap. The same reasoning
  * applies to any natural-language corpus.)
  *
  * The filter: order every document's shingle set by one GLOBAL order
  * (ascending document frequency, ties by shingle — rarest first). For
  * Jaccard ≥ τ a matching pair must share ≥ ⌈τ·|x|⌉ elements, so the
  * first |x| − ⌈τ·|x|⌉ + 1 elements of x (its "prefix") must intersect
  * the other side's prefix — candidate pairs are generated ONLY from
  * equal prefix elements. Prefixes hold each document's RAREST
  * shingles, so bucket sizes stay tiny exactly where a join on all
  * elements would explode.
  *
  * Shuffle shape at 100 TB: document frequency is a map-side-combining
  * count; the global rank is a window over the distinct-shingle VOCAB
  * (≪ corpus); every other step shuffles on doc_id or shingle — no
  * global sort of the corpus anywhere. Verification computes the exact
  * intersection only for candidates (candidate-then-verify, like LSH).
  *
  * Oracle: the exhaustive quadratic join in DuckDB — the lossless
  * claim IS the test. `Scale2Spec` additionally pins prefix-filtered
  * == brute-force inside Spark and ⊇ the LSH-verified pairs.
  */
object SimJoin {

  val Tau = 0.5

  /** doc_id → distinct 3-shingles: the dedup family's persisted set
    * view verbatim (one shingle materialization serves LSH and prefix
    * paths alike), renamed to this module's column contract. */
  private def shingleRows(s: SparkSession, dir: String): DataFrame =
    Dedup.shingleRows(s, dir).withColumnRenamed("s", "tok")

  /** Exact Jaccard-≥ τ pairs (a < b) from a (doc_id, tok) set view,
    * via prefix-filtered candidate generation (with PPJoin's length and
    * positional refinements) + array-based exact verification.
    *
    * Losslessness of each pruning step, for J(x,y) ≥ τ with overlap o:
    *  - prefix: o ≥ ⌈τ·|x|⌉, so the first |x|−⌈τ|x|⌉+1 elements (global
    *    (df, tok) order) of both sides must intersect (pigeonhole);
    *  - length: o ≤ min(|x|,|y|) and J ≥ τ force |y| ≥ τ|x| (and
    *    symmetrically) — size-skewed collisions can't be true pairs;
    *  - positional: common elements sort identically on both sides, so
    *    at the first collision (pos_a, pos_b) the whole overlap fits in
    *    the suffixes: o ≤ 1 + min(|x|−pos_a, |y|−pos_b); J ≥ τ needs
    *    o ≥ ⌈τ/(1+τ)·(|x|+|y|)⌉. A surviving pair keeps ≥1 collision
    *    satisfying the bound — keeping pairs where ANY collision passes
    *    is a superset of PPJoin's candidates, still lossless.
    *
    * Verification joins each candidate to its two COLLECTED shingle
    * arrays (one row per candidate, `array_intersect` for the overlap)
    * instead of re-exploding candidates against the element table —
    * the explode form shuffles Σ|cand|·|doc| rows (measured 21 M at
    * sf0.1 for 409 k candidates), the array form |cand| rows. */
  def prefixJoin(exRaw: DataFrame, tau: Double): DataFrame = {
    // Several consumers derive from the set view — it must be cached.
    // The query path hands in the already-persisted Dedup.shingleRows
    // view (Dataset.storageLevel resolves through the cache manager by
    // analyzed plan), so re-persisting would double-cache it; only
    // persist here when the caller didn't, and then release the cache
    // before returning (the verified pair set is materialized first, so
    // repeated ad-hoc invocations — the ScalaCheck corpora — can't
    // accumulate shingle-table cache entries).
    val preCached = exRaw.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val ex = exRaw
    if (!preCached) { ex.persist(); ex.count() }

    // Global element order: ascending document frequency, then value.
    // No materialized rank is needed — (df, tok) IS the order, so the
    // per-doc sort can use it directly; and df itself comes from a
    // count-over-tok window (one shuffle) rather than a groupBy+join
    // (which would shuffle ex twice plus the vocab).
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
    val sized = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val prefix = sized
      .where(col("pos") <= col("sz") - ceil(col("sz") * tau) + 1)
      .select(col("doc_id"), col("tok"), col("pos"), col("sz"))

    // Candidates from prefix collisions, pruned by the length and
    // positional filters; distinct because a pair can collide on
    // several prefix elements.
    val pa = prefix.toDF("a", "tok", "pos_a", "sz_a")
    val pb = prefix.toDF("b", "tok", "pos_b", "sz_b")
    val minOverlap = ceil(lit(tau / (1 + tau)) * (col("sz_a") + col("sz_b")))
    val cand = pa.join(pb, "tok")
      .where(col("a") < col("b") &&
        col("sz_b") >= ceil(col("sz_a") * tau) &&
        col("sz_a") >= ceil(col("sz_b") * tau) &&
        lit(1) + least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b")) >= minOverlap)
      .select(col("a"), col("b")).distinct()

    // Exact verify: one row per candidate, sets carried as arrays.
    val sets = ex.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("tok"))).as("toks"), count(lit(1)).as("sz"))
    val verified = cand
      .join(sets.toDF("a", "toks_a", "sz_a"), "a")
      .join(sets.toDF("b", "toks_b", "sz_b"), "b")
      // sort_array'd distinct sets → the codegen'd merge walk counts
      // the overlap allocation-free (array_intersect hash-builds per
      // candidate pair).
      .withColumn("i", graft.functions.Vectors
        .sortedIntersectCountStr(col("toks_a"), col("toks_b")).cast("int"))
    val jacc = col("i").cast("double") /
      (col("sz_a") + col("sz_b") - col("i")).cast("double")
    val result = verified.where(jacc >= tau)
      .select(col("a"), col("b"), Num.roundp(jacc, 4).as("jacc"))
    if (preCached) result
    else {
      // Pin the (small) verified pair set, then free the shingle cache
      // this call created. localCheckpoint also truncates the lineage,
      // so nothing downstream can re-trigger the unpersisted scan.
      val out = result.localCheckpoint(true)
      ex.unpersist(blocking = false)
      out
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "simjoin_prefix" -> ((s, dir) => prefixJoin(shingleRows(s, dir), Tau))
  )

  def oracles: Map[String, String] = Map(
    // The naive quadratic all-pairs join over the same shingle sets —
    // prefix filtering must reproduce it exactly.
    "simjoin_prefix" ->
      """WITH toksrc AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_transform(range(len(tok) - 2),
        |    i -> tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3]) AS shingles
        |  FROM toksrc WHERE len(tok) >= 3),
        |ex AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b,
        |  floor((CAST(i AS DOUBLE) / (sa.sz + sb.sz - i)) * 10000 + 0.5) / 10000 AS jacc
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = a
        |JOIN sizes sb ON sb.doc_id = b
        |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5""".stripMargin
  )
}
