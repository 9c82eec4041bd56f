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

  /** doc_id → distinct 3-shingles (same construction as the dedup
    * family: whitespace tokens, 3-grams joined by spaces). */
  private def shingleRows(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("tok"))
      .select(col("doc_id"), explode(Text.shingles(col("tok"), 3)).as("tok"))
      .distinct()

  /** Exact Jaccard-≥ τ pairs (a < b) from a (doc_id, tok) set view,
    * via prefix-filtered candidate generation + exact verification. */
  def prefixJoin(ex: DataFrame, tau: Double): DataFrame = {
    // Global element order: ascending document frequency, then value.
    // The window runs over the vocabulary, not the corpus.
    val vocab = ex.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .withColumn("rk", row_number().over(Window.orderBy(col("df"), col("tok"))))
      .select(col("tok"), col("rk"))
    val ranked = ex.join(vocab, "tok")

    // Per-doc prefix: first |x| − ⌈τ|x|⌉ + 1 elements in rank order.
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("rk"))
    val sized = ranked
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val prefix = sized
      .where(col("pos") <= col("sz") - ceil(col("sz") * tau) + 1)
      .select(col("doc_id"), col("tok"))

    // Candidates: pairs sharing a prefix element (lossless by the
    // prefix lemma); distinct because a pair can collide on several.
    val cand = prefix.toDF("a", "tok")
      .join(prefix.toDF("b", "tok"), "tok")
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()

    // Exact verify on the full sets, candidates only.
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(ex.toDF("a", "tok"), "a")
      .join(ex.toDF("b", "tok"), Seq("b", "tok"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("i"))
    val jacc = col("i").cast("double") /
      (col("sa.sz") + col("sb.sz") - col("i")).cast("double")
    inter
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .where(jacc >= tau)
      .select(col("a"), col("b"), Num.roundp(jacc, 4).as("jacc"))
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
