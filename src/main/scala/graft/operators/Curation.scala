package graft.operators

import graft.Tables
import graft.functions.{Num, Text}
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

  val queries: Map[String, Relational.Q] = Map(

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
    "pipe_mix_weighted" -> ((s, dir) => {
      val h = substring(md5(concat(lit("mix|"), col("doc_id").cast("string"))), 1, 1)
      val tier = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), "full")
        .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), "half")
        .otherwise("quarter")
      val kept = when(tier === "full", true)
        .when(tier === "half", h <= "7")
        .otherwise(h <= "3")
      Tables(s, dir, "documents")
        .select(col("source"), tier.as("tier"), kept.as("kept"))
        .groupBy(col("source"), col("tier"))
        .agg(count(lit(1)).as("n_total"), count_if(col("kept")).as("n_kept"))
    })
  )

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
        |FROM t GROUP BY 1, 2""".stripMargin
  )
}
