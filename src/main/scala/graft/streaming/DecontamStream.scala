package graft.streaming

import graft.functions.{Num, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming eval-set decontamination — the ingest-time face of the
  * batch `decontam_ngram` operator (operators/Curation.scala): incoming
  * documents are scored against the benchmark shingle set as they
  * arrive, so contaminated text is flagged (or dropped) BEFORE it ever
  * lands in the corpus, instead of by a later full-corpus sweep.
  *
  * Scoring is per-document with no cross-batch state, so the streaming
  * form is `foreachBatch { b => sink(score(b, evalShingles)) }` — a
  * per-doc aggregation INSIDE each micro-batch. (A direct streaming
  * `groupBy(doc_id)` would keep one state row per document forever;
  * routing through foreachBatch keeps the stream at constant memory.)
  *
  * Scale shape matches the batch op: the eval shingle set is
  * benchmark-sized and broadcast; each batch's documents explode to
  * shingles map-side, the broadcast left-join marks hits, and one
  * map-side-combined aggregation per doc yields the contamination
  * fraction.
  */
object DecontamStream {

  /** Attach `n_common` / `train_sz` / `contam_ratio` / `contaminated`
    * to a `(doc_id, text)` micro-batch. `evalShingles` must be a batch
    * frame with one `s` column (the benchmark 3-gram set). */
  def score(docs: DataFrame, evalShingles: DataFrame,
      threshold: Double = 0.1): DataFrame = {
    val sh = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("tok"))
      .select(col("doc_id"), explode(Text.shingles(col("tok"), 3)).as("s"))
      .dropDuplicates("doc_id", "s")
    val hits = sh.join(broadcast(evalShingles.select(col("s")).distinct()
        .withColumn("hit", lit(1))), Seq("s"), "left")
    val perDoc = hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("train_sz"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_common"))
    // Documents with fewer than 3 tokens produce NO shingles, so they
    // vanish from the exploded aggregation — but this is an ingest
    // GATE: such docs must pass through as clean, not be silently
    // dropped. Left-join the scores back onto the full doc_id set
    // (same restore pattern as TextOps.bpeApplyStats).
    val ratio = col("n_common").cast("double") / col("train_sz").cast("double")
    docs.select(col("doc_id")).dropDuplicates("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("train_sz"), lit(0L)).as("train_sz"),
        coalesce(Num.roundp(ratio, 4), lit(0.0d)).as("contam_ratio"),
        coalesce(ratio >= threshold, lit(false)).as("contaminated"))
  }

  /** The eval shingle set for a corpus dir — the same doc_id % 97 slice
    * the batch operator uses. */
  def evalShingles(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")
      .where(col("doc_id") % 97 === 0)
      .select(Text.tokens(col("text")).as("tok"))
      .select(explode(Text.shingles(col("tok"), 3)).as("s"))
      .distinct()
}
