package graft.news

import graft.functions.Text
import graft.udfs.Enrichers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

/** The daily-report query set R1–R7 (SURVEY.md §3.1; reference:
  * dags/scripts/spark_daily_report.py) as pure DataFrame stages. The
  * engine contract is these result *datasets*; PDF rendering stays a
  * thin driver-side consumer of the collected (small) outputs.
  *
  * Fixes over the reference applied here (SURVEY §4.1): the day's slice
  * is persisted once instead of re-scanned per action; sentiment and
  * summaries are computed distributed before collect instead of in a
  * driver loop; reads take an explicit schema.
  */
object DailyReport {

  /** S8 + F3/F5: read the archive and slice one day. JSONL preferred
    * (splittable); `multiline=true` compat for legacy arrays of
    * records (spark_daily_report.py:55). */
  def readArchive(spark: SparkSession, path: String, multiline: Boolean = false): DataFrame =
    spark.read.schema(NewsSchema.archiveSchema)
      .option("multiline", multiline.toString).json(path)

  def daySlice(df: DataFrame, date: String): DataFrame =
    df.withColumn("published_date", to_date(col("published_at"))) // :62
      .where(col("published_date") === to_date(lit(date))) // :63

  /** R1: per-category counts, descending (:68-70). */
  def categoryCounts(day: DataFrame): DataFrame =
    day.groupBy(col("category")).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("category"))

  /** R2: keyword frequencies via explode (:72-75). */
  def keywordCounts(day: DataFrame): DataFrame =
    day.select(explode(col("keywords")).as("keyword"))
      .groupBy(col("keyword")).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("keyword"))

  /** R2b: top-10 keywords (:153) — engine-side TakeOrderedAndProject,
    * not a driver-side head(10). */
  def topKeywords(day: DataFrame, k: Int = 10): DataFrame =
    keywordCounts(day).limit(k)

  /** R3: article listing with first-sentence summary (X10, :180) and
    * sentiment (U7, :175-179) computed distributed. */
  def articleList(day: DataFrame): DataFrame =
    day.select(col("id"), col("title"), col("category"),
      Text.firstSentence(col("content")).as("summary"),
      Enrichers.sentimentExpr(col("content")).as("sentiment"))

  /** R4/R6: PCA(k=2) + KMeans(k=min(5,n), seed=42) over embeddings
    * (:82-98). Returns (id, title, pc1, pc2, cluster). */
  def clustering(day: DataFrame): DataFrame = {
    val withVec = day.na.drop(Seq("embedding")) // F7, :82
      .withColumn("features", array_to_vector(col("embedding"))) // U5 via builtin
      .persist()
    val n = withVec.count() // :83 — counted once, slice cached
    if (n == 0) return day.sparkSession.emptyDataFrame
    val k = math.min(5L, n).toInt // :91
    val pca = new PCA().setK(2).setInputCol("features").setOutputCol("pca").fit(withVec)
    val km = new KMeans().setK(k).setSeed(42)
      .setFeaturesCol("features").setPredictionCol("cluster").fit(withVec)
    val out = km.transform(pca.transform(withVec))
      .select(col("id"), col("title"),
        element_at(vector_to_array(col("pca")), 1).as("pc1"),
        element_at(vector_to_array(col("pca")), 2).as("pc2"),
        col("cluster"))
    withVec.unpersist()
    out
  }

  /** R5: noun frequencies for the word cloud (:231-240) — distributed
    * tokenizer expression instead of the reference's driver-side Okt
    * loop (:31-36). Uses the stemmed (josa/verb-ending-stripped)
    * variant so 정부/정부는/정부가 aggregate into one cloud term, as
    * Okt.nouns() would produce. */
  def nounFrequencies(day: DataFrame): DataFrame =
    day.select(explode(Enrichers.hangulNounsStemmedExpr(col("content"))).as("noun"))
      .groupBy(col("noun")).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("noun"))

  /** Run the full report for one date; persists the slice once
    * (reference re-scans JSON for every action, §4.1). */
  def run(spark: SparkSession, path: String, date: String,
      multiline: Boolean = false): Map[String, DataFrame] = {
    val day = daySlice(readArchive(spark, path, multiline), date).persist()
    val out = Map(
      "r1_category_counts" -> categoryCounts(day),
      "r2_keyword_counts" -> keywordCounts(day),
      "r2b_top_keywords" -> topKeywords(day),
      "r3_article_list" -> articleList(day),
      "r4_clustering" -> clustering(day),
      "r5_noun_frequencies" -> nounFrequencies(day))
    out
  }
}
