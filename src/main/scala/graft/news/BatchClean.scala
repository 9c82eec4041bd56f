package graft.news

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The batch preprocessing pipeline (SURVEY.md §3.3; reference:
  * preprocess/datashow.ipynb) as one declarative chain:
  *
  *   raw pipe-delimited CSV → null-drop → control-char strip → length
  *   filter → author filter → rename → truncate → surrogate id →
  *   store-shaped output.
  *
  * Differences from the pandas original, by design:
  *  - explicit schema + PERMISSIVE mode with a corrupt-record column
  *    replaces `engine='python', on_bad_lines='warn'` (cell 4) — and is
  *    splittable/parallel instead of single-core;
  *  - the surrogate id (`index+1`, cell 30) is `row_number` over an
  *    explicit stable key (`link`): pandas ordinal ids assume a global
  *    order that distributed execution doesn't have. For 100 TB use
  *    `monotonically_increasing_id` instead (contiguity costs a
  *    single-partition window; documented tradeoff, SURVEY §7.3).
  */
object BatchClean {

  /** S9: pipe-delimited, quoted, multi-line-tolerant CSV scan. */
  def readRawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(NewsSchema.rawCsvSchema)
      .option("sep", "|")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** The notebook's cleaning chain (cells 19→47). */
  def clean(raw: DataFrame): DataFrame = {
    val noCtl = regexp_replace(col("article"), "[\\n\\r\\t]", "") // X1, cell 23
    raw
      .where(col("_corrupt").isNull)
      .na.drop(Seq("title", "reporter", "article")) // F6, cell 19
      .withColumn("article", noCtl)
      .where(length(col("article")) > 100) // F9, cell 25
      .where(col("reporter").contains("기자") && length(col("reporter")) < 30) // F10, cell 37
      .withColumn("reporter", substring(col("reporter"), 1, 255)) // X5, cell 45
      .withColumnsRenamed(Map( // F2, cell 31
        "reporter" -> "author", "article" -> "full_text", "published" -> "updated"))
      .withColumn("summary", lit("summary")) // F4, cell 33
      .withColumn("id", row_number().over(Window.orderBy(col("link"))).cast("long")) // cell 30
      .select(col("id"), col("title"), col("author"), col("link"),
        col("summary"), to_timestamp(col("updated")).as("updated"),
        col("full_text"),
        NewsSchema.validCategory(col("category")).as("category"))
  }
}
