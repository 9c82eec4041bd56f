package graft.news

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The canonical news-article data model (SURVEY.md §1.2): one logical
  * entity with four concrete surfaces. All schemas are explicit
  * `StructType` constants — inference at read time is an anti-pattern at
  * scale (schema drift + an extra full pass,
  * dags/scripts/spark_daily_report.py:55).
  */
object NewsSchema {

  /** Typed row for the enriched store table
    * (reference DDL: collect/consumer.py:45-59). */
  case class NewsArticle(
      id: Long,
      title: String,
      author: Option[String],
      link: String,
      summary: Option[String],
      updated: Option[java.sql.Timestamp],
      full_text: Option[String],
      category: Option[String],
      keywords: Option[Seq[String]],
      embedding: Option[Seq[Float]])

  /** The 17-label closed category set + fallback
    * (collect/consumer.py:117-118, validation at :131). */
  val Categories: Seq[String] = Seq(
    "IT_과학", "건강", "경제", "교육", "국제", "라이프스타일", "문화",
    "사건사고", "사회일반", "산업", "스포츠", "여성복지", "여행레저",
    "연예", "정치", "지역", "취미")
  val Unclassified = "미분류"

  /** (a) Kafka wire message (collect/producer.py:42-48). */
  val wireSchema: StructType = StructType(Seq(
    StructField("author", StringType),
    StructField("link", StringType, nullable = false),
    StructField("summary", StringType),
    StructField("title", StringType),
    StructField("updated", StringType)))

  /** (b) Enriched store table `news_api_newsarticle`
    * (collect/consumer.py:45-59). */
  val storeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("author", StringType),
    StructField("link", StringType, nullable = false),
    StructField("summary", StringType),
    StructField("updated", TimestampType),
    StructField("full_text", StringType),
    StructField("category", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("embedding", ArrayType(FloatType))))

  /** (c) HDFS archive JSON (data/news_archive/sample.json;
    * read at dags/scripts/spark_daily_report.py:55,77-78). */
  val archiveSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("content", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("published_at", TimestampType),
    StructField("category", StringType),
    StructField("embedding", ArrayType(FloatType))))

  /** (d) Raw batch CSV (preprocess/datashow.ipynb cells 4/49):
    * pipe-delimited, multi-line article bodies. */
  val rawCsvSchema: StructType = StructType(Seq(
    StructField("company", StringType),
    StructField("title", StringType),
    StructField("link", StringType),
    StructField("published", StringType),
    StructField("reporter", StringType),
    StructField("article", StringType),
    StructField("category", StringType),
    StructField("category_str", StringType),
    StructField("_corrupt", StringType)))

  /** store → archive mapping view (`full_text`→`content`,
    * `updated`→`published_at`; SURVEY §1.2c). */
  def storeToArchive(df: DataFrame): DataFrame =
    df.select(col("id"), col("title"),
      col("full_text").as("content"), col("keywords"),
      col("updated").as("published_at"), col("category"), col("embedding"))

  /** Closed-set validation (F11): keep only known labels, else 미분류. */
  def validCategory(c: Column): Column =
    when(c.isin(Categories: _*), c).otherwise(lit(Unclassified))
}
