package graft

import graft.operators.PostingsIndex
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Build-once / search-many inverted index: persisted layout, bucket
  * pruning on search, streaming incremental append, and the persisted
  * form of the inc_postings_merge identity (merged partials == full
  * rebuild). */
class PostingsIndexSpec extends SparkSuite {

  test("persisted search reproduces the inline BM25 ranking") {
    val tmp = Files.createTempDirectory("pidx").toString + "/idx"
    PostingsIndex.build(spark, Tables(spark, sf001, "documents"), tmp)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Long]("n_terms"))
    val got = PostingsIndex.bm25Search(spark, tmp, PostingsIndex.Terms, 10)
      .collect().map(key).toSeq
    val want = SparkEntry.queries("idx_bm25_topk")(spark, sf001)
      .collect().map(key).toSeq
    assert(got == want)
  }

  test("search reads only the query terms' bucket directories (plan pin)") {
    val tmp = Files.createTempDirectory("pidx2").toString + "/idx"
    PostingsIndex.build(spark, Tables(spark, sf001, "documents"), tmp)
    // the corpus spreads over many buckets …
    val allDirs = new java.io.File(s"$tmp/postings").list()
      .count(_.startsWith("tbucket="))
    assert(allDirs > 10, s"only $allDirs bucket dirs — layout degenerate")
    val df = PostingsIndex.bm25Search(spark, tmp, PostingsIndex.Terms, 10)
    df.collect()
    // … but the search scan is pruned to ≤ |terms| of them, with the
    // token filter pushed into the parquet read.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan)
      .filter(_.metadata("Location").contains("postings")).head
    assert(scan.metadata("PartitionFilters").contains("tbucket"),
      scan.metadata("PartitionFilters"))
    assert(scan.metadata("PushedFilters").contains("In(token"),
      scan.metadata("PushedFilters"))
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead <= PostingsIndex.Terms.length,
      s"read $filesRead files for ${PostingsIndex.Terms.length} terms ($allDirs dirs)")
  }

  test("streaming append equals a fresh batch build (search + merged stats)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmpA = Files.createTempDirectory("pidx-inc").toString + "/idx"
    val tmpB = Files.createTempDirectory("pidx-full").toString + "/idx"
    val docs = Tables(spark, sf001, "documents")

    PostingsIndex.build(spark, docs.where(col("doc_id") % 3 === 0), tmpA)

    // Two micro-batches of late documents through the ingest shape.
    val ids = MemoryStream[Long]
    val q = ids.toDS().toDF("id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        PostingsIndex.append(spark, tmpA,
          batch.join(docs, batch("id") === docs("doc_id"))
            .select(docs("doc_id"), docs("text")))
      }
      .start()
    try {
      ids.addData(docs.where(col("doc_id") % 3 === 1)
        .select("doc_id").as[Long].collect().toSeq: _*)
      q.processAllAvailable()
      ids.addData(docs.where(col("doc_id") % 3 === 2)
        .select("doc_id").as[Long].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    PostingsIndex.build(spark, docs, tmpB)

    def top(path: String) =
      PostingsIndex.bm25Search(spark, path, PostingsIndex.Terms, 10).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    assert(top(tmpA) == top(tmpB))

    // Merge-on-read over the partial stat batches == full rebuild —
    // the persisted inc_postings_merge identity.
    def stats(path: String) =
      PostingsIndex.termStats(spark, path).collect()
        .map(r => (r.getAs[String]("token"), r.getAs[Long]("df"),
          r.getAs[Long]("tf_total"))).toSet
    assert(stats(tmpA) == stats(tmpB))
  }
}
