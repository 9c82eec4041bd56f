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

  test("streaming increments through the ONE LSM mechanism equal a fresh batch build") {
    // r12 directive #6: the append-only partial-stats increment is
    // retired; the maintained BM25 index rides IncPostings' commit
    // protocol exclusively. The ingest shape stays the same — micro
    // -batches through foreachBatch — but each increment is a
    // commitDelta, and merge-on-read must reproduce the full build.
    import graft.operators.IncPostings
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("pidx-lsm").toFile
    val tmpFull = Files.createTempDirectory("pidx-full").toString + "/idx"
    val docs = Tables(spark, sf001, "documents")
    val noTombs = Seq.empty[Long].toDF("doc_id")

    IncPostings.commitBase(root,
      IncPostings.bm25RowsOf(docs.where(col("doc_id") % 3 === 0)))
    val dlRoot = Files.createTempDirectory("pidx-lsm-dl").toFile
    IncPostings.commitBase(dlRoot,
      IncPostings.doclenRowsOf(docs.where(col("doc_id") % 3 === 0)))

    // Two micro-batches of late documents through the ingest shape.
    val ids = MemoryStream[Long]
    val q = ids.toDS().toDF("id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val arrivals = batch.join(docs, batch("id") === docs("doc_id"))
          .select(docs("doc_id"), docs("text"))
        IncPostings.commitDelta(root,
          IncPostings.bm25RowsOf(arrivals), noTombs)
        IncPostings.commitDelta(dlRoot,
          IncPostings.doclenRowsOf(arrivals), noTombs)
        ()
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

    PostingsIndex.build(spark, docs, tmpFull)

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))
    val merged = IncPostings.bm25Probe(
      IncPostings.readCurrent(spark, root),
      IncPostings.readCurrent(spark, dlRoot),
      PostingsIndex.Terms, 10).collect().map(key).toSeq
    val full = PostingsIndex.bm25Search(spark, tmpFull,
      PostingsIndex.Terms, 10).collect().map(key).toSeq
    assert(merged == full)

    // …and the serving fold: the LSM view republished as the
    // bucket-partitioned layout must search identically through the
    // pruned bm25Search path — LSM for increments, serving layout for
    // searches, one result.
    val served = Files.createTempDirectory("pidx-served").toString + "/idx"
    PostingsIndex.publishServing(
      IncPostings.readCurrent(spark, root),
      IncPostings.readCurrent(spark, dlRoot), served)
    val foldTop = PostingsIndex.bm25Search(spark, served,
      PostingsIndex.Terms, 10).collect().map(key).toSeq
    assert(foldTop == full)
  }

  test("serving fold carries tombstone semantics: edits and deletes survive the republish") {
    import graft.operators.IncPostings
    import spark.implicits._
    val root = Files.createTempDirectory("pidx-tomb").toFile
    val dlRoot = Files.createTempDirectory("pidx-tomb-dl").toFile
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    // v1: three docs; delta: doc 1 edited, doc 2 deleted, doc 9 added
    val v1 = docs(1L -> "spark window query", 2L -> "window gone soon",
      3L -> "spark stays put")
    IncPostings.commitBase(root, IncPostings.bm25RowsOf(v1))
    IncPostings.commitBase(dlRoot, IncPostings.doclenRowsOf(v1))
    val delta = docs(1L -> "query only now", 9L -> "spark query window")
    val tombs = Seq(1L, 2L).toDF("doc_id")
    IncPostings.commitDelta(root, IncPostings.bm25RowsOf(delta), tombs)
    IncPostings.commitDelta(dlRoot, IncPostings.doclenRowsOf(delta), tombs)

    val served = Files.createTempDirectory("pidx-tomb-srv").toString + "/idx"
    PostingsIndex.publishServing(
      IncPostings.readCurrent(spark, root),
      IncPostings.readCurrent(spark, dlRoot), served)
    // the served index equals a fresh build over the FINAL corpus
    val tmpFull = Files.createTempDirectory("pidx-tomb-full").toString + "/idx"
    PostingsIndex.build(spark,
      docs(1L -> "query only now", 3L -> "spark stays put",
        9L -> "spark query window"), tmpFull)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Long]("n_terms"))
    val got = PostingsIndex.bm25Search(spark, served,
      PostingsIndex.Terms, 10).collect().map(key).toSeq
    val want = PostingsIndex.bm25Search(spark, tmpFull,
      PostingsIndex.Terms, 10).collect().map(key).toSeq
    assert(got == want && got.nonEmpty)
    // deleted doc 2 is gone; edited doc 1's old tokens are gone
    assert(!got.exists(_._1 == 2L))
    val p = spark.read.parquet(
      s"${PostingsIndex.servingDir(served)}/postings")
    assert(p.where(col("doc_id") === 1L && col("token") === "spark").count() == 0)
    assert(p.where(col("doc_id") === 2L).count() == 0)
  }

  test("repeated folds publish isolated generations; readers and recovery follow the claims") {
    import graft.operators.{IncPostings, PostingsIndex}
    def docs(rows: (Long, String)*) = {
      import spark.implicits._
      rows.toDF("doc_id", "text")
    }
    val serving = java.nio.file.Files
      .createTempDirectory("fold-gens").toString + "/idx"
    val terms = Seq("alpha")
    def fold(rows: (Long, String)*): Unit =
      PostingsIndex.publishServing(
        IncPostings.bm25RowsOf(docs(rows: _*)),
        IncPostings.doclenRowsOf(docs(rows: _*)), serving)
    def topDoc(dir: String): Long =
      PostingsIndex.bm25Search(spark, dir, terms, 1)
        .collect().head.getLong(0)

    // exactly ONE doc per fold contains the probe term, so the top
    // document identifies the generation unambiguously
    fold(1L -> "alpha alpha beta", 2L -> "beta gamma")
    val v1 = PostingsIndex.servingDir(serving)
    assert(v1.endsWith("/v1"), s"first fold must publish v1, got $v1")
    assert(topDoc(serving) === 1L)

    // a reader that resolved v1 BEFORE the refold reads it unchanged
    fold(3L -> "alpha alpha alpha", 4L -> "gamma")
    assert(PostingsIndex.servingDir(serving).endsWith("/v2"))
    assert(topDoc(serving) === 3L, "the hint now serves the new fold")
    assert(topDoc(v1) === 1L,
      "the superseded generation is bit-stable for in-flight readers")

    // third fold prunes v1 (current and current-1 stay)
    fold(5L -> "delta", 6L -> "alpha alpha alpha alpha")
    assert(!new java.io.File(v1).exists(), "v1 must be pruned")
    assert(new java.io.File(serving, "v2").exists())
    assert(topDoc(serving) === 6L)

    // hint loss recovers from the claim scan (claims are never pruned)
    assert(new java.io.File(serving, "CURRENT").delete())
    assert(PostingsIndex.servingDir(serving).endsWith("/v3"))
    assert(topDoc(serving) === 6L)

    // a crashed fold: claim gen-4 with no tables — recovery and the
    // next fold both skip it
    val t = new java.io.File(serving, ".pre4")
    java.nio.file.Files.write(t.toPath, Array.emptyByteArray)
    graft.operators.CommitPrimitive.active.claim(t,
      new java.io.File(serving, "gen-4"))
    assert(PostingsIndex.servingDir(serving).endsWith("/v3"),
      "a claimed-but-empty generation must not be resolved")
    fold(7L -> "alpha alpha alpha alpha alpha")
    assert(PostingsIndex.servingDir(serving).endsWith("/v5"),
      "the next fold must claim past the dead number")
    assert(topDoc(serving) === 7L)
  }
}
