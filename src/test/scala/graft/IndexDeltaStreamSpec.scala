package graft

import graft.operators.{IncPostings, TextOps}
import graft.streaming.IndexDeltaStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stream-maintained index ≡ batch rebuild, replay-idempotent: a CDC
  * change stream drives one committed generation per micro-batch
  * through the IncPostings machinery, and the merged view after any
  * prefix of batches equals a fresh build over the corpus state that
  * prefix implies. */
class IndexDeltaStreamSpec extends SparkSuite {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def readSet(root: java.io.File): Set[(Long, String)] =
    IncPostings.readCurrent(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def freshSet(corpus: Seq[(Long, String)]): Set[(Long, String)] =
    TextOps.trigramRowsOf(docsDf(corpus))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("streamed generations equal the batch rebuild after every batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("idxdelta").toFile
    val base = Seq(1L -> "alpha doc", 2L -> "beta doc", 3L -> "gamma doc")
    IncPostings.commitBase(root, TextOps.trigramRowsOf(docsDf(base)))

    val changes = MemoryStream[(Long, String, String)]
    val q = IndexDeltaStream.start(
      changes.toDS().toDF("doc_id", "text", "op"), root,
      Files.createTempDirectory("idxdelta-ckpt").toString)
    try {
      // Batch 1: edit doc 2, insert doc 4.
      changes.addData((2L, "beta prime", "upsert"), (4L, "delta doc", "upsert"))
      q.processAllAvailable()
      assert(readSet(root) === freshSet(Seq(1L -> "alpha doc",
        2L -> "beta prime", 3L -> "gamma doc", 4L -> "delta doc")))
      // Batch 2: delete doc 1, re-edit doc 4.
      changes.addData((1L, "", "delete"), (4L, "delta rev", "upsert"))
      q.processAllAvailable()
      assert(readSet(root) === freshSet(Seq(2L -> "beta prime",
        3L -> "gamma doc", 4L -> "delta rev")))
    } finally q.stop()
    // Three generations: base + one per batch.
    assert(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "CURRENT").toPath)).trim === "3")
  }

  test("inline maintenance bounds the segment chain and reclaims expired generations") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("idxdelta-maint").toFile
    var corpus = Map(1L -> "alpha doc", 2L -> "beta doc")
    IncPostings.commitBase(root, TextOps.trigramRowsOf(docsDf(corpus.toSeq)))

    val changes = MemoryStream[(Long, String, String)]
    val q = IndexDeltaStream.start(
      changes.toDS().toDF("doc_id", "text", "op"), root,
      Files.createTempDirectory("idxdelta-maint-ckpt").toString,
      compactAtSegments = 3, keepGens = 1, retainGraceMs = 0L)
    try {
      (10L to 16L).foreach { id =>
        changes.addData((id, s"streamed doc $id", "upsert"))
        q.processAllAvailable()
        corpus += id -> s"streamed doc $id"
        // Correctness never depends on where maintenance last ran.
        assert(readSet(root) === freshSet(corpus.toSeq))
        // Chain bounded: compaction fires before a 4th segment lives.
        assert(IncPostings.liveSegmentCount(root) <= 3)
      }
    } finally q.stop()
    // Retention kept only the live generation's manifest...
    val gens = new java.io.File(root, "gens").list().sorted
    assert(gens.length === 1, gens.toSeq)
    // ...and reclaimed every unreferenced segment file.
    val live = IncPostings.readCurrent(spark, root)
    val segs = new java.io.File(root, "segments").list()
    assert(segs.length <= 3, segs.toSeq)
    assert(live.count() > 0)
  }

  test("positional index rides the same stream: kind-parameterized maintenance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("idxdelta-pos").toFile
    var corpus = Map(1L -> "big table part here", 2L -> "plain doc")
    IncPostings.commitBase(root, TextOps.positionalRowsOf(docsDf(corpus.toSeq)))

    def posSet(): Set[(Long, Long, String)] =
      IncPostings.readCurrent(spark, root)
        .select(col("doc_id"), col("p"), col("tok"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    def freshPos(): Set[(Long, Long, String)] =
      TextOps.positionalRowsOf(docsDf(corpus.toSeq))
        .select(col("doc_id"), col("p"), col("tok"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val changes = MemoryStream[(Long, String, String)]
    val q = IndexDeltaStream.start(
      changes.toDS().toDF("doc_id", "text", "op"), root,
      Files.createTempDirectory("idxdelta-pos-ckpt").toString,
      compactAtSegments = 2, keepGens = 1,
      rowsOf = TextOps.positionalRowsOf, layout = Seq("tok", "doc_id"))
    try {
      // Edit shifts doc 1's phrase; delete doc 2; insert doc 3.
      changes.addData((1L, "pad big table part", "upsert"), (2L, "", "delete"))
      q.processAllAvailable()
      corpus = corpus - 2L + (1L -> "pad big table part")
      assert(posSet() === freshPos())
      changes.addData((3L, "table part again", "upsert"))
      q.processAllAvailable()
      corpus += 3L -> "table part again"
      assert(posSet() === freshPos())
      // Phrase adjacency over the stream-maintained merged view.
      val pos = IncPostings.readCurrent(spark, root)
      val hits = pos.where(col("tok") === "table").select(col("doc_id"), col("p"))
        .join(pos.where(col("tok") === "part")
          .select(col("doc_id"), (col("p") - 1).as("p")), Seq("doc_id", "p"))
        .select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(hits === Set(1L, 3L))
    } finally q.stop()
  }

  test("lshband kind rides the same stream: the dedup band index stays probe-fresh") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("idxdelta-lsh").toFile
    val t1 = "the quick brown fox jumps over the lazy dog"
    val t2 = "completely different text content goes right here now"
    var corpus = Map(1L -> t1, 2L -> t2)
    IncPostings.commitBase(root, IncPostings.lshBandRowsOf(docsDf(corpus.toSeq)))

    def bandSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("band"), col("key"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

    val changes = MemoryStream[(Long, String, String)]
    val q = IndexDeltaStream.start(
      changes.toDS().toDF("doc_id", "text", "op"), root,
      Files.createTempDirectory("idxdelta-lsh-ckpt").toString,
      compactAtSegments = 2, keepGens = 1,
      rowsOf = IncPostings.lshBandRowsOf, layout = Seq("key", "doc_id"),
      retainGraceMs = 0L)
    try {
      // Delete doc 2; stream in doc 3 as a copy of doc 1.
      changes.addData((2L, "", "delete"), (3L, t1, "upsert"))
      q.processAllAvailable()
      corpus = corpus - 2L + (3L -> t1)
      assert(bandSet(IncPostings.readCurrent(spark, root)) ===
        bandSet(IncPostings.lshBandRowsOf(docsDf(corpus.toSeq))))
      // The stream-maintained view answers the incremental-dedup
      // probe: doc 3's bands collide with doc 1 on every band.
      val merged = IncPostings.readCurrent(spark, root)
      val hits = IncPostings.lshBandRowsOf(docsDf(Seq(3L -> t1))).as("x")
        .join(merged.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .select(col("y.doc_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(hits === Set(1L))
    } finally q.stop()
  }

  test("ivfvec kind rides the same stream: the vector index stays search-fresh") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IvfIndex
    val root = Files.createTempDirectory("idxdelta-vec").toFile
    val corpus = Tables(spark, sf001, "embeddings")
      .where(col("vec_id") < 20).select(col("vec_id"), col("embedding"))
    val cents = IvfIndex.trainCodebook(corpus)
    IncPostings.commitBase(root, IvfIndex.vecRowsOf(cents, corpus))
    val embOf = corpus.collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toSeq).toMap

    def rowSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)).toSet

    val changes = MemoryStream[(Long, Seq[Float], String)]
    val q = IndexDeltaStream.start(
      changes.toDS().toDF("doc_id", "embedding", "op"), root,
      Files.createTempDirectory("idxdelta-vec-ckpt").toString,
      rowsOf = df => IvfIndex.vecRowsOf(cents,
        df.select(col("doc_id").as("vec_id"), col("embedding"))),
      layout = Seq("cid", "doc_id"))
    try {
      // Delete vec 2; stream in vec 21 as a copy of vec 1's embedding.
      changes.addData((2L, Seq.empty[Float], "delete"),
        (21L, embOf(1L), "upsert"))
      q.processAllAvailable()
      val want = corpus.where(col("vec_id") =!= 2)
        .unionByName(Seq((21L, embOf(1L))).toDF("vec_id", "embedding"))
      assert(rowSet(IncPostings.readCurrent(spark, root)) ===
        rowSet(IvfIndex.vecRowsOf(cents, want)))
      // The stream-maintained view answers ANN search: vec 1's probe
      // finds its streamed twin at cosine 1.0, and vec 2 is gone.
      val hits = IvfIndex.searchView(cents,
          IncPostings.readCurrent(spark, root),
          Seq((1L, embOf(1L))).toDF("vec_id", "embedding"), k = 3, nprobe = 1)
        .collect()
      assert(hits.head.getAs[Long]("vec_id") === 21L)
      assert(hits.head.getAs[Double]("score") === 1.0)
      assert(!hits.map(_.getAs[Long]("vec_id")).contains(2L))
    } finally q.stop()
  }

  test("vector stream reclusters on drift mid-stream; later batches ride the new codebook") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IvfIndex
    val root = Files.createTempDirectory("idxdelta-recluster").toFile
    val base = Tables(spark, sf001, "embeddings")
      .where(col("vec_id") < 200).select(col("vec_id"), col("embedding"))
    val cb1 = IvfIndex.trainCodebook(base)
    val cb1Dir = IncPostings.newDataDir(root, "meta")
    spark.createDataFrame(cb1.map { case (cid, c) => (cid, c.toSeq) })
      .toDF("centroid_id", "c_emb").write.parquet(s"$cb1Dir/centroids")
    IncPostings.commitBase(root, IvfIndex.vecRowsOf(cb1, base),
      meta = Some(cb1Dir.toString))
    val embOf = base.where(col("vec_id") < 3).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toSeq).toMap

    // The production maintainer contract for meta-dependent kinds:
    // resolve the codebook PER BATCH (a fixed closure would assign
    // post-recluster batches under the superseded codebook), and let
    // the post-commit policy recluster when the gauge trips.
    def liveCb() = IvfIndex.codebookOf(spark, root, IncPostings.committedGen(root))
    val changes = MemoryStream[(Long, Seq[Float], String)]
    val q = IndexDeltaStream.start(
      changes.toDS().toDF("doc_id", "embedding", "op"), root,
      Files.createTempDirectory("idxdelta-recluster-ckpt").toString,
      rowsOf = df => IvfIndex.vecRowsOf(liveCb(),
        df.select(col("doc_id").as("vec_id"), col("embedding"))),
      layout = Seq("cid", "doc_id"),
      postCommit = (s, r) => {
        if (IvfIndex.cellSkew(IncPostings.readCurrent(s, r)) >
            IvfIndex.SkewRetrainRatio) { IvfIndex.recluster(s, r); () }
      })
    try {
      // Batch 1: in-distribution upserts — the gauge must NOT trip.
      changes.addData((1000L, embOf(0L), "upsert"), (1001L, embOf(1L), "upsert"))
      q.processAllAvailable()
      assert(IncPostings.manifestOf(root,
        IncPostings.committedGen(root)).meta.contains(cb1Dir.toString))
      // Batch 2: an out-of-distribution pile — recluster mid-stream.
      val ood = (0 until 100).map(i =>
        (2000L + i, embOf((i % 3).toLong).map(_ + 10.0f), "upsert"))
      changes.addData(ood: _*)
      q.processAllAvailable()
      val metaAfter = IncPostings.manifestOf(root,
        IncPostings.committedGen(root)).meta
      assert(metaAfter.isDefined && !metaAfter.contains(cb1Dir.toString),
        "the OOD batch must have triggered a recluster")
      // Batch 3: rides the NEW codebook via per-batch resolution; the
      // stream-maintained view equals a fresh assignment of the full
      // state under the live codebook.
      changes.addData((1002L, embOf(2L), "upsert"))
      q.processAllAvailable()
      val want = base
        .unionByName(Seq((1000L, embOf(0L)), (1001L, embOf(1L)),
          (1002L, embOf(2L))).toDF("vec_id", "embedding"))
        .unionByName(ood.map(t => (t._1, t._2)).toDF("vec_id", "embedding"))
      val fresh = IvfIndex.vecRowsOf(liveCb(), want)
      val merged = IncPostings.readCurrent(spark, root)
      assert(merged.exceptAll(fresh).count() === 0L)
      assert(fresh.exceptAll(merged).count() === 0L)
    } finally q.stop()
  }

  test("replayed batches are skipped: at-least-once delivery, exactly-once index") {
    val root = Files.createTempDirectory("idxdelta-replay").toFile
    IncPostings.commitBase(root,
      TextOps.trigramRowsOf(docsDf(Seq(1L -> "first text"))))
    val batch = docsDf(Seq(5L -> "second text"))
      .withColumn("op", lit("upsert"))
    IndexDeltaStream.applyBatch(root, batch, batchId = 0L)
    val after = readSet(root)
    // The replay (same batchId) must be a no-op: no new generation, no
    // duplicated postings.
    IndexDeltaStream.applyBatch(root, batch, batchId = 0L)
    assert(readSet(root) === after)
    assert(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "CURRENT").toPath)).trim === "2")
    // A NEW batchId does commit.
    IndexDeltaStream.applyBatch(root,
      docsDf(Seq(6L -> "third text")).withColumn("op", lit("upsert")), 1L)
    assert(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "CURRENT").toPath)).trim === "3")
    assert(readSet(root) === freshSet(Seq(1L -> "first text",
      5L -> "second text", 6L -> "third text")))
  }

  test("BM25 layout rides the same stream: ranked-retrieval rows maintained per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("idxdelta-bm25").toFile
    var corpus = Map(1L -> "spark query engine", 2L -> "window query plan")
    IncPostings.commitBase(root, IncPostings.bm25RowsOf(docsDf(corpus.toSeq)))

    def bm25Set(): Set[(Long, String, Long, Long)] =
      IncPostings.readCurrent(spark, root)
        .select(col("doc_id"), col("token"), col("tf"), col("dl"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
    def freshSet(): Set[(Long, String, Long, Long)] =
      IncPostings.bm25RowsOf(docsDf(corpus.toSeq))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet

    val changes = MemoryStream[(Long, String, String)]
    val q = IndexDeltaStream.start(
      changes.toDS().toDF("doc_id", "text", "op"), root,
      Files.createTempDirectory("idxdelta-bm25-ckpt").toString,
      compactAtSegments = 2, keepGens = 1,
      rowsOf = IncPostings.bm25RowsOf, layout = Seq("token", "doc_id"))
    try {
      // Edit doc 1 (tf of 'query' rises, dl changes); delete doc 2.
      changes.addData((1L, "query query spark", "upsert"), (2L, "", "delete"))
      q.processAllAvailable()
      corpus = corpus - 2L + (1L -> "query query spark")
      assert(bm25Set() === freshSet())
      // Insert doc 3; the maintained tf/dl stay exact through the
      // compaction the second batch triggers.
      changes.addData((3L, "spark window window window", "upsert"))
      q.processAllAvailable()
      corpus += 3L -> "spark window window window"
      assert(bm25Set() === freshSet())
      assert(bm25Set().contains((3L, "window", 3L, 4L)))
    } finally q.stop()
  }

  test("crash between manifest link and marker write: replay still commits exactly once") {
    // The replay marker is transactional with the commit — the batchId
    // rides in the manifest. Simulate the crash position by committing
    // the generation directly (as applyBatch would) and NEVER writing
    // the fast-path marker file; the replay must detect the committed
    // batchId and skip, not stack a duplicate generation.
    val root = Files.createTempDirectory("idxdelta-crash").toFile
    IncPostings.commitBase(root,
      TextOps.trigramRowsOf(docsDf(Seq(1L -> "first text"))))
    val batch = docsDf(Seq(5L -> "second text")).withColumn("op", lit("upsert"))
    IncPostings.commitDelta(root,
      TextOps.trigramRowsOf(batch.select(col("doc_id"), col("text"))),
      batch.select(col("doc_id")), batchId = Some(0L))
    assert(!new java.io.File(root, "commits/batch-00000").exists())
    val genBefore = IncPostings.committedGen(root)
    val viewBefore = readSet(root)
    IndexDeltaStream.applyBatch(root, batch, batchId = 0L)
    assert(IncPostings.committedGen(root) === genBefore,
      "replay after a marker-less crash must not commit a new generation")
    assert(readSet(root) === viewBefore)
    // ...and the replay healed the fast-path marker for the next restart.
    assert(new java.io.File(root, "commits/batch-00000").exists())
  }

  test("restart from checkpoint resumes without re-applying or losing batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("idxdelta-restart").toFile
    val ckpt = Files.createTempDirectory("idxdelta-restart-ckpt").toString
    IncPostings.commitBase(root,
      TextOps.trigramRowsOf(docsDf(Seq(1L -> "base text"))))

    val src = MemoryStream[(Long, String, String)]
    val q1 = IndexDeltaStream.start(src.toDS().toDF("doc_id", "text", "op"),
      root, ckpt)
    try {
      src.addData((2L, "added text", "upsert"))
      q1.processAllAvailable()
    } finally q1.stop()

    // Restarted query over the same source + checkpoint: committed
    // offsets are honored (no re-apply), batchIds continue, and new
    // data lands in the next generation.
    val q2 = IndexDeltaStream.start(src.toDS().toDF("doc_id", "text", "op"),
      root, ckpt)
    try {
      src.addData((3L, "later text", "upsert"))
      q2.processAllAvailable()
    } finally q2.stop()

    assert(readSet(root) === freshSet(Seq(1L -> "base text",
      2L -> "added text", 3L -> "later text")))
  }

  test("auto serving-fold fires exactly at the delta threshold; served == merge-on-read before and after") {
    import spark.implicits._
    import graft.operators.PostingsIndex
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pRoot = Files.createTempDirectory("fold-bm25").toFile
    val dRoot = Files.createTempDirectory("fold-dl").toFile
    val serving = Files.createTempDirectory("fold-serve").toString + "/idx"
    val terms = Seq("alpha", "beta")
    def doc(i: Long) = (i, s"alpha common text beta word$i alpha")
    val base = (1L to 6L).map(doc(_))
    IncPostings.commitBase(pRoot, IncPostings.bm25RowsOf(docsDf(base)))
    IncPostings.commitBase(dRoot, IncPostings.doclenRowsOf(docsDf(base)))

    def served() = PostingsIndex.bm25Search(spark, serving, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    def merged() = IncPostings.bm25Probe(
      IncPostings.readCurrent(spark, pRoot),
      IncPostings.readCurrent(spark, dRoot), terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

    // deploy-time initial fold (threshold 1: the base segment is fresh)
    PostingsIndex.servingFoldPolicy(dRoot, serving, 1)(spark, pRoot)
    assert(PostingsIndex.lastFoldGen(serving) === 1)
    assert(served() === merged(), "initial fold must serve the base view")
    val servedAtBase = served()

    // streaming maintainer with the fold policy at threshold 2: the
    // fold must fire on every SECOND fresh delta segment, exactly
    val policy = PostingsIndex.servingFoldPolicy(dRoot, serving,
      foldAtDeltas = 2)
    val changes = MemoryStream[(Long, String, String)]
    val q = IndexDeltaStream.start(
      changes.toDS().toDF("doc_id", "text", "op"), pRoot,
      Files.createTempDirectory("fold-ckpt").toString,
      rowsOf = IncPostings.bm25RowsOf, postCommit = policy)
    try {
      // the doclens twin root is maintained alongside (the production
      // maintainer commits both kinds per change batch)
      def feed(docs: Seq[(Long, String)]): Unit = {
        IncPostings.commitDelta(dRoot, IncPostings.doclenRowsOf(docsDf(docs)),
          docsDf(docs).select(col("doc_id")))
        changes.addData(docs.map { case (id, t) => (id, t, "upsert") }: _*)
        q.processAllAvailable()
      }

      feed(Seq(doc(7L))) // delta 1 of the cadence: below threshold
      assert(PostingsIndex.lastFoldGen(serving) === 1,
        "one fresh segment must NOT trip a threshold of 2")
      assert(served() === servedAtBase, "serving layout stays the old fold")

      feed(Seq(doc(8L))) // delta 2: the gauge trips, the fold fires
      assert(PostingsIndex.lastFoldGen(serving) === 3,
        "the fold must fire exactly at the second fresh segment")
      assert(served() === merged(),
        "after the fold, served == merge-on-read over ALL batches")

      feed(Seq(doc(9L))) // cadence re-armed: one fresh segment again
      assert(PostingsIndex.lastFoldGen(serving) === 3)

      feed(Seq(doc(10L))) // and fires again at the second
      assert(PostingsIndex.lastFoldGen(serving) === 5)
      assert(served() === merged())
    } finally q.stop()
  }
}
