package graft

import graft.operators.{IncPostings, Maintenance, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-curve driver for the incremental trigram index (dev tool,
  * BASELINE.md evidence): times the base build, the delta build+commit,
  * the full v2 rebuild it replaces, and the merged-view probe, on any
  * corpus dir. One JSON line per run.
  *
  * Usage: IncPostingsBench <docsDir> [addShift]  — the shift must clear
  * the corpus id space (decade corpora: 1e9; SF dirs: default 10M).
  */
object IncPostingsBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shift = if (args.length > 1) args(1).toLong else Maintenance.AddShift
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_KINDS=trigram,positional,bm25,lshband,ivfvec restricts
    // the run (default: all) — the same dev contract as SPARK_GRAFT_ONLY.
    val kinds = sys.env.get("SPARK_GRAFT_KINDS")
      .map(_.split(",").map(_.trim).toSet)
    def want(k: String): Boolean = kinds.forall(_.contains(k))

    val docs = Tables(spark, dir, "documents")
    val root = java.nio.file.Files.createTempDirectory("incpostings-bench").toFile
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val nDocs = docs.count()
    val nDelta = IncPostings.deltaDocs(docs, shift).count()
    def r3(v: Double) = math.rint(v * 1000) / 1000

    if (want("trigram")) {
    val baseS = timed(IncPostings.commitBase(root, TextOps.trigramRowsOf(docs)))
    val deltaS = timed(IncPostings.commitDelta(root,
      TextOps.trigramRowsOf(IncPostings.deltaDocs(docs, shift)),
      IncPostings.tombstoneDocIds(docs)))
    // The cost the increment avoids: a fresh full tokenize+layout+write
    // of the v2 corpus.
    val freshDir = new java.io.File(root, "fresh-v2").toString
    val rebuildS = timed(TextOps.trigramRowsOf(
      Maintenance.snapshotV2(docs, shift).select(col("doc_id"), col("text")))
      .write.parquet(freshDir))
    // Merged-view probe (the idx_postings_inc shape, shift-aware).
    val grams = TextOps.TrigramPattern.sliding(3).toSeq.distinct
    var probeRows = 0L
    val probeS = timed {
      probeRows = IncPostings.readCurrent(spark, root)
        .where(col("g").isin(grams: _*))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("ng"))
        .where(col("ng") === grams.length)
        .join(Maintenance.snapshotV2(docs, shift), "doc_id")
        .where(col("text").contains(TextOps.TrigramPattern))
        .count()
    }
    println(s"""{"metric":"incpostings","dir":"$dir","n_docs":$nDocs,"n_delta_docs":$nDelta,"base_build_s":${r3(baseS)},"delta_commit_s":${r3(deltaS)},"full_rebuild_s":${r3(rebuildS)},"probe_s":${r3(probeS)},"probe_rows":$probeRows}""")
    }

    // ── the same curve for the POSITIONAL timeline (idx_phrase_inc) ──
    val posRoot = java.nio.file.Files.createTempDirectory("incpos-bench").toFile
    if (want("positional")) {
    val posBaseS = timed(IncPostings.commitBase(posRoot,
      TextOps.positionalRowsOf(docs)))
    val posDeltaS = timed(IncPostings.commitDelta(posRoot,
      TextOps.positionalRowsOf(IncPostings.deltaDocs(docs, shift)),
      IncPostings.tombstoneDocIds(docs)))
    val posFreshDir = new java.io.File(posRoot, "fresh-v2").toString
    val posRebuildS = timed(TextOps.positionalRowsOf(
      Maintenance.snapshotV2(docs, shift).select(col("doc_id"), col("text")))
      .write.parquet(posFreshDir))
    var phraseRows = 0L
    val posProbeS = timed {
      val pos = IncPostings.readCurrent(spark, posRoot)
        .where(col("tok").isin("table", "part"))
      val first = pos.where(col("tok") === "table").select(col("doc_id"), col("p"))
      val second = pos.where(col("tok") === "part")
        .select(col("doc_id"), (col("p") - 1).as("p"))
      phraseRows = first.join(second, Seq("doc_id", "p"))
        .groupBy(col("doc_id")).agg(count(lit(1))).count()
    }
    println(s"""{"metric":"incpositional","dir":"$dir","n_docs":$nDocs,"n_delta_docs":$nDelta,"base_build_s":${r3(posBaseS)},"delta_commit_s":${r3(posDeltaS)},"full_rebuild_s":${r3(posRebuildS)},"probe_s":${r3(posProbeS)},"probe_rows":$phraseRows}""")
    }
    // ── the same curve for the BM25 timeline (idx_bm25_inc): postings
    // kind + the doclen twin, searched together. ─────────────────────
    val bmRoot = java.nio.file.Files.createTempDirectory("incbm25-bench").toFile
    val dlRoot = java.nio.file.Files.createTempDirectory("incbm25dl-bench").toFile
    if (want("bm25")) {
    val bmBaseS = timed {
      IncPostings.commitBase(bmRoot, IncPostings.bm25RowsOf(docs))
      IncPostings.commitBase(dlRoot, IncPostings.doclenRowsOf(docs))
    }
    val bmDeltaS = timed {
      IncPostings.commitDelta(bmRoot,
        IncPostings.bm25RowsOf(IncPostings.deltaDocs(docs, shift)),
        IncPostings.tombstoneDocIds(docs))
      IncPostings.commitDelta(dlRoot,
        IncPostings.doclenRowsOf(IncPostings.deltaDocs(docs, shift)),
        IncPostings.tombstoneDocIds(docs))
    }
    val bmFreshDir = new java.io.File(bmRoot, "fresh-v2").toString
    val bmRebuildS = timed(IncPostings.bm25RowsOf(
      Maintenance.snapshotV2(docs, shift).select(col("doc_id"), col("text")))
      .write.parquet(bmFreshDir))
    var bmRows = 0L
    val bmProbeS = timed {
      // The EXACT gated query body (shared definition — see
      // IncPostings.bm25Probe), so this decade row measures what the
      // correctness gate certifies.
      bmRows = IncPostings.bm25Probe(
        IncPostings.readCurrent(spark, bmRoot),
        IncPostings.readCurrent(spark, dlRoot),
        graft.operators.PostingsIndex.Terms, 10).count()
    }
    // The SERVING FOLD (idx_bm25_lsm_served): republish the live view
    // into the bucket-partitioned layout, then search the pruned path.
    // The fold costs ~a build but runs OFF the ingest path; the served
    // search reads only the terms' bucket dirs.
    val servedDir = new java.io.File(bmRoot, "served").toString + "/idx"
    val bmFoldS = timed(graft.operators.PostingsIndex.publishServing(
      IncPostings.readCurrent(spark, bmRoot),
      IncPostings.readCurrent(spark, dlRoot), servedDir))
    var servedRows = 0L
    val bmServedS = timed {
      servedRows = graft.operators.PostingsIndex.bm25Search(spark, servedDir,
        graft.operators.PostingsIndex.Terms, 10).count()
    }
    println(s"""{"metric":"incbm25","dir":"$dir","n_docs":$nDocs,"n_delta_docs":$nDelta,"base_build_s":${r3(bmBaseS)},"delta_commit_s":${r3(bmDeltaS)},"full_rebuild_s":${r3(bmRebuildS)},"probe_s":${r3(bmProbeS)},"probe_rows":$bmRows,"serve_fold_s":${r3(bmFoldS)},"served_probe_s":${r3(bmServedS)},"served_rows":$servedRows}""")
    }

    // ── the same curve for the LSH BAND timeline (dedup_lsh_inc):
    // delta = re-minhash only the arrivals; rebuild = fresh
    // shingle→minhash→band over v2; probe = the arrivals' asymmetric
    // bucket-collision join against the merged view (candidate
    // generation only — the exact-verify cost is candidate-sized and
    // identical for both maintenance strategies). ────────────────────
    val lshRoot = java.nio.file.Files.createTempDirectory("inclsh-bench").toFile
    if (want("lshband")) {
    val lshBaseS = timed(IncPostings.commitBase(lshRoot,
      IncPostings.lshBandRowsOf(docs)))
    val lshDeltaS = timed(IncPostings.commitDelta(lshRoot,
      IncPostings.lshBandRowsOf(IncPostings.deltaDocs(docs, shift)),
      IncPostings.tombstoneDocIds(docs)))
    val lshFreshDir = new java.io.File(lshRoot, "fresh-v2").toString
    val lshRebuildS = timed(IncPostings.lshBandRowsOf(
      Maintenance.snapshotV2(docs, shift)).write.parquet(lshFreshDir))
    var lshRows = 0L
    val lshProbeS = timed {
      lshRows = IncPostings.lshBandRowsOf(
          IncPostings.deltaDocs(docs, shift)).as("x")
        .join(IncPostings.readCurrent(spark, lshRoot).as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    }
    println(s"""{"metric":"inclshband","dir":"$dir","n_docs":$nDocs,"n_delta_docs":$nDelta,"base_build_s":${r3(lshBaseS)},"delta_commit_s":${r3(lshDeltaS)},"full_rebuild_s":${r3(lshRebuildS)},"probe_s":${r3(lshProbeS)},"probe_rows":$lshRows}""")
    }

    // ── the same curve for the VECTOR timeline (sim_ivf_lsm): base =
    // codebook train + v1 assignment; delta = frozen-codebook
    // re-assignment of the arrivals only; rebuild = what an LSM-less
    // deployment pays on churn — retrain the codebook on v2 AND
    // reassign everything; probe = probe-1 top-3 searchView for the
    // v2 queries. ────────────────────────────────────────────────────
    import graft.operators.IvfIndex
    val vecRoot = java.nio.file.Files.createTempDirectory("incivfvec-bench").toFile
    if (want("ivfvec")) {
    val e = Tables(spark, dir, "embeddings")
    val nVecs = e.count()
    val nVecDelta = IvfIndex.deltaVecs(e, shift).count()
    var cents: Seq[(Long, Array[Double])] = null
    val vecBaseS = timed {
      cents = IvfIndex.trainCodebook(e)
      IncPostings.commitBase(vecRoot,
        IvfIndex.vecRowsOf(cents, e.select(col("vec_id"), col("embedding"))))
    }
    val vecDeltaS = timed(IncPostings.commitDelta(vecRoot,
      IvfIndex.vecRowsOf(cents, IvfIndex.deltaVecs(e, shift)),
      IvfIndex.vecTombstones(e)))
    val vecFreshDir = new java.io.File(vecRoot, "fresh-v2").toString
    val vecRebuildS = timed {
      val v2 = IvfIndex.v2Vectors(e, shift)
      IvfIndex.vecRowsOf(IvfIndex.trainCodebook(v2), v2)
        .write.parquet(vecFreshDir)
    }
    var vecRows = 0L
    val vecProbeS = timed {
      vecRows = IvfIndex.searchView(cents,
        IncPostings.readCurrent(spark, vecRoot),
        IvfIndex.v2Vectors(e, shift).where(col("vec_id") < 5),
        k = 3, nprobe = 1).count()
    }
    println(s"""{"metric":"incivfvec","dir":"$dir","n_vecs":$nVecs,"n_delta_vecs":$nVecDelta,"base_build_s":${r3(vecBaseS)},"delta_commit_s":${r3(vecDeltaS)},"full_rebuild_s":${r3(vecRebuildS)},"probe_s":${r3(vecProbeS)},"probe_rows":$vecRows}""")
    }

    val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    lfs.delete(new org.apache.hadoop.fs.Path(root.toString), true)
    lfs.delete(new org.apache.hadoop.fs.Path(posRoot.toString), true)
    lfs.delete(new org.apache.hadoop.fs.Path(bmRoot.toString), true)
    lfs.delete(new org.apache.hadoop.fs.Path(dlRoot.toString), true)
    lfs.delete(new org.apache.hadoop.fs.Path(lshRoot.toString), true)
    lfs.delete(new org.apache.hadoop.fs.Path(vecRoot.toString), true)
    spark.stop()
  }
}
