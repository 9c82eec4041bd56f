package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance for the trigram-postings index — the
  * delta-merge path the full-rebuild artifact lacks. At 100 TB a daily
  * delta cannot re-tokenize the corpus: the round-10 decade table puts
  * the full trigram build at 510 s on the 100× corpus, and a
  * production index takes the LSM shape instead — immutable postings
  * SEGMENTS plus doc-level TOMBSTONES, composed by a versioned
  * manifest, so an increment costs one delta-sized build and a
  * metadata commit while probes stay corpus-size-independent.
  *
  * Storage layout (one root per corpus generation, content-fingerprint
  * keyed like [[PostingsIndex]]):
  *
  *   segments/seg-00001/        (doc_id, g) postings  — immutable
  *   segments/seg-00002/        delta postings        — immutable
  *   tombstones/seg-00002/      doc_id                — immutable
  *   gens/gen-00001/MANIFEST.json
  *   gens/gen-00002/MANIFEST.json
  *   CURRENT                    live generation number (text)
  *
  * A manifest lists (segment path, seq) plus (tombstone path, seq); a
  * tombstone kills a doc's rows in every segment with a LOWER seq only
  * (the standard LSM visibility rule — an edited doc's fresh postings
  * live in the delta segment at the tombstone's own seq and survive).
  * Commits follow the same protocol as the versioned [[IvfIndex]]:
  * segments and the new manifest are written beside the live
  * generation, then one atomic CURRENT swap publishes — readers that
  * resolved the pointer earlier keep a complete immutable view, and a
  * killed build leaves no half-visible generation.
  *
  * The simulated timeline uses [[Maintenance.snapshotV2]]'s release
  * semantics (residue 97 drops, residue 31 edits, residue 89 adds at
  * doc_id + 10M) so the DuckDB oracle can reproduce the v2 corpus
  * exactly: gen-1 indexes v1 (the documents table); the increment
  * derives the delta docs + tombstones from the snapshot diff and
  * commits gen-2. Reference corpus: /root/reference has no index
  * maintenance at all (collect/consumer.py re-reads everything);
  * this serves the engine's own index family.
  */
object IncPostings {

  // ── manifest read/write ────────────────────────────────────────────

  /** One immutable postings file set with its commit sequence. */
  private[graft] case class Segment(path: String, seq: Int)

  /** A generation = the segments visible plus the tombstones in force. */
  private[graft] case class Manifest(segments: Seq[Segment],
      tombstones: Seq[Segment])

  private def manifestJson(m: Manifest): String = {
    def arr(ss: Seq[Segment]) = ss.map(s =>
      s"""{"path":"${s.path}","seq":${s.seq}}""").mkString("[", ",", "]")
    s"""{"segments":${arr(m.segments)},"tombstones":${arr(m.tombstones)}}"""
  }

  private def parseManifest(json: String): Manifest = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val ast = JsonMethods.parse(json)
    def segs(field: String): Seq[Segment] =
      (ast \ field).extract[Seq[Map[String, JValue]]].map(m =>
        Segment(m("path").extract[String], m("seq").extract[Int]))
    Manifest(segs("segments"), segs("tombstones"))
  }

  private def writeText(f: java.io.File, text: String): Unit = {
    f.getParentFile.mkdirs()
    val w = new java.io.FileWriter(f)
    try w.write(text) finally w.close()
  }

  private def readText(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Live generation number, resolved once per read. */
  private def currentGen(root: java.io.File): Int =
    readText(new java.io.File(root, "CURRENT")).trim.toInt

  private def manifestOf(root: java.io.File, gen: Int): Manifest =
    parseManifest(readText(
      new java.io.File(root, f"gens/gen-$gen%05d/MANIFEST.json")))

  /** Atomic pointer swap: write beside, rename over (same protocol as
    * IvfIndex.writePointer — rename is atomic on a local FS and the
    * pointer file is tiny). */
  private def swapCurrent(root: java.io.File, gen: Int): Unit = {
    val tmp = new java.io.File(root, ".CURRENT.tmp")
    writeText(tmp, gen.toString)
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(root, "CURRENT").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  // ── commit operations (shared by the batch timeline below and the
  //    streaming delta twin, which appends per micro-batch) ───────────

  /** Write the FIRST generation: one base segment, no tombstones. */
  private[graft] def commitBase(root: java.io.File,
      basePostings: DataFrame): Unit = {
    val seg = new java.io.File(root, "segments/seg-00001")
    basePostings.write.mode(SaveMode.Overwrite).parquet(seg.toString)
    writeText(new java.io.File(root, "gens/gen-00001/MANIFEST.json"),
      manifestJson(Manifest(Seq(Segment(seg.toString, 1)), Seq.empty)))
    swapCurrent(root, 1)
  }

  /** Append one increment: delta postings + tombstone ids become an
    * immutable segment pair at seq = gen+1, the new manifest extends
    * the live one, and the CURRENT swap is the only mutation readers
    * can observe. Cost: delta-sized postings build + metadata — the
    * standing corpus is never re-read. Idempotence note: the caller
    * guards replays (the streaming twin keys on batchId; the batch
    * timeline runs once under the build marker). */
  private[graft] def commitDelta(root: java.io.File,
      deltaPostings: DataFrame, tombstoneIds: DataFrame): Int = {
    val prev = currentGen(root)
    val gen = prev + 1
    val seg = new java.io.File(root, f"segments/seg-$gen%05d")
    val tomb = new java.io.File(root, f"tombstones/seg-$gen%05d")
    deltaPostings.write.mode(SaveMode.Overwrite).parquet(seg.toString)
    tombstoneIds.select(col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(tomb.toString)
    val m = manifestOf(root, prev)
    val next = Manifest(m.segments :+ Segment(seg.toString, gen),
      m.tombstones :+ Segment(tomb.toString, gen))
    writeText(new java.io.File(root, f"gens/gen-$gen%05d/MANIFEST.json"),
      manifestJson(next))
    swapCurrent(root, gen)
    gen
  }

  /** Merge-on-read over the live generation: each segment minus the
    * doc_ids tombstoned AFTER it (seq rule above), unioned. Tombstone
    * tables are delta-sized → broadcast anti-joins; a probe's pushed
    * `g IN (…)` filter reaches every segment scan through the union
    * and the anti-join (plan-pinned in IncPostingsSpec). */
  private[graft] def readCurrent(s: SparkSession,
      root: java.io.File): DataFrame =
    readAt(s, root, currentGen(root))

  /** Time travel: the merged view AS OF generation `gen`. Manifests
    * and segments are immutable and never referenced-then-rewritten,
    * so every committed generation stays readable until a retention
    * pass drops it — the Iceberg/Delta snapshot contract. */
  private[graft] def readAt(s: SparkSession, root: java.io.File,
      gen: Int): DataFrame = {
    val m = manifestOf(root, gen)
    m.segments.map { seg =>
      val df = s.read.parquet(seg.path)
      val killers = m.tombstones.filter(_.seq > seg.seq)
      if (killers.isEmpty) df
      else {
        val dead = killers.map(t => s.read.parquet(t.path))
          .reduce(_ unionByName _).distinct()
        df.join(broadcast(dead), Seq("doc_id"), "left_anti")
      }
    }.reduce(_ unionByName _)
  }

  /** LSM compaction: fold the live generation's segments + tombstones
    * into ONE fresh segment and commit it as the next generation. After
    * many streamed deltas the read path pays per-segment scans and
    * tombstone anti-joins (read amplification); compaction resets that
    * to a single bucket-laid-out segment while every PRIOR generation
    * stays readable (old manifests still reference the old segments —
    * a retention pass, not compaction, reclaims them; the
    * maint_vacuum_plan shape). Readers never block: the swap is the
    * same atomic CURRENT move as any commit. */
  private[graft] def compact(s: SparkSession, root: java.io.File,
      layout: Seq[String] = Seq("g", "doc_id")): Int = {
    val prev = currentGen(root)
    val gen = prev + 1
    val seg = new java.io.File(root, f"segments/seg-$gen%05d")
    val lay = layout.map(col)
    readAt(s, root, prev)
      .repartitionByRange(lay: _*)
      .sortWithinPartitions(lay: _*)
      .write.mode(SaveMode.Overwrite).parquet(seg.toString)
    writeText(new java.io.File(root, f"gens/gen-$gen%05d/MANIFEST.json"),
      manifestJson(Manifest(Seq(Segment(seg.toString, gen)), Seq.empty)))
    swapCurrent(root, gen)
    gen
  }

  /** Segment count of the live generation — the read-amplification
    * gauge maintenance policies trigger on. */
  private[graft] def liveSegmentCount(root: java.io.File): Int =
    manifestOf(root, currentGen(root)).segments.size

  /** Retention: expire every generation older than the newest
    * `keepGens` and delete the segment/tombstone files no surviving
    * manifest references — the expire-snapshots half of the lifecycle
    * (compaction resets read amplification; retention reclaims disk).
    * Deletion order is crash-safe: manifests of expired generations go
    * FIRST, so a reader can never resolve a generation whose files are
    * mid-delete — after a crash the worst case is unreferenced segment
    * files, which the next retention pass re-collects (the
    * maint_vacuum_plan contract). The live generation is always kept.
    * Returns the deleted file-set roots (for logging/tests). */
  private[graft] def retain(s: SparkSession, root: java.io.File,
      keepGens: Int): Seq[String] = {
    require(keepGens >= 1, "retention must keep at least the live generation")
    val live = currentGen(root)
    val cutoff = live - keepGens + 1
    val gensDir = new java.io.File(root, "gens")
    val allGens = Option(gensDir.list()).getOrElse(Array.empty)
      .filter(_.startsWith("gen-")).map(_.stripPrefix("gen-").toInt).sorted
    val (dead, kept) = allGens.partition(_ < cutoff)
    if (dead.isEmpty) return Seq.empty
    val referenced = kept.flatMap { g =>
      val m = manifestOf(root, g)
      (m.segments ++ m.tombstones).map(_.path)
    }.toSet
    val hfs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    // 1. Expire manifests — readers lose the pointer before files go.
    dead.foreach { g =>
      hfs.delete(new org.apache.hadoop.fs.Path(
        new java.io.File(gensDir, f"gen-$g%05d").toString), true)
    }
    // 2. Reclaim files referenced by NO surviving generation.
    val deletable = Seq("segments", "tombstones").flatMap { kind =>
      Option(new java.io.File(root, kind).listFiles()).getOrElse(Array.empty)
        .filter(f => !referenced.contains(f.toString)).map(_.toString)
    }
    deletable.foreach(p =>
      hfs.delete(new org.apache.hadoop.fs.Path(p), true))
    deletable
  }

  // ── the simulated v1 → v2 timeline over the documents table ────────

  /** v2-side docs that are NEW OR CHANGED — the only docs the
    * increment tokenizes (delta-sized, the whole point): residue-31
    * edits with their new text, residue-89 adds at the shifted id. */
  private[graft] def deltaDocs(docs: DataFrame, shift: Long): DataFrame = {
    val edited = docs
      .where(col("doc_id") % 97 =!= 0 && col("doc_id") % 31 === 0)
      .withColumn("text", concat(col("text"), lit(" v2")))
    val added = docs.where(col("doc_id") % 89 === 0)
      .withColumn("doc_id", col("doc_id") + lit(shift))
    edited.unionByName(added)
  }

  /** v1 doc_ids whose postings die in the increment: drops AND edits
    * (an edit's old rows are dead; its new rows ride the delta
    * segment at the tombstone's seq, so the LSM visibility rule keeps
    * exactly the new ones). */
  private[graft] def tombstoneDocIds(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 97 === 0 ||
        (col("doc_id") % 97 =!= 0 && col("doc_id") % 31 === 0))
      .select(col("doc_id"))

  // ── memoized on-disk index per corpus generation ───────────────────

  private val built =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), String]

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Build-once index root for `dir` (fingerprint-keyed, stale-
    * generation eviction — the PostingsIndex.indexPath protocol),
    * parameterized by index `kind` and its row builder so the trigram
    * and positional timelines share one cache protocol. The build runs
    * the whole timeline: base commit over v1, then the delta commit;
    * per-phase wall times are logged so the decade tables can
    * attribute base vs delta cost. */
  private def indexRoot(s: SparkSession, dir: String, kind: String,
      rowsOf: DataFrame => DataFrame,
      shift: Long = Maintenance.AddShift): java.io.File = {
    val f = new java.io.File(s"$dir/documents.parquet")
    val fp = s"${f.length()}-${f.lastModified()}"
    val path = built.getOrElseUpdate((dir, kind, fp), {
      val prefix = s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}-$kind-"
      val root = new java.io.File("/tmp/graft-incpostings-cache", prefix + fp)
      val marker = new java.io.File(root, "_GRAFT_DONE")
      if (!marker.exists()) {
        val hfs = org.apache.hadoop.fs.FileSystem.getLocal(
          s.sparkContext.hadoopConfiguration)
        Option(root.getParentFile.listFiles()).getOrElse(Array.empty)
          .filter(x => x.getName.startsWith(prefix) && x.getName != root.getName)
          .foreach(x => hfs.delete(new org.apache.hadoop.fs.Path(x.toString), true))
        if (root.exists()) // half-written timeline from a killed run
          hfs.delete(new org.apache.hadoop.fs.Path(root.toString), true)
        val docs = Tables(s, dir, "documents")
        val t0 = System.nanoTime()
        commitBase(root, rowsOf(docs))
        val t1 = System.nanoTime()
        commitDelta(root, rowsOf(deltaDocs(docs, shift)),
          tombstoneDocIds(docs))
        val t2 = System.nanoTime()
        log.info(f"[incpostings] $dir $kind base build ${(t1 - t0) / 1e9}%.2f s, " +
          f"delta build+commit ${(t2 - t1) / 1e9}%.2f s")
        marker.createNewFile()
      }
      root.toString
    })
    new java.io.File(path)
  }

  /** The live merged trigram postings view for the inventory queries. */
  private[graft] def mergedPostings(s: SparkSession, dir: String): DataFrame =
    readCurrent(s, indexRoot(s, dir, "trigram", TextOps.trigramRowsOf))

  /** The live merged POSITIONAL postings view — the same LSM timeline
    * applied to the phrase index's (doc_id, p, tok) layout, so the
    * engine's whole text-index family is delta-maintainable: trigram
    * (substring/regex), positional (phrase/boolean), and BM25 (which
    * already merges base+delta stats in idx_bm25_inc_search). */
  private[graft] def mergedPositional(s: SparkSession, dir: String): DataFrame =
    readCurrent(s, indexRoot(s, dir, "positional", TextOps.positionalRowsOf))

  /** Fresh full rebuild over the v2 corpus — the parity baseline the
    * increment must equal (and the cost it avoids). Artifact-cached so
    * the parity query's repeated runs measure the probe, not the
    * rebuild. */
  private def freshV2Postings(s: SparkSession, dir: String): DataFrame =
    ArtifactCache.parquet(s, dir, "trigram-postings-v2", Seq("documents")) {
      TextOps.trigramRowsOf(Maintenance.snapshotV2(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("text")))
    }

  /** Fresh positional rebuild over the v2 corpus — the parity baseline
    * for the positional timeline (same contract as freshV2Postings). */
  private def freshV2Positional(s: SparkSession, dir: String): DataFrame =
    ArtifactCache.parquet(s, dir, "positional-postings-v2", Seq("documents")) {
      TextOps.positionalRowsOf(Maintenance.snapshotV2(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("text")))
    }

  val queries: Map[String, Relational.Q] = Map(
    // ── substring search through the MERGED index: all-grams-present
    // candidates from base∪delta minus tombstones, exact contains()
    // verify against the v2 text. The oracle recomputes the answer
    // from the v2 corpus directly, so a hash match proves the
    // increment preserved search semantics end to end — the persisted
    // form of the inc_postings_merge invariant at the trigram layer. ─
    "idx_postings_inc" -> ((s, dir) => {
      val grams = TextOps.TrigramPattern.sliding(3).toSeq.distinct
      val v2 = Maintenance.snapshotV2(Tables(s, dir, "documents"))
      mergedPostings(s, dir)
        .where(col("g").isin(grams: _*))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("ng"))
        .where(col("ng") === grams.length)
        .select(col("doc_id"))
        .join(v2, "doc_id")
        .where(col("text").contains(TextOps.TrigramPattern))
        .select(col("doc_id"))
    }),

    // ── structural parity: the merged view must equal a fresh v2
    // rebuild as a MULTISET of (doc_id, g) rows — exceptAll in both
    // directions plus the rebuild's own summary stats. The oracle pins
    // the summary from the corpus and asserts both differences are
    // zero; any row the merge lost or leaked breaks the hash. ────────
    "idx_postings_inc_parity" -> ((s, dir) => {
      val merged = mergedPostings(s, dir)
      val fresh = freshV2Postings(s, dir)
      val onlyM = merged.exceptAll(fresh).agg(count(lit(1)).as("only_merged"))
      val onlyF = fresh.exceptAll(merged).agg(count(lit(1)).as("only_fresh"))
      val stats = fresh.agg(count(lit(1)).as("n_postings"),
        countDistinct(col("g")).as("n_grams"),
        countDistinct(col("doc_id")).as("n_docs"))
      onlyM.crossJoin(onlyF).crossJoin(stats)
    }),

    // ── Phrase search through the MERGED positional index: the
    // idx_phrase_search algorithm (filter each term's postings first,
    // intersect on (doc, p+1)) over base∪delta minus tombstones. The
    // oracle recomputes adjacency from the v2 corpus, so a hash match
    // proves the increment preserved PHRASE semantics — positions and
    // all — not just doc membership. ─────────────────────────────────
    "idx_phrase_inc" -> ((s, dir) => {
      val pos = mergedPositional(s, dir)
        .where(col("tok").isin("table", "part"))
      val first = pos.where(col("tok") === "table").select(col("doc_id"), col("p"))
      val second = pos.where(col("tok") === "part")
        .select(col("doc_id"), (col("p") - 1).as("p"))
      first.join(second, Seq("doc_id", "p"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"))
    }),

    // ── Structural parity for the positional timeline: merged ≡ fresh
    // v2 rebuild as a MULTISET of (doc_id, p, tok) rows. Positions make
    // this strictly stronger than the trigram parity — an off-by-one in
    // the delta's posexplode would pass doc-membership checks and fail
    // here. ──────────────────────────────────────────────────────────
    "idx_phrase_inc_parity" -> ((s, dir) => {
      val merged = mergedPositional(s, dir)
      val fresh = freshV2Positional(s, dir)
      val onlyM = merged.exceptAll(fresh).agg(count(lit(1)).as("only_merged"))
      val onlyF = fresh.exceptAll(merged).agg(count(lit(1)).as("only_fresh"))
      val stats = fresh.agg(count(lit(1)).as("n_postings"),
        countDistinct(col("tok")).as("n_toks"),
        countDistinct(col("doc_id")).as("n_docs"))
      onlyM.crossJoin(onlyF).crossJoin(stats)
    })
  )

  /** DuckDB v2-corpus CTE shared by both oracles (snapshotV2 in SQL —
    * the maint_snapshot_diff construction). */
  private val sqlV2 =
    """WITH kept AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
      |edited AS (SELECT doc_id,
      |    CASE WHEN doc_id % 31 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM kept),
      |added AS (SELECT doc_id + 10000000 AS doc_id, text
      |  FROM documents WHERE doc_id % 89 = 0),
      |v2 AS (SELECT doc_id, text FROM edited
      |       UNION ALL SELECT doc_id, text FROM added)""".stripMargin

  val oracles: Map[String, String] = Map(
    "idx_postings_inc" ->
      s"""$sqlV2
         |SELECT doc_id FROM v2
         |WHERE contains(text, '${TextOps.TrigramPattern.replace("'", "''")}')""".stripMargin,

    "idx_phrase_inc" ->
      s"""$sqlV2,
         |tk AS (
         |  SELECT doc_id, CAST(u.p AS BIGINT) AS p, u.tok AS tok
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(range(len(tk0)),
         |      i -> {'p': i, 'tok': tk0[i+1]})) AS u
         |    FROM (SELECT doc_id,
         |      list_filter(string_split(text, ' '), t -> t <> '') AS tk0
         |      FROM v2)))
         |SELECT a.doc_id, count(*) AS n_occurrences
         |FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.p = a.p + 1
         |WHERE a.tok = 'table' AND b.tok = 'part'
         |GROUP BY 1""".stripMargin,

    "idx_phrase_inc_parity" ->
      s"""$sqlV2,
         |tk AS (
         |  SELECT doc_id, u.tok AS tok
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(range(len(tk0)),
         |      i -> {'p': i, 'tok': tk0[i+1]})) AS u
         |    FROM (SELECT doc_id,
         |      list_filter(string_split(text, ' '), t -> t <> '') AS tk0
         |      FROM v2)))
         |SELECT CAST(0 AS BIGINT) AS only_merged,
         |  CAST(0 AS BIGINT) AS only_fresh,
         |  CAST(count(*) AS BIGINT) AS n_postings,
         |  CAST(count(DISTINCT tok) AS BIGINT) AS n_toks,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM tk""".stripMargin,

    "idx_postings_inc_parity" ->
      s"""$sqlV2,
         |tg AS (
         |  SELECT DISTINCT doc_id, g FROM (
         |    SELECT doc_id, unnest(list_transform(range(len(text) - 2),
         |      i -> substr(text, CAST(i + 1 AS INT), 3))) AS g
         |    FROM v2 WHERE len(text) >= 3))
         |SELECT CAST(0 AS BIGINT) AS only_merged,
         |  CAST(0 AS BIGINT) AS only_fresh,
         |  CAST(count(*) AS BIGINT) AS n_postings,
         |  CAST(count(DISTINCT g) AS BIGINT) AS n_grams,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM tg""".stripMargin
  )
}
