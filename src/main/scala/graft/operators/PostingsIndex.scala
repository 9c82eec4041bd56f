package graft.operators

import graft.Tables
import graft.functions.{Num, Text}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the build-once / search-many deployment
  * shape of the BM25 / boolean-retrieval inventory queries, mirroring
  * what [[IvfIndex]] does for ANN (the round-5 verdict's "next" item:
  * the comment at TextOps.scala's BM25 entry promised exactly this
  * layout). Three parquet tables under `<path>/`:
  *
  *   postings     token, doc_id, tf, dl      partitioned by tbucket
  *   termstats    token, df, tf_total        partitioned by tbucket
  *   corpusstats  n_docs, sum_dl             (one row per batch)
  *
  * `tbucket = pmod(xxhash64(token), NBuckets)` — a query for |terms|
  * terms prunes the scan to ≤|terms| bucket DIRECTORIES (literal IN
  * over the partition column, static pruning — plan-pinned in
  * PostingsIndexSpec), and the pushed `token IN (…)` filter plus
  * token-sorted row groups prune within the bucket. Document length is
  * DENORMALIZED into the postings rows (the doc-values trick of real
  * search engines), so scoring never joins a doclen table: the only
  * join in a search is postings ⋈ broadcast(|terms|-row idf stats).
  *
  * Incremental maintenance lives on the [[IncPostings]] LSM timeline
  * (since r13 the family's ONLY increment mechanism); this module is
  * the SERVING side — [[build]] for one-shot batch indexes and
  * [[publishServing]] to fold an LSM timeline's live view into this
  * layout. The stats tables still sum PARTIAL batches at read
  * ([[termStats]] / corpusStats) — additive over disjoint doc sets
  * (the `inc_postings_merge` invariant, Maintenance.scala) — which is
  * what lets a fold write beside existing batches without rewriting
  * them. At 100 TB: build is one explode + one aggregation per batch
  * (shuffle keyed on token); search reads |terms| postings lists +
  * |terms| stat partials — corpus-size-independent I/O for a fixed
  * result size.
  */
object PostingsIndex {

  /** Token hash-bucket count — the partition fan-out of the postings
    * layout (a production index sizes this so a bucket's postings fit
    * one executor's scan budget; the pruning shape is the same). */
  val NBuckets = 64

  /** The fixed query-term set shared with the inline BM25 entries. */
  val Terms: Seq[String] = Seq("query", "window", "spark")

  private def tbucket(token: Column): Column =
    pmod(xxhash64(token), lit(NBuckets.toLong)).cast("int")

  /** Build (overwrite) the index from a `documents`-shaped frame.
    * This module is the BUILD-ONCE / SEARCH-MANY shape only: since r13
    * the maintained (incremental) form of the BM25 index rides the
    * [[IncPostings]] LSM timeline exclusively — the old append-only
    * partial-stats increment was the one index family with a second
    * maintenance mechanism, retired per the r12 directive. The
    * partial-summing read path ([[termStats]] / corpusStats) stays: it
    * is what makes a COMPACTION of LSM-built batches into this layout
    * a pure fold, and it costs nothing for single-batch indexes. */
  def build(spark: SparkSession, docs: DataFrame, path: String): Unit =
    writeBatch(docs, path, SaveMode.Overwrite)

  private def writeBatch(docs: DataFrame, path: String, mode: SaveMode): Unit = {
    // Three outputs hang off the tokenization (postings, termstats,
    // corpusstats) — without caching, each write re-tokenizes the batch
    // from scratch (3× the dominant cost). Persist the tokenized frame
    // and the postings aggregate for the duration of the batch;
    // MEMORY_AND_DISK so an oversized batch spills instead of OOMing
    // (per-batch lifetime — at 100 TB a build feeds bounded batches, or
    // derives the stats from the just-written postings files).
    import org.apache.spark.storage.StorageLevel
    val tk = tokFrame(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val postings = layout(postFrame(tk)).persist(StorageLevel.MEMORY_AND_DISK)
      try writeFrom(tk.select(col("doc_id"), col("dl")), postings, path, mode)
      finally postings.unpersist(blocking = false)
    } finally tk.unpersist(blocking = false)
  }

  /** (doc_id, dl, tok) — the tokenization pass, the dominant build cost. */
  private def tokFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(Text.tokens(col("text"))).cast("long").as("dl"),
      Text.tokens(col("text")).as("tok"))

  /** (token, doc_id, dl, tf, tbucket) — the explode + per-doc term
    * aggregation (the one corpus-sized shuffle of a build). */
  private def postFrame(tk: DataFrame): DataFrame =
    tk.select(col("doc_id"), col("dl"), explode(col("tok")).as("token"))
      .groupBy(col("token"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tbucket", tbucket(col("token")))

  /** The layout pass: co-locate each bucket and sort by token so
    * parquet row-group min/max stats prune within the bucket for the
    * pushed token filter. Applied once per frame — a doc_id filter over
    * an already-laid-out frame preserves both the partitioning and the
    * intra-partition sort, so cached corpus slices skip this shuffle. */
  private def layout(postings: DataFrame): DataFrame =
    postings.repartition(col("tbucket"))
      .sortWithinPartitions(col("token"), col("doc_id"))

  // ── serving generations (r14): the fold republishes repeatedly over
  // a live timeline, so unlike the one-shot batch build it needs
  // reader isolation — each fold writes a NEW vN directory whose
  // number is claimed through [[CommitPrimitive]] (the same seam as
  // the LSM manifests, the artifact pointers, and the IVF
  // generations), then swaps the advisory CURRENT hint. A reader that
  // resolved vN mid-fold is untouched; a missing hint recovers from
  // the claim scan. A path with NO generations (the batch build's
  // layout, at the path root) resolves to itself. ──────────────────────

  /** The directory a search should read for `path`: the CURRENT
    * hint's generation, claim-scan recovery when the hint is absent
    * (max claimed generation whose LAST-written table committed), or
    * the path itself for a generation-less (batch-built) layout. */
  def servingDir(path: String): String = {
    Generations.requireLocalRoot(path) // java.io hint read + claim scan
    val hint = new java.io.File(path, "CURRENT")
    val n =
      if (hint.exists())
        Some(new String(java.nio.file.Files.readAllBytes(hint.toPath),
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
      else Generations.claimed(path)
        .filter(n => new java.io.File(path,
          s"v$n/corpusstats/_SUCCESS").exists())
        .maxOption
    n.map(v => s"$path/v$v").getOrElse(path)
  }

  /** Publish the SERVING layout from already-aggregated postings rows
    * — `(doc_id, token, tf, dl)`, the bm25 LSM kind's layout — plus
    * `(doc_id, dl)` doclens: the production split between the two
    * index shapes this engine keeps. The [[IncPostings]] LSM timeline
    * absorbs increments at delta cost; this fold republishes the
    * bucket-partitioned, token-sorted layout searches want
    * (tbucket dir pruning + row-group pruning = corpus-size-
    * independent search I/O). At 100 TB the fold is one corpus-sized
    * shuffle — a batch build's cost — but it runs OFF the ingest path
    * on whatever cadence serving freshness needs, while the LSM keeps
    * absorbing deltas. Merge-on-read probes and served searches are
    * interchangeable under the same oracle (idx_bm25_lsm_served).
    *
    * Each fold is a NEW claimed generation + hint swap (see above):
    * concurrent readers never observe a half-written layout, and two
    * racing folds land in distinct directories with the last hint
    * winning. Generations older than current−1 are pruned (in-flight
    * readers hold at most one horizon — the IvfIndex rule). */
  def publishServing(postings: DataFrame, doclens: DataFrame,
      path: String): Unit = {
    val bucketed = layout(postings
      .select(col("token"), col("doc_id"), col("dl"), col("tf"))
      .withColumn("tbucket", tbucket(col("token"))))
    val prev = {
      val d = servingDir(path)
      if (d == path) 0 else d.substring(d.lastIndexOf("/v") + 2).toInt
    }
    val next = Generations.claimNext(path, prev + 1)
    writeFrom(doclens, bucketed, s"$path/v$next", SaveMode.Overwrite)
    // advisory hint, swapped atomically AFTER the tables committed
    val tmp = new java.io.File(path, s".CURRENT-$next.tmp")
    java.nio.file.Files.write(tmp.toPath,
      next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(path, "CURRENT").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // prune: current and current-1 stay (claim files are never pruned
    // — max-claimed monotonicity is what hint recovery leans on)
    (1 until next - 1).foreach { old =>
      val dir = new java.io.File(path, s"v$old")
      if (dir.exists()) {
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
          f.delete()
        }
        del(dir)
      }
    }
  }

  // ── auto serving-fold (r14 verdict #4) ──────────────────────────────

  /** Generation marker of the last serving fold, stored WITH the
    * serving layout (the fold owns its cadence state; the LSM root
    * stays pure timeline). */
  private def foldMarker(servingPath: String): java.io.File =
    new java.io.File(servingPath, "_FOLDED_AT_GEN")

  /** The postings-timeline generation the serving layout was last
    * folded at (0 = never folded). */
  private[graft] def lastFoldGen(servingPath: String): Int = {
    val f = foldMarker(servingPath)
    if (!f.exists()) 0
    else new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt
  }

  /** Auto serving-fold as a streaming-maintainer policy — the
    * [[graft.streaming.IndexDeltaStream]] `postCommit` seam, the same
    * pattern as the ivfvec skew-gauge recluster (r13 left the fold
    * runnable only inside the gate query's build closure; this hook
    * makes the production split self-maintaining). Gauge: the live
    * manifest's segments committed AFTER the last fold — delta churn,
    * not absolute segment count, so the policy re-arms after each fold
    * instead of firing forever once crossed. When `foldAtDeltas` or
    * more fresh segments exist, [[publishServing]] refolds the live
    * view into `servingPath` and the marker records the folded
    * generation. The fold is idempotent (Overwrite) and the marker is
    * written after it completes — a crash mid-fold refolds on the next
    * batch, never serves a half-written layout AS committed. Cadence
    * is single-maintainer (postCommit runs on the maintainer's
    * thread); production serving reads would resolve a published
    * generation of this layout exactly like the artifact pointers.
    *
    * A compaction segment counts as fresh churn (it carries the
    * compaction's generation) — acceptable: a compaction that large
    * changes read shape enough that refreshing the fold is reasonable. */
  def servingFoldPolicy(doclensRoot: java.io.File, servingPath: String,
      foldAtDeltas: Int): (SparkSession, java.io.File) => Unit =
    (s, root) => {
      val gen = IncPostings.committedGen(root)
      val since = lastFoldGen(servingPath)
      val fresh = IncPostings.manifestOf(root, gen).segments
        .count(_.seq > since)
      if (fresh >= foldAtDeltas) {
        publishServing(
          IncPostings.readCurrent(s, root),
          IncPostings.readCurrent(s, doclensRoot),
          servingPath)
        val m = foldMarker(servingPath)
        Option(m.getParentFile).foreach(_.mkdirs())
        java.nio.file.Files.write(m.toPath, gen.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      }
    }

  /** The three table writes, given already-materialized doclens
    * (`(doc_id, dl)`, one row per document INCLUDING zero-token docs —
    * they count into n_docs) and postings. `postings` must already be
    * in bucket layout (see [[layout]]). Per-doc grouping commutes with
    * any doc_id filter, so a filtered slice of a corpus-wide postings
    * frame IS that slice's build. */
  private def writeFrom(doclens: DataFrame, postings: DataFrame, path: String,
      mode: SaveMode): Unit = {
    postings
      .write.mode(mode).partitionBy("tbucket").parquet(s"$path/postings")
    postings
      .groupBy(col("token"), col("tbucket"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      .select(col("token"), col("df"), col("tf_total"), col("tbucket"))
      .write.mode(mode).partitionBy("tbucket").parquet(s"$path/termstats")
    doclens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .coalesce(1)
      .write.mode(mode).parquet(s"$path/corpusstats")
  }

  /** Merged (df, tf_total) for `terms` — partial batches summed at
    * read, pruned to the terms' buckets. With terms = None, the full
    * merged index stats (the inc_postings_merge identity's left side,
    * over the persisted tables). */
  def termStats(spark: SparkSession, path: String,
      terms: Option[Seq[String]] = None): DataFrame = {
    // idempotent on an already-resolved generation dir (no gens there)
    val raw = spark.read.parquet(s"${servingDir(path)}/termstats")
      .withColumn("tbucket", col("tbucket").cast("int"))
    val pruned = terms.fold(raw) { ts =>
      val buckets = bucketsOf(spark, ts)
      raw.where(col("tbucket").isin(buckets: _*) && col("token").isin(ts: _*))
    }
    pruned.groupBy(col("token"))
      .agg(sum(col("df")).as("df"), sum(col("tf_total")).as("tf_total"))
  }

  /** Merged corpus stats (n_docs, avgdl) over the partial rows. */
  private def corpusStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/corpusstats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))

  /** Driver-side bucket ids for the query terms (evaluated with the
    * SAME expression that wrote them — one tiny local job, no second
    * hash definition to drift). */
  private def bucketsOf(spark: SparkSession, terms: Seq[String]): Seq[Int] = {
    import spark.implicits._
    terms.toDF("token").select(tbucket(col("token")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** Okapi BM25 top-k over the persisted index — identical scoring
    * recurrence (k1 = 1.2, b = 0.75, 1e-6 idf/partial grids before the
    * 1e-4 score grid) as the inline `idx_bm25_topk`, so the two are
    * interchangeable under the same oracle. The scan reads only the
    * query terms' bucket directories (static partition pruning via the
    * literal IN below) + their stat partials. */
  def bm25Search(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    // resolve the generation ONCE and read all three tables from the
    // resolved dir — a concurrent fold is invisible to this search
    val dir = servingDir(path)
    val buckets = bucketsOf(spark, terms)
    val post = spark.read.parquet(s"$dir/postings")
      .withColumn("tbucket", col("tbucket").cast("int"))
      .where(col("tbucket").isin(buckets: _*) && col("token").isin(terms: _*))
    val ts = termStats(spark, dir, Some(terms))
    val idf = Num.roundp(
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)), 6)
    val stats = ts.crossJoin(corpusStats(spark, dir)).withColumn("idf", idf)
    val denom = col("tf") +
      lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))
    val part = Num.roundp(col("idf") * (col("tf") * lit(2.2)) / denom, 6)
    post.join(broadcast(stats), "token")
      .select(col("doc_id"), part.as("p"))
      .groupBy(col("doc_id"))
      .agg(Num.roundp(sum(col("p")), 4).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  // ── Memoized index builds for the inventory queries: "full" is one
  // build over the whole corpus; "inc" is a base build on
  // doc_id % 5 != 0 plus an append of the rest — so the inc search
  // ALSO exercising the merge-on-read stats path must hash-match the
  // same full-corpus oracle (the persisted form of the
  // inc_postings_merge identity). The memo is the on-disk index itself
  // (fingerprint-keyed, cross-session — see indexPath); the in-JVM map
  // only avoids re-checking the marker. ──────────────────────────────
  private val built =
    scala.collection.concurrent.TrieMap.empty[(String, String, String),
      (SparkSession, String)]

  // The tokenized corpus + postings aggregate, shared by BOTH index
  // variants (r7 verdict #5: the "full" and "inc" builds each paid the
  // whole tokenize + explode-shuffle; now the corpus is tokenized and
  // aggregated once per session×dir and each variant is a doc_id filter
  // over the cached frames — filtering commutes with the per-doc
  // grouping, so the filtered slices are exactly those builds).
  //
  // Round-11 note — shared tokenization MEASURED AND REJECTED: the r10
  // verdict proposed deriving these frames from the positional-postings
  // artifact (tf = rows per (tok, doc), dl = rows per doc) so one
  // corpus tokenize feeds both indexes. Implemented and measured, the
  // derived build LOST at both decades (×10: 9.7 s vs 4.2 s fresh;
  // ×100: 15.7 s vs 10.4 s fresh, positional artifact warm): reading
  // back the corpus-token-sized artifact plus the extra dl aggregation
  // costs more than re-splitting the text — whitespace tokenization is
  // NOT the dominant cost of this family (the char-trigram explode is,
  // 510 s at ×100, and that one cannot share a token pass; its real
  // fix is the IncPostings delta path). Kept: the single-tokenize-per-
  // session cache below and the doclens-based writeFrom seam the
  // experiment introduced.
  private val corpusCache =
    scala.collection.concurrent.TrieMap.empty[(String, String),
      (SparkSession, DataFrame, DataFrame)]

  private def cachedCorpus(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    corpusCache.filterInPlace((_, v) => !v._1.sparkContext.isStopped)
    val (_, doclens, post) = corpusCache.getOrElseUpdate(
      (org.apache.spark.sql.GraftBridge.sessionUUID(s), dir), {
        // Persist the token frame itself so doclens and the postings
        // aggregate share ONE tokenization (doclens is a projection of
        // the cached plan).
        val tk = tokFrame(Tables(s, dir, "documents"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val post = layout(postFrame(tk)).persist(StorageLevel.MEMORY_AND_DISK)
        (s, tk.select(col("doc_id"), col("dl")), post)
      })
    (doclens, post)
  }

  /** Cheap content fingerprint of the corpus the index derives from —
    * regenerated testdata (new mtime/length) invalidates the on-disk
    * index automatically. */
  private def corpusFingerprint(dir: String): String = {
    val f = new java.io.File(s"$dir/documents.parquet")
    s"${f.length()}-${f.lastModified()}"
  }

  /** The deterministic on-disk index for (dir, variant) — build-once /
    * search-many ACROSS sessions, the deployment shape this module
    * models (a production search index is not rebuilt per query
    * session; it lives in storage and serves until its source data
    * changes). The path is keyed by a corpus content fingerprint, so a
    * regenerated testdata dir rebuilds; a half-written index (no DONE
    * marker — e.g. a killed build) is wiped and rebuilt, never
    * appended onto. */
  private def indexPath(s: SparkSession, dir: String, variant: String): String = {
    val fp = corpusFingerprint(dir)
    built.getOrElseUpdate((fp, dir, variant), {
      val root = new java.io.File("/tmp/graft-postings-cache",
        s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}-$fp-$variant")
      val marker = new java.io.File(root, "_GRAFT_DONE")
      val base = new java.io.File(root, "idx").toString
      val prefix = s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}-"
      val fsLocal = org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
      // Sweep the retired pre-r13 '-inc' variant UNCONDITIONALLY (once
      // per JVM via this memo): its directories carry a CURRENT
      // fingerprint, so the stale-generation eviction below — which
      // only runs on cold builds — would never reclaim them.
      Option(root.getParentFile.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(prefix) && f.getName.endsWith("-inc"))
        .foreach(f => fsLocal.delete(
          new org.apache.hadoop.fs.Path(f.toString), true))
      if (!marker.exists()) {
        // Evict indexes of older corpus generations (stale fingerprint)
        // so regenerated testdata doesn't leak abandoned directories.
        Option(root.getParentFile.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith(prefix) && !f.getName.contains(fp))
          .foreach(f => fsLocal.delete(
            new org.apache.hadoop.fs.Path(f.toString), true))
        if (root.exists()) // partial build from a killed run: wipe
          fsLocal.delete(new org.apache.hadoop.fs.Path(root.toString), true)
        variant match {
          case "lsmserve" =>
            // fold the LSM timeline's live view into the serving layout
            publishServing(
              IncPostings.readCurrent(s, IncPostings.v1SplitRoot(
                s, dir, "bm25v1inc", IncPostings.bm25RowsOf)),
              IncPostings.readCurrent(s, IncPostings.v1SplitRoot(
                s, dir, "bm25dlv1inc", IncPostings.doclenRowsOf)),
              base)
          case _ =>
            val (doclens, post) = cachedCorpus(s, dir)
            writeFrom(doclens, post, base, SaveMode.Overwrite)
        }
        marker.createNewFile()
      }
      (s, base)
    })._2
  }

  val queries: Map[String, Relational.Q] = Map(
    // ── search over the persisted index: same result as the inline
    // idx_bm25_topk (same oracle), but the read path is the deployed
    // one — bucket-pruned postings + merged stat partials. ───────────
    "idx_bm25_persisted" -> ((s, dir) =>
      bm25Search(s, indexPath(s, dir, "full"), Terms, 10)),

    // ── search after an increment: base(80%) + one delta commit(20%)
    // on the IncPostings LSM timeline (r12 directive #6 — the old
    // append-only partial-stats path is retired; ONE increment
    // mechanism per index family). Merge-on-read must equal the full
    // build — enforced by the shared oracle. ─────────────────────────
    "idx_bm25_inc_search" -> ((s, dir) =>
      IncPostings.bm25Probe(
        IncPostings.readCurrent(s,
          IncPostings.v1SplitRoot(s, dir, "bm25v1inc", IncPostings.bm25RowsOf)),
        IncPostings.readCurrent(s,
          IncPostings.v1SplitRoot(s, dir, "bm25dlv1inc", IncPostings.doclenRowsOf)),
        Terms, 10)),

    // ── the serving fold: the LSM timeline's live view republished as
    // the bucket-partitioned layout, searched through the SAME pruned
    // path as idx_bm25_persisted. LSM-for-increments +
    // serving-layout-for-searches is the production split; this query
    // hash-gates the fold (merge-on-read ≡ served ≡ inline, one
    // oracle). ────────────────────────────────────────────────────────
    "idx_bm25_lsm_served" -> ((s, dir) =>
      bm25Search(s, indexPath(s, dir, "lsmserve"), Terms, 10))
  )

  val oracles: Map[String, String] = Map(
    // All three variants must reproduce the inline BM25 ranking exactly.
    "idx_bm25_persisted" -> TextOps.sqlBm25TopK,
    "idx_bm25_inc_search" -> TextOps.sqlBm25TopK,
    "idx_bm25_lsm_served" -> TextOps.sqlBm25TopK
  )
}
