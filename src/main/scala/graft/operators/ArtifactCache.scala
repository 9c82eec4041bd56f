package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Disk-backed derived-corpus artifacts — the shared build-once /
  * read-many mechanism behind [[PostingsIndex]]-style deployment
  * shapes, used by the dedup family (shingle/signature views) and the
  * graph family (edge tables). An artifact is a pure function of its
  * source tables; production pipelines materialize such tables once
  * and refresh them when the source changes, they do not recompute
  * them per query session.
  *
  * Path is keyed by a cheap content fingerprint (length + mtime) of
  * every source file, so regenerated testdata invalidates
  * automatically; sibling directories of older corpus generations are
  * evicted on first build. Values are byte-identical to the inline
  * build (parquet round-trips long/double/string exactly); only row
  * order differs, and every consumer aggregates or joins.
  *
  * Publication protocol (the same immutability contract as the
  * versioned IvfIndex): the build runs in a private temp dir that
  * already contains the `_GRAFT_DONE` completion marker, then a single
  * atomic rename publishes it — "directory exists with marker" and
  * "directory is complete" are therefore the SAME event, so no
  * interleaving of builders and readers can observe a half-built
  * table, and a killed build leaves only an ignorable temp dir (no
  * unmarked torso at the published path). A losing racer discards its
  * own build; published directories are never written again. In-JVM,
  * a per-artifact lock additionally serializes builders so the build
  * runs at most once per session.
  */
private[graft] object ArtifactCache {

  // In-JVM memo so a session checks each artifact's marker once.
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  // Per-artifact build lock: TrieMap.getOrElseUpdate may evaluate the
  // op concurrently in racing threads, so the publish section takes a
  // monitor keyed by (root, name) — one build per artifact per JVM.
  private val locks =
    scala.collection.concurrent.TrieMap.empty[(String, String), Object]

  private val Root = "/tmp/graft-artifact-cache"

  /** Marker file name INSIDE a published artifact directory. The
    * leading underscore keeps Spark's parquet reader from treating it
    * as data (same convention as `_SUCCESS`). */
  private val Done = "_GRAFT_DONE"

  def parquet(s: SparkSession, dir: String, name: String,
      sources: Seq[String])(build: => DataFrame): DataFrame = {
    val fp = sources.map { t =>
      val f = new java.io.File(s"$dir/$t.parquet")
      s"${f.length()}-${f.lastModified()}"
    }.mkString("_")
    // The eviction identity (prefix) must name the SOURCE TABLE SET,
    // not just the corpus dir: artifact sets fingerprinting different
    // tables (dedup→documents, graph→lineitem/orders) are different
    // namespaces, and a shared prefix would let one family's build
    // evict the other's live root as a "stale generation" mid-session
    // (observed: the co-purchase build deleted the minhashes table the
    // dedup queries were reading).
    val prefix =
      s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}-${sources.mkString("+")}-"
    val root = new java.io.File(Root, prefix + fp)
    val key = (root.toString, name)
    val path = memo.getOrElseUpdate(key,
      locks.getOrElseUpdate(key, new Object).synchronized {
        memo.get(key).getOrElse(publish(s, root, prefix, name, build))
      })
    s.read.parquet(path)
  }

  private def isPublished(out: java.io.File): Boolean =
    new java.io.File(out, Done).exists()

  private def publish(s: SparkSession, root: java.io.File, prefix: String,
      name: String, build: => DataFrame): String = {
    val out = new java.io.File(root, name)
    if (isPublished(out)) return out.toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      s.sparkContext.hadoopConfiguration)
    def del(f: java.io.File): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(f.toString), true)
    // Evict artifact sets of older corpus generations (siblings under
    // Root with this source-set prefix but a different fingerprint).
    Option(root.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) && f.getName != root.getName)
      .foreach(del)
    val tmp = new java.io.File(root,
      s".build-$name-${java.util.UUID.randomUUID().toString.take(8)}")
    build.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    new java.io.File(tmp, Done).createNewFile()
    // Publish. Never rename onto an existing directory (the local-FS
    // fallback would nest tmp INSIDE it): re-check, clear only an
    // UNMARKED dst, and treat "marked dst appeared" as losing the race.
    var attempts = 0
    var published = isPublished(out)
    while (!published && attempts < 3) {
      attempts += 1
      if (out.exists() && !isPublished(out)) del(out)
      published = fs.rename(new org.apache.hadoop.fs.Path(tmp.toString),
        new org.apache.hadoop.fs.Path(out.toString)) || isPublished(out)
    }
    if (tmp.exists()) del(tmp)
    // Lost-race repair: if another PROCESS published `out` between our
    // unmarked-dst check and the rename, the local-FS rename fallback
    // moved tmp INSIDE the published dir instead of failing — the old
    // tmp path is gone (so the cleanup above was a no-op) and a
    // .build-* orphan with its own marker sits inside the "immutable"
    // artifact. Readers stay correct (Spark ignores dot-prefixed
    // paths), but the dir must still match what the winner published.
    val nested = new java.io.File(out, tmp.getName)
    if (nested.exists()) del(nested)
    if (!isPublished(out))
      throw new IllegalStateException(s"artifact publish failed: $out")
    out.toString
  }
}
