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
  * automatically; a completion marker per artifact makes killed builds
  * rewrite instead of serving a torso; sibling directories of older
  * corpus generations are evicted on first build. Values are
  * byte-identical to the inline build (parquet round-trips
  * long/double/string exactly); only row order differs, and every
  * consumer aggregates or joins.
  */
private[graft] object ArtifactCache {

  // In-JVM memo so a session checks each artifact's marker once.
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private val Root = "/tmp/graft-artifact-cache"

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
    val path = memo.getOrElseUpdate((root.toString, name), {
      val marker = new java.io.File(root, s"_GRAFT_DONE_$name")
      val out = new java.io.File(root, name)
      if (!marker.exists()) {
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          s.sparkContext.hadoopConfiguration)
        // Evict artifact sets of older corpus generations.
        Option(root.getParentFile.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith(prefix) && f.getName != root.getName)
          .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f.toString), true))
        // Publish-by-rename (the same immutability contract as the
        // versioned IvfIndex): build into a private temp dir, then
        // atomically rename into place. A published artifact directory
        // is never written again, so a concurrent reader can never see
        // a half-built or mid-overwrite table; if a second builder
        // races us and publishes first, our build is discarded.
        val tmp = new java.io.File(root,
          s".build-$name-${java.util.UUID.randomUUID().toString.take(8)}")
        build.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        if (!marker.exists()) {
          fs.delete(new org.apache.hadoop.fs.Path(out.toString), true) // unmarked torso
          if (fs.rename(new org.apache.hadoop.fs.Path(tmp.toString),
              new org.apache.hadoop.fs.Path(out.toString)))
            marker.createNewFile()
          else fs.delete(new org.apache.hadoop.fs.Path(tmp.toString), true)
        } else fs.delete(new org.apache.hadoop.fs.Path(tmp.toString), true)
      }
      out.toString
    })
    s.read.parquet(path)
  }
}
