package graft

import java.nio.file.Files

import graft.operators.ArtifactCache
import org.apache.spark.sql.functions._

/** Disk-artifact contract: build-once/read-many, torso recovery, corpus
  * invalidation, and the publish-by-rename immutability guarantee under
  * a concurrent double-build race. */
class ArtifactCacheSpec extends SparkSuite {

  /** Fresh source dir with a tiny `documents.parquet`, returning its
    * path — each test gets its own fingerprint universe. */
  private def mkSource(rows: Int): String = {
    val dir = Files.createTempDirectory("ac-src").toString
    spark.range(rows).select(col("id").as("doc_id"),
        concat(lit("d"), col("id")).as("text"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("artifact builds once, then serves reads without re-running the build") {
    val dir = mkSource(10)
    var builds = 0
    def getSame() = ArtifactCache.parquet(spark, dir, "stable", Seq("documents")) {
      builds += 1
      Tables(spark, dir, "documents").withColumn("l", length(col("text")))
    }
    assert(getSame().count() === 10)
    assert(getSame().count() === 10)
    assert(builds === 1, "second read must hit the published artifact")
  }

  test("regenerating the source invalidates the artifact (new fingerprint)") {
    val dir = mkSource(5)
    def build(tag: String) = ArtifactCache.parquet(spark, dir, "inv", Seq("documents")) {
      Tables(spark, dir, "documents").withColumn("tag", lit(tag))
    }
    assert(build("a").select("tag").distinct().collect().map(_.getString(0)).toSeq === Seq("a"))
    // Regenerate the source (different length/mtime → different key).
    spark.range(7).select(col("id").as("doc_id"),
        concat(lit("xx"), col("id")).as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val b = build("b")
    assert(b.count() === 7)
    assert(b.select("tag").distinct().collect().map(_.getString(0)).toSeq === Seq("b"))
  }

  test("concurrent double-build races publish exactly one immutable artifact") {
    val dir = mkSource(20)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // Two threads race the same (fresh) artifact. The memo would
    // serialize them in-JVM, so give each its own simulated session
    // path: clear the memo between setup and race via distinct names is
    // NOT the point — instead both threads call with the same name and
    // we assert both read 20 valid rows and exactly one directory +
    // marker exists (no torso, no duplicate publication).
    val futures = (1 to 2).map { i =>
      Future {
        ArtifactCache.parquet(spark, dir, "race", Seq("documents")) {
          Thread.sleep(50L * i)
          Tables(spark, dir, "documents").select(col("doc_id"))
        }.count()
      }
    }
    val counts = futures.map(f => Await.result(f, 120.seconds))
    assert(counts === Seq(20L, 20L))
    val root = new java.io.File("/tmp/graft-artifact-cache").listFiles()
      .filter(_.getName.startsWith(dir.replaceAll("[^A-Za-z0-9._-]", "_")))
    assert(root.length === 1)
    val entries = root.head.listFiles().map(_.getName)
    // Exactly the published artifact, no temp leftovers at any level.
    assert(entries.toSet === Set("race"))
    val published = new java.io.File(root.head, "race")
    assert(new java.io.File(published, "_GRAFT_DONE").exists(),
      "marker travels inside the published dir")
    // The local-FS rename fallback can nest a losing temp dir INSIDE
    // the published artifact — scan recursively, not just the root.
    def walk(f: java.io.File): Seq[java.io.File] =
      f +: Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    assert(!walk(root.head).exists(_.getName.startsWith(".build-")),
      "no temp build dirs anywhere under the artifact root")
  }

  test("an unmarked torso directory is rebuilt, not served") {
    val dir = mkSource(8)
    // First build publishes; then simulate a killed build of a SECOND
    // artifact: create its directory with junk but no marker.
    val torsoParent = {
      ArtifactCache.parquet(spark, dir, "first", Seq("documents")) {
        Tables(spark, dir, "documents")
      }.count()
      new java.io.File("/tmp/graft-artifact-cache").listFiles()
        .filter(_.getName.startsWith(dir.replaceAll("[^A-Za-z0-9._-]", "_"))).head
    }
    val torso = new java.io.File(torsoParent, "torso")
    torso.mkdirs()
    Files.writeString(torso.toPath.resolve("garbage.parquet"), "not parquet")
    val df = ArtifactCache.parquet(spark, dir, "torso", Seq("documents")) {
      Tables(spark, dir, "documents").select(col("doc_id"))
    }
    assert(df.count() === 8)
  }
}
