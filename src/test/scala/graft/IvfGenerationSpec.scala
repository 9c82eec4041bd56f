package graft

import java.nio.file.Files

import graft.operators.{CommitPrimitive, IvfIndex}
import org.apache.spark.sql.functions._

/** Generation lifecycle of the persisted IVF index under the r14
  * commit protocol: the `gen-N` claim through [[CommitPrimitive]] is
  * the commit point (the same seam the LSM manifests and the artifact
  * pointers commit through), CURRENT is an advisory hint with claim-
  * scan recovery. The battery is ABSTRACT over the primitive
  * (IncPostingsSpec pattern) so every contract holds under both the
  * single-host CAS and the lake-filesystem one. */
abstract class IvfGenerationBattery extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {
  protected def primitive: CommitPrimitive
  private var saved: CommitPrimitive = _
  override protected def beforeAll(): Unit = {
    super.beforeAll()
    saved = CommitPrimitive.active
    CommitPrimitive.set(primitive)
  }
  override protected def afterAll(): Unit = {
    CommitPrimitive.set(saved)
    super.afterAll()
  }

  private def corpus = Tables(spark, sf001, "embeddings")
    .where(col("vec_id") < 200)

  private def preClaim(path: String, n: Int): Unit = {
    val root = new java.io.File(path)
    root.mkdirs()
    val t = new java.io.File(root, s".pre-$n")
    Files.write(t.toPath, Array.emptyByteArray)
    CommitPrimitive.active.claim(t, new java.io.File(root, s"gen-$n"))
  }

  test("build claims its generation through the commit primitive") {
    val path = Files.createTempDirectory("ivf-gen").toString + "/idx"
    IvfIndex.build(spark, corpus, path)
    assert(new java.io.File(path, "gen-1").exists(),
      "the generation claim file is the commit point")
    assert(IvfIndex.currentVersion(spark, path).contains(1))
    val got = IvfIndex.search(spark, path, corpus.where(col("vec_id") < 3),
      k = 2, nprobe = 2).count()
    assert(got === 6L)
  }

  test("a pre-claimed (crashed-writer) generation is skipped, never written into") {
    val path = Files.createTempDirectory("ivf-gen").toString + "/idx"
    preClaim(path, 1) // a dead writer holds gen-1, wrote nothing
    IvfIndex.build(spark, corpus, path)
    assert(IvfIndex.currentVersion(spark, path).contains(2),
      "the builder must move past the claimed number")
    assert(!new java.io.File(path, "v1").exists(),
      "the claimed-but-dead generation directory is never created by others")
    assert(new java.io.File(path, "v2/assignments/_SUCCESS").exists())
    assert(spark.read.parquet(s"$path/v2/assignments").count() === 200L)
  }

  test("racing builds claim DISTINCT generations; both directories are complete") {
    val path = Files.createTempDirectory("ivf-gen").toString + "/idx"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 2).map { _ =>
      Future { IvfIndex.build(spark, corpus, path) }
    }
    futures.foreach(f => Await.result(f, 300.seconds))
    val claims = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("gen-")).sorted
    assert(claims.toSeq === Seq("gen-1", "gen-2"),
      "two racing builds must own two distinct generations")
    Seq(1, 2).foreach { n =>
      assert(new java.io.File(path, s"v$n/assignments/_SUCCESS").exists(),
        s"generation $n must be complete — no interleaved writes")
      assert(spark.read.parquet(s"$path/v$n/assignments").count() === 200L)
    }
    // the hint points at one of the two complete generations
    assert(Seq(1, 2).map(Some(_)).contains(
      IvfIndex.currentVersion(spark, path)))
  }

  test("a missing CURRENT hint recovers from the claim scan") {
    val path = Files.createTempDirectory("ivf-gen").toString + "/idx"
    IvfIndex.build(spark, corpus, path)
    IvfIndex.build(spark, corpus, path) // second generation
    assert(IvfIndex.currentVersion(spark, path).contains(2))
    val before = IvfIndex.search(spark, path,
      corpus.where(col("vec_id") < 3), k = 2, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("vec_id"))).toSet
    // the HDFS hint-swap window: CURRENT briefly absent
    assert(new java.io.File(path, "CURRENT").delete())
    assert(IvfIndex.currentVersion(spark, path).contains(2),
      "recovery must find the newest claimed+complete generation")
    assert(IvfIndex.currentDir(spark, path).endsWith("/v2"))
    val after = IvfIndex.search(spark, path,
      corpus.where(col("vec_id") < 3), k = 2, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("vec_id"))).toSet
    assert(after === before)
  }
}

/** The battery under the single-host primitive: POSIX hard link. */
class IvfGenerationSpec extends IvfGenerationBattery {
  override protected def primitive = CommitPrimitive.LocalLink
}

/** The SAME battery under the lake-filesystem primitive: Hadoop
  * `FileSystem.rename` without overwrite. */
class IvfGenerationHadoopCommitSpec extends IvfGenerationBattery {
  override protected def primitive = CommitPrimitive.HadoopRename
}
