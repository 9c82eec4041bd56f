package graft

import graft.operators.{CommitPrimitive, IncPostings}
import java.nio.file.Files

/** The atomic claim itself, raced at the primitive level — and the
  * commit path's cleanup contract around it. Both implementations
  * (local hard link, Hadoop rename-without-overwrite) must admit
  * EXACTLY ONE winner per target; losers must see
  * FileAlreadyExistsException with their tmp left for cleanup. */
class CommitPrimitiveSpec extends SparkSuite {

  private def freshDir(): java.io.File =
    Files.createTempDirectory("commit-prim").toFile

  private def raceOnce(p: CommitPrimitive, writers: Int): Unit = {
    val dir = freshDir()
    val target = new java.io.File(dir, "MANIFEST.json")
    val start = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val losses = new java.util.concurrent.atomic.AtomicInteger
    val tmps = (1 to writers).map { i =>
      val tmp = new java.io.File(dir, s"MANIFEST-$i.tmp")
      Files.write(tmp.toPath, s"writer-$i".getBytes("UTF-8"))
      tmp
    }
    val threads = tmps.map { tmp =>
      new Thread(() => {
        start.await()
        try { p.claim(tmp, target); wins.incrementAndGet() }
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            losses.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(30000))
    assert(wins.get() === 1, s"${p.name}: exactly one claim must win")
    assert(losses.get() === writers - 1)
    // the published manifest is one loser-free winner's bytes, intact
    val content = new String(Files.readAllBytes(target.toPath), "UTF-8")
    assert(content.matches("writer-\\d+"))
    // the winner's tmp is consumed; every loser's tmp survives for the
    // caller's cleanup arm
    assert(tmps.count(_.exists()) === writers - 1)
  }

  for (p <- Seq(CommitPrimitive.LocalLink, CommitPrimitive.HadoopRename)) {
    test(s"${p.name}: 8 racing claims on one target admit exactly one winner") {
      (1 to 3).foreach(_ => raceOnce(p, 8))
    }

    test(s"${p.name}: claim onto an existing target fails without touching it") {
      val dir = freshDir()
      val target = new java.io.File(dir, "MANIFEST.json")
      Files.write(target.toPath, "committed".getBytes("UTF-8"))
      val tmp = new java.io.File(dir, "MANIFEST-x.tmp")
      Files.write(tmp.toPath, "latecomer".getBytes("UTF-8"))
      intercept[java.nio.file.FileAlreadyExistsException] {
        p.claim(tmp, target)
      }
      assert(new String(Files.readAllBytes(target.toPath), "UTF-8")
        === "committed")
      assert(tmp.exists())
    }
  }

  test("forName round-trips both primitives and rejects unknowns") {
    assert(CommitPrimitive.forName("link") === CommitPrimitive.LocalLink)
    assert(CommitPrimitive.forName("hadoop-rename")
      === CommitPrimitive.HadoopRename)
    intercept[RuntimeException] { CommitPrimitive.forName("s3-magic") }
  }

  // ── r12 advice #4: a conflict thrown by `build` (MetaConflict /
  // ReplaceConflict / CompactConflict) must not leak the tmp manifest
  // or the bare claimed gen dir. ──────────────────────────────────────
  test("an aborted commit leaks neither a tmp manifest nor a bare gen dir") {
    val root = freshDir()
    import spark.implicits._
    IncPostings.commitBase(root,
      graft.operators.TextOps.trigramRowsOf(
        Seq(1L -> "abcd").toDF("doc_id", "text")))
    val boom = new RuntimeException("conflict from build")
    val thrown = intercept[RuntimeException] {
      IncPostings.commitManifest(root)((_, _) => throw boom)
    }
    assert(thrown eq boom)
    // gen-1 intact; gen-2's claim leaves NO tmp and NO manifest (the
    // bare dir itself is left for retention — deleting it could race a
    // concurrent committer sharing the same claim dir)
    val gens = new java.io.File(root, "gens")
    assert(new java.io.File(gens, "gen-00001/MANIFEST.json").exists())
    assert(!new java.io.File(gens, "gen-00002/MANIFEST.json").exists())
    val tmps = Option(gens.listFiles()).getOrElse(Array.empty)
      .flatMap(d => Option(d.list()).getOrElse(Array.empty))
      .filter(_.endsWith(".tmp"))
    assert(tmps.isEmpty)
    // and the root still accepts the next commit at gen-2
    val gen = IncPostings.commitDelta(root,
      graft.operators.TextOps.trigramRowsOf(
        Seq(2L -> "wxyz").toDF("doc_id", "text")),
      Seq.empty[Long].toDF("doc_id"))
    assert(gen === 2)
  }
}
