package graft

import java.nio.file.Files

/** CROSS-PROCESS contention on one shared local root — the r13
  * verdict's directive #8. The in-JVM CommitPrimitiveSpec races
  * threads; this spec forks two real JVMs ([[CommitRaceMain]]) so the
  * arbitration crosses a process boundary, where a JVM monitor is
  * worthless:
  *
  *  - LocalLink was always safe (link(2) is the kernel's CAS);
  *  - HadoopRename's local-`file:` emulation had a documented gap —
  *    two PROCESSES could both pass the exists check and rename(2)
  *    overwrites — now closed by an OS-level advisory flock scoped to
  *    the local emulation (HDFS never takes that branch; its namenode
  *    arbitrates).
  *
  * Contract, identical under BOTH primitives: every generation is
  * claimed exactly once, the two processes' winner sets are disjoint
  * and exhaustive, and each claim file's content names the process
  * that reported winning it (an overwrite would leave a file whose
  * content contradicts the reported winner). */
class CommitCrossProcessSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def run(prim: String): Unit = {
    val root = Files.createTempDirectory(s"xproc-$prim").toString
    val nGens = 200
    val cp = System.getProperty("java.class.path")
    def launch(id: String): Process =
      new ProcessBuilder("java", "-cp", cp, "graft.CommitRaceMain",
        root, prim, id, nGens.toString)
        .redirectErrorStream(true).start()
    val a = launch("A")
    val b = launch("B")
    def harvest(p: Process): Set[Int] = {
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(p.waitFor() == 0, s"child failed:\n$out")
      val line = out.linesIterator.find(_.startsWith("WON:"))
        .getOrElse(fail(s"no WON line in:\n$out"))
      line.stripPrefix("WON:").split(",").filter(_.nonEmpty)
        .map(_.toInt).toSet
    }
    val wonA = harvest(a)
    val wonB = harvest(b)
    assert((wonA & wonB).isEmpty,
      s"both processes won ${(wonA & wonB).toSeq.sorted} — lost arbitration")
    assert((wonA | wonB) == (1 to nGens).toSet,
      "every generation must be claimed by someone")
    (1 to nGens).foreach { n =>
      val content = Files.readString(
        new java.io.File(root, s"gen-$n").toPath).trim
      val expect = if (wonA(n)) "A" else "B"
      assert(content == expect,
        s"gen-$n content '$content' contradicts reported winner $expect")
    }
    // no orphaned tmp files from losers
    val tmps = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith(".tmp-"))
    assert(tmps.isEmpty, s"loser tmp files not cleaned: ${tmps.toSeq}")
  }

  test("two PROCESSES racing one local root: exactly one owner per generation (link)") {
    run("link")
  }

  test("two PROCESSES racing one local root: exactly one owner per generation (hadoop-rename)") {
    run("hadoop-rename")
  }
}
