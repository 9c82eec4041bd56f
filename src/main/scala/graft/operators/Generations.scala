package graft.operators

/** Generation-number claims over a directory — THE shared commit
  * mechanic of every versioned publisher in this engine (the IVF
  * index's `vN` generations and the BM25 serving folds; the LSM
  * timeline shares the same [[CommitPrimitive]] seam through its
  * manifest links). A writer claims `gen-N` via the active commit
  * primitive (POSIX hard link locally, Hadoop rename-without-overwrite
  * on a lake filesystem): exactly one writer owns each number, racers
  * and crashed predecessors are skipped, and claim files are never
  * pruned — "max claimed = newest" is what hint recovery leans on. */
private[graft] object Generations {

  private val Claim = "gen-([0-9]+)".r

  /** Generation numbers claimed under `path`. */
  def claimed(path: String): Seq[Int] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .toSeq.map(_.getName).collect { case Claim(n) => n.toInt }

  /** Claim the next free generation at or above `from`; returns the
    * owned number. */
  def claimNext(path: String, from: Int): Int = {
    val root = new java.io.File(path)
    root.mkdirs()
    var n = from
    var won = false
    while (!won) {
      val tmp = new java.io.File(root,
        s".gen-$n-${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.write(tmp.toPath, Array.emptyByteArray)
      try {
        CommitPrimitive.active.claim(tmp, new java.io.File(root, s"gen-$n"))
        won = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          tmp.delete()
          n += 1
          require(n - from < 10000, s"generation-claim runaway at $path")
      }
    }
    n
  }
}
