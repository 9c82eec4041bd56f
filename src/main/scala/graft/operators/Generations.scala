package graft.operators

/** Generation-number claims over a directory — THE shared commit
  * mechanic of every versioned publisher in this engine (the IVF
  * index's `vN` generations and the BM25 serving folds; the LSM
  * timeline shares the same [[CommitPrimitive]] seam through its
  * manifest links). A writer claims `gen-N` via the active commit
  * primitive (POSIX hard link locally, Hadoop rename-without-overwrite
  * on a lake filesystem): exactly one writer owns each number, racers
  * and crashed predecessors are skipped, and claim files are never
  * pruned — "max claimed = newest" is what hint recovery leans on.
  *
  * SCOPE (r15, loud): claim DISCOVERY — the directory listing here,
  * the claim temp files, and the pointer/hint scans that lean on it
  * (ArtifactCache pointers, PostingsIndex.servingDir, IvfIndex hint
  * recovery) — is java.io-based and therefore LOCAL-filesystem-only.
  * The commit primitive's claim step itself is lake-capable
  * (HadoopRename), but a root on a non-local scheme would make claims
  * invisible to the scans: a fresh builder could re-claim a taken
  * generation or hint recovery could silently miss the newest one.
  * [[requireLocalRoot]] turns that silent hazard into an immediate
  * error; lifting it means routing the listing and temp IO through
  * `Path.getFileSystem` alongside the primitive. */
private[graft] object Generations {

  private val Claim = "gen-([0-9]+)".r

  /** Fail fast on ANY URI-scheme root (s3a://, hdfs://, even
    * file://): discovery below is java.io-based — a lake scheme would
    * silently HIDE claims from the scans, and even a file:// URI is
    * not a File path (java.io.File("file:///x") creates a literal
    * `file:` subdirectory — caught by this guard's own spec). Roots
    * must be plain local paths. */
  def requireLocalRoot(path: String): Unit =
    require(!path.contains("://"),
      s"generation/claim root '$path' carries a URI scheme: claim " +
        "discovery (directory listing, claim temps, hint recovery) is " +
        "java.io-based and needs a PLAIN local path — a lake scheme " +
        "would silently miss claims; a file:// URI would be taken " +
        "literally. Pass the plain path, or extend Generations to list " +
        "through the root's Hadoop FileSystem first")

  /** Generation numbers claimed under `path`. */
  def claimed(path: String): Seq[Int] = {
    requireLocalRoot(path)
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .toSeq.map(_.getName).collect { case Claim(n) => n.toInt }
  }

  /** Claim the next free generation at or above `from`; returns the
    * owned number. */
  def claimNext(path: String, from: Int): Int = {
    requireLocalRoot(path)
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
