package graft.operators

/** The atomic claim behind the LSM's optimistic-concurrency commit
  * ([[IncPostings.commitManifest]]): publish a fully-written manifest
  * file at the generation path, failing if the generation is already
  * claimed. Exactly one writer can win each generation; a loser sees
  * [[java.nio.file.FileAlreadyExistsException]] and rebases.
  *
  * Two implementations, one per filesystem reality:
  *
  *  - [[CommitPrimitive.LocalLink]] — POSIX `link(2)` via
  *    `Files.createLink`, atomic create-fails-if-exists on every local
  *    filesystem. The right primitive for single-host roots (tests,
  *    spill-local indexes).
  *  - [[CommitPrimitive.HadoopRename]] — `FileSystem.rename` WITHOUT
  *    overwrite through the Hadoop API, the primitive a 100 TB lake
  *    actually offers: HDFS has no hard links, but its namenode
  *    arbitrates rename atomically and fails the call when the
  *    destination exists (the mechanism Iceberg's HadoopTableOperations
  *    commits through). Local `file:` FileSystems (RawLocal/Checksum)
  *    emulate rename with POSIX `rename(2)`, which OVERWRITES — there
  *    the exists+rename window is closed by a JVM-wide lock standing in
  *    for the namenode's arbitration, so the in-sandbox spec battery
  *    exercises the real code path with real semantics. Multi-process
  *    writers on a shared LOCAL root should use LocalLink; on HDFS the
  *    rename itself is the arbiter and the lock is redundant.
  *
  * Selection: [[CommitPrimitive.active]], defaulting to the
  * `graft.lsm.commit` system property (`link` | `hadoop-rename`) and
  * then to LocalLink. Commit paths run on the driver, so a
  * process-wide setting is the deployment-level knob it should be.
  */
private[graft] sealed trait CommitPrimitive {
  /** Atomically publish `tmp` as `target`; throws
    * [[java.nio.file.FileAlreadyExistsException]] if `target` exists.
    * Consumes `tmp` on success; leaves it for the caller's cleanup on
    * failure. */
  def claim(tmp: java.io.File, target: java.io.File): Unit
  def name: String
}

private[graft] object CommitPrimitive {

  case object LocalLink extends CommitPrimitive {
    override val name = "link"
    override def claim(tmp: java.io.File, target: java.io.File): Unit = {
      java.nio.file.Files.createLink(target.toPath, tmp.toPath)
      tmp.delete()
    }
  }

  case object HadoopRename extends CommitPrimitive {
    override val name = "hadoop-rename"

    /** Stand-in for the namenode's atomic arbitration when the
      * FileSystem is a local emulation whose rename(2) overwrites.
      * Scoped to `file:`-scheme filesystems only. Serializes THREADS;
      * the OS file lock below serializes PROCESSES (r14 — previously
      * two processes sharing a local root could both win the
      * exists+rename window, a documented-but-unenforced gap). */
    private val localArbiter = new Object

    // one Configuration for the primitive's lifetime: construction
    // parses the default XML resources, and a contended commit loop
    // calls claim() per retry
    private lazy val conf = new org.apache.hadoop.conf.Configuration()

    override def claim(tmp: java.io.File, target: java.io.File): Unit = {
      val dst = new org.apache.hadoop.fs.Path(target.getAbsolutePath)
      val src = new org.apache.hadoop.fs.Path(tmp.getAbsolutePath)
      val fs = dst.getFileSystem(conf)
      val isLocalEmulation = fs.getScheme == "file"

      def attempt(): Unit = {
        // HDFS rename is atomic and fails when dst exists; the exists
        // pre-check is for the local emulation (under the arbiter) and
        // a fast-path loser exit everywhere else.
        if (fs.exists(dst))
          throw new java.nio.file.FileAlreadyExistsException(target.toString)
        if (!fs.rename(src, dst)) {
          // HDFS reports a lost race as `false`; anything else (absent
          // source, dead parent dir) surfaces as NoSuchFile for the
          // caller's swept-gen-dir retry arm.
          if (fs.exists(dst))
            throw new java.nio.file.FileAlreadyExistsException(target.toString)
          throw new java.nio.file.NoSuchFileException(
            s"rename $src -> $dst failed")
        }
      }

      if (isLocalEmulation) localArbiter.synchronized {
        // OS-level arbitration across PROCESSES: rename(2) overwrites,
        // so without this two JVMs on one local root can both pass the
        // exists check and both "win" the generation. A root-scoped
        // advisory flock closes the window; the JVM monitor above
        // prevents the same-process OverlappingFileLockException. HDFS
        // never takes this branch — its namenode is the arbiter.
        val lockFile = new java.io.File(target.getParentFile,
          ".graft-commit-lock")
        Option(lockFile.getParentFile).foreach(_.mkdirs())
        val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val l = ch.lock()
          try attempt() finally l.release()
        } finally ch.close()
      }
      else attempt()
    }
  }

  def forName(n: String): CommitPrimitive = n match {
    case "link" => LocalLink
    case "hadoop-rename" => HadoopRename
    case other => sys.error(s"unknown commit primitive '$other' " +
      "(expected link | hadoop-rename)")
  }

  @volatile private var current: CommitPrimitive =
    forName(sys.props.getOrElse("graft.lsm.commit", "link"))

  def active: CommitPrimitive = current
  def set(p: CommitPrimitive): Unit = current = p

  /** Run `body` under `p`, restoring the prior primitive — the spec
    * battery's both-primitives harness. */
  def withPrimitive[A](p: CommitPrimitive)(body: => A): A = {
    val prev = current
    current = p
    try body finally current = prev
  }
}
