package graft.operators

/** r14-advice closures on the generation/claim seam:
  *  - claim DISCOVERY is java.io-based — a non-local (URI-scheme) root
  *    would silently hide claims from the scans, so it must fail at
  *    the door instead;
  *  - the IVF CURRENT hint is advisory but must be MONOTONIC through
  *    writePointer: a build finishing out of claim order must not
  *    regress the hint to an older generation. */
class GenerationGuardSpec extends graft.SparkSuite {

  test("a URI-scheme claim root is rejected loudly, never scanned blind") {
    val e = intercept[IllegalArgumentException] {
      Generations.claimNext("s3a://bucket/index", 1)
    }
    assert(e.getMessage.contains("URI scheme"))
    intercept[IllegalArgumentException] {
      Generations.claimed("hdfs://nn:8020/graft/postings")
    }
    intercept[IllegalArgumentException] {
      PostingsIndex.servingDir("s3a://bucket/bm25")
    }
    // even file:// — java.io.File would take the URI LITERALLY and
    // create a `file:` subdirectory (this spec caught exactly that)
    intercept[IllegalArgumentException] {
      Generations.claimNext("file:///tmp/somewhere", 1)
    }
    // a plain local path works
    val dir = java.nio.file.Files.createTempDirectory("gen-guard").toString
    assert(Generations.claimNext(dir, 1) === 1)
  }

  test("the CURRENT hint is monotonic: an out-of-order finisher cannot regress it") {
    val root = java.nio.file.Files.createTempDirectory("ivf-mono").toString
    def hint(): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/CURRENT")),
      java.nio.charset.StandardCharsets.UTF_8).trim
    IvfIndex.writePointer(spark, root, 1)
    assert(hint() === "1")
    IvfIndex.writePointer(spark, root, 3)
    assert(hint() === "3")
    // the slow gen-2 build finishes LAST — r14 behavior regressed the
    // hint to 2 here until the next build; now the swap is skipped
    IvfIndex.writePointer(spark, root, 2)
    assert(hint() === "3", "a lower generation must not regress the hint")
    IvfIndex.writePointer(spark, root, 4)
    assert(hint() === "4")
    // and no temp droppings from the skipped swap (".CURRENT.crc" is
    // the ChecksumFileSystem sibling of the hint itself, not a temp)
    val temps = new java.io.File(root).list()
      .count(n => n.startsWith(".CURRENT-") && n.endsWith(".tmp"))
    assert(temps === 0)
  }
}
