package graft

/** Child-process worker for [[CommitCrossProcessSpec]]: race `nGens`
  * generation claims against a shared local root under the named
  * commit primitive, printing the generations THIS process believes it
  * won. The parent asserts the winner sets are disjoint and the claim
  * files' contents agree — the cross-process exists+rename window the
  * r13 verdict flagged as documented-but-unenforced. */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, primName, writerId, nGensS) = args
    val prim = graft.operators.CommitPrimitive.forName(primName)
    val nGens = nGensS.toInt
    val won = scala.collection.mutable.ArrayBuffer.empty[Int]
    (1 to nGens).foreach { n =>
      val tmp = new java.io.File(root, s".tmp-$writerId-$n")
      java.nio.file.Files.write(tmp.toPath,
        writerId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try {
        prim.claim(tmp, new java.io.File(root, s"gen-$n"))
        won += n
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => tmp.delete()
      }
    }
    println("WON:" + won.mkString(","))
  }
}
