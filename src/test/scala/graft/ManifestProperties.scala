package graft

import graft.operators.IncPostings
import org.scalacheck.{Gen, Prop, Properties}

/** Randomized roundtrip of the LSM manifest codec THROUGH the real
  * commit path (commitManifest's atomic link write → manifestOf's
  * parse): any segment/tombstone paths — including quotes,
  * backslashes, newlines, control chars, and non-ASCII — any seqs,
  * any batchId, and any kind-owned meta attachment must come back
  * exactly. Pins the hand-rolled JSON writer's escaping, so a future
  * root path the generator can produce can never corrupt a manifest. */
object ManifestProperties extends Properties("graft.manifest") {

  private val nastyString: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      1 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', '', '/', ' ')
        .map(_.toString),
      // astral char as a PAIRED string: a lone surrogate is not
      // representable in UTF-8 and no filesystem path carries one
      1 -> Gen.oneOf("\uD55C", "\u00E9", "\u20AC", "\uD834\uDD1E")))
  } yield cs.mkString

  private val segGen: Gen[IncPostings.Segment] = for {
    p <- nastyString
    seq <- Gen.chooseNum(1, 1000)
  } yield IncPostings.Segment(p, seq)

  private val manifestGen: Gen[IncPostings.Manifest] = for {
    segs <- Gen.listOf(segGen)
    tombs <- Gen.listOf(segGen)
    batch <- Gen.option(Gen.chooseNum(0L, Long.MaxValue))
    meta <- Gen.option(nastyString)
  } yield IncPostings.Manifest(segs, tombs, batch, meta)

  property("commit → read roundtrips any manifest exactly") =
    Prop.forAll(manifestGen) { m =>
      val root = java.nio.file.Files
        .createTempDirectory("manifest-prop").toFile
      try {
        val gen = IncPostings.commitManifest(root)((_, _) => m)
        IncPostings.manifestOf(root, gen) == m
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
        }
        rm(root)
      }
    }
}
