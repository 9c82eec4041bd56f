package graft

import graft.sources.KafkaWire
import org.scalacheck.{Gen, Prop, Properties}

/** Randomized roundtrip of the message-format-v1 codec battery:
  * arbitrary key/value byte arrays (nulls included, any bytes — not
  * just UTF-8), any record count, any broker-assigned wrapper offset,
  * through each compression path (none / gzip / snappy / lz4) and the
  * plain encoder. Pins three contracts at once:
  *
  *  - CONTENT: keys, values, and null-ness survive encode → (compress
  *    → wrap → decompress) → decode byte-exactly, under CRC32
  *    verification per record;
  *  - OFFSETS: the v1 wrapper convention (wrapper offset = absolute of
  *    the LAST inner message, inner offsets relative 0..n-1)
  *    reconstructs contiguous absolutes ending at the wrapper offset,
  *    for any assigned offset;
  *  - TRUNCATION: slicing the encoded set at any byte boundary never
  *    throws and never fabricates records — the decoder returns a
  *    prefix of the full decode (the grow-on-truncation recovery's
  *    foundational assumption). */
object WireCodecProperties extends Properties("graft.wirecodec") {

  private val bytesGen: Gen[Array[Byte]] = Gen.frequency(
    1 -> Gen.const(null.asInstanceOf[Array[Byte]]),
    1 -> Gen.const(Array.emptyByteArray),
    6 -> Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray)))

  private val recordsGen: Gen[List[(Array[Byte], Array[Byte])]] = for {
    n <- Gen.chooseNum(1, 20)
    recs <- Gen.listOfN(n, Gen.zip(bytesGen, bytesGen))
  } yield recs

  private def sameBytes(a: Array[Byte], b: Array[Byte]): Boolean =
    (a == null && b == null) ||
      (a != null && b != null && java.util.Arrays.equals(a, b))

  private val codecs = Seq(KafkaWire.Codec.Gzip, KafkaWire.Codec.Snappy,
    KafkaWire.Codec.Lz4)

  property("compressed wrapper roundtrip: content, nulls, and absolute offsets") =
    Prop.forAll(recordsGen, Gen.chooseNum(0L, Long.MaxValue / 2),
        Gen.oneOf(codecs)) { (recs, lastOffset, codec) =>
      val ts = 12345L
      val set = KafkaWire.encodeMessageSetCompressed(recs, ts, codec)
      // the broker assigns the wrapper's offset to the LAST inner
      // message: patch the first 8 bytes the way a broker serves it
      val wrapperOffset = lastOffset
      var i = 0
      while (i < 8) { set(i) = (wrapperOffset >> (56 - 8 * i)).toByte; i += 1 }
      val out = KafkaWire.decodeMessageSet(set)
      val offsetsOk = out.map(_.offset) ==
        ((wrapperOffset - recs.length + 1) to wrapperOffset)
      val contentOk = out.length == recs.length && out.zip(recs).forall {
        case (r, (k, v)) => sameBytes(r.key, k) && sameBytes(r.value, v)
      }
      offsetsOk && contentOk && out.forall(_.timestamp == ts)
    }

  property("plain set roundtrip with explicit absolute offsets") =
    Prop.forAll(recordsGen, Gen.chooseNum(0L, Long.MaxValue / 2)) {
      (recs, base) =>
        val stored = recs.zipWithIndex.map { case ((k, v), i) =>
          KafkaWire.Record(base + i, 7L, k, v)
        }
        val out = KafkaWire.decodeMessageSet(
          KafkaWire.encodeMessageSetAt(stored))
        out.length == recs.length && out.zip(stored).forall { case (a, b) =>
          a.offset == b.offset && sameBytes(a.key, b.key) &&
            sameBytes(a.value, b.value)
        }
    }

  property("truncation at any byte yields a clean prefix, never garbage") =
    Prop.forAll(recordsGen) { recs =>
      val set = KafkaWire.encodeMessageSet(recs, 3L)
      val full = KafkaWire.decodeMessageSet(set)
      Prop.forAll(Gen.chooseNum(0, set.length)) { cut =>
        val sliced = java.util.Arrays.copyOf(set, cut)
        val out = KafkaWire.decodeMessageSet(sliced)
        // a prefix of the full decode — record for record
        out.length <= full.length && out.zip(full).forall { case (a, b) =>
          a.offset == b.offset && sameBytes(a.key, b.key) &&
            sameBytes(a.value, b.value)
        }
      }
    }
}
