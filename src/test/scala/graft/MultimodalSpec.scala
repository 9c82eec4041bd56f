package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("binary-column plumbing: synthesize → extract features per partition") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, sf001)
      .repartition(4)
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.features.length == 8)) // fixed feature width
    feats.foreach { f =>
      val s = f.features.sum
      assert(math.abs(s - 1.0f) < 1e-3, s"histogram not normalized: $s") // L1-normalized
      assert(f.n_bytes > 0)
    }
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.media_id) == f.features.toSeq))
  }

  test("PNG encode→decode round-trips exact pixels through the decoder seam") {
    // Local round-trip: decoded channel sums equal the generating formula.
    val dec = new Multimodal.PngDecoder()
    for (id <- Seq(0L, 1L, 41L, 499L)) {
      val f = dec.decode(Multimodal.pngBytes(id))
      assert(f(0) == 8f && f(1) == 8f, f.toSeq)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        er += (id * 31 + x * 7 + y * 13) % 256
        eg += (id * 17 + x * 11 + y * 3) % 256
        eb += (id * 7 + x * 5 + y * 19) % 256
      }
      assert(f(2) == er.toFloat && f(3) == eg.toFloat && f(4) == eb.toFloat,
        s"id=$id decoded=${f.toSeq} expected=($er,$eg,$eb)")
    }
    // Distributed: the decoder runs executor-side in the same seam.
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticPngMedia(spark, sf001).repartition(4),
      () => new Multimodal.PngDecoder()).collect()
    assert(feats.length == 500)
    assert(feats.forall(f => f.features.length == 5 && f.features(0) == 8f))
  }

  test("chunk sampling is a pure expression over opaque bytes") {
    val out = Multimodal.sampleChunks(Multimodal.syntheticMedia(spark, sf001))
      .select(col("media_id"), size(col("chunks")).as("n"))
      .collect()
    assert(out.length == 500 && out.forall(_.getAs[Int]("n") >= 1))
  }

  test("resize stub yields a fixed-width binary for every input size") {
    val out = Multimodal.resizeStub(Multimodal.syntheticMedia(spark, sf001), target = 32)
      .select(col("media_id"), length(col("resized")).as("w"), col("resized"))
      .collect()
    assert(out.length == 500)
    assert(out.forall(_.getAs[Int]("w") == 32)) // fixed shape regardless of input
    // deterministic: same input → same bytes
    val again = Multimodal.resizeStub(Multimodal.syntheticMedia(spark, sf001), target = 32)
      .select(col("media_id"), col("resized")).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("resized").toSeq).toMap
    assert(out.forall(r =>
      again(r.getAs[Long]("media_id")) == r.getAs[Array[Byte]]("resized").toSeq))
  }

  test("multi-page TIFF carries 4 real frames; the sampler decodes every 2nd") {
    val bytes = Multimodal.tiffBytes(7L)
    // Real TIFF container: II*\0 or MM\0* magic.
    val magic = bytes.take(4).map(_ & 0xff)
    assert(magic.sameElements(Array(0x49, 0x49, 0x2a, 0x00)) ||
      magic.sameElements(Array(0x4d, 0x4d, 0x00, 0x2a)), magic.toSeq)
    val f = new Multimodal.TiffFrameDecoder(2).decode(bytes)
    assert(f(0) === 4f && f(1) === 2f)
    // Channel sums equal the closed form over frames {0, 2}.
    val expR = (for (fr <- Seq(0, 2); y <- 0 until 8; x <- 0 until 8)
      yield (7L * 31 + x * 7 + y * 13 + fr * 29) % 256).sum
    assert(f(2) === expR.toFloat)
  }

  test("WAV encode→decode round-trips exact PCM samples through the decoder seam") {
    // The bytes are a REAL RIFF/WAVE container, not raw samples…
    val bytes = Multimodal.wavBytes(42L)
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    // …and the decoder recovers exactly the closed-form samples.
    val feats = new Multimodal.WavDecoder().decode(bytes)
    val expected = (0 until 256).map(t => (42L * 7 + t * 13) % 256)
    assert(feats(0) === 256f)
    assert(feats(1) === expected.sum.toFloat)
    assert(feats(2) === expected.min.toFloat)
    assert(feats(3) === expected.max.toFloat)
  }
}
