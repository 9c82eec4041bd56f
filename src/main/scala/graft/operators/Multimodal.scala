package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media is an
  * opaque `binary` column with typed metadata; decode / feature-extract
  * / frame-sample run as partition-local batch transforms.
  *
  * Two decoders ride the same per-partition seam: [[PngDecoder]] is a
  * REAL image decode (javax.imageio, in the JDK — PNG bytes to pixel
  * statistics, DuckDB-oracled via closed-form pixel values), and
  * [[StubDecoder]] is the deterministic byte-histogram stand-in for
  * codecs the JDK lacks (audio/video). Everything around them — the
  * schema, the `mapPartitions` batching (decoder initialized once per
  * partition, rows streamed through), the fixed feature width, the
  * partition-count preservation — is the Spark-side contract a
  * production decoder plugs into, mirroring how a Python pipeline would
  * use `mapInPandas` with one model per batch.
  */
object Multimodal {

  case class MediaRow(media_id: Long, bytes: Array[Byte], mime: String,
      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
      features: Array[Float])

  /** ImageIO defaults to a DISK cache file per decode when fed a raw
    * InputStream — at thousands of decodes per partition that is pure
    * temp-file churn; the in-memory cache is correct for our ≤ KB
    * payloads. The flag is PROCESS-GLOBAL JDK state, so the toggle
    * lives here as a lazy val: executed at most once per JVM, however
    * many decoder instances the partitions construct. */
  @transient private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Decoder contract: init is expensive (model load), decode is
    * per-item. Implementations must be deterministic for golden runs or
    * be marked nondeterministic at the call site. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** STUB decode: 8-bin byte histogram, L1-normalized. Deterministic
    * stand-in for a real image/audio decoder (which is `???` in this
    * container). */
  class StubDecoder(bins: Int = 8) extends MediaDecoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Float](bins)
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) * bins / 256) += 1f; i += 1 }
      val n = math.max(1, bytes.length).toFloat
      h.map(_ / n)
    }
  }

  /** REAL JDK decoder (javax.imageio, ships in the JDK — no external
    * codec libs needed): PNG bytes → BufferedImage → per-channel pixel
    * sums. Returns [width, height, sumR, sumG, sumB]; channel sums of an
    * 8×8 image are ≤ 64·255, exact in Float. */
  class PngDecoder extends MediaDecoder {
    imageIoMemCache // once-per-JVM (lazy val), not once per decoder
    def decode(bytes: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      Array(w.toFloat, h.toFloat, sr.toFloat, sg.toFloat, sb.toFloat)
    }
  }

  /** Deterministic 8×8 RGB PNG for `id`: every channel is a closed-form
    * function of (id, x, y), so a DuckDB oracle reproduces the DECODED
    * pixel statistics arithmetically, with no codec on the oracle side —
    * a hash match proves the ImageIO encode→decode round-trip carries
    * real pixels through the mapPartitions seam (PNG is lossless). */
  def pngBytes(id: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 7 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** PNG media table: one deterministic image per document id,
    * encoded executor-side. */
  def syntheticPngMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, pngBytes(id), "image/png", 8, 8))
  }

  /** REAL JDK audio decoder (javax.sound.sampled, ships in the JDK):
    * WAV bytes → AudioInputStream → PCM frames. Returns
    * [n_frames, sum, min, max] of the unsigned 8-bit samples; the sum
    * of 256 bytes is ≤ 65280, exact in Float. The RIFF/fmt parse is a
    * real codec path — the audio twin of [[PngDecoder]]. */
  class WavDecoder extends MediaDecoder {
    // AudioSystem.getAudioInputStream re-runs a SYNCHRONIZED service-
    // provider scan on EVERY call (JDK13Services.getProviders rebuilds
    // the list each time) — measured NEGATIVE scaling: 100 K decodes
    // take 8.9 s on one thread but 12.8 s on sixteen, and the 100×
    // corpus serialized to 76 s on 32 cores. Loading the SPI readers
    // ONCE here — the expensive-init contract this seam exists for —
    // removes the global lock; the JDK's own WaveFileReader still does
    // the actual RIFF/PCM parse.
    @transient private lazy val readers: List[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) b += it.next()
      b.result()
    }
    // Remember the reader that accepted the last payload and try it
    // first: the SPI order lists AIFF/AU before WAVE, and every miss
    // costs a filled-in UnsupportedAudioFileException per decode.
    @transient private var hit: javax.sound.sampled.spi.AudioFileReader = _
    private def open(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      if (hit != null) {
        try return hit.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      }
      val rs = readers.iterator
      while (rs.hasNext) {
        val r = rs.next()
        try {
          val in = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          hit = r
          return in
        } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "no SPI reader accepts the payload")
    }
    def decode(bytes: Array[Byte]): Array[Float] = {
      val in = open(bytes)
      try {
        val buf = in.readAllBytes()
        var s = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < buf.length) {
          val v = buf(i) & 0xff
          s += v; if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        Array(buf.length.toFloat, s.toFloat, mn.toFloat, mx.toFloat)
      } finally in.close()
    }
  }

  /** Deterministic 256-sample 8-bit mono PCM WAV for `id`: sample t is
    * the closed form (id·7 + t·13) % 256, so the oracle reproduces the
    * DECODED waveform statistics arithmetically — a hash match proves
    * the WAVE encode→parse round-trip carries real samples through the
    * same seam (PCM is lossless). */
  // The WAVE writer SPI, loaded once per JVM: AudioSystem.write scans
  // the provider registry per call (same synchronized re-scan as the
  // reader side — see WavDecoder).
  @transient private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var w: javax.sound.sampled.spi.AudioFileWriter = null
    while (w == null && it.hasNext) {
      val c = it.next()
      if (c.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE)) w = c
    }
    require(w != null, "no WAVE-capable AudioFileWriter on this JVM")
    w
  }

  def wavBytes(id: Long, n: Int = 256): Array[Byte] = {
    val samples = Array.tabulate(n)(t => ((id * 7 + t * 13) % 256).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** WAV media table: one deterministic clip per document id. */
  def syntheticWavMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, wavBytes(id), "audio/wav", 256, 1))
  }

  /** Deterministic multi-frame media: an 8×8 RGB frame sequence in a
    * MULTI-PAGE TIFF (ImageIO reads and writes TIFF since Java 9;
    * lossless RGB, a real container with a page directory) — the
    * video-shaped case: many frames, one payload. Pixel formula adds a
    * frame term to the PNG formula. */
  def tiffBytes(id: Long, frames: Int = 4, w: Int = 8, h: Int = 8): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("tiff").next()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id * 31 + x * 7 + y * 13 + f * 29) % 256).toInt
          val g = ((id * 17 + x * 11 + y * 3 + f * 23) % 256).toInt
          val b = ((id * 7 + x * 5 + y * 19 + f * 41) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    out.close(); writer.dispose()
    bos.toByteArray
  }

  /** REAL frame-sampling decoder: parse the TIFF page directory, read
    * every `every`-th frame (the others are never decoded — exactly
    * how a video sampler skips), sum channels over the sampled frames.
    * Returns [n_frames_total, n_sampled, sumR, sumG, sumB]. */
  class TiffFrameDecoder(every: Int = 2) extends MediaDecoder {
    require(every >= 1, s"frame stride must be >= 1, got $every")
    def decode(bytes: Array[Byte]): Array[Float] = {
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("tiff").next()
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(in)
        val n = reader.getNumImages(true)
        var sampled = 0; var sr = 0L; var sg = 0L; var sb = 0L
        var f = 0
        while (f < n) {
          val img = reader.read(f)
          sampled += 1
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          f += every
        }
        Array(n.toFloat, sampled.toFloat, sr.toFloat, sg.toFloat, sb.toFloat)
      } finally { reader.dispose(); in.close() }
    }
  }

  /** TIFF media table: one deterministic 4-frame clip per document. */
  def syntheticTiffMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, tiffBytes(id), "image/tiff", 8, 8))
  }

  /** REAL image resize: decode (ImageIO), then nearest-neighbor
    * downsample by explicit integer index mapping — source pixel
    * (x·w/tw, y·h/th) — NOT Java2D's rendering pipeline, whose
    * filtering is platform-dependent. Deterministic everywhere, and
    * exactly the access pattern a production thumbnailer ships to
    * executors. Returns [tw, th, sumR, sumG, sumB] of the RESAMPLED
    * image. */
  class PngResizeDecoder(tw: Int = 4, th: Int = 4) extends MediaDecoder {
    imageIoMemCache // see the lazy val
    def decode(bytes: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          val p = img.getRGB(x * w / tw, y * h / th)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      Array(tw.toFloat, th.toFloat, sr.toFloat, sg.toFloat, sb.toFloat)
    }
  }

  /** Synthesize a media table from `documents` (UTF-8 bytes as fake
    * payloads) — exercises the binary-column plumbing end-to-end with
    * deterministic content. */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame =
    graft.Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      lit("text/plain").as("mime"),
      (length(col("text")) % 640).cast("int").as("width"),
      (length(col("text")) % 480).cast("int").as("height"))

  /** Feature extraction: decoder built once per partition, rows
    * streamed — the Flink RichFunction / mapInPandas shape. */
  def extractFeatures(media: Dataset[MediaRow],
      mkDecoder: () => MediaDecoder = () => new StubDecoder()): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = mkDecoder() // once per partition
      it.map(m => MediaFeatures(m.media_id, m.mime, m.bytes.length, dec.decode(m.bytes)))
    }
  }

  /** Inventory entries. The former `mm_feature_stub` rows-only entry is
    * retired: `mm_decode_png` exercises the identical decoder seam
    * with a REAL codec and a full hash oracle (StubDecoder itself stays,
    * spec-covered, as the contract demo for codecs the JDK lacks). */
  val queries: Map[String, Relational.Q] = Map(
    // ── REAL image decode (r7 verdict #4): synthesize deterministic
    // PNGs, decode actual pixels via javax.imageio in the same
    // per-partition decoder seam as the stub, and emit per-channel
    // means. The oracle computes the same statistics from the pixel
    // formula — a hash match certifies the decode path end-to-end. ────
    "mm_decode_png" -> ((s, dir) => {
      import s.implicits._
      val feats = extractFeatures(syntheticPngMedia(s, dir),
        () => new PngDecoder()).toDF()
      // features = [w, h, sumR, sumG, sumB]; n = w·h = 64 (dyadic), so
      // sum/n is exact in double and safe on the 1e-4 rounding grid.
      val n = (element_at(col("features"), 1) *
        element_at(col("features"), 2)).cast("double")
      def mean(i: Int, name: String) = graft.functions.Num.roundp(
        element_at(col("features"), i).cast("double") / n, 4).as(name)
      feats.select(col("media_id"),
        element_at(col("features"), 1).cast("long").as("width"),
        element_at(col("features"), 2).cast("long").as("height"),
        mean(3, "mean_r"), mean(4, "mean_g"), mean(5, "mean_b"))
    }),

    // ── REAL multi-frame container + frame sampling: 4-frame 8×8 RGB
    // multi-page TIFF per doc; the decoder parses the page directory
    // and decodes every 2nd frame only — the video frame-sample access
    // pattern over a real container (frames 0 and 2 of 4). Oracle =
    // the pixel formula averaged over the sampled frames. ─────────────
    "mm_frames_tiff" -> ((s, dir) => {
      val feats = extractFeatures(syntheticTiffMedia(s, dir),
        () => new TiffFrameDecoder(2)).toDF()
      // n sampled pixels = 2 frames · 64 px (dyadic) → exact means.
      val n = (element_at(col("features"), 2) * lit(64.0d)).cast("double")
      def mean(i: Int, name: String) = graft.functions.Num.roundp(
        element_at(col("features"), i).cast("double") / n, 4).as(name)
      feats.select(col("media_id"),
        element_at(col("features"), 1).cast("long").as("n_frames"),
        element_at(col("features"), 2).cast("long").as("n_sampled"),
        mean(3, "mean_r"), mean(4, "mean_g"), mean(5, "mean_b"))
    }),

    // ── REAL audio decode: deterministic 8-bit PCM WAV clips, parsed
    // back through javax.sound.sampled in the same per-partition
    // decoder seam; per-clip waveform stats (frame count, mean level,
    // min/max). The oracle computes the same statistics from the
    // sample formula — the audio twin of mm_decode_png, retiring the
    // "audio is only a stub" limitation. ──────────────────────────────
    "mm_decode_wav" -> ((s, dir) => {
      val feats = extractFeatures(syntheticWavMedia(s, dir),
        () => new WavDecoder()).toDF()
      // features = [n_frames, sum, min, max]; n_frames = 256 (dyadic),
      // so sum/n is exact in double on the 1e-4 grid.
      def f(i: Int) = element_at(col("features"), i).cast("double")
      feats.select(col("media_id"),
        f(1).cast("long").as("n_frames"),
        graft.functions.Num.roundp(f(2) / f(1), 4).as("mean_level"),
        f(3).cast("long").as("min_level"),
        f(4).cast("long").as("max_level"))
    }),

    // ── REAL image resize: decode + integer nearest-neighbor
    // downsample 8×8 → 4×4 in the decoder seam; per-channel means of
    // the thumbnail. The oracle evaluates the pixel formula at the
    // sampled coordinates (x·2, y·2) — the resample is real, the
    // verification arithmetic. Replaces resizeStub as the production
    // path (the stub stays as the opaque-bytes contract demo). ────────
    "mm_resize_png" -> ((s, dir) => {
      val feats = extractFeatures(syntheticPngMedia(s, dir),
        () => new PngResizeDecoder(4, 4)).toDF()
      val n = (element_at(col("features"), 1) *
        element_at(col("features"), 2)).cast("double")
      def mean(i: Int, name: String) = graft.functions.Num.roundp(
        element_at(col("features"), i).cast("double") / n, 4).as(name)
      feats.select(col("media_id"),
        element_at(col("features"), 1).cast("long").as("width"),
        element_at(col("features"), 2).cast("long").as("height"),
        mean(3, "mean_r"), mean(4, "mean_g"), mean(5, "mean_b"))
    }),

    // ── frame-sample profile: every-4th 16-byte chunk of each payload,
    // counted and byte-summed. DuckDB reproduces the slicing on the text
    // the synthetic payload encodes (ASCII ⇒ byte-exact), so unlike the
    // stub decoder this multimodal path IS oracled. ───────────────────
    "mm_chunk_stats" -> ((s, dir) => {
      val chunks = sampleChunks(syntheticMedia(s, dir))
      chunks.select(col("media_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        aggregate(transform(col("chunks"), c => length(c)),
          lit(0), (acc, x) => acc + x).cast("long").as("chunk_bytes"))
    }))

  val oracles: Map[String, String] = Map(
    "mm_frames_tiff" ->
      """WITH px AS (
        |  SELECT doc_id AS media_id, f.f AS f,
        |         CAST(i % 8 AS BIGINT) AS x, CAST(i // 8 AS BIGINT) AS y
        |  FROM documents, (VALUES (0), (2)) f(f), range(64) t(i))
        |SELECT media_id,
        |  CAST(4 AS BIGINT) AS n_frames, CAST(2 AS BIGINT) AS n_sampled,
        |  floor(avg((media_id * 31 + x * 7 + y * 13 + f * 29) % 256) * 10000 + 0.5) / 10000 AS mean_r,
        |  floor(avg((media_id * 17 + x * 11 + y * 3 + f * 23) % 256) * 10000 + 0.5) / 10000 AS mean_g,
        |  floor(avg((media_id * 7 + x * 5 + y * 19 + f * 41) % 256) * 10000 + 0.5) / 10000 AS mean_b
        |FROM px GROUP BY media_id""".stripMargin,

    "mm_resize_png" ->
      """WITH px AS (
        |  SELECT doc_id AS media_id,
        |         CAST((i % 4) * 2 AS BIGINT) AS x, CAST((i // 4) * 2 AS BIGINT) AS y
        |  FROM documents, range(16) t(i))
        |SELECT media_id,
        |  CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  floor(avg((media_id * 31 + x * 7 + y * 13) % 256) * 10000 + 0.5) / 10000 AS mean_r,
        |  floor(avg((media_id * 17 + x * 11 + y * 3) % 256) * 10000 + 0.5) / 10000 AS mean_g,
        |  floor(avg((media_id * 7 + x * 5 + y * 19) % 256) * 10000 + 0.5) / 10000 AS mean_b
        |FROM px GROUP BY media_id""".stripMargin,

    "mm_decode_wav" ->
      """WITH sm AS (
        |  SELECT doc_id AS media_id, (doc_id * 7 + i * 13) % 256 AS v
        |  FROM documents, range(256) t(i))
        |SELECT media_id,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  floor(avg(v) * 10000 + 0.5) / 10000 AS mean_level,
        |  CAST(min(v) AS BIGINT) AS min_level,
        |  CAST(max(v) AS BIGINT) AS max_level
        |FROM sm GROUP BY media_id""".stripMargin,

    "mm_decode_png" ->
      """WITH px AS (
        |  SELECT doc_id AS media_id,
        |         CAST(i % 8 AS BIGINT) AS x, CAST(i // 8 AS BIGINT) AS y
        |  FROM documents, range(64) t(i))
        |SELECT media_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  floor(avg((media_id * 31 + x * 7 + y * 13) % 256) * 10000 + 0.5) / 10000 AS mean_r,
        |  floor(avg((media_id * 17 + x * 11 + y * 3) % 256) * 10000 + 0.5) / 10000 AS mean_g,
        |  floor(avg((media_id * 7 + x * 5 + y * 19) % 256) * 10000 + 0.5) / 10000 AS mean_b
        |FROM px GROUP BY media_id""".stripMargin,

    "mm_chunk_stats" ->
      """WITH m AS (SELECT doc_id AS media_id, text, len(text) AS n FROM documents)
        |SELECT media_id,
        |  greatest(n // 64, 1) AS n_chunks,
        |  CAST(list_sum(list_transform(range(greatest(n // 64, 1)),
        |    i -> length(substr(text, CAST(i * 64 + 1 AS INT), 16)))) AS BIGINT) AS chunk_bytes
        |FROM m""".stripMargin
  )

  /** Frame sampling: every k-th fixed-size chunk of the payload —
    * the video-frame-sample access pattern over opaque bytes, pure
    * expression (no decoder needed). */
  def sampleChunks(media: DataFrame, chunk: Int = 16, every: Int = 4): DataFrame =
    media.select(col("media_id"),
      transform(
        sequence(lit(0), greatest((length(col("bytes")) / (chunk * every)).cast("int") - 1, lit(0))),
        i => substring(col("bytes"), i * (chunk * every) + 1, lit(chunk))).as("chunks"))

  /** Resize stub: downsample the payload to a FIXED target width by
    * strided byte sampling with wrap-around — the image-resize access
    * pattern (fixed output shape regardless of input size) over opaque
    * bytes, pure codegen'd expressions. A real codec-backed resize
    * plugs in behind the same `binary → fixed-width binary` column
    * contract. Inputs must be non-empty (wrap-around indexing). */
  def resizeStub(media: DataFrame, target: Int = 32): DataFrame = {
    val n = greatest(length(col("bytes")), lit(1))
    val stride = greatest((length(col("bytes")) / target), lit(1))
    val parts = (0 until target).map { i =>
      col("bytes").substr((lit(i) * stride) % n + 1, lit(1))
    }
    media.select(col("media_id"), concat(parts: _*).as("resized"))
  }
}
