package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media is an
  * opaque `binary` column with typed metadata; decode / feature-extract
  * / frame-sample run as partition-local batch transforms.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[StubDecoder]] produces a deterministic byte-histogram
  * "feature vector". Everything around it — the schema, the
  * `mapPartitions` batching (decoder initialized once per partition,
  * rows streamed through), the fixed feature width, the partition-count
  * preservation — is the real Spark-side contract a production decoder
  * plugs into, mirroring how a Python pipeline would use
  * `mapInPandas` with one model per batch.
  */
object Multimodal {

  case class MediaRow(media_id: Long, bytes: Array[Byte], mime: String,
      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
      features: Array[Float])

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

  /** Inventory entry (rows-only: the stub decoder has no SQL
    * equivalent): binary payloads → per-partition feature extraction →
    * scalar profile per media item. */
  val queries: Map[String, Relational.Q] = Map(
    "mm_feature_stub" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val feats = extractFeatures(syntheticMedia(s, dir).as[MediaRow]).toDF()
      feats.select(col("media_id"), col("mime"), col("n_bytes").cast("long").as("n_bytes"),
        size(col("features")).cast("long").as("n_features"),
        graft.functions.Num.roundp(aggregate(col("features"),
          lit(0.0d), (acc, x) => acc + x.cast("double")), 4).as("feat_l1"))
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
