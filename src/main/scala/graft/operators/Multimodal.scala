package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video content as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition inference.
  *
  * Two decode layers:
  *  - [[decodeMeta]] is REAL: pure-JVM container-header parsing for
  *    BMP (width/height/bpp) and RIFF/WAVE (channels/rate/bits) —
  *    no codec dependency needed.
  *  - [[decodeStub]] stands in for the ML feature-extraction forward
  *    pass (no model runtimes in this environment) with deterministic
  *    byte-derived fakes. Everything around it — the schema, the
  *    partition-level batching (models want fixed-size batches, not
  *    row-at-a-time calls), the executor-side iterator pipeline, and
  *    the repartition-before-inference pattern — is the real 100 TB
  *    shape: swap `decodeStub` for a JNI/ONNX call and nothing else
  *    changes.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])

  /** Extracted features per media item. */
  case class MediaFeatures(media_id: Long, n_bytes: Int, n_spaces: Int,
                           first_byte: Int, batch_size: Int)

  /** STUB decoder: a real implementation would decode the image/audio
    * payload here (e.g. JPEG → pixels → embedding). The fake derives
    * features purely from the bytes so results are deterministic and
    * oracle-checkable. Takes a whole batch, like a model forward pass.
    */
  private def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val nSpaces = r.content.count(_ == ' '.toByte)
      val first = if (r.content.nonEmpty) java.lang.Byte.toUnsignedInt(r.content(0)) else -1
      MediaFeatures(r.media_id, r.content.length, nSpaces, first, batch.size)
    }

  /** Batched per-partition feature extraction. `batchSize` controls the
    * model-call granularity; `numPartitions` (if set) re-shards first so
    * executors see balanced work — the knob that matters when payloads
    * are MB-scale and skewed.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 32,
                      numPartitions: Option[Int] = None): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    val sharded = numPartitions.map(media.repartition(_)).getOrElse(media)
    sharded.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeStub(b))
    }
  }

  /** Decoded container metadata: the image fields are -1 for audio and
    * vice versa; `kind` is "bmp" / "wav" / "unknown".
    */
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       channels: Int, sample_rate: Int, bits_per_sample: Int,
                       n_bytes: Int)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b.slice(o, o + 4), java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL (non-stub) decoder for the two container formats parseable
    * with zero codec dependencies: BMP (BITMAPINFOHEADER — width/height
    * le32 at 18/22, bpp le16 at 28) and RIFF/WAVE (chunk walk to
    * `fmt `: channels le16 +2, sample rate le32 +4, bits le16 +14).
    * Anything else → kind "unknown" with only n_bytes populated. Pure
    * JVM byte parsing; runs inside the same batched mapPartitions
    * plumbing as the model-inference stub.
    */
  def decodeMeta(r: MediaRow): MediaMeta = {
    val b = r.content
    if (b.length >= 30 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
      MediaMeta(r.media_id, "bmp", le32(b, 18), le32(b, 22), -1, -1, le16(b, 28), b.length)
    } else if (b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") {
      // Walk chunks from offset 12: [4-byte id][le32 size][payload].
      // Offsets tracked in Long: a crafted chunk size near Int.MaxValue
      // would overflow an Int offset to negative and index out of
      // bounds; with Long math an oversized or negative size just walks
      // past b.length and terminates as unknown.
      var o = 12L
      var meta: Option[MediaMeta] = None
      var corrupt = false
      while (meta.isEmpty && !corrupt && o + 8 <= b.length) {
        val oi = o.toInt
        val id = tag(b, oi); val size = le32(b, oi + 4)
        if (id == "fmt " && o + 8 + 16 <= b.length)
          meta = Some(MediaMeta(r.media_id, "wav", -1, -1,
            le16(b, oi + 10), le32(b, oi + 12), le16(b, oi + 22), b.length))
        // chunks are word-aligned: odd sizes carry a pad byte
        if (size < 0) corrupt = true
        else o += 8L + size.toLong + (size & 1)
      }
      meta.getOrElse(MediaMeta(r.media_id, "unknown", -1, -1, -1, -1, -1, b.length))
    } else MediaMeta(r.media_id, "unknown", -1, -1, -1, -1, -1, b.length)
  }

  /** Batched metadata decode over a media Dataset — identical
    * partition/batch shape to [[extractFeatures]], real decode.
    */
  def extractMeta(media: Dataset[MediaRow], batchSize: Int = 32,
                  numPartitions: Option[Int] = None): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    val sharded = numPartitions.map(media.repartition(_)).getOrElse(media)
    sharded.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map(decodeMeta))
    }
  }

  /** Frame sampling for "video" payloads: treat the byte stream as
    * fixed-size frames and keep every `stride`-th frame — the plumbing
    * of decode/frame-sample without a codec. Emits (media_id,
    * frame_idx, frame_bytes).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      r.content.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 => (r.media_id, idx, frame)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Lift a text table into the media shape (test/demo helper: content
    * bytes play the role of an undecodable payload).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               mediaType: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("media_id"),
        lit(mediaType).as("media_type"),
        col(textCol).cast("binary").as("content"))
      .as[MediaRow]
  }
}
