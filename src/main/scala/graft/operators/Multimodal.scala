package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video content as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition inference.
  *
  * The decode step is STUBBED (no codec libraries in this
  * environment): `decodeStub` produces deterministic fake features
  * from the raw bytes. Everything around it — the schema, the
  * partition-level batching (models want fixed-size batches, not
  * row-at-a-time calls), the executor-side iterator pipeline, and the
  * repartition-before-inference pattern — is the real 100 TB shape:
  * swap `decodeStub` for a JNI/ONNX call and nothing else changes.
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
