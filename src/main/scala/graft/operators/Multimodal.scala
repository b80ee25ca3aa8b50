package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video content as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition inference.
  *
  * Both decode layers are REAL pure-JVM container parsing (no codec
  * dependency): [[decodeMeta]] reads BMP/RIFF-WAVE headers, and
  * [[decodeStats]] decodes the PAYLOAD — pixel channel bytes (BMP,
  * padding excluded, 24/32 bpp) and PCM samples (WAV, 8-bit unsigned /
  * 16-bit signed) — into per-channel means and global min/max/RMS.
  * The one thing still standing in for an ML runtime is the feature
  * SEMANTICS: a production pipeline would push the same decoded
  * batches through a JNI/ONNX forward pass for embeddings; the
  * batching (models want fixed-size batches, not row-at-a-time
  * calls), the executor-side iterator pipeline, and the
  * repartition-before-inference pattern are exactly what that swap
  * keeps.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])

  /** Decoded-payload statistics per media item: `n_values` scalar
    * values (pixel channel bytes / PCM samples) with per-channel means
    * (None where the container has fewer channels) and global
    * min/max/RMS. Undecodable payloads keep `n_values = 0` and None
    * stats. `batch_size` reports the inference-batch the row rode in —
    * the plumbing diagnostic that proves batching happened
    * executor-side.
    */
  case class MediaStats(media_id: Long, kind: String, n_channels: Int, n_values: Int,
                        mean_c0: Option[Double], mean_c1: Option[Double],
                        mean_c2: Option[Double], v_min: Option[Double],
                        v_max: Option[Double], rms: Option[Double], batch_size: Int)

  /** Decode one batch's payloads into [[MediaStats]] — the "forward
    * pass" of the batched inference pipeline, on real decoded values:
    * BMP pixels are walked row-by-row with the 4-byte row padding
    * excluded (uncompressed BI_RGB only — a compressed or truncated
    * payload degrades to empty stats, never throws); WAV walks to the
    * `data` chunk and reads 8-bit unsigned or 16-bit signed PCM.
    */
  private def decodeStats(batch: Seq[MediaRow]): Seq[MediaStats] =
    batch.map { r =>
      val meta = decodeMeta(r)
      val values: (Int, Array[Double]) = meta.kind match {
        case "bmp" => decodeBmpValues(r.content, meta)
        case "wav" => decodeWavValues(r.content, meta)
        case _ => (0, Array.empty[Double])
      }
      val (nCh, vals) = values
      if (vals.isEmpty)
        MediaStats(r.media_id, meta.kind, nCh, 0, None, None, None, None, None, None,
          batch.size)
      else {
        val chSum = new Array[Double](nCh)
        val chN = new Array[Long](nCh)
        var mn = Double.MaxValue; var mx = Double.MinValue; var sq = 0.0
        var i = 0
        while (i < vals.length) {
          val v = vals(i)
          chSum(i % nCh) += v; chN(i % nCh) += 1
          if (v < mn) mn = v
          if (v > mx) mx = v
          sq += v * v
          i += 1
        }
        def meanOf(c: Int): Option[Double] =
          if (c < nCh && chN(c) > 0) Some(chSum(c) / chN(c)) else None
        MediaStats(r.media_id, meta.kind, nCh, vals.length,
          meanOf(0), meanOf(1), meanOf(2), Some(mn), Some(mx),
          Some(math.sqrt(sq / vals.length)), batch.size)
      }
    }

  /** BMP pixel channel bytes in storage order (B,G,R[,A] per pixel),
    * row padding excluded. Only uncompressed (BI_RGB) 24/32 bpp
    * payloads decode; anything else — or a payload shorter than the
    * geometry promises — returns empty.
    */
  private def decodeBmpValues(b: Array[Byte], meta: MediaMeta): (Int, Array[Double]) = {
    val bpp = meta.bits_per_sample
    if (b.length < 54 || (bpp != 24 && bpp != 32)) return (0, Array.empty)
    val off = le32(b, 10); val comp = le32(b, 30)
    val w = meta.width; val h = math.abs(meta.height)
    val ch = bpp / 8
    val stride = ((w * ch + 3) / 4) * 4
    if (comp != 0 || w <= 0 || h <= 0 || off < 0 ||
        off.toLong + stride.toLong * h > b.length) return (ch, Array.empty)
    val out = new Array[Double](w * h * ch)
    var o = 0
    var row = 0
    while (row < h) {
      val base = off + row * stride
      var i = 0
      while (i < w * ch) {
        out(o) = java.lang.Byte.toUnsignedInt(b(base + i)).toDouble
        o += 1; i += 1
      }
      row += 1
    }
    (ch, out)
  }

  /** WAV PCM samples, channel-interleaved as stored: 8-bit PCM is
    * unsigned (0..255), 16-bit is signed little-endian — per the RIFF
    * spec. The data chunk is clamped to the physical payload and
    * truncated to a whole sample, so a lying chunk size cannot read
    * out of bounds. Other bit depths return empty stats.
    */
  private def decodeWavValues(b: Array[Byte], meta: MediaMeta): (Int, Array[Double]) = {
    val bits = meta.bits_per_sample
    if (bits != 8 && bits != 16) return (math.max(meta.channels, 0), Array.empty)
    // Chunk walk (same Long-offset discipline as decodeMeta) to `data`.
    var o = 12L
    var dataOff = -1L; var dataLen = 0L
    while (dataOff < 0 && o + 8 <= b.length) {
      val oi = o.toInt
      val id = tag(b, oi); val size = le32(b, oi + 4)
      if (size < 0) return (meta.channels, Array.empty)
      if (id == "data") { dataOff = o + 8; dataLen = math.min(size.toLong, b.length - o - 8) }
      o += 8L + size.toLong + (size & 1)
    }
    if (dataOff < 0) return (meta.channels, Array.empty)
    val bytesPer = bits / 8
    val n = (dataLen / bytesPer).toInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = (dataOff + i.toLong * bytesPer).toInt
      out(i) =
        if (bits == 8) java.lang.Byte.toUnsignedInt(b(p)).toDouble
        else (le16(b, p).toShort).toDouble
      i += 1
    }
    (meta.channels, out)
  }

  /** Batched per-partition payload-stats extraction. `batchSize`
    * controls the model-call granularity; `numPartitions` (if set)
    * re-shards first so executors see balanced work — the knob that
    * matters when payloads are MB-scale and skewed.
    */
  def extractStats(media: Dataset[MediaRow], batchSize: Int = 32,
                   numPartitions: Option[Int] = None): Dataset[MediaStats] = {
    implicit val enc = Encoders.product[MediaStats]
    val sharded = numPartitions.map(media.repartition(_)).getOrElse(media)
    sharded.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeStats(b))
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

  /** Per-image perceptual hash row. */
  case class MediaHash(media_id: Long, kind: String, dhash: Long)

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * cheap perceptual fingerprint: a 9×8 grayscale grid (channel
    * average, point-sampled at cell centers — valid at ANY image size,
    * where block averaging leaves empty cells below 9×8), bit(i,j) set
    * iff grid(i,j) < grid(i,j+1). Identical images hash identically;
    * small pixel edits flip only the comparisons they cross, so
    * near-copies land within a small Hamming distance — the property
    * [[imageNearDups]] banding exploits. None for non-images or
    * undecodable payloads. (A production variant samples from a
    * smoothed downscale for stronger re-encode robustness; the grid
    * shape and bit layout are the standard ones.)
    */
  def dHash(r: MediaRow): Option[Long] = {
    val meta = decodeMeta(r)
    if (meta.kind != "bmp") None
    else {
      val (ch, vals) = decodeBmpValues(r.content, meta)
      val w = meta.width; val h = math.abs(meta.height)
      if (ch <= 0 || vals.isEmpty || w <= 0 || h <= 0) None
      else {
        def gray(x: Int, y: Int): Double = {
          var s = 0.0; var c = 0
          while (c < ch) { s += vals(((y * w) + x) * ch + c); c += 1 }
          s / ch
        }
        def g2(i: Int, j: Int): Double =
          gray(((2 * j + 1) * w) / 18, ((2 * i + 1) * h) / 16)
        var bits = 0L
        var i = 0
        while (i < 8) {
          var j = 0
          while (j < 8) {
            if (g2(i, j) < g2(i, j + 1)) bits |= 1L << (i * 8 + j)
            j += 1
          }
          i += 1
        }
        Some(bits)
      }
    }
  }

  /** Perceptual hashes for every decodable image in `media` (batched
    * per-partition like the other decode passes; non-images yield no
    * row). Output feeds [[imageNearDups]] — or a warehouse table, the
    * 8-bytes-per-image index a billion-image dedup actually stores.
    */
  def perceptualHashes(media: Dataset[MediaRow], batchSize: Int = 32): Dataset[MediaHash] = {
    implicit val enc = Encoders.product[MediaHash]
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      dHash(r).map(hh => MediaHash(r.media_id, "bmp", hh))
    }))
  }

  /** Perceptual image near-dup pairs: the SAME 4×16-bit pigeonhole
    * banding + exact Hamming verify as the text SimHash path
    * ([[NearDup.fingerprintNearDups]]) over the dHash column — one
    * candidate machinery for every 64-bit fingerprint family. The join
    * carries (chunk, 16 bits, id); pixels never shuffle.
    */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    NearDup.fingerprintNearDups(hashes, "media_id", "dhash", maxHamming)

  /** 64-bit audio energy-delta fingerprint over the decoded PCM — the
    * audio analogue of [[dHash]] (chromaprint-lite): channels mixed to
    * mono, the frame stream split into 65 equal windows, window energy
    * = sum of squares, bit t set iff e(t) < e(t+1). Identical audio
    * fingerprints identically; a localized sample edit perturbs only
    * the windows it touches. None for non-audio, undecodable payloads,
    * or clips shorter than 65 frames (too short for the window grid).
    * Window bounds use Long arithmetic — t·n_frames overflows Int on
    * hour-scale 44.1 kHz audio.
    */
  def audioFingerprint(r: MediaRow): Option[Long] = {
    val meta = decodeMeta(r)
    if (meta.kind != "wav") None
    else {
      val (ch, vals) = decodeWavValues(r.content, meta)
      val nf = if (ch > 0) vals.length / ch else 0
      if (ch <= 0 || nf < 65) None
      else {
        val mono = new Array[Double](nf)
        var f = 0
        while (f < nf) {
          var s = 0.0; var c = 0
          while (c < ch) { s += vals(f * ch + c); c += 1 }
          mono(f) = s / ch
          f += 1
        }
        def energy(t: Int): Double = {
          val lo = ((t.toLong * nf) / 65).toInt
          val hi = (((t + 1).toLong * nf) / 65).toInt
          var s = 0.0; var i = lo
          while (i < hi) { s += mono(i) * mono(i); i += 1 }
          s
        }
        val e = Array.tabulate(65)(energy)
        var bits = 0L
        var t = 0
        while (t < 64) { if (e(t) < e(t + 1)) bits |= 1L << t; t += 1 }
        Some(bits)
      }
    }
  }

  /** Audio fingerprints for every decodable clip (batched like the
    * other decode passes); pairs via [[NearDup.fingerprintNearDups]]
    * — same banding, PCM never shuffles.
    */
  def audioFingerprints(media: Dataset[MediaRow], batchSize: Int = 32): Dataset[MediaHash] = {
    implicit val enc = Encoders.product[MediaHash]
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      audioFingerprint(r).map(hh => MediaHash(r.media_id, "wav", hh))
    }))
  }

  def audioNearDups(fps: DataFrame, maxHamming: Int = 3): DataFrame =
    NearDup.fingerprintNearDups(fps, "media_id", "dhash", maxHamming)

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
