package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video content as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition inference.
  *
  * All decode layers are REAL pure-JVM parsing: [[decodeMeta]] reads
  * BMP/PNG/RIFF-WAVE headers, and the payload decoders produce a
  * CANONICAL sample stream — images as top-down rows with (R,G,B[,A])
  * per pixel (BMP's bottom-up B,G,R storage is flipped and swapped;
  * PNG decodes through `javax.imageio`, covering a real compressed
  * codec), audio as interleaved PCM. Canonical order is what makes
  * recompression invariance REAL: a pixel-identical PNG re-encode of
  * a BMP yields byte-identical samples, hence identical statistics,
  * identical [[dHash]], and an identical [[extractEmbeddings]]
  * embedding — the property the cross-format near-dup gates pin.
  *
  * Feature extraction ([[extractEmbeddings]]) is a fixed-seed
  * Rademacher random projection of the decoded sample stream — a
  * real, deterministic, oracle-able featurizer (the JL-sketch family
  * production systems use for cheap similarity structure). A heavier
  * model runtime (ONNX/JNI forward pass) would slot into the same
  * batched `mapPartitions` pipeline: models want fixed-size batches,
  * not row-at-a-time calls, and the repartition-before-inference
  * knob is exactly what that swap keeps.
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

  /** Decode one batch's payloads into [[MediaStats]] on real decoded
    * values: BMP pixels walked into canonical order with the 4-byte
    * row padding excluded (uncompressed BI_RGB only — a compressed or
    * truncated payload degrades to empty stats, never throws); PNG
    * through `javax.imageio`; WAV walks to the `data` chunk and reads
    * 8-bit unsigned or 16-bit signed PCM.
    */
  private def decodeStats(batch: Seq[MediaRow]): Seq[MediaStats] =
    batch.map { r =>
      val meta = decodeMeta(r)
      val values: (Int, Array[Double]) = decodeValues(r.content, meta)
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

  /** Dispatch to the payload decoder for `meta.kind`; unknown kinds
    * yield empty values (never throw).
    */
  private def decodeValues(b: Array[Byte], meta: MediaMeta): (Int, Array[Double]) =
    meta.kind match {
      case "bmp" => decodeBmpValues(b, meta)
      case "png" | "jpeg" => decodeImageIoValues(b, meta)
      case "wav" => decodeWavValues(b, meta)
      case _ => (0, Array.empty[Double])
    }

  /** BMP pixel samples in CANONICAL image order — top-down rows,
    * (R,G,B[,A]) per pixel (the file stores bottom-up B,G,R[,A]; a
    * negative header height means rows are already top-down), row
    * padding excluded. Only uncompressed (BI_RGB) 24/32 bpp payloads
    * decode; anything else — or a payload shorter than the geometry
    * promises — returns empty.
    */
  private def decodeBmpValues(b: Array[Byte], meta: MediaMeta): (Int, Array[Double]) = {
    val bpp = meta.bits_per_sample
    if (b.length < 54 || (bpp != 24 && bpp != 32)) return (0, Array.empty)
    val off = le32(b, 10); val comp = le32(b, 30)
    val w = meta.width; val hRaw = meta.height; val h = math.abs(hRaw)
    val ch = bpp / 8
    val stride = ((w * ch + 3) / 4) * 4
    if (comp != 0 || w <= 0 || h <= 0 || off < 0 ||
        off.toLong + stride.toLong * h > b.length) return (ch, Array.empty)
    val out = new Array[Double](w * h * ch)
    var o = 0
    var y = 0
    while (y < h) {
      val row = if (hRaw > 0) h - 1 - y else y
      val base = off + row * stride
      var x = 0
      while (x < w) {
        val p = base + x * ch
        out(o) = java.lang.Byte.toUnsignedInt(b(p + 2)).toDouble // R
        out(o + 1) = java.lang.Byte.toUnsignedInt(b(p + 1)).toDouble // G
        out(o + 2) = java.lang.Byte.toUnsignedInt(b(p)).toDouble // B
        if (ch == 4) out(o + 3) = java.lang.Byte.toUnsignedInt(b(p + 3)).toDouble
        o += ch; x += 1
      }
      y += 1
    }
    (ch, out)
  }

  /** PNG and JPEG pixel samples via `javax.imageio` — the decode paths
    * that exercise REAL compressed codecs (PNG: DEFLATE + scanline
    * filters; JPEG: huffman entropy coding + quantized DCT, the
    * dominant real-crawl image format). Samples are read from the
    * decoded Raster band by band per pixel: band order follows the
    * color model's component order (R,G,B[,A]; gray/gray+alpha for 1–2
    * bands) — already canonical. JPEG decode is pinnable because
    * entropy decode + dequantization are exactly specified and the
    * JDK's IDCT is jpeg-6b's public integer "islow" algorithm — the
    * independent replica (tools/media_replica.py jpeg_pixels)
    * reproduces it integer for integer, verified bit-exact on the
    * fixtures. Undecodable payloads return empty, never throw.
    */
  private def decodeImageIoValues(b: Array[Byte], meta: MediaMeta): (Int, Array[Double]) =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) return (math.max(meta.channels, 0), Array.empty)
      val raster = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      val ch = raster.getNumBands
      val out = new Array[Double](w * h * ch)
      var o = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < ch) { out(o) = raster.getSample(x, y, c).toDouble; o += 1; c += 1 }
          x += 1
        }
        y += 1
      }
      (ch, out)
    } catch { case _: Exception => (math.max(meta.channels, 0), Array.empty) }

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

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) | ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  /** Container-header decoder for the three supported formats: BMP
    * (BITMAPINFOHEADER — width/height le32 at 18/22, bpp le16 at 28),
    * PNG (IHDR — width/height be32 at 16/20, bit depth at 24, color
    * type at 25), and RIFF/WAVE (chunk walk to `fmt `: channels le16
    * +2, sample rate le32 +4, bits le16 +14). Anything else → kind
    * "unknown" with only n_bytes populated. Pure JVM byte parsing;
    * runs inside the same batched mapPartitions plumbing as the
    * payload decoders.
    */
  def decodeMeta(r: MediaRow): MediaMeta = {
    val b = r.content
    if (b.length >= 30 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
      MediaMeta(r.media_id, "bmp", le32(b, 18), le32(b, 22), -1, -1, le16(b, 28), b.length)
    } else if (b.length >= 26 && (b(0) & 0xFF) == 0x89 && b(1) == 'P'.toByte &&
        b(2) == 'N'.toByte && b(3) == 'G'.toByte) {
      // IHDR is mandatory-first: width/height BE32 at 16/20, bit depth
      // at 24, color type at 25 → channel count.
      val channels = b(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => -1
      }
      MediaMeta(r.media_id, "png", be32(b, 16), be32(b, 20), channels, -1,
        b(24).toInt, b.length)
    } else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
        (b(2) & 0xFF) == 0xFF) {
      // JPEG: walk [FF marker][be16 len] segments to the frame header
      // (SOF0–SOF15, excluding DHT C4 / DAC CC / JPG C8). SOF body:
      // precision(1) height(2) width(2) ncomponents(1). Offsets in
      // Long for the same crafted-length safety as the RIFF walk; a
      // malformed stream terminates as "unknown", never throws.
      var o = 2L
      var meta: Option[MediaMeta] = None
      var corrupt = false
      while (meta.isEmpty && !corrupt && o + 4 <= b.length) {
        if ((b(o.toInt) & 0xFF) != 0xFF) corrupt = true
        else {
          val m = b(o.toInt + 1) & 0xFF
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (m == 0xD9 || m == 0xDA) corrupt = true // EOI/SOS before any SOF
          else {
            val len = ((b(o.toInt + 2) & 0xFF) << 8) | (b(o.toInt + 3) & 0xFF)
            if (len < 2) corrupt = true
            else if (isSof && o + 4 + 6 <= b.length) {
              val oi = o.toInt + 4
              val prec = b(oi) & 0xFF
              val hh = ((b(oi + 1) & 0xFF) << 8) | (b(oi + 2) & 0xFF)
              val ww = ((b(oi + 3) & 0xFF) << 8) | (b(oi + 4) & 0xFF)
              val ncomp = b(oi + 5) & 0xFF
              meta = Some(MediaMeta(r.media_id, "jpeg", ww, hh, ncomp, -1, prec, b.length))
            } else o += 2L + len
          }
        }
      }
      meta.getOrElse(MediaMeta(r.media_id, "unknown", -1, -1, -1, -1, -1, b.length))
    } else if (b.length >= 4 && ((b(0) == 'I'.toByte && b(1) == 'D'.toByte &&
        b(2) == '3'.toByte) ||
        ((b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0))) {
      // MP3 (MPEG-1 Layer III): header-metadata ONLY — the fields a
      // crawl pipeline routes/filters on (rate, channels) read from
      // the pure byte structure of the frame headers; payload decode
      // needs a real MDCT codec (none ships in the JVM) and degrades
      // to zero values like any unknown codec. An optional ID3v2 tag
      // (syncsafe size) is skipped; ≥ 2 consecutive structurally
      // valid frames are required before classifying, so a random
      // 0xFF-leading blob stays "unknown".
      val bitratesV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320)
      val ratesV1 = Array(44100, 48000, 32000)
      var o: Long =
        if (b(0) == 'I'.toByte && b.length >= 10)
          10L + (((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
            ((b(8) & 0x7F) << 7) | (b(9) & 0x7F))
        else 0L
      var ch = -1; var rate = -1; var frames = 0; var bad = false
      while (!bad && o + 4 <= b.length) {
        val oi = o.toInt
        val ok = (b(oi) & 0xFF) == 0xFF && (b(oi + 1) & 0xE0) == 0xE0 &&
          ((b(oi + 1) >> 3) & 3) == 3 && ((b(oi + 1) >> 1) & 3) == 1
        if (!ok) bad = true
        else {
          val bi = (b(oi + 2) & 0xFF) >> 4
          val ri = (b(oi + 2) >> 2) & 3
          val pad = (b(oi + 2) >> 1) & 1
          if (bi == 0 || bi == 15 || ri == 3) bad = true
          else {
            ch = if (((b(oi + 3) & 0xFF) >> 6) == 3) 1 else 2
            rate = ratesV1(ri)
            frames += 1
            o += (144L * bitratesV1L3(bi) * 1000L) / rate + pad
          }
        }
      }
      if (frames >= 2)
        MediaMeta(r.media_id, "mp3", -1, -1, ch, rate, -1, b.length)
      else MediaMeta(r.media_id, "unknown", -1, -1, -1, -1, -1, b.length)
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
    * partition/batch shape to [[extractStats]], real decode.
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
    if (meta.kind != "bmp" && meta.kind != "png" && meta.kind != "jpeg") None
    else {
      val (ch, vals) = decodeValues(r.content, meta)
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
      dHash(r).map(hh => MediaHash(r.media_id, decodeMeta(r).kind, hh))
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

  /** One media item's feature vector: the fixed-seed random-projection
    * embedding of its decoded canonical sample stream.
    */
  case class MediaEmbedding(media_id: Long, kind: String, n_values: Int,
                            embedding: Array[Double])

  /** splitmix64 — the standard 64-bit finalizer, the deterministic
    * source of the projection signs (identical integer arithmetic in
    * any language, which is what lets an independent replica pin the
    * embeddings bit-for-bit).
    */
  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Fixed-seed Rademacher random projection of a decoded sample
    * stream: e(j) = Σᵢ v(i)·s(i,j) / n with s(i,j) = ±1 from the sign
    * bit of splitmix64(i·dim + j). This is a REAL featurizer (the
    * Johnson–Lindenstrauss sketch family): inner products between
    * embeddings concentrate around scaled sample-stream inner
    * products, so downstream ANN / SemDeDup machinery can consume
    * these exactly like model embeddings — while staying
    * deterministic, dependency-free, and replica-pinnable. Summation
    * is sequential in i: the double-rounding order is part of the
    * contract.
    */
  def projectionEmbedding(vals: Array[Double], dim: Int): Array[Double] = {
    val e = new Array[Double](dim)
    var i = 0
    while (i < vals.length) {
      val base = i.toLong * dim
      var j = 0
      while (j < dim) {
        val s = if (splitmix64(base + j) >= 0) 1.0 else -1.0
        e(j) += vals(i) * s
        j += 1
      }
      i += 1
    }
    if (vals.nonEmpty) { var j = 0; while (j < dim) { e(j) /= vals.length; j += 1 } }
    e
  }

  /** Batched per-partition feature extraction over a media Dataset —
    * the "forward pass" of the inference pipeline on real decoded
    * values. Undecodable payloads yield no row (a null embedding is
    * poison downstream; absence is filterable). Same batch/partition
    * knobs as the other decode passes.
    */
  def extractEmbeddings(media: Dataset[MediaRow], dim: Int = 8,
                        batchSize: Int = 32,
                        numPartitions: Option[Int] = None): Dataset[MediaEmbedding] = {
    implicit val enc = Encoders.product[MediaEmbedding]
    val sharded = numPartitions.map(media.repartition(_)).getOrElse(media)
    sharded.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      val meta = decodeMeta(r)
      val (_, vals) = decodeValues(r.content, meta)
      if (vals.isEmpty) None
      else Some(MediaEmbedding(r.media_id, meta.kind, vals.length,
        projectionEmbedding(vals, dim)))
    }))
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
