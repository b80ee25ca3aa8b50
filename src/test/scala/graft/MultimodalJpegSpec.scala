package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** JPEG decode + recompressed-copy near-dup recovery: 7.jpg is a lossy
  * baseline-JPEG re-encode of 6.png's pixels (different codec,
  * different bytes, quantized-DCT loss). Exact content-hash dedup can
  * never collapse that pair; the perceptual pipeline must.
  */
class MultimodalJpegSpec extends SparkSuite {

  private def mediaRow(path: String, id: Long): Multimodal.MediaRow = {
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    Multimodal.MediaRow(id, path.split('.').last, b)
  }

  private lazy val png6 = mediaRow("/root/repo/fixtures/media/6.png", 6L)
  private lazy val jpg7 = mediaRow("/root/repo/fixtures/media2/7.jpg", 7L)
  private lazy val jpg8 = mediaRow("/root/repo/fixtures/media2/8.jpg", 8L)

  private def ds(rows: Multimodal.MediaRow*) = {
    implicit val enc = Encoders.product[Multimodal.MediaRow]
    spark.createDataset(rows)
  }

  test("JPEG meta decodes from the SOF marker by pure byte parsing") {
    val m7 = Multimodal.decodeMeta(jpg7)
    assert((m7.kind, m7.width, m7.height, m7.channels, m7.bits_per_sample) ===
      (("jpeg", 12, 7, 1, 8)))
    val m8 = Multimodal.decodeMeta(jpg8)
    assert((m8.kind, m8.width, m8.height, m8.channels) === (("jpeg", 24, 16, 1)))
  }

  test("recompressed JPEG copy recovers as a perceptual near-dup; exact dedup cannot see it") {
    val hashes = Multimodal.perceptualHashes(ds(png6, jpg7, jpg8)).toDF()
    assert(hashes.count() === 3)
    val pairs = Multimodal.imageNearDups(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // Exactly the (png original, jpeg re-encode) pair, at Hamming 0;
    // the unrelated 8.jpg (Hamming 13 from 6.png per the replica)
    // pairs with neither.
    assert(pairs === Set((6L, 7L, 0)))
    // Exact content-hash dedup sees three distinct payloads — the gap
    // the perceptual path exists to close.
    val exact = Dedup.exactByHash(
      ds(png6, jpg7, jpg8).toDF().select(col("media_id"), col("content")),
      "content", "media_id")
    assert(exact.agg(max(col("group_size"))).head.getLong(0) === 1L)
  }

  test("JPEG embeddings are format-consistent with the decoded sample stream") {
    val emb = Multimodal.extractEmbeddings(ds(jpg7, jpg8), dim = 8, batchSize = 1)
      .collect().map(e => e.media_id -> e).toMap
    assert(emb(7L).n_values === 84)  // 12x7 grayscale
    assert(emb(8L).n_values === 384) // 24x16 grayscale
    assert(emb(7L).kind === "jpeg" && emb(8L).kind === "jpeg")
    // First pinned dimension from the independent replica.
    assert(math.abs(emb(7L).embedding(0) - 9.9167) < 5e-4)
    assert(math.abs(emb(8L).embedding(0) - (-3.0651)) < 5e-4)
  }

  test("corrupt JPEG payloads degrade to empty values, never throw") {
    // Truncated before any SOF: unknown container.
    val trunc = Multimodal.MediaRow(90L, "jpg", jpg7.content.take(10))
    assert(Multimodal.decodeMeta(trunc).kind === "unknown")
    // Valid headers, garbage entropy data: meta parses, payload decode
    // returns empty (ImageIO failure is caught), stats row keeps
    // n_values = 0.
    val garbled = jpg7.content.clone()
    (garbled.length - 30 until garbled.length - 2).foreach(i => garbled(i) = 0x11)
    val bad = Multimodal.MediaRow(91L, "jpg", garbled)
    assert(Multimodal.decodeMeta(bad).kind === "jpeg")
    val stats = Multimodal.extractStats(ds(bad)).collect()
    assert(stats.length === 1)
    // Either the decoder rejects it (0 values) or decodes a garbage
    // image of the declared geometry — it must not throw either way.
    assert(stats.head.n_values === 0 || stats.head.n_values === 84)
  }
}
