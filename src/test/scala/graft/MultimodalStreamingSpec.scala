package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.streaming.StreamingJobs

class MultimodalStreamingSpec extends SparkSuite {
  import spark.implicits._

  test("multimodal featurize: batching respects batchSize within partitions") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("content for item "), col("id")).as("text"))
    val media = Multimodal.fromText(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.extractStats(media.repartition(2), batchSize = 16)
    val rows = feats.collect()
    assert(rows.length === 100)
    // every batch is <= 16; with 50 rows/partition the tail batch is smaller
    assert(rows.map(_.batch_size).max <= 16)
    // text payloads are not decodable media: empty stats, never a throw
    val f = rows.find(_.media_id === 7L).get
    assert(f.kind === "unknown" && f.n_values === 0 && f.mean_c0.isEmpty)
  }

  test("extractStats decodes real pixel/sample statistics from the fixtures") {
    def load(name: String, id: Long): Multimodal.MediaRow =
      Multimodal.MediaRow(id, name.split('.').last, java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/repo/fixtures/media/$name")))
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val media = spark.createDataset(Seq(
      load("1.bmp", 1), load("2.bmp", 2), load("3.wav", 3), load("4.wav", 4)))
    val stats = Multimodal.extractStats(media, batchSize = 2)
      .collect().map(s => s.media_id -> s).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-3
    // 7x5 24bpp BMP: 105 channel bytes, padding excluded (stride 24,
    // row 21) — the padding would drag every stat toward 0 if counted.
    // Canonical decode: channel means are (R, G, B), not BMP's stored
    // B,G,R.
    val bmp1 = stats(1L)
    assert(bmp1.kind === "bmp" && bmp1.n_channels === 3 && bmp1.n_values === 105)
    assert(close(bmp1.mean_c0.get, 127.7714) && close(bmp1.mean_c1.get, 122.6) &&
      close(bmp1.mean_c2.get, 117.4286))
    assert(bmp1.v_min.get === 0.0 && bmp1.v_max.get === 251.0 &&
      close(bmp1.rms.get, 142.875))
    // 16x9 32bpp: alpha channel participates in the global stats
    val bmp2 = stats(2L)
    assert(bmp2.n_channels === 4 && bmp2.n_values === 576 && close(bmp2.mean_c1.get, 129.5))
    // stereo 16-bit PCM: signed samples, channel-interleaved means
    val wav3 = stats(3L)
    assert(wav3.kind === "wav" && wav3.n_channels === 2 && wav3.n_values === 200)
    assert(close(wav3.mean_c0.get, 13.76) && close(wav3.mean_c1.get, -49.37) &&
      wav3.mean_c2.isEmpty)
    assert(wav3.v_min.get === -1000.0 && close(wav3.rms.get, 577.2771))
    // mono 8-bit PCM: unsigned samples
    val wav4 = stats(4L)
    assert(wav4.n_channels === 1 && wav4.n_values === 64 &&
      close(wav4.mean_c0.get, 119.5) && wav4.mean_c1.isEmpty)
  }

  test("decodeMeta parses BMP and WAV headers; garbage is unknown") {
    val bmpBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/1.bmp"))
    val wavBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/3.wav"))
    val bmp = Multimodal.decodeMeta(Multimodal.MediaRow(1L, "bmp", bmpBytes))
    assert(bmp.kind === "bmp" && bmp.width === 7 && bmp.height === 5 &&
      bmp.bits_per_sample === 24)
    val wav = Multimodal.decodeMeta(Multimodal.MediaRow(3L, "wav", wavBytes))
    assert(wav.kind === "wav" && wav.channels === 2 && wav.sample_rate === 44100 &&
      wav.bits_per_sample === 16)
    val junk = Multimodal.decodeMeta(Multimodal.MediaRow(9L, "x", Array[Byte](1, 2, 3)))
    assert(junk.kind === "unknown" && junk.n_bytes === 3)
    // truncated RIFF that never reaches a fmt chunk must not loop/crash
    // (size field is four explicit zero bytes; a raw NUL in the literal
    // would make the whole file binary to git)
    val truncated = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII")
    assert(Multimodal.decodeMeta(Multimodal.MediaRow(10L, "x", truncated)).kind === "unknown")
    // corrupt chunk with a negative le32 size must terminate, not spin
    val corrupt = "RIFF    WAVEjunk".getBytes("US-ASCII") ++
      Array[Byte](-8, -1, -1, -1) ++ new Array[Byte](16)
    assert(Multimodal.decodeMeta(Multimodal.MediaRow(11L, "x", corrupt)).kind === "unknown")
  }

  test("dHash: stable on identical pixels, near on small edits, absent for audio") {
    val bmpBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/1.bmp"))
    val wavBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/3.wav"))
    val h1 = Multimodal.dHash(Multimodal.MediaRow(1L, "bmp", bmpBytes))
    assert(h1.isDefined)
    // Same bytes, different id/type: identical hash.
    assert(Multimodal.dHash(Multimodal.MediaRow(99L, "x", bmpBytes)) === h1)
    // One-byte pixel edit: small nonzero Hamming distance (value
    // cross-checked against the independent Python replica: 2).
    val edited = bmpBytes.clone()
    val off = java.nio.ByteBuffer.wrap(edited, 10, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    edited(off) = math.min(255, java.lang.Byte.toUnsignedInt(edited(off)) + 200).toByte
    val h2 = Multimodal.dHash(Multimodal.MediaRow(1L, "bmp", edited))
    assert(h2.isDefined && h2 != h1)
    assert(java.lang.Long.bitCount(h1.get ^ h2.get) === 2)
    // Audio and garbage have no perceptual hash.
    assert(Multimodal.dHash(Multimodal.MediaRow(3L, "wav", wavBytes)).isEmpty)
    assert(Multimodal.dHash(Multimodal.MediaRow(9L, "x", Array[Byte](1, 2, 3))).isEmpty)
  }

  test("recompressed copies: PNG re-encode recovers as a perceptual near-dup of its BMP") {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[Multimodal.MediaRow]
    def load(name: String, id: Long): Multimodal.MediaRow =
      Multimodal.MediaRow(id, name.split('.').last, java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/repo/fixtures/media/$name")))
    val media = Seq(load("1.bmp", 1), load("2.bmp", 2),
      load("5.png", 5), load("6.png", 6)).toDS()
    // 5.png carries 1.bmp's pixels through a REAL compressed codec
    // (different bytes, different container): canonical decode makes
    // the hashes identical, so the banded join recovers exactly the
    // cross-format pair at Hamming 0 — the duplicate sha256 dedup can
    // never see. The unrelated images pair with nothing.
    val pairs = Multimodal.imageNearDups(
        Multimodal.perceptualHashes(media).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 5L, 0)))
    // Full feature invariance too: identical embedding, every
    // dimension, exact doubles — decode order is part of the contract.
    val emb = Multimodal.extractEmbeddings(media).collect()
      .map(e => e.media_id -> e.embedding).toMap
    assert(emb(1L).toSeq === emb(5L).toSeq)
    assert(emb(1L).toSeq !== emb(2L).toSeq)
    // dHash covers PNG now; a grayscale PNG hashes too.
    assert(Multimodal.dHash(load("6.png", 6)).isDefined)
  }

  test("audioFingerprint: edit pairs with original; short clips have no fingerprint") {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[Multimodal.MediaRow]
    val wav = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/3.wav"))
    val short = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/media/4.wav"))
    val h3 = Multimodal.audioFingerprint(Multimodal.MediaRow(3L, "wav", wav))
    assert(h3.isDefined)
    // 64 frames < the 65-window grid: no fingerprint.
    assert(Multimodal.audioFingerprint(Multimodal.MediaRow(4L, "wav", short)).isEmpty)
    // Edit two PCM bytes; the pair must be recovered through the
    // banded join at its small Hamming distance.
    val edited = wav.clone()
    val idx = (12 until edited.length - 8).find(i =>
      edited(i) == 'd' && edited(i + 1) == 'a' &&
        edited(i + 2) == 't' && edited(i + 3) == 'a').get
    edited(idx + 9) =
      math.min(255, java.lang.Byte.toUnsignedInt(edited(idx + 9)) + 60).toByte
    val media = Seq(
      Multimodal.MediaRow(3L, "wav", wav),
      Multimodal.MediaRow(103L, "wav", edited),
      Multimodal.MediaRow(4L, "wav", short)).toDS()
    val pairs = Multimodal.audioNearDups(
        Multimodal.audioFingerprints(media).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((3L, 103L, 1)))
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val media = Multimodal.fromText(
      Seq((1L, "0123456789abcdef")).toDF("doc_id", "text"), "doc_id", "text", "video/fake")
    val frames = StreamFixtures.collectFrames(Multimodal.sampleFrames(media, frameBytes = 4, stride = 2))
    // 16 bytes → 4 frames of 4; stride 2 keeps frames 0 and 2
    assert(frames.map(_._2).toSeq === Seq(0, 2))
    assert(new String(frames(0)._3) === "0123")
    assert(new String(frames(1)._3) === "89ab")
  }

  test("streaming hourly agg equals the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingJobs.runToMemory(spark,
      StreamingJobs.hourlyAgg(StreamingJobs.eventsStream(spark, s"$dir/events.parquet")),
      "t_stream_hourly")
    val batch = graft.sources.Timestamps.normalized(
        spark.read.parquet(s"$dir/events.parquet"), "ts", s"$dir/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n_rows"), avg(col("value")).as("avg_value"))
    val s = streamed.orderBy("hour_ts").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val b = batch.orderBy("hour_ts").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    assert(s.toSeq === b.toSeq)
  }

  test("streaming quality gate equals the batch gopher rule's survivors") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingJobs.runToMemory(spark,
      StreamingJobs.qualityGateStream(
        StreamingJobs.documentsStream(spark, s"$dir/documents.parquet"),
        keep = col("n_tokens") >= 20 && col("stop_hits") >= 1),
      "t_stream_quality", mode = "append")
    val batch = graft.functions.QualitySignals
      .gopherSignals(spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .filter(col("n_tokens") >= 20 && col("stop_hits") >= 1)
    val s = streamed.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = batch.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(s.nonEmpty && s.toSeq === b.toSeq)
  }

  test("stateful mapGroupsWithState totals equal batch groupBy after one batch") {
    val dir = "/root/testdata/sf0.001"
    val stateful = StreamingJobs.runToMemory(spark,
      StreamingJobs.statefulUserTotals(
        StreamingJobs.eventsStream(spark, s"$dir/events.parquet")).toDF(),
      "t_stream_state", mode = "update")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("s"))
    val s = stateful.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
    val b = batch.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
    assert(s.toSeq === b.toSeq)
  }

  test("stream-static join enriches every micro-batch row") {
    val dir = "/root/testdata/sf0.001"
    val dim = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct()
      .withColumn("segment", when(col("user_id") % 2 === 0, "even").otherwise("odd"))
    val joined = StreamingJobs.runToMemory(spark,
      StreamingJobs.withStaticDim(
        StreamingJobs.eventsStream(spark, s"$dir/events.parquet"), dim, Seq("user_id"))
        .groupBy("segment").agg(count(lit(1)).as("n")),
      "t_stream_dim", mode = "complete")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .join(dim, Seq("user_id"))
      .groupBy("segment").agg(count(lit(1)).as("n"))
    assert(joined.orderBy("segment").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === batch.orderBy("segment").collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("streaming sessionization emits closed sessions, holds the open one") {
    val rows = Seq(
      (1L, 0L), (1L, 100L), (1L, 5000L),          // session closes at gap, one open
      (2L, 50L))                                   // single open session, nothing emitted
      .toDF("user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    rows.write.parquet(s"$dir/events")
    val stream = spark.readStream
      .schema("user_id LONG, ts LONG").parquet(s"$dir/events")
    val out = StreamingJobs.runToMemory(spark,
      StreamingJobs.sessionizeStream(stream, gapSec = 1800).toDF(),
      "t_stream_sess", mode = "append")
    val emitted = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // only user 1's first session (2 events, 0..100) is closed within the batch
    assert(emitted.toSeq === Seq((1L, 2L, 0.0, 100.0)))
  }

  test("streaming sessionization: a late event never moves the open end backwards") {
    // batch contains a late event (t=10) older than the open session's
    // span plus a closing event — the emitted session must keep its
    // real end, and duration can never be negative.
    val rows = Seq((1L, 1000L), (1L, 1100L), (1L, 10L), (1L, 5000L)).toDF("user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-sess2").toString
    rows.write.parquet(s"$dir/events")
    val stream = spark.readStream.schema("user_id LONG, ts LONG").parquet(s"$dir/events")
    val out = StreamingJobs.runToMemory(spark,
      StreamingJobs.sessionizeStream(stream, gapSec = 1800).toDF(),
      "t_stream_sess2", mode = "append")
    val emitted = out.collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // sorted batch: 10,1000,1100 merge (gaps <= 1800), closed by 5000
    assert(emitted.toSeq === Seq((3L, 10.0, 1100.0)))
    assert(emitted.forall { case (_, s, e) => e >= s })
  }

  test("event-time sessionization closes idle sessions via the watermark") {
    // Two files processed as two micro-batches (maxFilesPerTrigger=1):
    // batch 1 opens user 1's session; batch 2's much-later event
    // advances the watermark past end+gap, firing the timeout.
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-et").toString
    Seq((1L, "2025-01-01 00:00:00"), (1L, "2025-01-01 00:01:00"))
      .toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
      .write.parquet(s"$dir/f1")
    Thread.sleep(1100) // distinct mtimes → deterministic batch order
    Seq((2L, "2025-01-01 02:00:00"))
      .toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
      .write.parquet(s"$dir/f2")
    val stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
      .withWatermark("ts", "10 seconds")
    val out = StreamingJobs.runToMemory(spark,
      StreamingJobs.sessionizeStreamEventTime(stream, gapSec = 1800).toDF(),
      "t_stream_sess_et", mode = "append")
    val emitted = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    // user 1's 2-event session emitted by timeout; user 2's still open
    assert(emitted.toSeq === Seq((1L, 2L)))
  }

  test("foreachBatch sink lands stream rows in a managed table") {
    val dir = "/root/testdata/sf0.001"
    val stream = StreamingJobs.eventsStream(spark, s"$dir/events.parquet")
      .select("event_id", "user_id", "value")
    StreamingJobs.runToTable(spark, stream, "t_stream_sink")
    val expected = spark.read.parquet(s"$dir/events.parquet").count()
    assert(spark.table("t_stream_sink").count() === expected)
  }

  test("streaming dedup keeps one row per key") {
    val dir = "/root/testdata/sf0.001"
    val deduped = StreamingJobs.runToMemory(spark,
      StreamingJobs.dedupStream(
        StreamingJobs.eventsStream(spark, s"$dir/events.parquet"), Seq("user_id", "event_type")),
      "t_stream_dedup", mode = "append")
    val keys = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type").distinct().count()
    assert(deduped.count() === keys)
  }

  test("stream-stream join pairs rows across micro-batches via buffered state") {
    import spark.implicits._
    // Two parquet files processed as TWO micro-batches
    // (maxFilesPerTrigger=1): the click arrives in batch 0, its
    // matching purchase only in batch 1 — the pair can only emit if
    // the left row survived in buffered join state across batches.
    val dir = java.nio.file.Files.createTempDirectory("ss-join").toString
    // Offset from epoch: an event at exactly t=0 sits AT the initial
    // watermark and is discarded as late before it reaches join state.
    def ns(min: Long) = (1700000000L + min * 60L) * 1000000000L
    Seq((1L, ns(0), 7L, "click", 1.0, "{}"),
        (2L, ns(5), 8L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // distinct mtimes => deterministic file order
    Seq((3L, ns(10), 7L, "purchase", 2.0, "{}"),   // in-window for user 7
        (4L, ns(185), 8L, "purchase", 2.0, "{}"))  // 3h after the click: outside
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    // This test writes its own nanos-as-long fixture, so a LongType
    // schema is the truth here (unlike eventsStream, which infers).
    val rawSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val out = graft.streaming.StreamingJobs.runToMemory(spark,
      graft.streaming.StreamingJobs.streamStreamJoin(
        stream.filter($"event_type" === "click"),
        stream.filter($"event_type" === "purchase"), withinSec = 3600),
      s"ssx_${System.nanoTime}", mode = "append", statePartitions = Some(2))
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("user_id") === 7L)
    assert(rows(0).getAs[Long]("a_id") === 1L && rows(0).getAs[Long]("b_id") === 3L)
  }

  test("streaming near-dup pairs clones across micro-batches via band state") {
    val dir = java.nio.file.Files.createTempDirectory("nd-stream").toString
    val t0 = new java.sql.Timestamp(1_700_000_000_000L)
    val t1 = new java.sql.Timestamp(1_700_000_030_000L)
    Seq((1L, "the quick brown fox jumps over the lazy dog again and again", t0),
        (2L, "an entirely different document about spark structured streaming state", t0))
      .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").parquet(dir)
    val past = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000)
    java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .forEach(p => java.nio.file.Files.setLastModifiedTime(p, past))
    Seq((11L, "the quick brown fox jumps over the lazy dog again and again", t1),
        (12L, "a third unrelated text with no overlap whatsoever in its shingles", t1))
      .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = StreamingJobs.runToMemory(spark,
      StreamingJobs.nearDupStream(stream, "doc_id", "text", "ts",
        horizonSec = 3600, simFloor = 0.9),
      s"t_neardup_${System.nanoTime}", mode = "append", statePartitions = Some(2))
    val pairs = out.select($"id_a", $"id_b", $"est_sim").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // The only near-dup pair spans the two micro-batches: doc 1 was
    // stored in band state by batch 1, its clone 11 probes it in batch 2.
    assert(pairs === Set((1L, 11L, 1.0)))
  }

  test("streaming near-dup caps per-bucket state at maxBucket") {
    val dir = java.nio.file.Files.createTempDirectory("nd-cap").toString
    val txt = "identical text shared by every single document in this feed"
    val t0 = new java.sql.Timestamp(1_700_000_000_000L)
    (1L to 5L).map(i => (i, txt, t0)).toDF("doc_id", "text", "ts")
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType))))
      .parquet(dir)
    val out = StreamingJobs.runToMemory(spark,
      StreamingJobs.nearDupStream(stream, "doc_id", "text", "ts",
        horizonSec = 3600, simFloor = 0.9, maxBucket = 2),
      s"t_neardup_cap_${System.nanoTime}", mode = "append", statePartitions = Some(2))
    val pairs = out.select($"id_a", $"id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Only docs 1 and 2 enter each bucket's state (cap 2); later docs
    // still PROBE state — so every doc pairs with 1 and 2, and nothing
    // pairs 3/4/5 among themselves: bounded state, bounded output.
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (1L, 5L), (2L, 5L)))
  }

  test("streaming token budget carries consumed state across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("budget-stream").toString
    // 4 tokens per doc; budget 10 => docs admitted while total <= 10,
    // i.e. 2 whole docs across ALL batches (3rd doc reaches 12).
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    Seq((1L, "sA", "one two three four"), (2L, "sA", "one two three four"))
      .toDF("doc_id", "source", "text").coalesce(1).write.mode("append").parquet(dir)
    val past = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000)
    java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .forEach(p => java.nio.file.Files.setLastModifiedTime(p, past))
    Seq((3L, "sA", "one two three four"), (4L, "sB", "ignored no budget"))
      .toDF("doc_id", "source", "text").coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = StreamingJobs.runToMemory(spark,
      StreamingJobs.tokenBudgetStream(stream, "source", "doc_id", "text",
        budgets = Map("sA" -> 10L)),
      s"t_budget_${System.nanoTime}", mode = "append", statePartitions = Some(2))
    val rows = out.select($"doc_id", $"cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Batch 1 admits both docs (4, 8); batch 2's doc 3 would reach 12
    // — the STATE total from batch 1 must block it. sB has no budget.
    assert(rows === Set((1L, 4L), (2L, 8L)))
  }

  test("streaming decon gate equals the batch anti-join's survivors") {
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
    val bench = d.filter($"doc_id" % 50 === 0)
    val streamed = StreamingJobs.runToMemory(spark,
      StreamingJobs.deconStream(
        StreamingJobs.documentsStream(spark, s"$dir/documents.parquet")
          .select($"doc_id", $"text"),
        bench, "doc_id", "text", n = 5, minShared = 2).select($"doc_id"),
      s"t_decon_${System.nanoTime}", mode = "append", statePartitions = Some(2))
      .collect().map(_.getLong(0)).sorted
    val batch = graft.operators.CorpusHygiene.removeContaminated(
        d, bench, "doc_id", "text", n = 5, minShared = 2)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(streamed.toSeq === batch.toSeq)
  }

  test("deconStream falls back to the distributed Bloom gate past the driver budget") {
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
    val bench = d.filter($"doc_id" % 50 === 0)
    // maxDriverShingles = 0 forces the fallback: the benchmark is never
    // collected; the stream filters on the distributed-built Bloom.
    val streamed = StreamingJobs.runToMemory(spark,
      StreamingJobs.deconStream(
        StreamingJobs.documentsStream(spark, s"$dir/documents.parquet")
          .select($"doc_id", $"text"),
        bench, "doc_id", "text", n = 5, minShared = 2,
        maxDriverShingles = 0L).select($"doc_id"),
      s"t_decon_bloom_${System.nanoTime}", mode = "append", statePartitions = Some(2))
      .collect().map(_.getLong(0)).sorted
    // Same decision rule as the batch Bloom path (identical bit array —
    // the build is deterministic over the same key set), so the
    // survivor sets must match exactly; and the fallback can only
    // OVER-drop vs the exact batch rule, never under-drop.
    val batchBloom = graft.operators.CorpusHygiene.bloomDecontaminate(
        d, bench, "doc_id", "text", n = 5, minShared = 2)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(streamed.toSeq === batchBloom.toSeq)
    val batchExact = graft.operators.CorpusHygiene.removeContaminated(
        d, bench, "doc_id", "text", n = 5, minShared = 2)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed.toSet.subsetOf(batchExact))
  }

  test("ephemeral streaming checkpoints are deleted after the query stops") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val shm = Paths.get("/dev/shm")
    val base = if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
      else Paths.get(System.getProperty("java.io.tmpdir"))
    def ckptDirs() = Files.list(base).iterator().asScala
      .filter(_.getFileName.toString.startsWith("graft-ckpt")).toSet
    val before = ckptDirs()
    val dir = "/root/testdata/sf0.001"
    StreamingJobs.runToMemory(spark,
      graft.streaming.StreamingJobs.eventsStream(spark, s"$dir/events.parquet")
        .groupBy($"event_type").count(),
      s"t_ckpt_leak_${System.nanoTime}")
    // A long-lived harness leaks RAM via /dev/shm if these survive.
    assert(ckptDirs() === before)
  }
}

object StreamFixtures {
  def collectFrames(df: org.apache.spark.sql.DataFrame): Array[(Long, Int, Array[Byte])] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._2)

}
