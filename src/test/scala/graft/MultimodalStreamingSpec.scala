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
    val feats = Multimodal.extractFeatures(media.repartition(2), batchSize = 16)
    val rows = feats.collect()
    assert(rows.length === 100)
    // every batch is <= 16; with 50 rows/partition the tail batch is smaller
    assert(rows.map(_.batch_size).max <= 16)
    val f = rows.find(_.media_id === 7L).get
    assert(f.n_bytes === "content for item 7".length)
    assert(f.n_spaces === 3)
    assert(f.first_byte === 'c'.toInt)
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
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n_rows"), avg(col("value")).as("avg_value"))
    val s = streamed.orderBy("hour_ts").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val b = batch.orderBy("hour_ts").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    assert(s.toSeq === b.toSeq)
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
}

object StreamFixtures {
  def collectFrames(df: org.apache.spark.sql.DataFrame): Array[(Long, Int, Array[Byte])] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._2)
}
