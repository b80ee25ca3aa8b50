package graft

import org.apache.spark.sql.functions._
import graft.sources.ColumnarJson
import graft.sources.ColumnarJson._
import graft.pipelines.AirQuality.Pollutants

class ColumnarJsonSpec extends SparkSuite {

  test("clean payload flattens to one row per hour with typed columns") {
    val df = ColumnarJson.read(spark, fixture("aq_clean_768h.json"), Pollutants)
    assert(df.count() === 768)
    assert(df.schema("time").dataType.typeName === "timestamp")
    assert(df.schema("pm10").dataType.typeName === "double")
    val firstTime = df.agg(min(col("time"))).collect()(0).getTimestamp(0).toString
    assert(firstTime.startsWith("2025-03-01 00:00"))
  }

  test("nulls in arrays survive the pivot") {
    val df = ColumnarJson.read(spark, fixture("aq_with_nulls.json"), Pollutants)
    assert(df.count() === 100)
    val ozoneNulls = df.filter(col("ozone").isNull).count()
    assert(ozoneNulls === 100) // all-null column in fixture
    assert(df.filter(col("pm10").isNull).count() > 0) // scattered nulls
  }

  test("ragged arrays: PadToLongest vs TruncateToShortest vs AlignToTime") {
    // fixture: time has 50, pm10 has 45 (short), ozone has 53 (long)
    val pad = ColumnarJson.read(spark, fixture("aq_ragged.json"), Pollutants, PadToLongest)
    assert(pad.count() === 53)
    assert(pad.filter(col("time").isNull).count() === 3) // beyond time axis

    val trunc = ColumnarJson.read(spark, fixture("aq_ragged.json"), Pollutants, TruncateToShortest)
    assert(trunc.count() === 45)
    assert(trunc.filter(col("pm10").isNull).count() === 0)

    val align = ColumnarJson.read(spark, fixture("aq_ragged.json"), Pollutants, AlignToTime)
    assert(align.count() === 50)
    assert(align.filter(col("time").isNull).count() === 0)
    assert(align.filter(col("pm10").isNull).count() === 5) // padded tail
  }

  test("missing metric key becomes a typed-null column") {
    val df = ColumnarJson.read(spark, fixture("aq_missing_key.json"), Pollutants)
    assert(df.count() === 50)
    assert(df.schema("carbon_dioxide").dataType.typeName === "double")
    assert(df.filter(col("carbon_dioxide").isNull).count() === 50)
  }

  test("empty hourly payload yields zero rows, full schema") {
    val df = ColumnarJson.read(spark, fixture("aq_empty.json"), Pollutants)
    assert(df.count() === 0)
    assert(df.columns.toSeq.containsSlice("time" +: Pollutants))
  }

  test("readDynamic discovers undeclared metric keys from the payload") {
    // aq_clean_768h declares the standard pollutant keys in its own
    // hourly block; discovery must return exactly those (sorted),
    // with no caller-supplied list.
    val discovered = ColumnarJson.discoverMetrics(spark, fixture("aq_clean_768h.json"))
    assert(discovered.nonEmpty && discovered == discovered.sorted)
    assert(!discovered.contains("time"))
    val df = ColumnarJson.readDynamic(spark, fixture("aq_clean_768h.json"))
    assert(df.count() === 768)
    discovered.foreach(m => assert(df.columns.contains(m)))

    // A payload with a key the Pollutants list doesn't know about:
    // read() drops it silently; readDynamic surfaces it.
    val dyn = ColumnarJson.readDynamic(spark, "/root/repo/fixtures/columnar")
    assert(dyn.columns.contains("o3"))
    assert(dyn.filter(col("o3").isNotNull).count() === 8)
  }

  test("flatten plan has no driver-side collect (Generate on executors)") {
    val df = ColumnarJson.read(spark, fixture("aq_clean_768h.json"), Pollutants)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"))
  }

  test("Jsonl: good/quarantine split the corpus with full accounting") {
    val path = "/root/repo/fixtures/jsonl/docs.jsonl"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    val good = graft.sources.Jsonl.good(spark, path, schema)
    val bad = graft.sources.Jsonl.quarantine(spark, path, schema)
    assert(good.count() === 10)
    assert(good.columns.toSeq === Seq("doc_id", "text", "lang"))
    assert(bad.count() === 2)
    // The quarantine carries the raw lines, re-parseable later.
    val lines = bad.collect().map(_.getString(0))
    assert(lines.exists(_.contains("unterminated")))
    assert(lines.exists(_.contains("not json at all")))
    // Nothing lost: good + quarantined == physical lines.
    assert(good.count() + bad.count() ===
      spark.read.text(path).filter(length(trim(col("value"))) > 0).count())
  }

  test("Jsonl: a caller schema containing the reserved corrupt column fails fast") {
    val clash = org.apache.spark.sql.types.StructType.fromDDL(
      s"doc_id BIGINT, ${graft.sources.Jsonl.CorruptCol} STRING")
    val e = intercept[IllegalArgumentException] {
      graft.sources.Jsonl.read(spark, "/root/repo/fixtures/jsonl/docs.jsonl", clash)
    }
    assert(e.getMessage.contains(graft.sources.Jsonl.CorruptCol))
  }

  test("Jsonl: errorifexists mode refuses to clobber an existing export") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl-mode").toString
    graft.sources.Jsonl.writeSharded(docs, out, "doc_id", 2)
    intercept[Exception] {
      graft.sources.Jsonl.writeSharded(docs, out, "doc_id", 2, mode = "errorifexists")
    }
    // The default stays re-runnable.
    graft.sources.Jsonl.writeSharded(docs, out, "doc_id", 2)
  }

  test("Jsonl: sharded export rejects an input already carrying a shard column") {
    import spark.implicits._
    val withShard = Seq((1L, "x", 0)).toDF("doc_id", "text", "shard")
    val e = intercept[IllegalArgumentException] {
      graft.sources.Jsonl.writeSharded(withShard, "/tmp/never-written", "doc_id", 4)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("Jsonl: parse rejects schema fields colliding with passthrough columns") {
    import spark.implicits._
    val lines = Seq(("{}", 3)).toDF("value", "shard")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, shard INT")
    val e = intercept[IllegalArgumentException] {
      graft.sources.Jsonl.parseLines(lines, schema)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("Jsonl: sharded export roundtrips losslessly with hash-determined shards") {
    import spark.implicits._
    // Quotes, backslashes, and an embedded newline: the JSON escape
    // path must keep every byte (an embedded \n becomes \\n inside the
    // line, so the export stays one line per record).
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "with \"quotes\" and \\backslash\\", "en"),
      (3L, "line one\nline two", "de"),
      (4L, "", "fr")).toDF("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl-sink").toString
    graft.sources.Jsonl.writeSharded(docs, out, "doc_id", shards = 4)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    val back = graft.sources.Jsonl.readSharded(spark, out, schema)
    assert(back.filter(col(graft.sources.Jsonl.CorruptCol).isNotNull).count() === 0)
    val rows = back.select("doc_id", "text", "lang", "shard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).sorted
    val expectedShards = docs.select(col("doc_id"),
        graft.operators.Sampling.shardOf(col("doc_id"), 4).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.map(x => (x._1, x._2, x._3)).toSeq ===
      Seq((1L, "plain text", "en"), (2L, "with \"quotes\" and \\backslash\\", "en"),
        (3L, "line one\nline two", "de"), (4L, "", "fr")))
    rows.foreach { case (id, _, _, shard) => assert(shard === expectedShards(id)) }
    // Re-export after a repartition lands every doc in the SAME shard
    // (membership is a pure function of the key, not the layout).
    graft.sources.Jsonl.writeSharded(docs.repartition(5), out, "doc_id", shards = 4)
    val again = graft.sources.Jsonl.readSharded(spark, out, schema)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again === expectedShards)
  }
}
