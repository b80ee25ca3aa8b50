package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality
import graft.pipelines._
import graft.sources.TableManager

class PipelinesSpec extends SparkSuite {

  lazy val tables = new TableManager(spark)

  test("E1 bronze→silver: clean payload keeps all rows") {
    val p = new BronzeSilverPipeline(spark, tables)
    val r = p.run(fixture("aq_clean_768h.json"), "2025-04-02",
      bronzeTable = "e1_bronze", silverTable = "e1_silver")
    assert(r.bronzeRows === 768)
    assert(r.silverRows === 768)
    val rep = r.report.collect()(0)
    assert(rep.getAs[Long]("total_rows") === 768)
    assert(rep.getAs[Long]("duplicate_rows") === 0)
  }

  test("E1 with nulls: DropIfAnyNull removes rows with any null pollutant") {
    val p = new BronzeSilverPipeline(spark, tables, Quality.DropIfAnyNull)
    val r = p.run(fixture("aq_with_nulls.json"), "2025-04-02",
      bronzeTable = "e1n_bronze", silverTable = "e1n_silver")
    assert(r.bronzeRows === 100)
    assert(r.silverRows === 0) // fixture has an all-null ozone column
  }

  test("E1 with nulls: DropIfAllNull keeps rows with any pollutant present") {
    val p = new BronzeSilverPipeline(spark, tables, Quality.DropIfAllNull)
    val r = p.run(fixture("aq_with_nulls.json"), "2025-04-02",
      bronzeTable = "e1o_bronze", silverTable = "e1o_silver")
    assert(r.silverRows === 100)
  }

  test("E1 idempotent re-ingest: rerunning a date does not duplicate Bronze") {
    val p = new BronzeSilverPipeline(spark, tables, idempotentIngest = true)
    val r1 = p.run(fixture("aq_clean_768h.json"), "2025-04-02",
      bronzeTable = "e1i_bronze", silverTable = "e1i_silver")
    assert(r1.bronzeRows === 768)
    // same date again → partition replaced, not appended
    val r2 = p.run(fixture("aq_clean_768h.json"), "2025-04-02",
      bronzeTable = "e1i_bronze", silverTable = "e1i_silver")
    assert(r2.bronzeRows === 768)
    // a different date still accumulates
    val r3 = p.run(fixture("aq_clean_768h.json"), "2025-04-03",
      bronzeTable = "e1i_bronze", silverTable = "e1i_silver")
    assert(r3.bronzeRows === 1536)
  }

  test("E1 dedup: duplicate timestamps collapse deterministically") {
    val p = new BronzeSilverPipeline(spark, tables, Quality.KeepAll)
    val r = p.run(fixture("aq_dup_ts.json"), "2025-04-02",
      bronzeTable = "e1d_bronze", silverTable = "e1d_silver")
    assert(r.bronzeRows === 60) // 50 + 10 repeated hours
    assert(r.silverRows === 50)
    // deterministic: rerunning the dedup yields identical pm10 sum
    val s1 = spark.table("e1d_silver").agg(sum("pm10")).collect()(0).getDouble(0)
    val p2 = new BronzeSilverPipeline(spark, tables, Quality.KeepAll)
    tables.overwrite(spark.table("e1d_bronze"), "e1d_bronze2")
    val s2 = graft.operators.Dedup.keepFirst(spark.table("e1d_bronze2"), Seq("time"),
        col("ingestion_date") +: AirQuality.Pollutants.map(col))
      .agg(sum("pm10")).collect()(0).getDouble(0)
    assert(s1 === s2)
  }

  test("E2 monthly aggregation: 4416 hours → 6 month groups") {
    val p = new MonthlyAggPipeline(spark, tables)
    val monthly = p.run(fixture("aq_mar_aug_4416h.json"), monthlyTable = "e2_monthly")
    assert(monthly.count() === 6)
    assert(monthly.columns.contains("avg_pm10"))
    val months = monthly.select("month").collect().map(_.getInt(0)).sorted
    assert(months.toSeq === Seq(3, 4, 5, 6, 7, 8))
    // avg of avgs sanity: every avg within the generator's [0,100] range
    val row = monthly.filter(col("month") === 3).collect()(0)
    AirQuality.Pollutants.foreach { m =>
      val v = row.getAs[Double](s"avg_$m")
      assert(v > 0 && v < 100)
    }
  }

  test("E3 join pipeline: aligned payloads join 1:1; mismatch drops rows") {
    val p = new JoinedSilverPipeline(spark, tables)
    val r = p.run(fixture("aq_clean_768h.json"), fixture("wx_clean_768h.json"), "2025-04-02",
      aqBronze = "e3_aq", wxBronze = "e3_wx", silverTable = "e3_silver")
    assert(r.silverRows === 768)
    val silver = spark.table("e3_silver")
    assert(silver.columns.contains("pm10") && silver.columns.contains("temperature_2m"))

    // mismatched time axes: aq hours 0..49, wx hours 12..61 → 38 overlap
    val r2 = p.run(fixture("aq_dup_ts.json"), fixture("wx_mismatch.json"), "2025-04-03",
      aqBronze = "e3m_aq", wxBronze = "e3m_wx", silverTable = "e3m_silver")
    assert(r2.silverRows === 38)
  }

  test("E4 training pipeline: every stage filters and the export roundtrips") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val en = "the cat sat on the mat and that is fine for a test with words"
    val docs = Seq(
      (1L, "s0", en + " one"),
      (2L, "s0", en + " one"),                      // exact dup of 1 → dropped
      (3L, "s0", "der hund ist nicht mit von zu"),  // non-en → dropped
      (4L, "s0", en + " two two two"),
      (5L, "s1", en + " three")).toDF("doc_id", "source", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-e4-test").toString
    val r = new graft.pipelines.TrainingDataPipeline(spark)
      .run(docs, keepLang = "en",
        budgets = Map("s0" -> 1000L, "s1" -> 1000L),
        seqLen = 8, exportPath = out, shards = 2)
      .collect()
    val ids = r.map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 4L, 5L))           // 2 deduped, 3 lang-gated
    // Roundtripped text hashes equal the source rows'.
    val wantMd5 = docs.filter(col("doc_id").isin(1L, 4L, 5L))
      .select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    r.foreach(x => assert(x.getAs[String]("text_md5") === wantMd5(x.getLong(0))))
    // Offsets tile the packed stream: sorted begin_off + n_tokens chain.
    val spans = r.map(x =>
      (x.getAs[Long]("begin_off"), x.getAs[Long]("n_tokens"))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((b1, n1), (b2, _)) => assert(b1 + n1 === b2)
      case _ =>
    }
    assert(spans.head._1 === 0L)
  }
}
