package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Timestamps

/** Fixture-encoding canary + NTZ hardening gates.
  *
  * The driver regenerates /root/testdata occasionally and the parquet
  * timestamp encoding has already changed once (TIMESTAMP(NANOS)→
  * TIMESTAMP_MICROS NTZ, round 7→8). These tests make the NEXT silent
  * re-encode fail in one obvious place instead of as five scattered
  * CORRECTNESS rows: the canary asserts the engine normalizes whatever
  * is on disk to session-UTC TimestampType with present-day values, and
  * the operator gates feed deliberately-NTZ frames through every
  * operator that does timestamp arithmetic.
  */
class TimestampEncodingSpec extends SparkSuite {
  import spark.implicits._

  test("canary: every fixture SF's events.ts normalizes to a present-day timestamp") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val path = s"/root/testdata/$sf/events.parquet"
      val raw = spark.read.parquet(path)
      // Supported encodings only — a new physical shape must fail HERE.
      val rawType = raw.schema("ts").dataType
      assert(Seq(TimestampType, TimestampNTZType, LongType).contains(rawType),
        s"$sf events.ts arrived as unsupported $rawType — extend graft.sources.Timestamps")
      val norm = Timestamps.normalized(raw, "ts", path)
      assert(norm.schema("ts").dataType === TimestampType)
      val (lo, hi) = norm.agg(min(year($"ts")), max(year($"ts")))
        .as[(Int, Int)].head()
      assert(lo >= 2000 && hi <= 2100,
        s"$sf normalized ts years [$lo,$hi] — unit misread (1970 collapse or far future)")
    }
  }

  test("unitOf decides nanos/micros/millis/seconds by magnitude") {
    val t2024 = 1700000000L
    assert(Timestamps.unitOf(t2024) === "seconds")
    assert(Timestamps.unitOf(t2024 * 1000L) === "millis")
    assert(Timestamps.unitOf(t2024 * 1000000L) === "micros")
    assert(Timestamps.unitOf(t2024 * 1000000000L) === "nanos")
  }

  private def ntzEvents = {
    // (user, epoch-sec, type, id) → an NTZ ts column, the pandas default.
    Seq((1L, 1000L, "click", 1L), (1L, 1400L, "click", 2L),
        (1L, 9000L, "buy", 3L), (2L, 500L, "click", 4L))
      .toDF("user_id", "sec", "event_type", "event_id")
      .withColumn("ts", timestamp_seconds($"sec").cast(TimestampNTZType))
      .drop("sec")
  }

  test("sessionize + sessionStats accept TIMESTAMP_NTZ input") {
    val s = operators.Sessions.sessionStats(ntzEvents, "user_id", "ts", 1800,
      Seq("event_id")).orderBy("user_id", "session_num")
      .select($"user_id", $"session_num", $"n_events", $"duration_sec")
      .as[(Long, Long, Long, Double)].collect()
    assert(s.toSeq === Seq((1L, 1L, 2L, 400.0), (1L, 2L, 1L, 0.0), (2L, 1L, 1L, 0.0)))
  }

  test("gapPercentiles accepts TIMESTAMP_NTZ input") {
    val g = operators.Sessions.gapPercentiles(ntzEvents, "user_id", "ts",
      "event_type", Seq("event_id"))
      .select($"event_type", $"n_gaps", $"p50_gap_us").as[(String, Long, Double)].collect()
    assert(g.toSeq === Seq(("click", 1L, 400000000.0)))
  }

  test("asOf tolerance accepts TIMESTAMP_NTZ on both sides") {
    val left = Seq((1L, 1000L, "a"), (1L, 5000L, "b"))
      .toDF("k", "sec", "tag")
      .withColumn("ts", timestamp_seconds($"sec").cast(TimestampNTZType)).drop("sec")
    val right = Seq((1L, 900L, 10.0))
      .toDF("k", "sec", "v")
      .withColumn("rts", timestamp_seconds($"sec").cast(TimestampNTZType)).drop("sec")
    val j = operators.Joins.asOf(left, right, Seq("k"), "ts", "rts", Seq("v"),
        toleranceSec = Some(600))
      .orderBy("ts").select($"tag", $"asof_v").as[(String, Option[Double])].collect()
    // b's nearest-backward right row is 4100s stale — outside tolerance.
    assert(j.toSeq === Seq(("a", Some(10.0)), ("b", None)))
  }
}
