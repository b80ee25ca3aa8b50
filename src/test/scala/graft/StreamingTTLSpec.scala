package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingJobs

/** State-bound contracts for the streaming operators: the near-dup band
  * state and the TTL'd per-user totals must EVICT once the event-time
  * watermark passes an entry's horizon — asserted directly on the state
  * store row counts reported in query progress, plus the behavioral
  * consequences (in-horizon pair found, beyond-horizon pair not, evicted
  * user restarts at zero). Idempotent table commits are replay-tested
  * at the commitBatch layer — the exact call a checkpoint-recovered
  * foreachBatch re-fires.
  */
class StreamingTTLSpec extends SparkSuite {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Latest reported state-store row count of `q` (sum over operators). */
  private def stateRows(q: StreamingQuery): Long =
    q.recentProgress.reverseIterator
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(0L)

  private def doc(i: Long): String =
    s"unique streaming document number $i carrying enough distinct tokens " +
      s"to shingle cleanly marker ${i * 7} tail ${i * 13}"

  test("withStateStore(rocksdb) really swaps the provider, and state survives it") {
    def run(rocksdb: Boolean, sink: String): Set[String] = {
      val in = MemoryStream[String]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-rocks-spec").toString
      var metricKeys = Set.empty[String]
      StreamingJobs.withStateStore(spark, rocksdb) {
        val q = in.toDF.toDF("k").dropDuplicates("k")
          .writeStream.outputMode("append").format("memory").queryName(sink)
          .option("checkpointLocation", ckpt).start()
        try {
          in.addData("a", "b", "a")
          q.processAllAvailable()
          in.addData("b", "c") // 'b' must hit run-1 state
          q.processAllAvailable()
          import scala.jdk.CollectionConverters._
          metricKeys = q.recentProgress.reverseIterator
            .find(_.stateOperators.nonEmpty)
            .map(_.stateOperators.head.customMetrics.keySet.asScala.toSet)
            .getOrElse(Set.empty)
        } finally q.stop()
      }
      val rows = spark.table(sink).collect().map(_.getString(0)).toSet
      assert(rows === Set("a", "b", "c"), s"dedup wrong under rocksdb=$rocksdb: $rows")
      metricKeys
    }
    // RocksDB run: the state operator reports rocksdb* custom metrics
    // — proof the provider is actually in the loop, not just a conf.
    val rocks = run(rocksdb = true, "t_rocks_on")
    assert(rocks.exists(_.startsWith("rocksdb")), s"no rocksdb metrics: $rocks")
    // Default run: no rocksdb metrics; the conf scoping restored.
    val default = run(rocksdb = false, "t_rocks_off")
    assert(!default.exists(_.startsWith("rocksdb")), s"conf leaked: $default")
    // getOption surfaces the conf's DEFAULT (HDFSBacked...) when unset
    // — "restored" means not-RocksDB, not absent.
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("nearDupStream evicts band state past the horizon; in-horizon pairs still found") {
    val t0 = 1_700_000_000_000L // fixed epoch ms; only relative time matters
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    val in = MemoryStream[(Long, String, Timestamp)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ndttl-spec").toString
    val q = StreamingJobs.nearDupStream(
        in.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
        horizonSec = 120, simFloor = 0.9)
      .writeStream.outputMode("append").format("memory").queryName("t_ndttl")
      .option("checkpointLocation", ckpt).start()
    try {
      // batch 1: eight base docs at T0
      in.addData((1L to 8L).map(i => (i, doc(i), ts(0))))
      q.processAllAvailable()
      val afterBase = stateRows(q)
      assert(afterBase > 0, "base docs must populate band state")

      // batch 2: clone of doc 1 thirty seconds later — inside the
      // 120 s horizon, must pair with its original via state
      in.addData(Seq((101L, doc(1), ts(30))))
      q.processAllAvailable()
      val pairs1 = spark.table("t_ndttl").select("id_a", "id_b")
        .as[(Long, Long)].collect().toSet
      assert(pairs1.contains((1L, 101L)), s"in-horizon pair missing: $pairs1")

      // batch 3: a watermark pusher 600 s ahead — watermark advances to
      // T0+480 s, stranding every T0-era entry 6 horizons stale
      in.addData(Seq((900L, doc(900), ts(600))))
      q.processAllAvailable()

      // batch 4: clone of doc 2, on time for the new watermark — its
      // original was evicted, so NO pair may surface; the batch also
      // fires the pending timeouts, shrinking the store
      in.addData(Seq((102L, doc(2), ts(610))))
      q.processAllAvailable()
      val pairs2 = spark.table("t_ndttl").select("id_a", "id_b")
        .as[(Long, Long)].collect().toSet
      assert(!pairs2.contains((2L, 102L)),
        s"beyond-horizon pair must not be found: $pairs2")
      val afterEvict = stateRows(q)
      assert(afterEvict < afterBase,
        s"state must shrink after eviction: $afterEvict >= $afterBase")
    } finally q.stop()
  }

  test("statefulUserTotalsTTL evicts idle users; a returning user restarts") {
    val t0 = 1_700_000_000_000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    val in = MemoryStream[(Long, Double, Timestamp)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-uttl-spec").toString
    val q = StreamingJobs.statefulUserTotalsTTL(
        in.toDF.toDF("user_id", "value", "ts").withWatermark("ts", "10 seconds"),
        idleSec = 60)
      .writeStream.outputMode("append").format("memory").queryName("t_uttl")
      .option("checkpointLocation", ckpt).start()
    try {
      in.addData((1L to 5L).map(u => (u, 2.0, ts(0))))
      q.processAllAvailable()
      assert(stateRows(q) === 5L)

      // push the watermark far past everyone's idle horizon
      in.addData(Seq((9L, 1.0, ts(300))))
      q.processAllAvailable()
      // next batch fires the timeouts for users 1..5
      in.addData(Seq((1L, 7.0, ts(310))))
      q.processAllAvailable()
      val rows = spark.table("t_uttl")
        .as[StreamingJobs.UserAgg].collect()
      // user 1 was evicted, so the return starts a FRESH total
      val user1 = rows.filter(_.user_id == 1L)
      assert(user1.map(_.n_events).toSet === Set(1L),
        s"returning user must restart at n=1: ${user1.toSeq}")
      assert(user1.map(_.total_value).contains(7.0))
      val afterEvict = stateRows(q)
      assert(afterEvict <= 2L, // user 9 + returned user 1
        s"idle users must be evicted: $afterEvict state rows")
    } finally q.stop()
  }

  test("incrementalDedupCommit replay of the same micro-batch is a state no-op") {
    def resetT(t: String): Unit = new graft.sources.TableManager(spark).reset(t)
    val versions = Seq("t_sincr_v0", "t_sincr_v1")
    versions.foreach(resetT)
    val current = new java.util.concurrent.atomic.AtomicInteger(-1)
    val b1 = Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(1))) // 3 clones 1
      .toDF("doc_id", "text")
    val b2 = Seq((4L, doc(2)), (5L, doc(5))).toDF("doc_id", "text") // 4 clones 2
    StreamingJobs.incrementalDedupCommit(b1, "doc_id", "text", versions, current)
    StreamingJobs.incrementalDedupCommit(b2, "doc_id", "text", versions, current)
    def state = spark.table(versions(current.get))
    val rowsAfter = state.count()
    val decisions = graft.operators.IncrementalDedup.keepDecision(state)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(decisions === Set((1L, 1L, true), (3L, 1L, false),
      (2L, 2L, true), (4L, 2L, false)))
    // crash replay: batch 2 re-fired — the anti-join guard must make it
    // a no-op (same rows, same decisions), not a duplicate-id blowup
    StreamingJobs.incrementalDedupCommit(b2, "doc_id", "text", versions, current)
    assert(state.count() === rowsAfter)
    val decisions2 = graft.operators.IncrementalDedup.keepDecision(state)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(decisions2 === decisions)
  }

  test("incremental dedup resumes across invocations through the durable cursor") {
    def resetT(t: String): Unit = new graft.sources.TableManager(spark).reset(t)
    val versions = Seq("t_resume_v0", "t_resume_v1")
    val cursor = "t_resume_cursor"
    (versions :+ cursor).foreach(resetT)
    // Invocation 1: absorb docs 1-2, cursor written durably.
    val c1 = new java.util.concurrent.atomic.AtomicInteger(
      StreamingJobs.bootstrapCursor(spark, versions, cursor))
    assert(c1.get === -1) // clean start
    StreamingJobs.incrementalDedupCommit(
      Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text"),
      "doc_id", "text", versions, c1, cursorTable = Some(cursor))
    // Invocation 2 (new process: FRESH cursor object): a clone of doc 1
    // arriving "months later" must still collide with invocation 1's
    // state — the exact history a non-durable cursor silently discards.
    val c2 = new java.util.concurrent.atomic.AtomicInteger(
      StreamingJobs.bootstrapCursor(spark, versions, cursor))
    assert(c2.get === c1.get)
    StreamingJobs.incrementalDedupCommit(
      Seq((9L, doc(1))).toDF("doc_id", "text"),
      "doc_id", "text", versions, c2, cursorTable = Some(cursor))
    val decisions = graft.operators.IncrementalDedup
      .keepDecision(spark.table(versions(c2.get)))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(decisions(1L) === true && decisions(9L) === false,
      s"cross-invocation clone must be dropped: $decisions")
    // A cursor pointing at a dropped state table fails loudly.
    resetT(versions(c2.get))
    val e = intercept[IllegalArgumentException] {
      StreamingJobs.bootstrapCursor(spark, versions, cursor)
    }
    assert(e.getMessage.contains("cursor"))
    // An EMPTY cursor table (crash inside the non-atomic delete+write
    // overwrite) routes into the same loud message, not an opaque
    // NoSuchElementException from head().
    val tm = new graft.sources.TableManager(spark)
    tm.overwrite(Seq(0).toDF("v").filter($"v" < 0), cursor)
    val e2 = intercept[IllegalArgumentException] {
      StreamingJobs.bootstrapCursor(spark, versions, cursor)
    }
    assert(e2.getMessage.contains("drop the cursor table"),
      s"empty cursor must fail loudly: ${e2.getMessage}")
  }

  test("commitBatch replay of the same batch id does not duplicate rows") {
    val tm = new graft.sources.TableManager(spark)
    val tbl = "t_idem_sink"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    StreamingJobs.commitBatch(tm, b0, tbl, batchId = 0L, idempotent = true)
    assert(spark.table(tbl).count() === 2)
    // crash-replay: same batch id fired again must overwrite, not append
    StreamingJobs.commitBatch(tm, b0, tbl, batchId = 0L, idempotent = true)
    assert(spark.table(tbl).count() === 2)
    // a replay that previously wrote PARTIAL output is also healed:
    // the partition is replaced wholesale
    StreamingJobs.commitBatch(tm, b0.limit(1), tbl, batchId = 0L, idempotent = true)
    StreamingJobs.commitBatch(tm, b0, tbl, batchId = 0L, idempotent = true)
    assert(spark.table(tbl).count() === 2)
    // a NEW batch id appends alongside
    StreamingJobs.commitBatch(tm, Seq((3L, "c")).toDF("k", "v"), tbl,
      batchId = 1L, idempotent = true)
    assert(spark.table(tbl).count() === 3)
    assert(spark.table(tbl).select("k").as[Long].collect().sorted
      === Array(1L, 2L, 3L))
    // contrast: the non-idempotent mode is plain at-least-once append
    val tbl2 = "t_idem_sink_raw"
    spark.sql(s"DROP TABLE IF EXISTS $tbl2")
    StreamingJobs.commitBatch(tm, b0, tbl2, batchId = 0L, idempotent = false)
    StreamingJobs.commitBatch(tm, b0, tbl2, batchId = 0L, idempotent = false)
    assert(spark.table(tbl2).count() === 4)
  }
}
