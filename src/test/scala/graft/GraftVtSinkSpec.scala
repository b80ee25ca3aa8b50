package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The versioned table as a native STREAMING SINK:
  * `writeStream.format("graftvt")` commits each micro-batch through
  * the exactly-once (txnAppId, batchId) protocol — replays skip,
  * restarts resume, sideloaded plain appends interleave freely.
  */
class GraftVtSinkSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_sink").toString

  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("vt_sink_ckpt").toString

  test("writeStream.format(graftvt) commits micro-batches exactly once") {
    val dir = tmpVt()
    val ck = ckpt()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "s").writeStream.format("graftvt")
      .option("checkpointLocation", ck).start(dir)
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      val vt = new graft.sources.VersionedTable(spark, dir)
      assert(vt.read().count() === 2)
      // a sideloaded PLAIN append interleaves without disturbing the
      // stream's batch-id bookkeeping
      vt.append(Seq((100L, "side")).toDF("k", "s"))
      in.addData((3L, "c"))
      q.processAllAvailable()
      assert(vt.read().count() === 4)
      // commits carry the txn tag: replaying the SAME batch id skips
      val history = vt.history().count()
      assert(vt.appendStreamBatch(Seq((3L, "dup")).toDF("k", "s"),
        app = vt.read().sparkSession.conf.get("spark.app.id", "x"),
        batchId = 0L).isDefined) // different app: lands
      assert(vt.read().count() === 5)
      assert(vt.history().count() === history + 1)
    } finally q.stop()
    // restart on the SAME checkpoint: already-committed batches are
    // not re-appended; new data still lands
    val q2 = in.toDF().toDF("k", "s").writeStream.format("graftvt")
      .option("checkpointLocation", ck).start(dir)
    try {
      in.addData((4L, "d"))
      q2.processAllAvailable()
      val vt = new graft.sources.VersionedTable(spark, dir)
      assert(vt.read().count() === 6)
      assert(vt.read().filter(col("s") === "d").count() === 1)
    } finally q2.stop()
  }

  test("sink contract: append-only, no partitionBy, needs a stable query id") {
    val dir = tmpVt()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // no checkpoint and no txnAppId → loud
    val e = intercept[Exception] {
      in.toDF().toDF("k", "s").writeStream.format("graftvt").start(dir)
    }
    assert(e.getMessage.contains("txnAppId") ||
      e.getMessage.contains("checkpointLocation"))
    // explicit txnAppId works without a checkpoint option
    val q = in.toDF().toDF("k", "s").writeStream.format("graftvt")
      .option("txnAppId", "spec-app")
      .option("checkpointLocation", ckpt()).start(dir)
    try {
      in.addData((1L, "a")); q.processAllAvailable()
      assert(new graft.sources.VersionedTable(spark, dir).read().count() === 1)
    } finally q.stop()
    // complete mode is rejected loudly
    val e2 = intercept[Exception] {
      in.toDF().toDF("k", "s").groupBy("s").count()
        .writeStream.format("graftvt").outputMode("complete")
        .option("checkpointLocation", ckpt()).start(tmpVt())
    }
    assert(e2.getMessage.toLowerCase.contains("append"))
  }

  test("stream-through: graftvt source feeding a graftvt sink preserves rows exactly once") {
    val src = tmpVt(); val dst = tmpVt()
    val vsrc = new graft.sources.VersionedTable(spark, src)
    vsrc.append((0L until 50L).map(k => (k, s"r$k")).toDF("k", "s"))
    val q = spark.readStream.format("graftvt").load(src)
      .withColumn("s", upper(col("s")))
      .writeStream.format("graftvt")
      .option("checkpointLocation", ckpt()).start(dst)
    try {
      q.processAllAvailable()
      vsrc.append((50L until 80L).map(k => (k, s"r$k")).toDF("k", "s"))
      q.processAllAvailable()
      val out = new graft.sources.VersionedTable(spark, dst).read()
      assert(out.count() === 80)
      assert(out.filter(col("s") === upper(col("s"))).count() === 80)
      assert(out.select(sum(col("k"))).head.getLong(0) === (0L until 80L).sum)
    } finally q.stop()
  }
}
