package graft

import org.apache.spark.sql.functions._

/** MID-STREAM SCHEMA CHANGES against the versioned streaming source
  * and the change feed — the contract pinned on
  * [[graft.sources.GraftVtMicroBatchStream]]: the read schema is
  * pinned at stream start; servable changes (add / rename — no byte
  * moves) keep streaming transparently, unservable ones (a type
  * widening: later files spell a pinned column wider) fail with an
  * explicit "restart the stream" error at the first batch that crosses
  * the change — NEVER a raw parquet cast failure rows later. Batch
  * `readChangeFeed` reads bind the CURRENT schema, so a range spanning
  * a widen boundary serves the evolved type (old narrow files upcast).
  */
class StreamSchemaChangeSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_schchg").toString

  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("vt_schchg_ck").toString

  private def seeded(): (String, graft.sources.VersionedTable) = {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1, "a"), (2, "b")).toDF("k", "s"))
    (dir, vt)
  }

  private def rootMessage(t: Throwable): String = {
    var cur = t
    val sb = new StringBuilder(Option(cur.getMessage).getOrElse(""))
    while (cur.getCause != null) {
      cur = cur.getCause
      sb.append(" | ").append(Option(cur.getMessage).getOrElse(""))
    }
    sb.toString
  }

  test("ADD COLUMNS mid-stream keeps serving the pinned schema; widen fails with the explicit restart error") {
    val (dir, vt) = seeded()
    val sink = s"vt_schchg_add_${System.nanoTime}"
    val q = spark.readStream.format("graftvt").load(dir)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 2)
      // servable evolution: a new column appears; the pinned stream
      // never projects it and keeps flowing
      vt.addColumns(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.DoubleType))))
      vt.append(Seq((3, "c", 0.5)).toDF("k", "s", "extra"))
      q.processAllAvailable()
      assert(spark.table(sink).select("k").collect().map(_.getInt(0)).sorted
        .toSeq === Seq(1, 2, 3))
      // UNSERVABLE evolution: k widens int -> long; post-widen files
      // carry int64 pages the pinned int read cannot serve — the guard
      // must fail the stream AT the widen commit, explicitly
      vt.widenColumn("k", org.apache.spark.sql.types.LongType)
      vt.append(Seq((4L, "d", 1.5)).toDF("k", "s", "extra"))
      val e = intercept[Exception] { q.processAllAvailable() }
      val msg = rootMessage(e)
      assert(msg.contains("restart the stream"), s"got: $msg")
      assert(msg.contains("`k`"), s"got: $msg")
    } finally q.stop()
  }

  test("RENAME mid-stream is metadata-only and keeps serving (bytes keep physical names)") {
    val (dir, vt) = seeded()
    val sink = s"vt_schchg_ren_${System.nanoTime}"
    val q = spark.readStream.format("graftvt").load(dir)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      vt.renameColumn("s", "label")
      // post-rename appends write the ORIGINAL physical name; the
      // pinned stream (old logical = physical here) serves them
      vt.append(Seq((3, "c")).toDF("k", "label"))
      q.processAllAvailable()
      assert(spark.table(sink).select("s").collect().map(_.getString(0)).sorted
        .toSeq === Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("the CHANGE FEED stream fails explicitly at a widen, not on the first wide file") {
    val (dir, vt) = seeded()
    val sink = s"vt_schchg_cdf_${System.nanoTime}"
    val q = spark.readStream.format("graftvt")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(dir)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 2)
      vt.widenColumn("k", org.apache.spark.sql.types.LongType)
      vt.append(Seq((3L, "c")).toDF("k", "s"))
      val e = intercept[Exception] { q.processAllAvailable() }
      val msg = rootMessage(e)
      assert(msg.contains("restart the stream"), s"got: $msg")
    } finally q.stop()
  }

  test("a RESTARTED stream (fresh start after the widen) serves the evolved schema, history upcast") {
    val (dir, vt) = seeded()
    vt.widenColumn("k", org.apache.spark.sql.types.LongType)
    vt.append(Seq((3L, "c")).toDF("k", "s"))
    // the restart pins the NEW schema: old int files upcast, new long
    // files read natively — the error message's recovery path works
    val sink = s"vt_schchg_restart_${System.nanoTime}"
    val q = spark.readStream.format("graftvt").load(dir)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt()).start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).schema("k").dataType ===
        org.apache.spark.sql.types.LongType)
      assert(spark.table(sink).select("k").collect().map(_.getLong(0)).sorted
        .toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("batch readChangeFeed SPANNING the widen boundary serves the evolved type") {
    val (dir, vt) = seeded()                         // v0: (1,a),(2,b) int k
    vt.widenColumn("k", org.apache.spark.sql.types.LongType) // v1: alter
    vt.append(Seq((3L, "c")).toDF("k", "s"))         // v2: long k
    val cdf = spark.read.format("graftvt")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0").option("endingVersion", "2")
      .load(dir)
    assert(cdf.schema("k").dataType === org.apache.spark.sql.types.LongType)
    val got = cdf.select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, "insert", 0), (2L, "insert", 0),
      (3L, "insert", 2)))
  }
}
