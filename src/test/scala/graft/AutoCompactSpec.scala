package graft

import org.apache.spark.sql.functions._

/** OPT-IN AUTO-COMPACTION FOR APPENDS (Delta's auto-compaction): a
  * steady append stream accrues small files until a manual OPTIMIZE —
  * unless the table's own TBLPROPERTIES ask the post-commit hook to
  * fold them: when at least `graft.autoCompact.minFiles` active,
  * DV-free directories are each under `graft.autoCompact.smallBytes`,
  * ONE maintenance commit (op `optimize`, dataChange = false — streams
  * never replay it) rewrites exactly those directories into one.
  * Same policy as the DV hooks: at most one maintenance commit per
  * trigger, race losses are silent, the user's append never fails.
  */
class AutoCompactSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_autocompact").toString

  private def activeDirCount(vt: graft.sources.VersionedTable): Int =
    vt.activeDirs().size

  test("N small appends leave a bounded directory count with zero manual calls") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((0L, "seed")).toDF("k", "s"))
    vt.setProperties(Map(
      "graft.autoCompact.minFiles" -> "4",
      "graft.autoCompact.smallBytes" -> (32L * 1024 * 1024).toString))
    // five more tiny appends: at the fourth small directory the hook
    // folds all four into one; the stragglers stay until the next
    // threshold crossing
    (1L to 5L).foreach(i => vt.append(Seq((i, s"r$i")).toDF("k", "s")))
    assert(activeDirCount(vt) === 3) // 4->1 at the trigger, then +2
    val ops = vt.history().orderBy("version").collect()
      .map(_.getString(1)).toSeq
    assert(ops.count(_ == "optimize") === 1) // ONE maintenance commit
    assert(ops.count(_ == "append") === 6)
    // nothing lost, nothing duplicated
    assert(vt.read().select("k").collect().map(_.getLong(0)).sorted.toSeq
      === (0L to 5L))
    // time travel below the compaction still serves the small dirs
    assert(vt.readAt(3).count() === 3)
  }

  test("directories at or above smallBytes are never auto-compacted") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((0L, "seed")).toDF("k", "s"))
    vt.setProperties(Map(
      "graft.autoCompact.minFiles" -> "2",
      "graft.autoCompact.smallBytes" -> "1")) // nothing is "small"
    (1L to 4L).foreach(i => vt.append(Seq((i, s"r$i")).toDF("k", "s")))
    assert(activeDirCount(vt) === 5)
    assert(vt.history().filter(col("op") === "optimize").count() === 0)
  }

  test("DV-carrying directories are left to the DV hooks, not swept into append compaction") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 50L).map(k => (k, s"r$k")).toDF("k", "s"))
    // attach a DV to the first directory BEFORE enabling the hook
    vt.delete(col("k") === 1L, useDeletionVectors = true)
    val dvDir = vt.dvsAt(vt.latestVersion).keys.head
    vt.setProperties(Map(
      "graft.autoCompact.minFiles" -> "3",
      "graft.autoCompact.smallBytes" -> (32L * 1024 * 1024).toString))
    (1L to 3L).foreach(i => vt.append(Seq((100L + i, s"x$i")).toDF("k", "s")))
    // the DV'd directory survives untouched; the DV-free small ones fold
    assert(vt.activeDirs().contains(dvDir))
    assert(vt.dvsAt(vt.latestVersion).contains(dvDir))
    assert(vt.history().filter(col("op") === "optimize").count() >= 1)
    assert(vt.read().count() === 52) // 50 - 1 hidden + 3 appended
  }

  test("the streaming source never replays an auto-compaction (dataChange = false)") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((0L, "seed")).toDF("k", "s"))
    vt.setProperties(Map(
      "graft.autoCompact.minFiles" -> "3",
      "graft.autoCompact.smallBytes" -> (32L * 1024 * 1024).toString))
    val sink = s"vt_ac_stream_${System.nanoTime}"
    val ckpt = java.nio.file.Files.createTempDirectory("vt_ac_ck").toString
    val q = spark.readStream.format("graftvt").load(dir)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      (1L to 4L).foreach(i => vt.append(Seq((i, s"r$i")).toDF("k", "s")))
      assert(vt.history().filter(col("op") === "optimize").count() >= 1)
      q.processAllAvailable()
      // exactly once despite the mid-stream compaction commit
      assert(spark.table(sink).select("k").collect().map(_.getLong(0)).sorted
        .toSeq === (0L to 4L))
    } finally q.stop()
  }
}
