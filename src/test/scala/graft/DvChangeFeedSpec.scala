package graft

import org.apache.spark.sql.functions._

/** Change feeds over merge-on-read commits: the DSv2 file-level feed
  * (batch `readChangeFeed` and the streaming form) serves DV commits
  * from their persisted CDC — mixed-type sidecars split per embedded
  * change type — and folds deletion vectors when a rewrite removes (or
  * a restore re-adds) a DV'd directory. Every shape is pinned against
  * the row-level batch feed ([[graft.sources.VersionedTable.changes]]),
  * which was already exact.
  */
class DvChangeFeedSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_dvcdf_spec").toString

  private def cdf(dir: String, from: Int, to: Int) =
    spark.read.format("graftvt")
      .option("readChangeFeed", "true")
      .option("startingVersion", from).option("endingVersion", to)
      .load(dir)

  private def sig(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double, String, Int)] =
    df.select("k", "p", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getInt(3)))
      .toSeq.sorted

  test("batch CDF serves update-dv and merge-dv commits from their CDC") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))   // v0
    vt.update(col("k") < 5L, Map("p" -> lit(-1.0)),
      useDeletionVectors = true)                                        // v1
    vt.merge(Seq((50L, -2.0), (500L, 5.0)).toDF("k", "p"), Seq("k"),
      useDeletionVectors = true)                                        // v2
    assert(vt.history().orderBy("version").collect().map(_.getAs[String]("op"))
      .toSeq === Seq("append", "update-dv", "merge-dv"))
    val got = sig(cdf(dir, 1, 2))
    val want = sig(vt.changes(1, 2)
      .select("k", "p", "_change_type", "_commit_version"))
    assert(got === want)
    // type split is real: v1 contributes pre+post pairs only
    assert(got.filter(_._4 == 1).map(_._3).distinct.sorted ===
      Seq("update_postimage", "update_preimage"))
    assert(got.filter(_._4 == 2).count(_._3 == "insert") === 1)
  }

  test("CDF folds DVs when a rewrite removes a DV'd directory") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 50L).map(k => (k, k * 1.0)).toDF("k", "p"))    // v0
    vt.delete(col("k") < 5L, useDeletionVectors = true)                // v1
    vt.overwrite(Seq((999L, 0.0)).toDF("k", "p"))                      // v2
    val got = sig(cdf(dir, 2, 2))
    val want = sig(vt.changes(2, 2)
      .select("k", "p", "_change_type", "_commit_version"))
    assert(got === want)
    // the five DV-hidden rows are NOT re-reported as deletes
    assert(got.count(_._3 == "delete") === 45)
    assert(got.count(_._3 == "insert") === 1)
  }

  test("CDF serves renamed tables under the logical names") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 40L).map(k => (k, k * 1.0)).toDF("k", "p"))    // v0
    vt.renameColumn("p", "price")                                       // v1
    vt.delete(col("k") < 3L, useDeletionVectors = true)                 // v2
    vt.append(Seq((100L, 9.0)).toDF("k", "price"))                      // v3
    val feed = spark.read.format("graftvt")
      .option("readChangeFeed", "true")
      .option("startingVersion", 2).option("endingVersion", 3)
      .load(dir)
    assert(feed.columns.toSeq ===
      Seq("k", "price", "_change_type", "_commit_version"))
    val got = feed.select("k", "price", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getInt(3)))
      .toSeq.sorted
    val want = sig(vt.changes(2, 3)
      .withColumnRenamed("price", "p")
      .select("k", "p", "_change_type", "_commit_version"))
      .map { case (k, p, t, v) => (k, p, t, v) }
    assert(got === want)
    assert(got.count(_._3 == "delete") === 3)
    assert(got.count(_._3 == "insert") === 1)
  }

  test("streaming CDF: a DV DELETE lands mid-stream, sink equals batch CDF") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 60L).map(k => (k, k * 1.0)).toDF("k", "p"))    // v0
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, String, Int)]
    val q = spark.readStream.format("graftvt")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .load(dir).writeStream
      .option("checkpointLocation", tmpVt())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sunk ++= b.select("k", "p", "_change_type", "_commit_version")
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getInt(3)))
        ()
      }.start()
    q.processAllAvailable()
    vt.delete(col("k") % 6 === 0, useDeletionVectors = true)           // v1
    vt.update(col("k") === 1L, Map("p" -> lit(-9.0)),
      useDeletionVectors = true)                                        // v2
    q.processAllAvailable(); q.stop()
    val want = sig(vt.changes(0, 2)
      .select("k", "p", "_change_type", "_commit_version"))
    assert(sunk.sorted.toSeq === want)
  }
}
