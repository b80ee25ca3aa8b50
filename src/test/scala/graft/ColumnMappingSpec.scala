package graft

import org.apache.spark.sql.functions._

/** ALTER TABLE RENAME COLUMN via log-level column mapping: the schema
  * commit records logical names, each renamed field pins the PHYSICAL
  * parquet name its bytes carry — no data file is touched, old
  * versions keep their own names, reads/writes/mutations/pruning all
  * address the new name, and a full OPTIMIZE normalizes the map away.
  */
class ColumnMappingSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_cm_spec").toString

  private def dataFiles(dir: String): Set[(String, Long)] = {
    val local = new java.io.File(dir)
    local.listFiles().filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getParentFile.getName + "/" + f.getName, f.lastModified()))
      .toSet
  }

  test("rename is metadata-only; old versions keep their names") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "p"))
    val before = dataFiles(dir)
    val v = vt.renameColumn("s", "label")
    assert(v === 1)
    assert(dataFiles(dir) === before)
    assert(vt.read().columns.toSeq === Seq("k", "label", "p"))
    assert(vt.read().filter(col("label") === "a").head.getLong(0) === 1L)
    assert(vt.readAt(0).columns.toSeq === Seq("k", "s", "p")) // time travel
    // rename to a live name, to itself, or of a missing column: loud
    intercept[Exception](vt.renameColumn("label", "p"))
    intercept[Exception](vt.renameColumn("label", "label"))
    intercept[Exception](vt.renameColumn("nope", "x"))
  }

  test("appends, mutations, and pruning address the new name") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))
    vt.append((100L until 200L).map(k => (k, k * 1.0)).toDF("k", "p"))
    vt.renameColumn("k", "id")
    // append THROUGH the new name: files spell the physical name, the
    // read serves the logical one
    vt.append(Seq((500L, 0.5)).toDF("id", "p"))
    assert(vt.read().filter(col("id") === 500L).count() === 1)
    // stats pruning through the new name (the index stays keyed by the
    // stable physical name)
    val (kept, skipped) = vt.pruneActive("id", Some(150L), Some(160L))
    assert(kept.size === 1 && skipped.size === 2)
    // mutations through the new name; discovery still stats-pruned
    vt.update(col("id") === 150L, Map("p" -> lit(-1.0)))
    assert(vt.lastDiscoveryDirs.size === 1)
    assert(vt.read().filter(col("p") === -1.0).count() === 1)
    vt.delete(col("id") >= 190L && col("id") < 200L)
    assert(vt.read().count() === 191)
    // merge on the renamed key
    vt.merge(Seq((0L, 99.0), (1000L, 1.0)).toDF("id", "p"), Seq("id"))
    assert(vt.read().filter(col("id") === 0L).head.getDouble(1) === 99.0)
    assert(vt.read().count() === 192)
    // metadata answers stay exact through the mapping
    assert(vt.fastCount() === Some(192L))
    assert(vt.fastNonNullCount("id") === Some(192L))
    assert(vt.statRange("id") === Some((0L, 1000L)))
  }

  test("DSv2 serves renamed tables (fallback) and OPTIMIZE normalizes") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 2.0)).toDF("k", "p"))
    vt.renameColumn("p", "price")
    val t = spark.read.format("graftvt").load(dir)
    assert(t.columns.toSeq === Seq("k", "price"))
    assert(t.filter(col("price") > 100.0).count() === 49)
    // unfiltered COUNT(*) still metadata-only; MIN/MAX map and stay exact
    assert(t.groupBy().count().head.getLong(0) === 100L)
    assert(vt.statRange("price") === Some((0.0, 198.0)))
    // pre-rename version reads through the plain parquet path
    assert(spark.read.format("graftvt").option("versionAsOf", 0).load(dir)
      .columns.toSeq === Seq("k", "p"))
    // streaming a renamed table serves the logical names (the reader
    // factory reads the physical schema; rows are positional)
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = spark.readStream.format("graftvt").load(dir).writeStream
      .option("checkpointLocation", tmpVt())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(b.columns.toSeq === Seq("k", "price"))
        sunk ++= b.collect().map(r => (r.getLong(0), r.getDouble(1)))
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(sunk.size === 100)
    assert(sunk.map(_._2).max === 198.0)
    // a FULL rewrite normalizes: files spell the logical names, the map
    // dissolves, the vectorized DSv2 path returns
    vt.optimize("k", 2)
    assert(vt.renamesAt(vt.latestVersion).isEmpty)
    assert(spark.read.parquet(
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.contains("-opt"))
        .head.getPath).columns.contains("price"))
    val t2 = spark.read.format("graftvt").load(dir)
    assert(t2.filter(col("price") > 100.0).count() === 49)
    val scans = t2.filter(col("price") > 100.0).queryExecution.executedPlan
      .collect { case b: org.apache.spark.sql.execution.datasources.v2
        .BatchScanExec => b }
    assert(scans.nonEmpty) // back on the parquet BatchScan path
  }

  test("residue guards: old physical bytes cannot be re-addressed") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, "x")).toDF("k", "s"))
    vt.renameColumn("s", "label")
    // addColumns of the old name: its bytes still live — refused
    val e1 = intercept[Exception](vt.addColumns(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType)))))
    assert(e1.getMessage.contains("resurface"))
    // an evolving APPEND reintroducing the old name: same guard
    val e2 = intercept[Exception](
      vt.append(Seq((2L, "y", "ghost")).toDF("k", "label", "s")))
    assert(e2.getMessage.contains("resurface"))
    // renaming another column ONTO live bytes: refused
    vt.append(Seq((3L, "z")).toDF("k", "label"))
    val e3 = intercept[Exception](vt.renameColumn("k", "s"))
    assert(e3.getMessage.contains("bytes named"))
    // renaming BACK to the physical name dissolves the mapping
    vt.renameColumn("label", "s")
    assert(vt.renamesAt(vt.latestVersion).isEmpty)
    assert(vt.read().columns.toSeq === Seq("k", "s"))
  }

  test("overwrite replaces the map: files and schema agree afterwards") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, "a")).toDF("k", "s"))
    vt.renameColumn("s", "label")
    // the overwrite payload DEFINES the table anew — its files spell
    // the new names and the column map dissolves with the old data
    vt.overwrite(Seq((9L, "z"), (10L, "y")).toDF("k", "label"))
    assert(vt.renamesAt(vt.latestVersion).isEmpty)
    assert(vt.read().orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq === Seq((9L, "z"), (10L, "y")))
    // the DSv2 path is the plain parquet scan again, values intact
    assert(spark.read.format("graftvt").load(dir)
      .filter(col("label") === "z").count() === 1)
    // pre-overwrite version still maps
    assert(vt.readAt(1).columns.toSeq === Seq("k", "label"))
    assert(vt.readAt(1).head.getString(1) === "a")
  }

  test("constraint-referenced columns cannot be renamed or dropped") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, 5.0)).toDF("k", "p"))
    vt.addConstraint("pos_p", "p >= 0")
    val e1 = intercept[Exception](vt.renameColumn("p", "price"))
    assert(e1.getMessage.contains("pos_p"))
    val e2 = intercept[Exception](vt.dropColumns(Seq("p")))
    assert(e2.getMessage.contains("pos_p"))
    // unrelated columns still rename; dropping the constraint unblocks
    vt.renameColumn("k", "id")
    vt.dropConstraint("pos_p")
    vt.renameColumn("p", "price")
    assert(vt.read().columns.toSeq === Seq("id", "price"))
    // writes through the renamed schema still validate fresh constraints
    vt.addConstraint("pos_price", "price >= 0")
    intercept[Exception](vt.append(Seq((2L, -1.0)).toDF("id", "price")))
    vt.append(Seq((2L, 1.0)).toDF("id", "price"))
    assert(vt.read().count() === 2)
  }

  test("changes() and CDC serve the current names across a rename") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "p"))       // v0
    vt.renameColumn("p", "price")                              // v1
    vt.update(col("k") === 1L, Map("price" -> lit(9.0)),
      writeChangeData = true)                                  // v2
    val ch = vt.changes(0, 2)
    assert(ch.columns.contains("price") && !ch.columns.contains("p"))
    val post = ch.filter(col("_change_type") === "update_postimage")
      .head
    assert(post.getAs[Double]("price") === 9.0)
    // the v0 insert synthesis also serves the CURRENT name
    assert(ch.filter(col("_change_type") === "insert").count() === 2)
  }

  test("catalog: ALTER TABLE RENAME COLUMN through SQL") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    try spark.sql("DROP TABLE IF EXISTS graft.cm_t") catch { case _: Exception => () }
    spark.sql("CREATE TABLE graft.cm_t (k BIGINT, v STRING) USING graftvt")
    spark.sql("INSERT INTO graft.cm_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.cm_t RENAME COLUMN v TO tag")
    assert(spark.table("graft.cm_t").columns.toSeq === Seq("k", "tag"))
    assert(spark.sql("SELECT k FROM graft.cm_t WHERE tag = 'b'")
      .head.getLong(0) === 2L)
    // mutate through the new name; insert through the new schema
    spark.sql("INSERT INTO graft.cm_t VALUES (3, 'c')")
    spark.sql("UPDATE graft.cm_t SET tag = 'B' WHERE k = 2")
    assert(spark.sql("SELECT tag FROM graft.cm_t ORDER BY k").collect()
      .map(_.getString(0)).toSeq === Seq("a", "B", "c"))
    // time travel keeps the old name
    assert(spark.sql("SELECT * FROM graft.cm_t VERSION AS OF 1")
      .columns.toSeq === Seq("k", "v"))
    spark.sql("DROP TABLE graft.cm_t")
  }

  test("partitioned table: renaming the partition column keeps the split") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.create(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.StringType))),
      partitionCols = Seq("d"))
    vt.append(Seq((1L, "x"), (2L, "y")).toDF("k", "d"))
    assert(vt.activeDirs().size === 2)
    vt.renameColumn("d", "day")
    assert(vt.partitionColumns() === Seq("day"))
    // appends through the new name still split per partition value
    vt.append(Seq((3L, "x"), (4L, "z")).toDF("k", "day"))
    assert(vt.activeDirs().size === 4)
    val (kept, _) = vt.pruneActive("day", Some("x"), Some("x"))
    assert(kept.size === 2)
    assert(vt.read().filter(col("day") === "x").count() === 2)
    // A FULL rewrite normalizes the column map away — the commit must
    // re-record the partition columns under the now-logical names, or
    // partitionColumns() would serve a name absent from the schema and
    // appends would silently stop splitting.
    vt.optimize(clusterBy = "k", targetChunks = 1)
    assert(vt.partitionColumns() === Seq("day"))
    assert(vt.read().schema.fieldNames.toSeq === Seq("k", "day"))
    val before = vt.activeDirs().size
    vt.append(Seq((5L, "x"), (6L, "w")).toDF("k", "day"))
    assert(vt.activeDirs().size === before + 2) // still one dir per value
    val (kept2, _) = vt.pruneActive("day", Some("w"), Some("w"))
    assert(kept2.size === 1)
    assert(vt.read().filter(col("day") === "w").count() === 1)
    // and a SECOND rename after normalization keeps working
    vt.renameColumn("day", "dt")
    assert(vt.partitionColumns() === Seq("dt"))
    vt.append(Seq((7L, "w")).toDF("k", "dt"))
    assert(vt.read().filter(col("dt") === "w").count() === 2)
  }
}
