package graft

import org.apache.spark.sql.functions._

/** The V2 TableCatalog: table lifecycle (CREATE / INSERT / SELECT /
  * CTAS / time travel / RENAME / DROP) as native SQL over versioned
  * tables — no bridge views, no quoted paths.
  */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val enabled: Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")

  private def dropQuiet(name: String): Unit =
    try spark.sql(s"DROP TABLE IF EXISTS graft.$name") catch { case _: Exception => () }

  test("CREATE TABLE / INSERT INTO / SELECT round-trips through the catalog") {
    enabled
    dropQuiet("cat_t1")
    spark.sql("CREATE TABLE graft.cat_t1 (k BIGINT, v STRING) USING graftvt")
    // a created-empty table reads as an empty frame of the declared schema
    assert(spark.sql("SELECT * FROM graft.cat_t1").count() === 0)
    assert(spark.table("graft.cat_t1").schema.fieldNames.toSeq === Seq("k", "v"))
    spark.sql("INSERT INTO graft.cat_t1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.cat_t1 SELECT 3 AS k, 'c' AS v")
    assert(spark.sql("SELECT sum(k) FROM graft.cat_t1").head.getLong(0) === 6L)
    // INSERT OVERWRITE replaces the active set as one commit
    spark.sql("INSERT OVERWRITE graft.cat_t1 VALUES (9, 'z')")
    assert(spark.sql("SELECT k, v FROM graft.cat_t1").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))) === Seq((9L, "z")))
    // duplicate CREATE fails loudly; IF NOT EXISTS is quiet
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.cat_t1 (x INT) USING graftvt")
    }
    spark.sql("CREATE TABLE IF NOT EXISTS graft.cat_t1 (x INT) USING graftvt")
    dropQuiet("cat_t1")
  }

  test("native time travel: VERSION AS OF and TIMESTAMP AS OF resolve through loadTable") {
    enabled
    dropQuiet("cat_tt")
    spark.sql("CREATE TABLE graft.cat_tt (k BIGINT) USING graftvt") // v0
    spark.sql("INSERT INTO graft.cat_tt VALUES (1), (2)")           // v1
    spark.sql("INSERT INTO graft.cat_tt VALUES (3)")                // v2
    assert(spark.sql("SELECT count(*) FROM graft.cat_tt VERSION AS OF 0")
      .head.getLong(0) === 0)
    assert(spark.sql("SELECT count(*) FROM graft.cat_tt VERSION AS OF 1")
      .head.getLong(0) === 2)
    assert(spark.sql("SELECT count(*) FROM graft.cat_tt").head.getLong(0) === 3)
    // a future timestamp resolves to the latest version
    val futureTs = java.time.Instant.now().plusSeconds(60).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graft.cat_tt TIMESTAMP AS OF '$futureTs'")
      .head.getLong(0) === 3)
    // writes to a time-travelled load are rejected
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.cat_tt VERSION AS OF 1 VALUES (4)")
    }
    dropQuiet("cat_tt")
  }

  test("the same ISO instant pins the same version on every surface") {
    enabled
    dropQuiet("cat_ttu")
    spark.sql("CREATE TABLE graft.cat_ttu (k BIGINT) USING graftvt") // v0
    spark.sql("INSERT INTO graft.cat_ttu VALUES (1), (2)")           // v1
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql("INSERT INTO graft.cat_ttu VALUES (3)")                // v2
    // session zone is UTC — the ONE string both surfaces parse in it
    val iso = java.time.Instant.ofEpochMilli(betweenMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString
    val viaCatalog = spark.sql(
      s"SELECT count(*) FROM graft.cat_ttu TIMESTAMP AS OF '$iso'")
      .head.getLong(0)
    val dir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "_graft_catalog_graft"),
      "cat_ttu").toString
    val viaOption = spark.read.format("graftvt")
      .option("timestampAsOf", iso).load(dir).count()
    assert(viaCatalog === 2L)
    assert(viaOption === viaCatalog)
    dropQuiet("cat_ttu")
  }

  test("TBLPROPERTIES round-trip: CREATE, SHOW, SET/UNSET, DESCRIBE DETAIL") {
    enabled
    dropQuiet("cat_props")
    spark.sql("""CREATE TABLE graft.cat_props (k BIGINT) USING graftvt
                |TBLPROPERTIES ('retention'='30d', 'team'='ml')""".stripMargin)
    // served through loadTable().properties() → SHOW TBLPROPERTIES
    val shown = spark.sql("SHOW TBLPROPERTIES graft.cat_props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("retention") === Some("30d"))
    assert(shown.get("team") === Some("ml"))
    // ALTER SET updates/adds; UNSET removes; unknown UNSET is loud
    spark.sql("ALTER TABLE graft.cat_props SET TBLPROPERTIES ('retention'='7d', 'tier'='gold')")
    spark.sql("ALTER TABLE graft.cat_props UNSET TBLPROPERTIES ('team')")
    val shown2 = spark.sql("SHOW TBLPROPERTIES graft.cat_props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown2.get("retention") === Some("7d"))
    assert(shown2.get("tier") === Some("gold"))
    assert(!shown2.contains("team"))
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.cat_props UNSET TBLPROPERTIES ('nope')")
    }
    // DESCRIBE DETAIL serves the folded properties deterministically
    val dir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "_graft_catalog_graft"),
      "cat_props").toString
    assert(spark.sql(s"DESCRIBE DETAIL '$dir'").head.getString(5) ===
      "retention=7d,tier=gold")
    // properties survive a checkpointed log (fold + checkpoint parse)
    val vt = new graft.sources.VersionedTable(spark, dir)
    import spark.implicits._
    (0 until 11).foreach(i => vt.append(Seq((i.toLong)).toDF("k")))
    assert(vt.tableProperties() ===
      Map("retention" -> "7d", "tier" -> "gold"))
    dropQuiet("cat_props")
  }

  test("PARTITIONED BY (identity): one directory per partition value, pruned reads") {
    enabled
    dropQuiet("cat_part")
    spark.sql("""CREATE TABLE graft.cat_part (k BIGINT, d STRING, v DOUBLE)
                |USING graftvt PARTITIONED BY (d)""".stripMargin)
    // one INSERT spanning three dates → ONE commit, THREE directories,
    // each with an exact d stat (min = max = the partition value)
    spark.sql("""INSERT INTO graft.cat_part
                |SELECT id AS k,
                |       CASE WHEN id % 3 = 0 THEN '2026-01-01'
                |            WHEN id % 3 = 1 THEN '2026-01-02'
                |            ELSE '2026-01-03' END AS d,
                |       id * 1.5 AS v
                |FROM range(300)""".stripMargin)
    val dir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "_graft_catalog_graft"),
      "cat_part").toString
    val vt = new graft.sources.VersionedTable(spark, dir)
    assert(vt.latestVersion === 1) // create + ONE append commit
    assert(vt.activeDirs().size === 3)
    assert(vt.partitionColumns() === Seq("d"))
    // the manifest provably keeps 1 of 3 directories for a d = X read
    val (kept, skipped) =
      vt.pruneActive("d", Some("2026-01-02"), Some("2026-01-02"))
    assert(kept.size === 1 && skipped.size === 2)
    // a partition-scoped scan PLANS only the kept directory, and its
    // answer equals the unpruned recomputation
    val q = spark.sql(
      "SELECT count(*) AS n, round(sum(v), 2) AS s FROM graft.cat_part " +
        "WHERE d = '2026-01-02'")
    val scan = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan
    }.collectFirst { case s: graft.sources.GraftVtScan => s.parquet }.get
    assert(scan.fileIndex.rootPaths.length === 1)
    val full = spark.sql("SELECT * FROM graft.cat_part").collect()
      .filter(_.getString(1) == "2026-01-02")
    assert(q.head.getLong(0) === full.length.toLong)
    assert(q.head.getDouble(1) ===
      BigDecimal(full.map(_.getDouble(2)).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // DESCRIBE shows the partitioning; the table reports it natively
    assert(spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.sources.GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "cat_part"))
      .partitioning().map(_.toString).toSeq === Seq("identity(d)"))
    // a second INSERT into one partition adds ONE directory
    spark.sql("INSERT INTO graft.cat_part VALUES (1000, '2026-01-01', 9.0)")
    assert(vt.activeDirs().size === 4)
    // DELETE WHERE d = X discovery scans only that partition's dirs
    // (the stats-pruned candidate set is the partition, not the table)
    vt.delete(col("d") === "2026-01-03")
    assert(vt.lastDiscoveryDirs.size === 1)
    assert(spark.sql("SELECT count(*) FROM graft.cat_part").head.getLong(0)
      === 201L)
    dropQuiet("cat_part")
  }

  test("CTAS, RENAME, DROP, listTables, tableExists") {
    enabled
    dropQuiet("cat_src"); dropQuiet("cat_dst"); dropQuiet("cat_dst2")
    spark.sql("CREATE TABLE graft.cat_src USING graftvt AS SELECT id AS k, id * 2 AS dbl FROM range(10)")
    assert(spark.sql("SELECT sum(dbl) FROM graft.cat_src").head.getLong(0) === 90L)
    // the new name is resolved inside the same catalog (a leading
    // "graft." would read as a NAMESPACE, landing at warehouse/graft.cat_dst)
    spark.sql("ALTER TABLE graft.cat_src RENAME TO cat_dst")
    assert(spark.sql("SELECT count(*) FROM graft.cat_dst").head.getLong(0) === 10)
    assert(intercept[Exception] {
      spark.sql("SELECT * FROM graft.cat_src").collect()
    } != null)
    assert(spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("cat_dst"))
    assert(spark.sql("DROP TABLE graft.cat_dst") != null)
    assert(!spark.catalog.tableExists("graft.cat_dst"))
    // DROP of a missing table: IF EXISTS quiet, plain loud
    spark.sql("DROP TABLE IF EXISTS graft.cat_dst")
    intercept[Exception] { spark.sql("DROP TABLE graft.cat_never_was") }
  }

  test("catalog scans keep the DSv2 optimizations: skipping, agg pushdown, limit") {
    enabled
    dropQuiet("cat_opt")
    spark.sql("CREATE TABLE graft.cat_opt (k BIGINT, p DOUBLE) USING graftvt")
    spark.sql("INSERT INTO graft.cat_opt SELECT id, id * 1.0 FROM range(0, 100)")
    spark.sql("INSERT INTO graft.cat_opt SELECT id, id * 1.0 FROM range(100, 200)")
    spark.sql("INSERT INTO graft.cat_opt SELECT id, id * 1.0 FROM range(200, 300)")
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
      }.collectFirst { case s: graft.sources.GraftVtScan => s }
    // manifest range skipping straight through catalog SQL
    val q = spark.sql("SELECT count(*) FROM graft.cat_opt WHERE k BETWEEN 250 AND 260")
    assert(scanOf(q).get.parquet.fileIndex.rootPaths.length === 1)
    assert(q.head.getLong(0) === 11)
    // metadata-only aggregate: LocalTableScan, no BatchScan
    val agg = spark.sql("SELECT count(*), min(k), max(p) FROM graft.cat_opt")
    assert(agg.queryExecution.executedPlan.collectWithSubqueries {
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l
    }.nonEmpty)
    assert(agg.head === org.apache.spark.sql.Row(300L, 0L, 299.0))
    // limit pushdown
    val lim = spark.sql("SELECT * FROM graft.cat_opt LIMIT 50")
    assert(scanOf(lim).get.parquet.fileIndex.rootPaths.length === 1)
    assert(lim.count() === 50)
    // maintenance reaches catalog tables through the quoted path
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.sources.GraftCatalog]
    val dir = cat.tableDir(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array.empty, "cat_opt")).toString
    assert(spark.sql(s"DESCRIBE HISTORY '$dir'").count() === 4) // create + 3 inserts
    spark.sql(s"OPTIMIZE '$dir' ZORDER BY (k) INTO 2 CHUNKS")
    assert(spark.sql("SELECT count(*) FROM graft.cat_opt").head.getLong(0) === 300)
    dropQuiet("cat_opt")
  }

  test("DML and maintenance SQL address catalog tables by their natural names") {
    enabled
    dropQuiet("cat_dml")
    spark.sql("CREATE TABLE graft.cat_dml USING graftvt AS " +
      "SELECT id AS k, id * 1.0 AS p FROM range(100)")
    spark.sql("UPDATE graft.cat_dml SET p = -1.0 WHERE k < 10")
    assert(spark.sql("SELECT count(*) FROM graft.cat_dml WHERE p = -1.0")
      .head.getLong(0) === 10)
    spark.sql("DELETE FROM graft.cat_dml WHERE k >= 90")
    assert(spark.sql("SELECT count(*) FROM graft.cat_dml").head.getLong(0) === 90)
    spark.sql("CREATE TABLE graft.cat_dml_src USING graftvt AS " +
      "SELECT id + 95 AS k, 0.0 AS p FROM range(10)") // keys 95..104: all inserts
    spark.sql("MERGE INTO graft.cat_dml t USING graft.cat_dml_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT count(*) FROM graft.cat_dml").head.getLong(0) === 100)
    // maintenance on the catalog name (no quoted path)
    assert(spark.sql("DESCRIBE HISTORY graft.cat_dml").count() === 5)
    spark.sql("OPTIMIZE graft.cat_dml ZORDER BY (k) INTO 2 CHUNKS")
    assert(spark.sql("SELECT count(*) FROM graft.cat_dml").head.getLong(0) === 100)
    assert(spark.sql("DESCRIBE DETAIL graft.cat_dml").head.getInt(1) === 2)
    spark.sql("ALTER TABLE graft.cat_dml ADD CONSTRAINT pk CHECK (k >= 0)")
    intercept[Exception] {
      spark.sql("INSERT INTO graft.cat_dml VALUES (-1, 0.0)")
    }
    spark.sql("VACUUM graft.cat_dml RETAIN 1 VERSIONS")
    assert(spark.sql("SELECT count(*) FROM graft.cat_dml").head.getLong(0) === 100)
    dropQuiet("cat_dml"); dropQuiet("cat_dml_src")
  }

  test("ALTER TABLE ADD/DROP COLUMNS is metadata-only; re-adding live bytes is refused") {
    enabled
    dropQuiet("cat_alter")
    spark.sql("CREATE TABLE graft.cat_alter USING graftvt AS " +
      "SELECT id AS k, id * 1.0 AS p FROM range(5)")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.sources.GraftCatalog]
    val dir = cat.tableDir(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array.empty, "cat_alter")).toString
    val vt = new graft.sources.VersionedTable(spark, dir)
    val localDir = dir.stripPrefix("file:")
    val filesBefore = new java.io.File(localDir).listFiles()
      .filter(_.getName.startsWith("v")).flatMap(_.listFiles())
      .map(f => (f.getName, f.lastModified())).toSet
    // ADD COLUMNS: old rows read the new column as null; no file touched
    spark.sql("ALTER TABLE graft.cat_alter ADD COLUMNS (tag STRING)")
    assert(spark.table("graft.cat_alter").schema.fieldNames.toSeq ===
      Seq("k", "p", "tag"))
    assert(spark.sql("SELECT count(*) FROM graft.cat_alter WHERE tag IS NULL")
      .head.getLong(0) === 5)
    val filesAfter = new java.io.File(localDir).listFiles()
      .filter(_.getName.startsWith("v")).flatMap(_.listFiles())
      .map(f => (f.getName, f.lastModified())).toSet
    assert(filesAfter === filesBefore) // metadata-only, byte-identical
    // new writes carry the column; time travel keeps the old schema
    spark.sql("INSERT INTO graft.cat_alter VALUES (9, 9.0, 'x')")
    assert(spark.sql("SELECT tag FROM graft.cat_alter WHERE k = 9")
      .head.getString(0) === "x")
    assert(!spark.sql("SELECT * FROM graft.cat_alter VERSION AS OF 1")
      .schema.fieldNames.contains("tag"))
    // DROP COLUMN hides it (bytes stay); re-adding the LIVE name is loud
    spark.sql("ALTER TABLE graft.cat_alter DROP COLUMN tag")
    assert(!spark.table("graft.cat_alter").schema.fieldNames.contains("tag"))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.cat_alter ADD COLUMNS (tag STRING)")
    }
    assert(e.getMessage.contains("resurface"))
    // after a full rewrite the name is free again and reads null
    spark.sql("OPTIMIZE graft.cat_alter ZORDER BY (k) INTO 1 CHUNKS")
    spark.sql("ALTER TABLE graft.cat_alter ADD COLUMNS (tag STRING)")
    assert(spark.sql("SELECT count(*) FROM graft.cat_alter WHERE tag IS NULL")
      .head.getLong(0) === 6)
    dropQuiet("cat_alter")
  }

  test("schema is enforced on insert; evolution still works through the Scala API") {
    enabled
    dropQuiet("cat_schema")
    spark.sql("CREATE TABLE graft.cat_schema (k INT, v STRING) USING graftvt")
    // Spark validates INSERT arity/types against the catalog schema
    intercept[Exception] { spark.sql("INSERT INTO graft.cat_schema VALUES (1)") }
    spark.sql("INSERT INTO graft.cat_schema VALUES (1, 'a')")
    // int column stays int (the declared physical type wins)
    assert(spark.table("graft.cat_schema").schema("k").dataType ===
      org.apache.spark.sql.types.IntegerType)
    dropQuiet("cat_schema")
  }
}
