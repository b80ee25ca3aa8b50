package graft

import org.apache.spark.sql.functions._

/** Path-based SQL ALTER surface — `ALTER TABLE '<path>' ADD COLUMNS /
  * RENAME COLUMN / ALTER COLUMN TYPE / DROP COLUMNS` for SQL-only
  * users (previously only constraints were path-addressable; schema
  * changes needed the V2 catalog or the Scala API). All four hit the
  * same METADATA-ONLY commits as the API: no data file is touched.
  */
class SqlAlterSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_sqlalter").toString

  private def fileState(dir: String): Set[(String, Long)] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d{5}-.*"))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet

  test("ADD COLUMNS / RENAME COLUMN / ALTER COLUMN TYPE / DROP COLUMNS over a quoted path, all metadata-only") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1, "a", 0.5), (2, "b", 1.5)).toDF("k", "s", "junk"))
    val before = fileState(dir)

    assert(spark.sql(
      s"ALTER TABLE '$dir' ADD COLUMNS (tag STRING, score DECIMAL(10,2))")
      .head.getInt(0) === 1)
    assert(vt.tableSchema().fieldNames.toSeq ===
      Seq("k", "s", "junk", "tag", "score"))

    assert(spark.sql(s"ALTER TABLE '$dir' RENAME COLUMN s TO label")
      .head.getInt(0) === 2)
    assert(vt.tableSchema().fieldNames.toSeq ===
      Seq("k", "label", "junk", "tag", "score"))

    assert(spark.sql(s"ALTER TABLE '$dir' ALTER COLUMN k TYPE BIGINT")
      .head.getInt(0) === 3)
    assert(vt.tableSchema()("k").dataType ===
      org.apache.spark.sql.types.LongType)
    // Spark's own spelling works too
    assert(spark.sql(
      s"ALTER TABLE '$dir' ALTER COLUMN score SET DATA TYPE DECIMAL(20,2)")
      .head.getInt(0) === 4)

    assert(spark.sql(s"ALTER TABLE '$dir' DROP COLUMNS (junk)")
      .head.getInt(0) === 5)
    assert(vt.tableSchema().fieldNames.toSeq ===
      Seq("k", "label", "tag", "score"))

    // five schema commits, zero data movement
    assert(fileState(dir) === before)
    // the evolved read: old rows upcast + pad null through every change
    val got = spark.read.format("graftvt").load(dir)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2))).toSeq
    assert(got === Seq((1L, "a", true), (2L, "b", true)))
  }

  test("widening refusals and unknown columns stay loud through SQL") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, "a")).toDF("k", "s"))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE '$dir' ALTER COLUMN k TYPE INT") // narrowing
    }
    assert(e.getMessage.contains("lossless"))
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE '$dir' RENAME COLUMN nope TO x")
    }
    assert(e2.getMessage.contains("does not exist"))
  }

  test("ALTER on non-versioned targets falls through to Spark untouched") {
    // a plain temp view: Spark's own analyzer must receive the
    // statement (and reject it as non-alterable) — not our commands
    Seq((1, "a")).toDF("k", "s").createOrReplaceTempView("sqlalter_plain")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE sqlalter_plain ADD COLUMNS (x INT)")
    }
    // Spark's error, about the relation — not a graft refusal
    assert(!Option(e.getMessage).getOrElse("").contains("graft"))
  }

  test("bridge-named tables are SQL-alterable and the view refreshes") {
    val tm = new graft.sources.TableManager(spark)
    val name = s"sqlalter_bridge_${System.nanoTime}"
    tm.appendVersioned(Seq((1, "a")).toDF("k", "s"), name)
    spark.sql(s"ALTER TABLE $name ADD COLUMNS (extra INT)")
    assert(spark.table(name).columns.toSeq === Seq("k", "s", "extra"))
    spark.sql(s"ALTER TABLE $name RENAME COLUMN extra TO bonus")
    assert(spark.table(name).columns.toSeq === Seq("k", "s", "bonus"))
  }
}
