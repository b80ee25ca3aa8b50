package graft

import org.apache.spark.sql.functions._
import graft.sources.{MergeAction, MergeClause}

/** The NESTED-FIELD EVOLUTION CONTRACT, pinned explicitly: schema
  * evolution (catalog ALTER, SQL ALTER, MERGE evolution) operates on
  * TOP-LEVEL columns; nested struct/array/map fields do not evolve —
  * every path refuses LOUDLY with an actionable message instead of
  * silently casting or silently dropping. Nested columns whose types
  * MATCH the table exactly flow through every path unchanged.
  */
class NestedEvolutionContractSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_nested").toString

  private def seeded(): (String, graft.sources.VersionedTable) = {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "v", "cat")
      .withColumn("meta", struct(col("cat").as("tag"), lit(1).as("gen"))))
    (dir, vt)
  }

  test("catalog ALTER refuses nested field paths loudly") {
    val dir = tmpVt()
    new graft.sources.VersionedTable(spark, dir)
      .append(Seq((1L, "a")).toDF("k", "s"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    try spark.sql("DROP TABLE IF EXISTS graft.nested_t")
    catch { case _: Exception => () }
    spark.sql("CREATE TABLE graft.nested_t (k BIGINT, " +
      "meta STRUCT<tag: STRING, gen: INT>) USING graftvt")
    try {
      val add = intercept[Exception] {
        spark.sql("ALTER TABLE graft.nested_t ADD COLUMNS (meta.extra INT)")
      }
      assert(add.getMessage.contains("top-level"))
      val ren = intercept[Exception] {
        spark.sql("ALTER TABLE graft.nested_t RENAME COLUMN meta.tag TO label")
      }
      assert(ren.getMessage.contains("top-level"))
      val wid = intercept[Exception] {
        spark.sql("ALTER TABLE graft.nested_t ALTER COLUMN meta.gen TYPE BIGINT")
      }
      assert(wid.getMessage.contains("top-level"))
    } finally spark.sql("DROP TABLE IF EXISTS graft.nested_t")
  }

  test("MERGE evolution refuses a nested type diff loudly — never a silent cast") {
    val (_, vt) = seeded()
    // the source spells meta.gen as BIGINT where the table has INT —
    // a nested diff no metadata-only evolution can express
    val src = Seq((1L, 100.0, "x")).toDF("k", "v", "cat")
      .withColumn("meta", struct(col("cat").as("tag"), lit(9L).as("gen")))
    val e = intercept[IllegalArgumentException] {
      vt.mergeClauses(src, Seq("k"),
        matched = Seq(MergeClause(None, MergeAction.Update(None))),
        notMatched = Seq(MergeClause(None, MergeAction.Insert(None))),
        evolveSchema = true)
    }
    assert(e.getMessage.contains("nested"))
    assert(e.getMessage.contains("meta"))
  }

  test("nested columns with EXACTLY matching types flow through merge evolution") {
    val (_, vt) = seeded()
    val src = Seq((1L, 100.0, "x", "t1")).toDF("k", "v", "cat", "tag0")
      .withColumn("meta", struct(col("cat").as("tag"), lit(7).as("gen")))
      .drop("tag0")
    val v = vt.mergeClauses(src, Seq("k"),
      matched = Seq(MergeClause(None, MergeAction.Update(None))),
      notMatched = Seq(MergeClause(None, MergeAction.Insert(None))),
      evolveSchema = true)
    assert(v === vt.latestVersion)
    val got = vt.read().filter(col("k") === 1L)
      .select(col("v"), col("meta.gen")).head
    assert(got.getDouble(0) === 100.0 && got.getInt(1) === 7)
  }

  test("an evolving APPEND with a nested type diff refuses at write time") {
    val (dir, vt) = seeded()
    val bad = Seq((5L, 50.0, "z")).toDF("k", "v", "cat")
      .withColumn("meta", struct(col("cat").as("tag"), lit(9L).as("gen")))
    val e = intercept[IllegalStateException] { vt.append(bad) }
    assert(e.getMessage.contains("meta"))
    // nothing landed
    assert(new graft.sources.VersionedTable(spark, dir).read().count() === 2)
  }
}
