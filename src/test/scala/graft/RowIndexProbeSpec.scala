package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex, NoopCache}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Contract canary: the DSv2 parquet readers fill a read-schema field
  * named ROW_INDEX_TEMPORARY_COLUMN_NAME with per-file row indices —
  * the public mechanism the vectorized DV read path
  * ([[graft.sources.GraftVtDvBatch]]) rides. If a Spark upgrade breaks
  * this, THIS spec points at the cause before any DV gate does.
  */
class RowIndexProbeSpec extends SparkSuite {
  import spark.implicits._

  test("ParquetScan fills the temporary row-index column") {
    val dir = java.nio.file.Files.createTempDirectory("rowidx").toString + "/t"
    (0L until 1000L).map(k => (k, s"s$k")).toDF("k", "s")
      .repartition(3).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val readSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
        org.apache.spark.sql.types.LongType, nullable = true))
    val opts = new CaseInsensitiveStringMap(java.util.Map.of())
    val index = new InMemoryFileIndex(spark, Seq(new Path(dir)),
      Map.empty[String, String], Some(schema), NoopCache, None, None)
    val scan = ParquetScan(spark,
      spark.sessionState.newHadoopConfWithOptions(Map.empty),
      index,
      dataSchema = schema,
      readDataSchema = readSchema,
      readPartitionSchema = new StructType(),
      pushedFilters = Array.empty,
      options = opts)
    val batch = scan.toBatch
    val parts = batch.planInputPartitions()
    assert(parts.nonEmpty)
    val factory = batch.createReaderFactory()
    // row-based read of every partition: collect (k, rowIdx) pairs
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    parts.foreach { p =>
      val fp = p.asInstanceOf[FilePartition]
      fp.files.foreach { f =>
        val one = FilePartition(0, Array(f))
        val r = factory.createReader(one)
        var last = -1L
        while (r.next()) {
          val row = r.get()
          val idx = row.getLong(2)
          assert(idx > last, s"row index must increase within a file: $idx after $last")
          last = idx
          collected += ((row.getLong(0), idx))
        }
        r.close()
      }
    }
    assert(collected.size === 1000)
    assert(collected.map(_._1).toSet === (0L until 1000L).toSet)
    // per-file indices start at 0 and are dense
    val byFirst = collected.map(_._2)
    assert(byFirst.count(_ == 0L) === 3) // one zero per file
  }
}
