package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    def q() = {
      val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      operators.CorpusHygiene.contaminationPairs(
        d, d.filter(col("doc_id") % 50 === 0), "doc_id", "text", 5, 2)
    }
    time("run1")(q().write.format("noop").mode("overwrite").save())
    time("run2")(q().write.format("noop").mode("overwrite").save())
    // isolate: benchmark-side shingling alone (the un-persisted side)
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("bench side alone")(operators.NearDup.shingleSets(
      d.filter(col("doc_id") % 50 === 0), "doc_id", "text", 5)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
