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
    def star() = SparkEntry.queries("dedup_clusters_star")(spark, "/root/testdata/sf0.1")
    time("star 1")(star().write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    time("star 2")(star().write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
