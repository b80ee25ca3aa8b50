package graft.pipelines

import org.apache.spark.sql.SparkSession

import graft.sources.TableManager

/** CLI entry point mirroring the reference's runnable pipeline scripts
  * (each of the 21 reference files is a `main` that ingests, loads, and
  * prints a quality report — e.g. `First experiment/GPT 5.py:152-161`).
  *
  * Usage: runMain graft.pipelines.PipelineRunner <aqJson> <wxJson> <warehouseDir>
  */
object PipelineRunner {
  def main(args: Array[String]): Unit = {
    val Array(aqPath, wxPath, warehouse) = args
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-pipelines")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$warehouse/wh")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$warehouse/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      // Persistent catalog across runs (the reference's incremental
      // append story needs the table to survive the session).
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = new TableManager(spark)
    val today = java.time.LocalDate.now().toString

    val t0 = System.nanoTime()
    val e1 = new BronzeSilverPipeline(spark, tables).run(aqPath, today)
    println(s"[E1] bronze=${e1.bronzeRows} silver=${e1.silverRows}")
    e1.report.show(truncate = false)

    val e2 = new MonthlyAggPipeline(spark, tables).run(aqPath)
    println(s"[E2] monthly groups=${e2.count()}")
    e2.show(truncate = false)

    val e3 = new JoinedSilverPipeline(spark, tables).run(aqPath, wxPath, today)
    println(s"[E3] bronze=${e3.bronzeRows} silver=${e3.silverRows}")
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
