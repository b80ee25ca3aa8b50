package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Regenerates the `plans/r17` before/after plan evidence
  * for the round-17 engine-internal optimizations. These paths have no
  * single gate query whose `.explain` shows them (they execute inside
  * commit/merge machinery), so the dumps reconstruct each shape on a
  * demo frame: the physical plan the old code ran as a separate job
  * vs. the plan the fused code runs. Usage:
  * `runMain graft.PlanDumps [outDir]` (default `plans/r17`).
  */
object PlanDumps {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "plans/r17"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def w(name: String, s: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, name), s.getBytes("UTF-8"))
    def fmt(d: org.apache.spark.sql.Dataset[_]): String =
      d.queryExecution.explainString(ExplainMode.fromString("formatted"))

    val tmp = java.nio.file.Files.createTempDirectory("plans_r17").toString
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") % 7).cast("double").as("price"),
      concat(lit("s"), col("id").cast("string")).as("name"))
    val dir = tmp + "/v00000-demo"
    df.write.parquet(dir)

    val statCols = Seq(min(col("id").cast("long")), max(col("id").cast("long")),
      min(col("price").cast("double")), max(col("price").cast("double")),
      min(col("name")), max(col("name")),
      sum(when(col("id").isNull, 1L).otherwise(0L)),
      sum(when(col("price").isNull, 1L).otherwise(0L)),
      sum(when(col("name").isNull, 1L).otherwise(0L)),
      sum(when(expr("price >= 0") <=> lit(false), 1L).otherwise(0L)))
    val rb = spark.read.parquet(dir).agg(count(lit(1)), statCols: _*)
    w("commit_stats_before.txt",
      "# BEFORE (rounds <=16): every versioned-table commit ran this\n" +
      "# SEPARATE aggregate job over the just-written directory (plus a\n" +
      "# driver-side schema-inference footer read from spark.read.parquet)\n" +
      "# to record row count, min/max/null-count skipping stats, and CHECK\n" +
      "# violation counts. One extra full read pass of every committed\n" +
      "# byte, one extra driver-sequenced job per commit (k jobs for k\n" +
      "# partition tuples / OPTIMIZE chunks).\n\n" + fmt(rb))

    val obs = org.apache.spark.sql.Observation("plans_demo")
    val aggsAfter = (count(lit(1)) +: statCols).zipWithIndex
      .map { case (a, i) => a.as(s"_$i") }
    val od = df.observe(obs, aggsAfter.head, aggsAfter.tail: _*)
    w("commit_stats_after.txt",
      "# AFTER (round 17): the same aggregates ride the payload WRITE job\n" +
      "# as a CollectMetrics node directly under the file write (result\n" +
      "# stage: accumulator updates deduplicate per partition, exact under\n" +
      "# task retries). The read-back job and its footer read are gone —\n" +
      "# commit write I/O halves at table scale. Multi-directory writes\n" +
      "# (partitioned appends, OPTIMIZE/ZORDER chunks) run ONE grouped\n" +
      "# stats job keyed by parent directory instead of one per directory.\n" +
      "# (Plan below is the written frame; the write command wraps it.)\n\n" +
      fmt(od))

    val src = spark.range(0, 500).select(col("id").as("k"), (col("id") * 2).as("v"))
    val spanBefore = src.agg(min(col("k").cast("long")), max(col("k").cast("long")))
    val dupBefore = src.groupBy(col("k")).count()
      .filter(col("count") > 1).limit(1)
    w("merge_span_before.txt",
      "# BEFORE: mergeClauses ran TWO full passes over the cached merge\n" +
      "# source — a global key-span aggregate (touched-directory pruning):\n\n" +
      fmt(spanBefore) +
      "\n\n# ...and a separate groupBy(keys) duplicate-key gate job:\n\n" +
      fmt(dupBefore))

    val grouped = src.groupBy(col("k")).agg(count(lit(1)).as("__graft_kn"))
    val fused = grouped.agg(min(col("k").cast("long")),
      max(col("k").cast("long")), max(col("__graft_kn")))
    w("merge_span_after.txt",
      "# AFTER: when any MATCHED / NOT MATCHED BY SOURCE clause exists\n" +
      "# (the duplicate gate is needed), the span folds over the grouped\n" +
      "# counts in ONE pass — min over distinct keys == min over rows, and\n" +
      "# the keyed shuffle is the one the duplicate gate already paid.\n" +
      "# Insert-only merges keep the global aggregate (no keyed shuffle).\n\n" +
      fmt(fused))
    println(s"PLANS WRITTEN to $out")
    spark.stop()
  }
}
