package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is materialized through the noop sink (full plan
  * execution, no result serialization or disk cost) rather than
  * `count()`, which Catalyst can short-circuit via column pruning.
  * A small warmup job amortizes JVM/codegen startup out of the first
  * measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // Sample FIRST — before the Spark session spins 32 threads (the
    // 1-minute average still carries the launcher's own startup burst;
    // SPARK_GRAFT_AMBIENT_LOADAVG lets the invoking shell pass the
    // pre-launch reading through for the honest ambient number).
    val loadavgStart =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+")(0)
      catch { case _: Throwable => "-1" }
    val loadavgAmbient = sys.env.getOrElse("SPARK_GRAFT_AMBIENT_LOADAVG", loadavgStart)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadavgNow: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+")(0)
      catch { case _: Throwable => "-1" }

    // Warmup: touch codegen, shuffle machinery, and the parquet reader.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).collect()

    // Two passes per query, min taken: local-mode timings are noisy
    // (page cache, JIT, compaction pauses) and the min is the stable
    // estimator of achievable latency. A query that throws on either
    // pass is reported as -1 and listed in "failed" — a crash must not
    // masquerade as a fast run.
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      // Label every job with its gate (guide §1.5): event-log and UI
      // analysis can then attribute each of a gate's jobs without
      // timeline guesswork. Thread-local, cleared after the gate so
      // nothing leaks into the next one.
      spark.sparkContext.setJobDescription(s"gate:$name")
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        } finally spark.sparkContext.setJobDescription(null)
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Optional comma-separated name filter for single-query iteration;
    // the driver never sets it, so the full suite is the default.
    // Unknown names fail LOUDLY: a typo'd filter would otherwise run
    // zero queries and complete looking like a successful (empty)
    // bench.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      require(names.nonEmpty,
        "SPARK_GRAFT_ONLY is set but names no queries (empty value?) — " +
          "unset it to bench the full suite")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: " +
          unknown.toSeq.sorted.mkString(", "))
    }
    // SPARK_GRAFT_RUNS extends the min-of-passes estimator across
    // whole-suite repetitions: local-mode boxes drift in ~20-minute
    // windows (page-cache state, co-tenant load), and a single-window
    // run flags a DIFFERENT random handful of queries each time; the
    // per-query min over N suite sweeps is the same stable-achievable-
    // latency estimator the 2 in-JVM passes already implement, just
    // robust to the window. The JSON records the repetition count.
    val suiteRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(1)
    require(suiteRuns >= 1, s"SPARK_GRAFT_RUNS must be >= 1: $suiteRuns")
    val perRun = (1 to suiteRuns).map { _ =>
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
          val (t1, ok1) = timeOnce(name, fn)
          val (t2, ok2) = timeOnce(name, fn)
          // Several queries persist() intermediates; drop them outside
          // the timed region so caches can't accumulate across 2×N runs
          // and pressure later queries' memory.
          spark.catalog.clearCache()
          name -> (if (ok1 && ok2) math.min(t1, t2) else -1.0)
        }
    }
    val results = perRun.head.indices.map { i =>
      val name = perRun.head(i)._1
      val vals = perRun.map(_(i)._2)
      // any failed repetition fails the query — a crash must not hide
      // behind a clean sibling run
      name -> (if (vals.exists(_ < 0)) -1.0 else vals.min)
    }.toSeq
    // Millisecond precision: full double digits triple the line length
    // across 130+ queries, and the driver has truncated the tail of
    // this line before (round 7's BENCH json arrived unparseable).
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // O(n^2)-by-construction oracle baselines: input-capped in
    // SparkEntry, labeled here so readers don't treat them as the
    // scale path (LSH/IVF/AllPairs are).
    val baselines = SparkEntry.baselineQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Box load at measurement time: a loaded machine inflates every
    // query uniformly (round 3 committed a 6× artifact that a quiet-box
    // re-run disproved) — the JSON must carry the evidence to judge
    // itself. 1-minute loadavg: `loadavg_start` is the AMBIENT load
    // (sampled before warmup — the quiet-box criterion); `loadavg` is
    // the post-run reading kept for continuity with earlier rounds
    // (self-load-dominated).
    val loadavg = loadavgNow
    // Per-stage decomposition of multi-phase gates (recorded by the
    // gate bodies; last warm run wins) — the attributable before/after
    // a lifecycle blob's single timer can't provide.
    val stages = {
      import scala.jdk.CollectionConverters._
      SparkEntry.gateStages.asScala.toSeq.sortBy(_._1).map { case (g, m) =>
        "\"" + g + "\":" + m.toSeq.sortBy(_._1)
          .map { case (st, sec) => "\"" + st + "\":" + r3(sec) }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}")
    }
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failed,"baseline":$baselines,"stages":$stages,"loadavg":$loadavg,"loadavg_start":$loadavgStart,"loadavg_ambient":$loadavgAmbient,"runs":$suiteRuns,"sf":"$sfDir"}"""
    println(line)
    // Terminal scrollback can truncate a 100+-query line (round 5's
    // committed bench lost its first ~40 queries that way): persist
    // the full JSON to a file as well, so round-over-round comparison
    // never needs a re-run. Path overridable; write failures are
    // non-fatal — stdout remains the contract.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
