package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sketches, Skew}
import graft.sources.TableManager

class ScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = spark.range(2000)
      .select((when(col("id") % 10 === 0, col("id") % 5).otherwise(lit(42L))).as("k"),
        col("id").as("payload"))
    val right = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")

    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "payload", "name").collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", saltOn = Seq("payload"), saltBuckets = 8)
      .select("k", "payload", "name").collect().toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("key histogram surfaces the hot key") {
    val df = spark.range(1000)
      .select(when(col("id") % 10 === 0, col("id") % 3).otherwise(lit(7L)).as("k"))
    val top = Skew.keyHistogram(df, "k", topN = 1).collect()(0)
    assert(top.getLong(0) === 7L)
    assert(top.getLong(1) === 900L)
  }

  test("bucketed tables join without a shuffle") {
    val tables = new TableManager(spark)
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    tables.writeBucketed(a, "bk_a", numBuckets = 4, bucketCols = Seq("k"))
    tables.writeBucketed(b, "bk_b", numBuckets = 4, bucketCols = Seq("k"))
    // Force the non-broadcast path (tiny test tables would otherwise be
    // broadcast): the bucketed layout must yield a SortMergeJoin with
    // NO shuffle exchange on either side.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), Seq("k"))
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"), s"scan should be bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q1 scan gets pushed filters and pruned columns") {
    val q = SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,45.0)"),
      s"filter must reach the parquet reader:\n$formatted")
    // 6 of 11 lineitem columns read — pruning holds
    val readSchema = formatted.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.split(",").length === 6, readSchema)
  }

  test("q4 dimension joins broadcast; the fact side never shuffles for them") {
    val q = SparkEntry.queries("q4_region_stats")(spark, "/root/testdata/sf0.001")
    q.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // only the executed final section.
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("BroadcastExchange".r.findAllIn(plan).length === 2, plan)
    // the only hash exchange is the final groupBy aggregation
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
  }

  test("sessionize plans exactly one exchange, shared by windows and agg") {
    val ev = graft.sources.Timestamps.normalized(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"), "ts",
      "/root/testdata/sf0.001/events.parquet")
    val q = graft.operators.Sessions.sessionStats(ev, "user_id", "ts", 1800, Seq("event_id"))
    q.count() // materialize so AQE finalizes the plan
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one shuffle, plan:\n$plan")
  }

  test("AQE splits a skewed join partition at runtime") {
    // 100k rows all sharing ONE join key vs a tiny dim: with the skew
    // thresholds forced low, AQE's skew-join handling must kick in
    // (plan shows the skew marker) and results stay correct.
    val prev = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // Non-constant key (or Catalyst folds the join away entirely):
      // 99% of rows share k=1, the rest spread over the dim's range.
      val fact = spark.range(100000).select(
        when(col("id") % 100 === 0, col("id") % 7).otherwise(lit(1L)).as("k"),
        col("id").as("v"))
      val dim = spark.range(8).select(col("id").as("k"), col("id").as("d"))
      val joined = fact.join(dim, Seq("k"))
      // collect() drives THIS DataFrame's QueryExecution (count() would
      // spawn a fresh one and leave this plan un-finalized by AQE)
      assert(joined.collect().length === 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew handling in plan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._1)
      // Restore OR unset: leaving the forced 64KB thresholds behind
      // would warp AQE decisions for every later test in the session.
      def restore(key: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      restore("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prev._2)
      restore("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev._3)
    }
  }

  test("tokenBudgetSample never windows the corpus by the stratum alone") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LogicalWindow}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = graft.operators.Sampling.tokenBudgetSample(
      docs, "source", "doc_id", "text", budgets = Map("src0" -> 500L, "src1" -> 200L))
    val wins = q.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }
    assert(wins.nonEmpty)
    // A window partitioned by the stratum column ALONE funnels every
    // document of a source through one task — the scale-killer this
    // operator exists to avoid. The corpus running sum must partition
    // by (stratum, bucket); a stratum-only window is legal ONLY over
    // the aggregated ≤256-rows-per-stratum bucket-totals frame.
    wins.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.map(_.name)).distinct.toSet
      if (parts == Set("source")) {
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"stratum-only window must consume bucket totals, not the corpus:\n$w")
      }
    }
    assert(wins.exists { w =>
      w.partitionSpec.flatMap(_.references.map(_.name)).distinct.toSet == Set("source", "__b")
    }, s"corpus running sum must partition by (stratum, bucket):\n${wins.mkString("\n")}")
  }

  test("keepBest elects keepers with an aggregate, never a cluster-partitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L))
      .toDF("node", "cluster_id")
    val attrs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L)).toDF("doc_id", "n_chars")
    val q = graft.operators.Components.keepBest(comps, attrs, "doc_id", col("n_chars"))
    // A million-doc near-dup cluster must cost a bigger partial
    // aggregate, not a single-task sort: the plan may contain NO
    // window at all — the election is max_by + a winners join.
    val wins = q.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }
    assert(wins.isEmpty, s"keepBest must not window:\n${q.queryExecution.optimizedPlan}")
    assert(q.queryExecution.optimizedPlan.toString.contains("max_by"))
  }

  test("epochMixture's fractional prefix never windows the corpus by the stratum alone") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LogicalWindow}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = graft.operators.Sampling.epochMixture(
      docs, "source", "doc_id", "text", targets = Map("src0" -> 5000L, "src1" -> 200L))
    val wins = q.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.map(_.name)).distinct.toSet
      if (parts == Set("source")) {
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"stratum-only window must consume bucket totals, not the corpus:\n$w")
      }
    }
  }

  test("IVF postings probe broadcasts the query side; the index table never shuffles") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = graft.operators.EmbeddingAnn.trainCentroids(
      emb, "vec_id", "embedding", nlist = 8)
    val postings = graft.operators.EmbeddingAnn.ivfPostings(
      emb, "vec_id", "embedding", centroids)
    val q = graft.operators.EmbeddingAnn.ivfTopKFromPostings(
      postings, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, centroids, nprobe = 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join must broadcast the query side:\n$plan")
    // The rank <= k filter shape must keep triggering Spark's partial
    // top-k (WindowGroupLimit Partial before the shuffle, Final after):
    // candidates are pruned to k per query MAP-SIDE, so the window
    // sort never sees the full candidate set. A refactor that hides
    // the filter from the optimizer silently reverts to sorting every
    // candidate — this assertion is the tripwire.
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"rank<=k must plan a partial WindowGroupLimit:\n$plan")
  }

  test("capPerStratum never windows the corpus by the stratum alone") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LogicalWindow}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = graft.operators.Sampling.capPerStratum(docs, "source", "doc_id", cap = 10)
    val wins = q.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }
    assert(wins.nonEmpty)
    // Same contract as tokenBudgetSample: the per-stratum rank must
    // come from the (stratum, bucket) two-level sum — a stratum-only
    // window would drag a head domain's entire population through one
    // task, the exact pathology the cap exists to bound.
    wins.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.map(_.name)).distinct.toSet
      if (parts == Set("source")) {
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"stratum-only window must consume bucket totals, not the corpus:\n$w")
      }
    }
    assert(wins.exists { w =>
      w.partitionSpec.flatMap(_.references.map(_.name)).distinct.toSet == Set("source", "__b")
    }, s"per-stratum rank must partition by (stratum, bucket):\n${wins.mkString("\n")}")
  }

  test("dedup and hygiene operators leave no pinned cache behind") {
    // Every operator that persists an intermediate must release it
    // before returning (small results are materialized via
    // Caching.materializeAndRelease; corpus-sized results never
    // persist at all) — a long-lived session running the whole family
    // back-to-back must end with an empty CacheManager.
    spark.catalog.clearCache()
    for (name <- Seq("dedup_minhash", "dedup_clusters", "dedup_allpairs",
        "dedup_allpairs_auto", "dedup_ngram_sample", "dedup_lines",
        "dedup_paragraphs", "corpus_funnel", "corpus_funnel_keep",
        "sample_token_budget", "dedup_keep_best", "sample_epochs",
        "text_heavy_hitters", "text_ppl_buckets")) {
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left pinned cache entries behind")
    }
  }

  test("HLL approx distinct lands within rsd of exact") {
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val exact = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val approx = Sketches.approxDistinct(ev, Seq("user_id"), rsd = 0.02)
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("Skew.spread: spreads small (under-split) frames, skips large ones untouched") {
    val par = spark.sparkContext.defaultParallelism
    // Small frames — whatever their shape — are cheap to shuffle and
    // are exactly the single-split local case: spread.
    val single = spark.range(1000).toDF("id").coalesce(1)
    assert(graft.operators.Skew.spread(single).rdd.getNumPartitions === par,
      "spread must fan a single-split source out to the cluster")
    val limited = spark.range(1000).toDF("id").repartition(8).limit(100)
    assert(graft.operators.Skew.spread(limited).rdd.getNumPartitions === par,
      "spread must fan a limit-funnelled frame back out")
    // Frames estimated to scan in >= par/4 splits must come back
    // REFERENCE-identical: no repartition, and — critically — no .rdd
    // probe, which under AQE would execute upstream stages as
    // throwaway jobs (the d1 path of the hygiene funnel). Shrinking
    // maxPartitionBytes makes the tiny test frame count as "large".
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16")
      val big = spark.range(1000).toDF("id")
        .groupBy((col("id") % 10).as("k")).count()
      assert(graft.operators.Skew.spread(big) eq big,
        "spread must not touch (or probe) a frame it estimates as large")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("native graft_l2norm is bit-identical to the HOF l2Normalize") {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200)
    val rows = e.select(
        call_function("graft_l2norm", col("embedding")).as("native"),
        graft.functions.VectorFunctions.l2Normalize(col("embedding")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1))
    }
    // Zero vector passes through unscaled in both forms.
    val z = spark.sql("SELECT graft_l2norm(array(0.0D, 0.0D)) AS v").head().getSeq[Double](0)
    assert(z === Seq(0.0, 0.0))
  }

  test("approx quantiles bracket the median; describe emits stats rows") {
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val Seq(q50) = Sketches.approxQuantiles(ev, "value", Seq(0.5))
    assert(q50 > 0 && q50 < 490)
    val d = Sketches.describe(ev, "value").collect()
    assert(d.map(_.getString(0)).toSet === Set("count", "mean", "stddev", "min", "max"))
  }
}
