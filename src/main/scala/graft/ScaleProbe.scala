package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the scale claims PLANS.md records — the
  * numbers Bench can't see because they need instrumentation INSIDE an
  * operator's loop. Modes (argv(0)):
  *
  *  - `incr`: per-append wall time of [[graft.operators.IncrementalDedup]]
  *    across K appends with a warehouse state round-trip per append —
  *    the claim is that append cost is ~flat (state probes are keyed
  *    joins; the closure touches only this append's subgraph), i.e.
  *    carrying state beats the reference's re-dedup-everything loop by
  *    a factor that GROWS with corpus age.
  *  - `skew`: a deliberately skewed fact (half the rows on ONE hot key)
  *    joined to a dim, plain AQE skew-join vs [[graft.operators.Skew]]'s
  *    salted join — records whether Spark 4.1's AQE alone matches the
  *    salted plan, so the "when to salt" guidance is measured.
  *
  * Prints one line per measurement; not part of the driver contract.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("incr")
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
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    /** The shared 100×-class synthetic table of the dvread / mclauses /
      * dvheavy / plan probes: sf orders replicated `reps`× with shifted
      * keys as (k, p), appended as `k` range-disjoint directories.
      * Returns (table, dir, widened frame, exclusive key bound, per-dir
      * span) — one definition, so cross-probe comparisons stay
      * comparisons of the SAME table shape.
      */
    def buildWideOrders(prefix: String, k: Int, reps: Int)
        : (graft.sources.VersionedTable, String, DataFrame, Long, Long) = {
      val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
      val vt = new graft.sources.VersionedTable(spark, tmp)
      val o0 = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"))
      val wide = (0 until reps).map(i =>
          o0.select((col("o_orderkey") + lit(i * 10000000L)).as("k"),
            col("o_totalprice").as("p"))).reduce(_ unionByName _)
      val maxKey = reps.toLong * 10000000L
      val span = maxKey / k
      (0 until k).foreach(i => vt.append(
        wide.filter(col("k") >= i * span && col("k") < (i + 1) * span)))
      (vt, tmp, wide, maxKey, span)
    }

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-28s $s%8.3f s")
      s
    }

    mode match {
      case "incr" =>
        val k = args.lift(1).map(_.toInt).getOrElse(4)
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val tm = new graft.sources.TableManager(spark)
        val versions = Seq("probe_incr_v0", "probe_incr_v1")
        // Fresh metastore + leftover warehouse dir from a prior run:
        // DROP alone is a no-op, the dir must go too.
        versions.foreach(tm.reset)
        var cur = graft.operators.IncrementalDedup.emptyState(spark)
        (0 until k).foreach { i =>
          timed(s"append $i (1/$k of corpus)") {
            val next = graft.operators.IncrementalDedup.appendBatch(
              cur, d.filter(col("doc_id") % k === i), "doc_id", "text",
              n = 3, threshold = 0.5)
            tm.overwrite(next, versions(i % 2))
            cur = spark.table(versions(i % 2))
          }
        }
        timed("keepDecision") {
          graft.operators.IncrementalDedup.keepDecision(cur)
            .write.format("noop").mode("overwrite").save()
        }

      case "skew" =>
        // Fact: orders replicated 8x with HALF of all rows remapped to
        // one hot custkey — the shape AQE's skew split targets. Dim:
        // customer as-is. Both sides written to parquet first so scan
        // and shuffle costs are real, not in-memory ranges.
        val tmp = java.nio.file.Files.createTempDirectory("probe-skew").toString
        val o = spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
        val fact = (0 until 8).map(i => o.withColumn("o_orderkey",
            col("o_orderkey") * 8 + i)).reduce(_ unionAll _)
          .withColumn("o_custkey",
            when(pmod(col("o_orderkey"), lit(2)) === 0, lit(1L))
              .otherwise(col("o_custkey")))
        fact.write.parquet(s"$tmp/fact")
        val dim = spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        dim.write.parquet(s"$tmp/dim")
        val f = spark.read.parquet(s"$tmp/fact")
        val dm = spark.read.parquet(s"$tmp/dim")
        def agg(j: DataFrame) = j.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tp"))
          .write.format("noop").mode("overwrite").save()
        // Disable broadcast so the skewed SHUFFLE join is actually
        // exercised (the dim is broadcast-sized here, but at 100 TB the
        // interesting case is when it is not).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        (1 to 2).foreach { pass =>
          timed(s"plain AQE skew-join p$pass")(agg(f.join(dm, Seq("o_custkey"))))
          timed(s"salted join p$pass")(agg(graft.operators.Skew.saltedJoin(
            f, dm, "o_custkey", saltOn = Seq("o_orderkey"), saltBuckets = 8)))
        }
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

      case "asof" =>
        // Composed (union + window) vs native (co-partitioned merge)
        // as-of at a size where the physical difference matters:
        // N left rows, N/4 right rows, K keys, written to parquet so
        // scans and shuffles are real. The composed form shuffles and
        // sorts left+right TOGETHER and materializes the window; the
        // native exec shuffles each side alone and streams the merge.
        val n = args.lift(1).map(_.toLong).getOrElse(4000000L)
        val keys = args.lift(2).map(_.toLong).getOrElse(50000L)
        val rn = args.lift(3).map(_.toLong).getOrElse(n / 4)
        val tmp = java.nio.file.Files.createTempDirectory("probe-asof").toString
        spark.range(n).select(
            col("id").as("event_id"), pmod(col("id") * 2654435761L, lit(keys)).as("k"),
            timestamp_micros(col("id") * 1000L + 17L).as("t"),
            (col("id") % 97).cast("double").as("v"))
          .write.parquet(s"$tmp/left")
        spark.range(rn).select(
            pmod(col("id") * 40503L, lit(keys)).as("k"),
            timestamp_micros(col("id") * 4000L * (n / math.max(1L, 4L * rn))).as("rt"),
            col("id").as("rid"))
          .write.parquet(s"$tmp/right")
        val l = spark.read.parquet(s"$tmp/left")
        val r = spark.read.parquet(s"$tmp/right")
        def sink(df: DataFrame) =
          df.write.format("noop").mode("overwrite").save()
        (1 to 2).foreach { pass =>
          timed(s"composed union+window p$pass")(sink(
            graft.operators.Joins.asOf(l, r, Seq("k"), "t", "rt", Seq("rid"))))
          timed(s"native merge exec    p$pass")(sink(
            graft.plans.AsOfJoinPlan.asOfNative(l, r, Seq("k"), "t", "rt",
              hint = Some("merge"))))
          // Broadcast form: the right side (n/4 rows) ships whole to
          // every task; the left is never exchanged or sorted.
          timed(s"broadcast exec       p$pass")(sink(
            graft.plans.AsOfJoinPlan.asOfNative(l, r, Seq("k"), "t", "rt",
              hint = Some("broadcast"))))
        }

      case "prune" =>
        // Data-skipping payoff: K time-sliced appends of a widened
        // documents corpus into a VersionedTable, then a one-slice
        // range query as (a) full snapshot scan + filter vs (b)
        // readPruned + the same filter. The pruned plan opens 1/K of
        // the directories BEFORE any parquet footer is read — the
        // manifest-level half of the two-level (dir prune + row-group
        // skip) story.
        val k = args.lift(1).map(_.toInt).getOrElse(20)
        val reps = args.lift(2).map(_.toInt).getOrElse(10)
        val tmp = java.nio.file.Files.createTempDirectory("probe-prune").toString
        val vt = new graft.sources.VersionedTable(spark, tmp)
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val wide = (0 until reps).map(i =>
            docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
              col("text"))).reduce(_ unionByName _)
        (0 until k).foreach(slice =>
          vt.append(wide.filter(pmod(col("doc_id"), lit(k.toLong)) === slice)
            .withColumn("ingest_slice", lit(slice.toLong))))
        val (kept, skipped) = vt.pruneActive("ingest_slice", Some(7L), Some(7L))
        println(s"[probe] dirs kept=${kept.size} skipped=${skipped.size}")
        def sink(df: DataFrame) =
          df.write.format("noop").mode("overwrite").save()
        (1 to 2).foreach { pass =>
          timed(s"full scan + filter   p$pass")(sink(
            vt.read().filter(col("ingest_slice") === 7L)))
          timed(s"pruned read + filter p$pass")(sink(
            vt.readPruned("ingest_slice", Some(7L), Some(7L))
              .filter(col("ingest_slice") === 7L)))
        }

      case "dsv2" =>
        // The DataSourceV2 surface at scale: (a) transparent filter
        // pruning — a plain .filter() over format("graftvt") must cost
        // ~1/K of the full scan with NO pruning API in the query; (b)
        // the streaming tail — after K commits, serving ONE new commit
        // must cost that commit's data, not a snapshot rescan (offsets
        // are log versions; planInputPartitions reads only the delta).
        val k = args.lift(1).map(_.toInt).getOrElse(20)
        val reps = args.lift(2).map(_.toInt).getOrElse(10)
        val tmp = java.nio.file.Files.createTempDirectory("probe-dsv2").toString
        val vt = new graft.sources.VersionedTable(spark, tmp)
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val wide = (0 until reps).map(i =>
            docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
              col("text"))).reduce(_ unionByName _)
        (0 until k).foreach(slice =>
          vt.append(wide.filter(pmod(col("doc_id"), lit(k.toLong)) === slice)
            .withColumn("ingest_slice", lit(slice.toLong))))
        def sink(df: DataFrame) =
          df.write.format("noop").mode("overwrite").save()
        (1 to 2).foreach { pass =>
          timed(s"dsv2 full scan        p$pass")(sink(
            spark.read.format("graftvt").load(tmp)))
          timed(s"dsv2 filtered (1/$k)  p$pass")(sink(
            spark.read.format("graftvt").load(tmp)
              .filter(col("ingest_slice") === 7L)))
        }
        // Streaming tail: the stream starts at the log head, then ONE
        // commit lands — the micro-batch must read only that commit.
        val sinkName = s"probe_dsv2_${System.nanoTime}"
        val q = spark.readStream.format("graftvt")
          .option("startingVersion", "latest").load(tmp)
          .writeStream.format("memory").queryName(sinkName)
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("probe-dsv2-ck").toString)
          .start()
        try {
          q.processAllAvailable()
          vt.append(wide.filter(pmod(col("doc_id"), lit(k.toLong)) === 0L)
            .withColumn("ingest_slice", lit(999L)))
          timed(s"stream tail (1 of ${k + 1} commits)")(q.processAllAvailable())
          println(s"[probe] tail rows served = " +
            spark.table(sinkName).count())
        } finally q.stop()

      case "vtops" =>
        // Versioned-table op costs vs table size: build a K-dir table
        // from `reps`-fold widened orders, then time MERGE (source =
        // ~1/50 of the keys), DELETE (~1/100), ZORDER, RESTORE. The
        // scale story to verify: merge/delete cost tracks the TOUCHED
        // data (+ one discovery scan for delete), restore is O(1)
        // metadata, zorder is the deliberate full rewrite.
        val reps = args.lift(1).map(_.toInt).getOrElse(1)
        val slices = args.lift(2).map(_.toInt).getOrElse(4)
        val tmp = java.nio.file.Files.createTempDirectory("probe-vtops").toString
        val vt = new graft.sources.VersionedTable(spark, tmp)
        val o0 = spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val o = (0 until reps).map(i =>
            o0.select((col("o_orderkey") + lit(i * 100000000L)).as("o_orderkey"),
              col("o_orderstatus"), col("o_totalprice")))
          .reduce(_ unionByName _)
        val maxKey = reps.toLong * 100000000L
        (0 until slices).foreach(i => // range-disjoint ingestion slices
          vt.append(o.filter(col("o_orderkey") % slices === i)))
        println(s"[probe] table rows = ${vt.read().count()}")
        val upd = o.filter(col("o_orderkey") % 50 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        timed("merge ~2% of keys")(vt.merge(upd, Seq("o_orderkey")))
        timed("delete ~1% of rows")(vt.delete(col("o_orderkey") % 100 === 1))
        timed("update ~1% of rows")(vt.update(col("o_orderkey") % 100 === 2,
          Map("o_totalprice" -> (col("o_totalprice") + 1.0))))
        timed("zorder full rewrite")(
          vt.optimizeZOrder(Seq("o_orderkey", "o_totalprice"), 8))
        // On the now-clustered table, a RANGE mutation's discovery scan
        // is stats-pruned to the touched chunks (the modulo forms above
        // are untranslatable — they measure the full-discovery floor).
        // These two must track TOUCHED data, not table size: ~flat as
        // reps grows while the range covers a fixed ~0.5% of the REAL
        // key population (statRange — maxKey is the sparse shift bound,
        // not where rows actually live).
        val (realLo, realHi) = vt.statRange("o_orderkey")
          .map { case (a, b) => (a.asInstanceOf[Long], b.asInstanceOf[Long]) }
          .getOrElse((0L, maxKey))
        val span200 = math.max(1L, (realHi - realLo) / 200)
        def rangeProbe(label: String, lo: Long)(run: (Long, Long) => Unit): Unit = {
          val pre = vt.activeDirs().size
          timed(label) {
            run(lo, lo + span200)
            println(s"[probe]   discovery dirs = ${vt.lastDiscoveryDirs.size} " +
              s"of $pre")
          }
        }
        rangeProbe("delete range (pruned disc)", realLo + span200)(
          (a, b) => vt.delete(col("o_orderkey").between(a, b)))
        rangeProbe("update range (pruned disc)", realLo + 5 * span200)(
          (a, b) => vt.update(col("o_orderkey").between(a, b),
            Map("o_totalprice" -> (col("o_totalprice") + 1.0))))
        // DV delete: the merge-on-read cost floor — deleted-rows-sized
        // write, zero rewrite.
        timed("delete range (DV sidecar)")(
          vt.delete(col("o_orderkey").between(realLo + 10 * span200,
            realLo + 11 * span200), useDeletionVectors = true))
        val vNow = vt.latestVersion
        timed("restore (metadata)")(vt.restore(vNow - 1))
        timed("pruned range read")(
          vt.readPruned("o_orderkey", Some(1000L), Some(maxKey / 100))
            .filter(col("o_orderkey").between(1000L, maxKey / 100))
            .write.format("noop").mode("overwrite").save())
        // Merge-on-read MERGE last (own timing, perturbs nothing above):
        // the same ~2% upsert as the CoW merge, via one DV sidecar + one
        // appended payload — must track the MATCHED rows, not the
        // touched directories.
        timed("merge-dv ~2% of keys")(
          vt.merge(upd.withColumn("o_totalprice", col("o_totalprice") + 2.0),
            Seq("o_orderkey"), useDeletionVectors = true))

      case "dvread" =>
        // The DV READ path at scale: a K-dir range-disjoint table with
        // a growing share of directories carrying deletion vectors,
        // read through the DSv2 scan. The round-14 claim to verify:
        // the vectorized per-file row-index fold keeps a 1-DV-in-K
        // read within ~1.3× of the clean read, and WAY below the
        // row-based V1 fallback it replaced (forced here via a tiny
        // inline-position budget) — so a long-lived DV no longer turns
        // every read of a hot table row-based.
        val k = args.lift(1).map(_.toInt).getOrElse(20)
        val reps = args.lift(2).map(_.toInt).getOrElse(1)
        val (vt, tmp, wide, maxKey, span) = buildWideOrders("probe-dvread", k, reps)
        println(s"[probe] table rows = ${vt.read().count()} in $k dirs")
        def sink(df: DataFrame) =
          df.write.format("noop").mode("overwrite").save()
        def readTimes(tag: String): Unit = (1 to 2).foreach { p =>
          // p1 pays the one-offs (sidecar collect, fresh plan); p2 is
          // the steady-state number the comparison reads
          timed(f"full read  $tag%-14s p$p")(sink(
            spark.read.format("graftvt").load(tmp)))
          timed(f"range read $tag%-14s p$p")(sink(
            spark.read.format("graftvt").load(tmp)
              .filter(col("k") < span)))
        }
        readTimes("clean")
        Seq(1.0 / k, 0.1, 0.5).distinct.foreach { frac =>
          val dirs = math.max(1, math.round(frac * k).toInt)
          val bound = dirs * span
          val v0 = vt.latestVersion
          vt.delete(col("k") % 37 === 5 && col("k") < bound,
            useDeletionVectors = true)
          println(s"[probe] dv dirs = ${vt.dvsAt(vt.latestVersion).size} of $k")
          readTimes(f"dv $frac%.2f")
          vt.restore(v0) // each share level starts from the clean table
        }

      case "mclauses" =>
        // The clause-merge join shapes at scale: a ~0.3% source against
        // a 100×-class table, (A) a no-NOT-MATCHED clause set — the
        // LEFT OUTER shape, where the small source should broadcast —
        // vs (B) the general update+insert set — FULL OUTER, the shape
        // that can never broadcast. Both on the DV commit shape.
        val k = args.lift(1).map(_.toInt).getOrElse(20)
        val reps = args.lift(2).map(_.toInt).getOrElse(100)
        val (vt, tmp, wide, maxKey, span) = buildWideOrders("probe-mcl", k, reps)
        println(s"[probe] table rows = ${vt.read().count()} in $k dirs")
        val srcDf = wide.filter(col("k") % 347 === 5) // ~0.3% of keys
          .withColumn("p", col("p") + 1.0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] source rows = ${srcDf.count()}")
        import graft.sources.{MergeAction, MergeClause}
        import org.apache.spark.sql.functions.expr
        val vA = vt.latestVersion
        timed("A: matched-only clauses (left-outer shape)")(
          vt.mergeClauses(srcDf, Seq("k"),
            matched = Seq(
              MergeClause(Some(expr("s.p > t.p")), MergeAction.Update(
                Some(Map("p" -> expr("s.p"))))),
              MergeClause(None, MergeAction.Delete)),
            notMatched = Nil, useDeletionVectors = true))
        vt.restore(vA)
        timed("B: update+insert clauses (full-outer shape)")(
          vt.mergeClauses(srcDf, Seq("k"),
            matched = Seq(MergeClause(Some(expr("s.p > t.p")),
              MergeAction.Update(Some(Map("p" -> expr("s.p")))))),
            notMatched = Seq(MergeClause(None, MergeAction.Insert(
              Some(Map("k" -> expr("s.k + 1000000000"), "p" -> expr("s.p")))))),
            useDeletionVectors = true))
        srcDf.unpersist()

      case "dvheavy" =>
        // DEBT WITHOUT A BUDGET: the pre-r15 design collected every
        // hidden position to the driver and capped the vectorized path
        // at 8M positions (past it: row-fold fallback on batch,
        // refusal on streams). The per-file bitmap sidecars remove the
        // cap — this probe builds a 100×-class table, hides >8M rows
        // in ONE DV commit, and times the still-vectorized read.
        val k = args.lift(1).map(_.toInt).getOrElse(20)
        val reps = args.lift(2).map(_.toInt).getOrElse(120)
        val (vt, tmp, wide, maxKey, span) = buildWideOrders("probe-dvheavy", k, reps)
        val total = vt.read().count()
        println(s"[probe] table rows = $total in $k dirs")
        def sink(df: DataFrame) =
          df.write.format("noop").mode("overwrite").save()
        (1 to 2).foreach(p => timed(s"clean full read      p$p")(
          sink(spark.read.format("graftvt").load(tmp))))
        timed("DV delete ~50% (one commit)")(
          vt.delete(col("k") % 2 === 0, useDeletionVectors = true))
        // metadata-exact count under the DV proves the hidden volume
        val remaining = spark.read.format("graftvt").load(tmp).count()
        println(s"[probe] hidden rows = ${total - remaining} " +
          "(pre-r15 budget was 8M)")
        val t = spark.read.format("graftvt").load(tmp)
        val scans = t.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }
        println(s"[probe] vectorized = ${scans.nonEmpty && scans.head.supportsColumnar}" +
          s" (BatchScan present, columnar output)")
        (1 to 2).foreach(p => timed(s"DV'd full read       p$p")(
          sink(spark.read.format("graftvt").load(tmp))))
        (1 to 2).foreach(p => timed(s"DV'd range read 1/$k  p$p")(
          sink(spark.read.format("graftvt").load(tmp).filter(col("k") < span))))

      case "plan" =>
        // The plan-level optimizations at scale: a K-dir range-disjoint
        // table, then (a) metadata-only aggregates — COUNT/MIN/MAX must
        // cost the LOG, not the data (flat in K and rows); (b) LIMIT n
        // — must plan ~1 directory; (c) DPP — a selective dim filter
        // over a star join must scan ~selectivity of the fact table,
        // with the kept-directory count printed from the scan's own
        // runtime seam.
        val k = args.lift(1).map(_.toInt).getOrElse(20)
        val reps = args.lift(2).map(_.toInt).getOrElse(10)
        val (vt, tmp, wide, maxKey, span) = buildWideOrders("probe-plan", k, reps)
        println(s"[probe] table rows = ${vt.read().count()} in $k dirs")
        def sink(df: DataFrame) =
          df.write.format("noop").mode("overwrite").save()
        (1 to 2).foreach { pass =>
          timed(s"full scan             p$pass")(sink(
            spark.read.format("graftvt").load(tmp)))
          timed(s"metadata COUNT/MIN/MAX p$pass") {
            val r = spark.read.format("graftvt").load(tmp)
              .agg(count(lit(1)), min(col("k")), max(col("p"))).head()
            assert(r.getLong(0) > 0)
          }
          timed(s"limit 100 (1/$k dirs)  p$pass")(sink(
            spark.read.format("graftvt").load(tmp).limit(100)))
        }
        // DPP: dim keys live in ONE fact slice; the runtime filter must
        // keep ~1 of K directories.
        val dimDir = java.nio.file.Files.createTempDirectory("probe-dim").toString
        wide.filter(col("k") % 1000 === 0)
          .select(col("k").as("dk"),
            when(col("k") < span, lit("keep")).otherwise(lit("drop")).as("tag"))
          .write.mode("overwrite").parquet(dimDir)
        (1 to 2).foreach { pass =>
          val fact = spark.read.format("graftvt").load(tmp)
          val dim = spark.read.parquet(dimDir)
          val joined = fact.join(dim.filter(col("tag") === "keep"),
            fact("k") === dim("dk"))
          // drive THIS QueryExecution (a .write would replan a fresh
          // tree and the inspected scan instance would never execute)
          timed(s"DPP star join          p$pass")(
            assert(joined.queryExecution.toRdd.count() > 0))
          val kept = joined.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.finalPhysicalPlan.collectWithSubqueries {
                case b: org.apache.spark.sql.execution.datasources.v2
                  .BatchScanExec => b.scan
              }.collectFirst { case s: graft.sources.GraftVtScan =>
                s.runtimeKept }.flatten
            case _ => None
          }
          println(s"[probe] DPP kept dirs p$pass = $kept of $k")
        }

      case "vtparity" =>
        // DSv2-vs-Scala-API parity as the LOG grows: the same pruned
        // range read, metadata COUNT, and DPP-shaped IN-prune through
        // `format("graftvt")` and through the Scala API
        // (readPrunedAll / fastCount / pruneActiveIn), at 1×/10×/100×
        // version counts over the SAME data volume. What must hold:
        // the DSv2 ANALYSIS path (schema inference + manifest fold per
        // query) stays ~flat as versions grow — checkpoints bound the
        // fold at O(interval), so a 100×-commit log must not make
        // planning 100× slower. Wall times printed per (versions,
        // surface); the data volume is constant, so any growth is the
        // log's fault.
        val repsP = args.lift(1).map(_.toInt).getOrElse(2)
        val o0p = spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
        val widep = (0 until repsP).map(i =>
            o0p.select((col("k") + lit(i * 10000000L)).as("k"), col("p")))
          .reduce(_ unionByName _)
        val maxK = repsP.toLong * 10000000L
        Seq(1, 10, 100).foreach { versions =>
          val tmp = java.nio.file.Files
            .createTempDirectory(s"probe-par$versions").toString
          val vt = new graft.sources.VersionedTable(spark, tmp)
          val span = maxK / versions
          (0 until versions).foreach(i => vt.append(
            widep.filter(col("k") >= i * span && col("k") < (i + 1) * span)))
          val lo = 1000L
          val hi = maxK / 100
          def sink(df: DataFrame) =
            df.write.format("noop").mode("overwrite").save()
          (1 to 2).foreach { pass =>
            timed(f"v$versions%3d dsv2 pruned read   p$pass")(sink(
              spark.read.format("graftvt").load(tmp)
                .filter(col("k").between(lo, hi))))
            timed(f"v$versions%3d scala pruned read  p$pass")(sink(
              vt.readPruned("k", Some(lo), Some(hi))
                .filter(col("k").between(lo, hi))))
            timed(f"v$versions%3d dsv2 count         p$pass") {
              assert(spark.read.format("graftvt").load(tmp)
                .groupBy().count().head.getLong(0) > 0)
            }
            timed(f"v$versions%3d scala fastCount    p$pass") {
              assert(vt.fastCount().exists(_ > 0))
            }
            val inKeys = (0 until 20).map(i => (lo + i * span): Any)
            timed(f"v$versions%3d scala pruneIn(20)  p$pass") {
              val (kept, _) = vt.pruneActiveIn("k", inKeys)
              assert(kept.nonEmpty)
            }
          }
        }

      case other => sys.error(s"unknown probe mode: $other")
    }
    spark.stop()
  }
}
