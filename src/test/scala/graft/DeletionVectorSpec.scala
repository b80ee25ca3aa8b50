package graft

import org.apache.spark.sql.functions._

/** Merge-on-read DELETE via deletion vectors: a selective delete
  * commits a (dir, file, row-index) sidecar instead of rewriting
  * directories — every data file stays byte-identical, every reader
  * folds the hidden rows away, OPTIMIZE compacts the debt, vacuum
  * reclaims unreferenced sidecars.
  */
class DeletionVectorSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_dv_spec").toString

  private def dataFiles(dir: String): Set[(String, Long, Long)] = {
    val local = new java.io.File(dir)
    local.listFiles().filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getParentFile.getName + "/" + f.getName,
        f.lastModified(), f.length())).toSet
  }

  test("dv delete hides rows; every data file stays byte-identical") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))
    vt.append((100L until 200L).map(k => (k, k * 1.0)).toDF("k", "p"))
    val before = dataFiles(dir)
    val v = vt.delete(col("k") % 3 === 0, useDeletionVectors = true)
    assert(v === 2)
    assert(dataFiles(dir) === before) // names, mtimes, and sizes pinned
    assert(vt.history().orderBy("version").collect().map(_.getString(1)).toSeq
      === Seq("append", "append", "delete-dv"))
    // answers equal the CoW recomputation
    val expect = (0L until 200L).filter(_ % 3 != 0)
    assert(vt.read().select("k").collect().map(_.getLong(0)).sorted.toSeq
      === expect)
    // time travel still serves the pre-delete rows
    assert(vt.readAt(1).count() === 200)
    // COUNT(*) stays metadata-exact (recorded rows minus DV counts);
    // bounds and per-column counts honestly decline
    assert(vt.fastCount() === Some(expect.size.toLong))
    assert(vt.statRange("k") === None)
    assert(vt.fastNonNullCount("k") === None)
    assert(vt.detail().head.getLong(2) === expect.size.toLong)
  }

  test("dv deletes compose; a later CoW mutation folds and clears them") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, "x")).toDF("k", "s"))
    vt.delete(col("k") < 10L, useDeletionVectors = true)
    vt.delete(col("k") >= 90L, useDeletionVectors = true) // second DV, same dir
    assert(vt.read().count() === 80)
    assert(vt.fastCount() === Some(80L))
    // a dv delete of ALREADY-hidden rows is a no-op (no double commit)
    val vNow = vt.latestVersion
    assert(vt.delete(col("k") < 5L, useDeletionVectors = true) === vNow)
    // CoW update reads folded (hidden rows cannot resurrect) and the
    // rewritten directory's DV entries die with it
    vt.update(col("k") < 50L, Map("s" -> lit("u")))
    assert(vt.read().count() === 80)
    assert(vt.read().filter(col("s") === "u").count() === 40) // 10..49
    assert(vt.dvsAt(vt.latestVersion).isEmpty)
    assert(vt.fastNonNullCount("k") === Some(80L))
  }

  test("the DSv2 scan folds DVs through a V1 fallback, pruning intact") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 2.0)).toDF("k", "p"))
    vt.append((100L until 200L).map(k => (k, k * 2.0)).toDF("k", "p"))
    vt.delete(col("k") % 7 === 0, useDeletionVectors = true)
    val t = spark.read.format("graftvt").load(dir)
    val expect = (0L until 200L).filter(_ % 7 != 0)
    assert(t.count() === expect.size)
    assert(t.filter(col("k") < 100L).count() === expect.count(_ < 100L))
    // the fallback plan is the DV-folding V1 relation, not a parquet scan
    val scans = t.filter(col("k") < 100L).queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // unfiltered COUNT(*) still answers from metadata (LocalTableScan)
    val cnt = t.groupBy().count()
    val local = cnt.queryExecution.executedPlan.collect {
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l
    }
    assert(local.nonEmpty)
    assert(cnt.head.getLong(0) === expect.size.toLong)
    // time travel to the pre-delete version uses the plain parquet path
    val t1 = spark.read.format("graftvt").option("versionAsOf", 1).load(dir)
    assert(t1.count() === 200)
  }

  test("changes() serves the dv delete exactly and folds later synthesis") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 50L).map(k => (k, k * 1.0)).toDF("k", "p")) // v0
    vt.delete(col("k") < 5L, useDeletionVectors = true)             // v1
    val dv = vt.changes(1, 1).collect()
    assert(dv.map(r => (r.getLong(0), r.getString(2))).sorted.toSeq ===
      (0L until 5L).map((_, "delete")))
    // an overwrite's removed-dir synthesis reads the dir FOLDED — the
    // five already-deleted rows are not re-reported
    vt.overwrite(Seq((999L, 0.0)).toDF("k", "p"))                   // v2
    val ow = vt.changes(2, 2).collect()
    assert(ow.count(_.getString(2) == "delete") === 45)
    assert(ow.count(_.getString(2) == "insert") === 1)
  }

  test("OPTIMIZE compacts DVs away; vacuum reclaims unreferenced sidecars") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))
    vt.delete(col("k") % 2 === 0, useDeletionVectors = true)
    assert(vt.dvsAt(vt.latestVersion).nonEmpty)
    vt.optimize("k", 2)
    assert(vt.dvsAt(vt.latestVersion).isEmpty)
    assert(vt.read().count() === 50)
    assert(vt.statRange("k") === Some((1L, 99L))) // bounds exact again
    def dvDirs() = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("dv-"))
    assert(dvDirs() === 1)
    vt.vacuum(1)
    assert(dvDirs() === 0)
    assert(vt.read().count() === 50)
  }

  test("dv update hides originals and appends images; files intact; count exact") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))
    vt.append((100L until 200L).map(k => (k, k * 1.0)).toDF("k", "p"))
    val before = dataFiles(dir)
    val v = vt.update(col("k") % 10 === 0, Map("p" -> lit(-5.0)),
      useDeletionVectors = true)
    assert(v === 2)
    // the ORIGINAL files are untouched; ONE new directory (the images)
    assert(before.subsetOf(dataFiles(dir)))
    assert(vt.activeDirs().size === 3)
    assert(vt.history().orderBy("version").collect().map(_.getString(1)).toSeq
      === Seq("append", "append", "update-dv"))
    // values: every %10 key updated, everything else untouched
    assert(vt.read().filter(col("p") === -5.0).count() === 20)
    assert(vt.read().count() === 200)
    assert(vt.fastCount() === Some(200L)) // hidden == appended: exact
    // exact CDC pre/post images
    val ch = vt.changes(2, 2)
    assert(ch.filter(col("_change_type") === "update_preimage").count() === 20)
    assert(ch.filter(col("_change_type") === "update_postimage")
      .filter(col("p") === -5.0).count() === 20)
    // constraints validate the NEW images and abort cleanly pre-publish
    vt.addConstraint("p_floor", "p >= -100")
    val vNow = vt.latestVersion
    intercept[Exception](vt.update(col("k") === 1L,
      Map("p" -> lit(-1000.0)), useDeletionVectors = true))
    assert(vt.latestVersion === vNow)
    // a CoW pass over the dv'd dirs folds first: no resurrection
    vt.update(col("k") < 50L, Map("p" -> lit(7.0)))
    assert(vt.read().count() === 200)
    assert(vt.read().filter(col("p") === 7.0).count() === 50)
    assert(vt.read().filter(col("p") === -5.0).count() === 15) // 100..190 %10
  }

  test("DV-vs-rewrite policy: dominant matches rewrite; the threshold is tunable") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))
    val before = dataFiles(dir)
    // 90% of the directory matches: an ever-growing sidecar would be
    // strictly worse than the rewrite — the engine rewrites
    vt.delete(col("k") < 90L, useDeletionVectors = true)
    assert(vt.history().orderBy("version").collect().map(_.getString(1)).last
      === "delete")
    assert(dataFiles(dir) !== before)
    assert(vt.read().count() === 10)
    assert(vt.dvsAt(vt.latestVersion).isEmpty)
    // with the threshold raised, the same shape commits a sidecar
    val dir2 = tmpVt()
    val vt2 = new graft.sources.VersionedTable(spark, dir2)
    vt2.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))
    vt2.setProperties(Map("graft.deletionVectors.maxFraction" -> "0.95"))
    val before2 = dataFiles(dir2)
    vt2.delete(col("k") < 90L, useDeletionVectors = true)
    assert(vt2.history().orderBy("version").collect().map(_.getString(1)).last
      === "delete-dv")
    assert(dataFiles(dir2) === before2)
    assert(vt2.read().count() === 10)
    // cumulative debt counts: a second small DV pushing PAST the
    // default threshold on vt's twin rewrites instead
    val dir3 = tmpVt()
    val vt3 = new graft.sources.VersionedTable(spark, dir3)
    vt3.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))
    vt3.delete(col("k") < 40L, useDeletionVectors = true)  // 0.40: DV
    assert(vt3.dvsAt(vt3.latestVersion).nonEmpty)
    vt3.delete(col("k") >= 80L, useDeletionVectors = true) // 0.40+0.20: rewrite
    assert(vt3.history().orderBy("version").collect().map(_.getString(1)).last
      === "delete")
    assert(vt3.dvsAt(vt3.latestVersion).isEmpty)
    assert(vt3.read().count() === 40)
  }

  test("DV mutations ride the disjoint-writer retry: non-matching appends pass, conflicts are loud") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))
    // a concurrent append of rows the condition CANNOT match lands
    // between the DV write and its publish: the retry proves
    // disjointness (exact scan of the winner's added dirs) and commits
    val racer = new graft.sources.VersionedTable(spark, dir)
    vt.beforeMutationPublish = () => {
      vt.beforeMutationPublish = () => ()
      racer.append((1000L until 1010L).map(k => (k, 0.0)).toDF("k", "p"))
    }
    vt.delete(col("k") < 10L, useDeletionVectors = true)
    assert(vt.history().orderBy("version").collect().map(_.getString(1)).toSeq
      === Seq("append", "append", "delete-dv"))
    assert(vt.read().count() === 100) // 90 survivors + 10 raced-in rows
    // a concurrent append of MATCHING data fails loudly — committing
    // the DV would silently miss rows the delete never saw
    vt.beforeMutationPublish = () => {
      vt.beforeMutationPublish = () => ()
      racer.append(Seq((5L, 5.0)).toDF("k", "p")) // k=5 < 20: matches
    }
    val e = intercept[IllegalStateException] {
      vt.delete(col("k") < 20L, useDeletionVectors = true)
    }
    assert(e.getMessage.contains("may match"))
    // nothing half-committed: the loser's sidecar never published
    assert(vt.history().orderBy("version").collect().map(_.getString(1)).last
      === "append")
    assert(vt.read().filter(col("k") === 5L).count() === 1)
    // the same rules hold for the DV update
    vt.beforeMutationPublish = () => {
      vt.beforeMutationPublish = () => ()
      racer.append((2000L until 2005L).map(k => (k, 0.0)).toDF("k", "p"))
    }
    vt.update(col("k") === 15L, Map("p" -> lit(-9.0)),
      useDeletionVectors = true)
    assert(vt.history().orderBy("version").collect().map(_.getString(1)).last
      === "update-dv")
    assert(vt.read().filter(col("p") === -9.0).count() === 1)
  }

  test("a concurrent DV attachment to a read directory conflicts loudly; disjoint DVs retry through") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 100L).map(k => (k, k * 1.0)).toDF("k", "p"))   // dir A
    vt.append((100L until 200L).map(k => (k, k * 1.0)).toDF("k", "p")) // dir B
    val racer = new graft.sources.VersionedTable(spark, dir)
    // CASE 1: a racing DV DELETE on the SAME directory this copy-on-
    // write delete read must fail loudly — the loser's rewrite was
    // computed from the pre-DV fold and would resurrect the winner's
    // deleted rows.
    vt.beforeMutationPublish = () => {
      vt.beforeMutationPublish = () => ()
      racer.delete(col("k") < 5L, useDeletionVectors = true) // DV on dir A
    }
    val e1 = intercept[IllegalStateException] {
      vt.delete(col("k") < 10L) // CoW, touches dir A
    }
    assert(e1.getMessage.contains("deletion vector"))
    // the winner's DV held: k < 5 stays hidden, nothing resurrected
    assert(vt.read().count() === 195)
    // CASE 2: two racing DV mutations on ONE directory must not both
    // commit — dvRowsByDir would double-count and COUNT(*) would lie.
    vt.beforeMutationPublish = () => {
      vt.beforeMutationPublish = () => ()
      racer.delete(col("k") >= 20L && col("k") < 25L,
        useDeletionVectors = true) // second DV, also dir A
    }
    val e2 = intercept[IllegalStateException] {
      vt.delete(col("k") >= 10L && col("k") < 15L,
        useDeletionVectors = true) // DV, dir A
    }
    assert(e2.getMessage.contains("deletion vector"))
    assert(vt.read().count() === 190) // 5 + 5 hidden, loser never landed
    assert(vt.fastCount() === Some(190L)) // metadata count stays exact
    // CASE 3: a racing DV on a DISJOINT directory retries through —
    // the overwhelmingly common case, no spurious failure.
    vt.beforeMutationPublish = () => {
      vt.beforeMutationPublish = () => ()
      racer.delete(col("k") >= 190L, useDeletionVectors = true) // dir B
    }
    vt.delete(col("k") < 30L, useDeletionVectors = true) // dir A only
    assert(vt.read().count() === 160) // 30 + 10 hidden across both dirs
    assert(vt.fastCount() === Some(160L))
    // CASE 4: a concurrent RESTORE resets the DV map — unprovable,
    // loud.
    vt.beforeMutationPublish = () => {
      vt.beforeMutationPublish = () => ()
      racer.restore(2)
    }
    val e3 = intercept[IllegalStateException] {
      vt.delete(col("k") === 50L, useDeletionVectors = true)
    }
    assert(e3.getMessage.contains("reset"))
  }

  test("restore rolls the DV state back with the data") {
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append((0L until 40L).map(k => (k, "a")).toDF("k", "s")) // v0
    vt.delete(col("k") < 10L, useDeletionVectors = true)        // v1: 30 rows
    vt.delete(col("k") >= 30L, useDeletionVectors = true)       // v2: 20 rows
    assert(vt.read().count() === 20)
    vt.restore(1)                                               // v3 = v1 state
    assert(vt.read().count() === 30)
    assert(vt.fastCount() === Some(30L))
    vt.restore(0)                                               // v4 = no DVs
    assert(vt.read().count() === 40)
    assert(vt.dvsAt(vt.latestVersion).isEmpty)
    assert(vt.fastNonNullCount("k") === Some(40L))
  }
}
