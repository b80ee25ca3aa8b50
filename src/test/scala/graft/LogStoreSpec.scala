package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** A store that always loses — proves the protocol treats a claim
  * refusal as the ordinary optimistic-concurrency loss (loud, never a
  * partial commit).
  */
class AlwaysLosesLogStore extends graft.sources.GraftLogStore {
  override def atomicClaim(fs: FileSystem, tmp: Path,
                           target: Path): Boolean = false
}

/** A user-shaped SERVICE coordinator: conditional put over a shared KV
  * map (what a DynamoDB putItem-with-attribute_not_exists or an S3
  * If-None-Match PUT reduces to) — named via
  * `spark.graft.logstore.coordinatorClass` with nothing else written.
  */
class FakeKvServiceCoordinator extends graft.sources.GraftClaimCoordinator {
  import FakeKvServiceCoordinator.kv
  override def claim(slot: String, value: String): Boolean =
    kv.putIfAbsent(slot, value) == null
  override def claimedValue(slot: String): Option[String] =
    Option(kv.get(slot))
  override def release(slot: String): Unit = kv.remove(slot)
}
object FakeKvServiceCoordinator {
  val kv = new java.util.concurrent.ConcurrentHashMap[String, String]()
}

/** The pluggable commit-claim seam ([[graft.sources.GraftLogStore]]):
  * the whole protocol above the one-method primitive is
  * backend-agnostic. [[graft.sources.GraftCoordinatedLogStore]] is the
  * MAIN-TREE object-store implementation (claim-is-the-commit over a
  * [[graft.sources.GraftClaimCoordinator]], Delta's S3 LogStore shape)
  * — this spec races it, crashes it mid-commit, and runs the full
  * table protocol over it.
  */
class LogStoreSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_ls_spec").toString

  private def withStore[A](cls: String, coordDir: Option[String] = None)
      (body: => A): A = {
    spark.conf.set(graft.sources.GraftLogStore.ConfKey, cls)
    coordDir.foreach(d =>
      spark.conf.set(graft.sources.GraftLogStore.CoordinatorDirKey, d))
    try body finally {
      spark.conf.unset(graft.sources.GraftLogStore.ConfKey)
      spark.conf.unset(graft.sources.GraftLogStore.CoordinatorDirKey)
    }
  }

  private val coordinated =
    classOf[graft.sources.GraftCoordinatedLogStore].getName

  /** Seed dense predecessor manifests 0..n at `work` — real logs are
    * dense below the slot being raced for, and the stores now REFUSE a
    * slot whose predecessor does not resolve (the stale-writer guard),
    * so a synthetic race dir must look like a real log.
    */
  private def seedManifests(fs: FileSystem, work: String, n: Int): Unit =
    (0 to n).foreach { v =>
      val p = new Path(work, f"$v%08d.json")
      val out = fs.create(p, false)
      out.write(s"""{"seed":$v}""".getBytes("UTF-8")); out.close()
    }

  test("the full protocol runs over the coordinated store (directory claims)") {
    val claims = tmpVt()
    withStore(coordinated, Some(claims)) {
      val dir = tmpVt()
      val vt = new graft.sources.VersionedTable(spark, dir)
      vt.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
      vt.append(Seq((3L, "c")).toDF("k", "s"))
      vt.delete(col("k") === 2L)
      vt.optimize("k", 1)
      assert(vt.read().orderBy("k").collect().map(_.getLong(0)).toSeq
        === Seq(1L, 3L))
      assert(vt.history().count() === 4)
      // every commit claimed through the coordinator directory
      assert(new java.io.File(claims).listFiles()
        .count(_.getName.endsWith(".claim")) >= 4)
      // time travel still resolves: manifests were really written
      assert(vt.readAt(1).count() === 3)
    }
  }

  test("4-writer race on one slot: exactly one winner, everyone loud") {
    val claims = tmpVt()
    val work = tmpVt()
    val fs = new Path(work).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    withStore(coordinated, Some(claims)) {
      val store = new graft.sources.GraftCoordinatedLogStore()
      seedManifests(fs, work, 0)
      val target = new Path(work, "00000001.json")
      val prepared = (0 until 4).map { i =>
        val tmp = new Path(work, s".tmp-$i")
        val out = fs.create(tmp, false)
        out.write(s"""{"writer":$i}""".getBytes("UTF-8")); out.close()
        (i, tmp)
      }
      val acc = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(Int, Boolean)]())
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = prepared.map { case (i, tmp) =>
        new Thread(() => {
          gate.await()
          acc.add((i, store.atomicClaim(fs, tmp, target)))
        })
      }
      threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
      val results = scala.jdk.CollectionConverters
        .ListHasAsScala(acc).asScala.toList
      assert(results.count(_._2) === 1)
      val winner = results.find(_._2).get._1
      // the target holds EXACTLY the winner's bytes
      val in = fs.open(target)
      val content = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      assert(content === s"""{"writer":$winner}""")
      // winner's tmp is gone; losers' tmps remain for reclamation
      assert(!fs.exists(new Path(work, s".tmp-$winner")))
      assert(results.filterNot(_._2).forall { case (i, _) =>
        fs.exists(new Path(work, s".tmp-$i")) })
    }
  }

  test("crashed winner's commit rolls forward from the recorded claim") {
    val claims = tmpVt()
    val work = tmpVt()
    val fs = new Path(work).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    withStore(coordinated, Some(claims)) {
      seedManifests(fs, work, 1)
      val target = new Path(work, "00000002.json")
      // the "crashed winner": claimed the slot, wrote its tmp, died
      // before the upload — simulate by claiming directly
      val crashedTmp = new Path(work, ".tmp-crashed")
      val out = fs.create(crashedTmp, false)
      out.write("""{"writer":"crashed"}""".getBytes("UTF-8")); out.close()
      val coord = new graft.sources.GraftDirectoryClaimCoordinator(
        new Path(claims), fs)
      assert(coord.claim(target.toString, crashedTmp.toString))
      assert(!fs.exists(target)) // wedged: claim without manifest
      // a later writer loses the claim AND completes the upload
      val store = new graft.sources.GraftCoordinatedLogStore()
      val laterTmp = new Path(work, ".tmp-later")
      val out2 = fs.create(laterTmp, false)
      out2.write("""{"writer":"later"}""".getBytes("UTF-8")); out2.close()
      assert(!store.atomicClaim(fs, laterTmp, target))
      val in = fs.open(target)
      val content = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      assert(content === """{"writer":"crashed"}""") // the CLAIM is the commit
    }
  }

  test("claim namespace separates same-numbered manifests of different tables") {
    val claims = tmpVt()
    val fs = new Path(claims).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val coord = new graft.sources.GraftDirectoryClaimCoordinator(
      new Path(claims), fs)
    // two TABLES sharing one coordinator directory, same version number:
    // both claims must win (distinct slots — a colliding namespace would
    // refuse the second table's commit forever and cross-feed recovery)
    assert(coord.claim("/data/t1/_graft_log/00000005.json", "tmp1"))
    assert(coord.claim("/data/t2/_graft_log/00000005.json", "tmp2"))
    assert(coord.claimedValue("/data/t1/_graft_log/00000005.json")
      === Some("tmp1"))
    assert(coord.claimedValue("/data/t2/_graft_log/00000005.json")
      === Some("tmp2"))
    // and the same slot twice still has exactly one winner
    assert(!coord.claim("/data/t1/_graft_log/00000005.json", "tmp3"))
  }

  test("a failed claim write is a FAILURE, never 'already claimed'") {
    val claims = tmpVt()
    val work = tmpVt()
    val fs = new Path(work).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val coord = new graft.sources.GraftDirectoryClaimCoordinator(
      new Path(claims), fs)
    // a claim that could not fully write must leave NO claim behind —
    // the caller retries the claim, it does not demote to a loser (a
    // loser would roll its own half-claim forward and then also retry
    // the commit at the next slot, duplicating rows)
    assert(coord.claim("slot-a", "v1"))
    assert(coord.claimedValue("slot-a") === Some("v1")) // fully written
    val claimFiles = new java.io.File(claims).listFiles()
      .filter(_.getName.endsWith(".claim"))
    assert(claimFiles.length === 1)
    // no tmp residue from the atomic publish
    assert(!new java.io.File(claims).listFiles()
      .exists(_.getName.startsWith(".claim-tmp")))
    // INJECTED failure: an unwritable coordinator location (a FILE
    // where the directory should be) must THROW — returning false here
    // would be the old 'failure reads as already-claimed' bug, which
    // let a writer roll its own half-claim forward and also retry the
    // commit, duplicating rows
    val notADir = java.nio.file.Files.createTempFile("claims", ".f")
    val broken = new graft.sources.GraftDirectoryClaimCoordinator(
      new Path(notADir.toString), fs)
    intercept[Exception](broken.claim("slot-b", "v2"))
    assert(broken.claimedValue("slot-b").isEmpty) // nothing half-claimed
  }

  test("a lost claim is the ordinary optimistic loss: loud, no partial commit") {
    val dir = tmpVt()
    val vt0 = new graft.sources.VersionedTable(spark, dir)
    vt0.append(Seq((1L, "a")).toDF("k", "s"))
    withStore(classOf[AlwaysLosesLogStore].getName) {
      val vt = new graft.sources.VersionedTable(spark, dir)
      val e = intercept[IllegalStateException] {
        vt.overwrite(Seq((9L, "z")).toDF("k", "s")) // no retry wrapper
      }
      assert(e.getMessage.contains("concurrent commit"))
    }
    // nothing half-committed: the table still reads version 0
    assert(vt0.read().head.getLong(0) === 1L)
    assert(vt0.latestVersion === 0)
  }

  test("misconfiguration fails loudly at first commit, not silently") {
    withStore("com.example.DoesNotExist") {
      val dir = tmpVt()
      val vt = new graft.sources.VersionedTable(spark, dir)
      val e = intercept[IllegalArgumentException] {
        vt.append(Seq((1L, "a")).toDF("k", "s"))
      }
      assert(e.getMessage.contains("spark.graft.logstore.class"))
    }
  }

  test("in-process coordinator arbitrates when no directory is configured") {
    withStore(coordinated) {
      val dir = tmpVt()
      val vt = new graft.sources.VersionedTable(spark, dir)
      vt.append(Seq((1L, "a")).toDF("k", "s"))
      vt.append(Seq((2L, "b")).toDF("k", "s"))
      assert(vt.read().count() === 2)
      assert(vt.latestVersion === 1)
    }
  }

  test("the in-process map stays O(in-flight): completed commits release their claims") {
    withStore(coordinated) {
      val dir = tmpVt()
      val vt = new graft.sources.VersionedTable(spark, dir)
      val before = graft.sources.GraftInProcessClaimCoordinator.retained
      (0 until 8).foreach(i => vt.append(Seq((i.toLong, "x")).toDF("k", "s")))
      assert(vt.latestVersion === 7)
      // every slot released on durable visibility — nothing retained
      // beyond whatever unrelated in-flight work the suite carries
      assert(graft.sources.GraftInProcessClaimCoordinator.retained <= before)
    }
  }

  test("a re-claimed released slot can never rewrite a committed manifest") {
    withStore(coordinated) {
      val work = tmpVt()
      val fs = new org.apache.hadoop.fs.Path(work).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val store = new graft.sources.GraftCoordinatedLogStore()
      seedManifests(fs, work, 4)
      val target = new org.apache.hadoop.fs.Path(work, "00000005.json")
      def mkTmp(name: String, content: String): org.apache.hadoop.fs.Path = {
        val p = new org.apache.hadoop.fs.Path(work, name)
        val out = fs.create(p, false)
        out.write(content.getBytes("UTF-8")); out.close()
        p
      }
      // the real winner commits and (internally) releases its claim
      assert(store.atomicClaim(fs, mkTmp(".tmp-w", """{"w":1}"""), target))
      // a stale writer that computed the same slot re-claims it — the
      // exists-check surrenders the claim; the manifest is untouched
      assert(!store.atomicClaim(fs, mkTmp(".tmp-stale", """{"w":2}"""), target))
      val in = fs.open(target)
      val content = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      assert(content === """{"w":1}""")
      // and no staged .put- litter survives beside the log
      assert(!fs.listStatus(new org.apache.hadoop.fs.Path(work))
        .exists(_.getPath.getName.contains(".put-")))
    }
  }

  test("a config-named service coordinator runs the full protocol and crash recovery") {
    spark.conf.set(graft.sources.GraftLogStore.CoordinatorClassKey,
      classOf[FakeKvServiceCoordinator].getName)
    try withStore(coordinated) {
      val dir = tmpVt()
      val vt = new graft.sources.VersionedTable(spark, dir)
      vt.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
      vt.delete(col("k") === 2L)
      assert(vt.read().collect().map(_.getLong(0)).toSeq === Seq(1L))
      assert(vt.history().count() === 2)
      // crash roll-forward rides the user's coordinator unchanged: a
      // "crashed winner" claimed slot 2 through the KV service, wrote
      // its tmp, died before the upload; a later loser completes it
      val work = tmpVt()
      val fs = new Path(work).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      seedManifests(fs, work, 1)
      val target = new Path(work, "00000002.json")
      val crashedTmp = new Path(work, ".tmp-crashed")
      val out = fs.create(crashedTmp, false)
      out.write("""{"writer":"crashed"}""".getBytes("UTF-8")); out.close()
      assert(new FakeKvServiceCoordinator()
        .claim(target.toString, crashedTmp.toString))
      val store = new graft.sources.GraftCoordinatedLogStore()
      val laterTmp = new Path(work, ".tmp-later")
      val out2 = fs.create(laterTmp, false)
      out2.write("""{"writer":"later"}""".getBytes("UTF-8")); out2.close()
      assert(!store.atomicClaim(fs, laterTmp, target))
      val in = fs.open(target)
      val content = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      assert(content === """{"writer":"crashed"}""")
      // misconfiguration is loud, never a silent different protocol
      spark.conf.set(graft.sources.GraftLogStore.CoordinatorClassKey,
        "com.example.NoSuchCoordinator")
      val vt2 = new graft.sources.VersionedTable(spark, tmpVt())
      val e = intercept[Exception] {
        vt2.append(Seq((1L, "a")).toDF("k", "s"))
      }
      assert(e.getMessage.contains("coordinatorClass"))
    } finally spark.conf.unset(
      graft.sources.GraftLogStore.CoordinatorClassKey)
  }

  test("a maximally stale writer cannot publish below the vacuum floor") {
    // exists(target) alone cannot arbitrate a slot whose manifest was
    // legitimately RECLAIMED: vacuum deletes every manifest below its
    // cutoff, and a writer that computed its slot before the vacuum,
    // stalled, then woke would find the target absent and publish a
    // bogus manifest at an old version — an acknowledged commit no
    // current reader resolves. Both stores must refuse such a slot.
    val dir = tmpVt()
    val vt = new graft.sources.VersionedTable(spark, dir)
    (0 until 6).foreach(i => vt.append(Seq((i.toLong, "x")).toDF("k", "s")))
    vt.vacuum(keepLast = 2) // manifests 0..3 reclaimed, 4..5 survive
    val logDir = new Path(dir, "_graft_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(logDir, "00000002.json")))
    def mkTmp(name: String): Path = {
      val p = new Path(logDir, name)
      val out = fs.create(p, false)
      out.write("""{"writer":"stale"}""".getBytes("UTF-8")); out.close()
      p
    }
    // slot 3: just below the floor — the NEXT manifest (4) survives,
    // proving the slot already decided (the v+1 branch)
    val t2 = new Path(logDir, "00000003.json")
    // slot 1: deep below the floor — neither neighbor resolves
    // (the v-1 branch)
    val t1 = new Path(logDir, "00000001.json")
    assert(!graft.sources.GraftLogStore.Default
      .atomicClaim(fs, mkTmp(".tmp-st-d2"), t2))
    assert(!graft.sources.GraftLogStore.Default
      .atomicClaim(fs, mkTmp(".tmp-st-d1"), t1))
    val coord = new graft.sources.GraftCoordinatedLogStore()
    assert(!coord.atomicClaim(fs, mkTmp(".tmp-st-c2"), t2))
    assert(!coord.atomicClaim(fs, mkTmp(".tmp-st-c1"), t1))
    assert(!fs.exists(t2) && !fs.exists(t1)) // nothing planted
    // the surviving log still reads and appends normally
    assert(vt.latestVersion === 5)
    vt.append(Seq((9L, "y")).toDF("k", "s"))
    assert(vt.latestVersion === 6)
    // ...and a CHECKPOINT slot is never staleness-refused (the
    // publisher proved its version committed before writing it)
    assert(!graft.sources.GraftLogStore.slotSuperseded(fs,
      new Path(logDir, "00000004.checkpoint.json")))
  }
}
