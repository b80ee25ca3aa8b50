package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** An EXTERNAL-COORDINATOR log store in the S3 shape: the backing
  * "store" has NO atomic no-overwrite rename (a plain copy-then-delete
  * stands in for an object PUT, which would overwrite silently), so
  * single-winner arbitration comes from an external claims table —
  * here a JVM-global map standing in for the DynamoDB table Delta's
  * S3 LogStore uses. putIfAbsent is the ONLY atomicity relied on.
  */
class ExternalCoordinatorLogStore extends graft.sources.GraftLogStore {
  override def atomicClaim(fs: FileSystem, tmp: Path,
                           target: Path): Boolean = {
    ExternalCoordinatorLogStore.calls.incrementAndGet()
    // claim the slot in the COORDINATOR first; the storage write below
    // is then uncontended (an S3 PUT may overwrite, but only the claim
    // winner ever attempts it)
    if (ExternalCoordinatorLogStore.claims
        .putIfAbsent(target.toString, "claimed") != null) {
      return false
    }
    // "object PUT": non-atomic copy + delete — deliberately NOT a rename
    val in = fs.open(tmp)
    val out = fs.create(target, false)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally { in.close(); out.close() }
    fs.delete(tmp, false)
    true
  }
}

object ExternalCoordinatorLogStore {
  val claims = new ConcurrentHashMap[String, String]()
  val calls = new AtomicInteger(0)
}

/** A store that always loses — proves the protocol treats a claim
  * refusal as the ordinary optimistic-concurrency loss (loud, never a
  * partial commit).
  */
class AlwaysLosesLogStore extends graft.sources.GraftLogStore {
  override def atomicClaim(fs: FileSystem, tmp: Path,
                           target: Path): Boolean = false
}

/** The pluggable commit-claim seam ([[graft.sources.GraftLogStore]]):
  * the whole protocol above the one-method primitive is
  * backend-agnostic, so an object store only needs to supply
  * single-winner claims (the S3 seam Delta documents).
  */
class LogStoreSpec extends SparkSuite {
  import spark.implicits._

  private def tmpVt(): String =
    java.nio.file.Files.createTempDirectory("vt_ls_spec").toString

  private def withStore[A](cls: String)(body: => A): A = {
    spark.conf.set(graft.sources.GraftLogStore.ConfKey, cls)
    try body finally spark.conf.unset(graft.sources.GraftLogStore.ConfKey)
  }

  test("the full protocol runs over an external-coordinator store") {
    withStore(classOf[ExternalCoordinatorLogStore].getName) {
      val before = ExternalCoordinatorLogStore.calls.get()
      val dir = tmpVt()
      val vt = new graft.sources.VersionedTable(spark, dir)
      vt.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
      vt.append(Seq((3L, "c")).toDF("k", "s"))
      vt.delete(col("k") === 2L)
      vt.optimize("k", 1)
      assert(vt.read().orderBy("k").collect().map(_.getLong(0)).toSeq
        === Seq(1L, 3L))
      assert(vt.history().count() === 4)
      // every commit (and checkpoint, if any) went through the plugin
      assert(ExternalCoordinatorLogStore.calls.get() - before >= 4)
      // time travel still resolves: manifests were really written
      assert(vt.readAt(1).count() === 3)
    }
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
}
