package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The per-backend ATOMIC PUBLISH primitive the whole commit protocol
  * hangs on (Delta's LogStore abstraction, reduced to the one method
  * the protocol actually needs): claim `target` with the content of
  * `tmp` such that of N racing writers EXACTLY ONE returns true and
  * the rest false — never two winners, never zero. Everything above
  * this (optimistic retry, conflict detection, checkpointing, vacuum)
  * is backend-agnostic.
  *
  * Built-in behavior ([[GraftLogStore.Default]]):
  *  - `file://` — hard-link the tmp onto the target: link(2) fails
  *    EEXIST atomically in the kernel (a rename would REPLACE an
  *    existing target on POSIX — two racers could both "win");
  *  - everything else (HDFS and HDFS-semantics stores) — exists-check
  *    then rename, whose rename-onto-existing fails atomically there.
  *
  * An OBJECT STORE (S3-style: no atomic no-overwrite rename, list-
  * after-write consistency caveats) needs an EXTERNAL coordinator —
  * exactly the seam Delta documents for S3 (its S3DynamoDBLogStore).
  * Plug one in per session:
  * {{{ spark.conf.set("spark.graft.logstore.class", "com.example.MyStore") }}}
  * — the class needs a no-arg constructor; it is resolved once per
  * [[VersionedTable]] instance. The contract to uphold is ONLY the
  * single-winner property above. The SHIPPABLE object-store stack is
  * in the main tree: [[GraftCoordinatedLogStore]] (claim-is-the-commit
  * + crash roll-forward) over a [[GraftClaimCoordinator]] — use
  * [[GraftDirectoryClaimCoordinator]] when a strongly consistent
  * filesystem is reachable, or name a 2-method conditional-PUT
  * coordinator of your own via `spark.graft.logstore.coordinatorClass`
  * (the DynamoDB/S3-conditional-write mapping is documented on the
  * coordinator trait); `graft.LogStoreSpec` carries the race test any
  * custom store or coordinator must pass.
  */
trait GraftLogStore {

  /** Atomically claim `target` with the content of `tmp`. Returns true
    * for the single winner; false if another writer already claimed
    * the slot. On true, `tmp` must no longer exist; on false, `tmp`
    * is left for the caller to reclaim.
    */
  def atomicClaim(fs: FileSystem, tmp: Path, target: Path): Boolean
}

/** The external ARBITER a no-atomic-rename store needs: putIfAbsent
  * over commit slots. This is the whole interface Delta's
  * S3DynamoDBLogStore reduces to — map [[claim]] onto your
  * coordination service's conditional write:
  *  - DynamoDB: `putItem` with `attribute_not_exists(slot)`;
  *  - S3 itself (2024+ conditional writes): `PUT` with
  *    `If-None-Match: *` on a claims prefix;
  *  - ZooKeeper/etcd: create-if-absent of an ephemeral-free node;
  *  - any SQL store: `INSERT` on a primary key.
  * `value` is the claimer's tmp-manifest path — recorded so that a
  * LATER claimer can roll a crashed winner's upload forward (the
  * recovery Delta documents for S3: the claim is the commit; the
  * object write is completable by anyone).
  */
trait GraftClaimCoordinator {

  /** putIfAbsent: true iff THIS call uniquely claimed `slot`. */
  def claim(slot: String, value: String): Boolean

  /** The recorded value of an already-claimed slot (for recovery). */
  def claimedValue(slot: String): Option[String]

  /** Drop a slot's recorded claim once its commit is DURABLY VISIBLE
    * in the log (the manifest exists) — the claim's only remaining
    * purpose, crash roll-forward, is moot then. Safe ONLY because the
    * log store's winner path independently refuses to write a slot
    * whose manifest already exists: a stale writer that re-claims a
    * released slot can never rewrite a committed manifest. Default
    * no-op (a directory coordinator's claims live with the log and
    * vacuum with it).
    */
  def release(slot: String): Unit = ()
}

/** A claims DIRECTORY on any store with atomic no-overwrite create
  * (HDFS, NFS, a small EBS/EFS mount, local disk) — the minimal
  * coordinator when the DATA lives on an object store but a strongly
  * consistent filesystem is reachable. One tiny file per commit slot.
  * Claim files may be cleaned up ONLY for slots whose manifest is
  * durably present in the log (the winner path's exists-check then
  * keeps a re-claimed slot from ever rewriting it); never clear the
  * claim of an in-flight or crashed commit — it carries the
  * roll-forward pointer.
  */
class GraftDirectoryClaimCoordinator(dir: Path, fs: FileSystem)
    extends GraftClaimCoordinator {

  private def slotPath(slot: String): Path = {
    // slots are full target paths: flatten to a filename. The digest is
    // a full SHA-256 prefix (128 bits) of the WHOLE slot string — a
    // 32-bit hash would let two different tables' same-numbered
    // manifests collide in a shared coordinator directory, and the
    // recovery path would then roll a FOREIGN table's bytes forward.
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(slot.getBytes("UTF-8")).take(16)
      .map(b => f"$b%02x").mkString
    new Path(dir, digest + "-" + new Path(slot).getName + ".claim")
  }

  /** Claim = make the fully-written content file appear at the slot
    * path ATOMICALLY: the value is first written to a private tmp (a
    * failure there is a FAILED claim attempt and throws — it must not
    * read as "someone else holds the slot", which would let a writer
    * roll ITS OWN half-claim forward and then also retry as a loser,
    * duplicating the commit), then linked/renamed into place with the
    * backend's atomic no-overwrite primitive.
    */
  override def claim(slot: String, value: String): Boolean = {
    fs.mkdirs(dir)
    val p = slotPath(slot)
    if (fs.exists(p)) return false // fast path; the create still arbitrates
    val tmp = new Path(dir,
      s".claim-tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    if (fs.getScheme == "file") {
      // kernel-atomic publish: hard-link the complete tmp onto the
      // claim path — link(2) fails EEXIST atomically (Hadoop's LOCAL
      // create(overwrite = false) is a racy exists-check-then-create).
      // The tmp is reclaimed on EVERY exit, including a failed write
      // (a failed claim attempt throws — and must not leave garbage in
      // a shared coordinator directory).
      val localTmp = java.nio.file.Paths.get(tmp.toUri.getPath)
      try {
        java.nio.file.Files.write(localTmp, value.getBytes("UTF-8"))
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(p.toUri.getPath), localTmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } finally java.nio.file.Files.deleteIfExists(localTmp)
    } else {
      // HDFS-semantics stores: write the tmp fully (any failure here
      // propagates — the claim was NOT taken), then the namenode-atomic
      // no-overwrite rename arbitrates; the tmp is reclaimed on every
      // non-winning exit, including a throwing rename
      var won = false
      try {
        val out = fs.create(tmp, false)
        try out.write(value.getBytes("UTF-8")) finally out.close()
        won = try fs.rename(tmp, p) catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        }
        won
      } finally if (!won) fs.delete(tmp, false)
    }
  }

  override def claimedValue(slot: String): Option[String] = {
    val p = slotPath(slot)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(bytes.toString("UTF-8"))
      } finally in.close()
    }
  }
}

/** A JVM-global claims map — single-process arbitration (concurrent
  * writer THREADS in one application, and the default rig for specs).
  * Multi-process writers need [[GraftDirectoryClaimCoordinator]] or a
  * service-backed [[GraftClaimCoordinator]].
  *
  * BOUNDED: the log store [[GraftClaimCoordinator.release releases]] a
  * slot as soon as its manifest is durably visible, so the map only
  * retains IN-FLIGHT (or crashed-pre-upload) commits — O(concurrent
  * writers), not O(commit history). Eviction is safe because the
  * winner path consults the STORAGE before writing: a stale writer
  * that re-claims a released slot finds the manifest present and
  * loses, never overwriting it. A crashed winner's claim is never
  * released (its manifest doesn't exist yet), so crash roll-forward
  * keeps its pointer.
  */
object GraftInProcessClaimCoordinator extends GraftClaimCoordinator {
  private val claims =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  override def claim(slot: String, value: String): Boolean =
    claims.putIfAbsent(slot, value) == null
  override def claimedValue(slot: String): Option[String] =
    Option(claims.get(slot))
  override def release(slot: String): Unit = claims.remove(slot)
  /** Spec seam: entries currently retained. */
  private[graft] def retained: Int = claims.size
}

/** The object-store commit protocol (Delta's S3 LogStore shape, over
  * the [[GraftClaimCoordinator]] seam): the CLAIM is the commit — the
  * winner then uploads the manifest with a plain overwrite-tolerant
  * put, safe because only the claim winner (or a recoverer copying
  * the IDENTICAL bytes) ever writes the target. Configure with
  * {{{
  *   spark.conf.set("spark.graft.logstore.class",
  *     "graft.sources.GraftCoordinatedLogStore")
  *   spark.conf.set("spark.graft.logstore.coordinatorDir", "/mnt/claims")
  * }}}
  * — without `coordinatorDir` the in-process map arbitrates (single
  * JVM only). Crash recovery: if a winner dies between claim and
  * upload, any later claimer of the slot finds the claim present but
  * the target absent and ROLLS THE UPLOAD FORWARD from the tmp path
  * the claim recorded (tmp files are only deleted after a completed
  * upload, so the bytes are still there); it still returns false —
  * the slot belongs to the crashed winner's commit, which is now
  * complete.
  */
class GraftCoordinatedLogStore extends GraftLogStore {

  private def coordinator(fs: FileSystem): GraftClaimCoordinator = {
    val conf = SparkSession.active.conf
    conf.getOption(GraftLogStore.CoordinatorClassKey)
      .filter(_.nonEmpty) match {
      case Some(cn) =>
        // a SERVICE-backed coordinator (DynamoDB conditional putItem,
        // S3 If-None-Match, etcd create-if-absent, SQL INSERT-on-PK):
        // the user ships ONLY the 2-method GraftClaimCoordinator and
        // names it here — the commit protocol, crash roll-forward, and
        // claim lifecycle all ride this class unchanged. Fails loudly
        // on misconfiguration: a silent fallback would arbitrate with
        // a different atomicity story than the one asked for.
        try Class.forName(cn).getDeclaredConstructor().newInstance()
          .asInstanceOf[GraftClaimCoordinator]
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"${GraftLogStore.CoordinatorClassKey} = $cn could not be " +
              "instantiated as a graft.sources.GraftClaimCoordinator " +
              "(no-arg constructor required)", e)
        }
      case None =>
        conf.getOption(GraftLogStore.CoordinatorDirKey)
          .filter(_.nonEmpty) match {
          case Some(d) => new GraftDirectoryClaimCoordinator(new Path(d), fs)
          case None => GraftInProcessClaimCoordinator
        }
    }
  }

  /** Publish `tmp`'s bytes at `target`. On visible-at-close stores
    * (S3-style PUT — this class's design center) a direct
    * overwrite-tolerant create is exactly the PUT stand-in. On
    * visible-BEFORE-close filesystems (local, HDFS) a direct create
    * would expose a truncated manifest to concurrent readers and a
    * crash mid-copy would leave a torn file the recovery path then
    * trusts — there the bytes are staged beside the target and RENAMED
    * into place (atomic on both); a failed rename means another
    * identical-bytes writer (a loser's crash roll-forward of the same
    * recorded tmp) won the final step, which is success. `deleteTmp =
    * false` on the recovery path (the crashed winner's retry may still
    * hold the handle).
    */
  private def put(fs: FileSystem, tmp: Path, target: Path,
                  deleteTmp: Boolean): Unit = {
    val scheme = fs.getScheme
    val staged =
      if (scheme == "file" || scheme == "hdfs")
        new Path(target.getParent,
          s".${target.getName}.put-${java.util.UUID.randomUUID().toString.take(8)}")
      else target
    val in = fs.open(tmp)
    try {
      val out = fs.create(staged, true)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
    if (staged != target && !fs.rename(staged, target)) {
      fs.delete(staged, false)
      // a failed rename is only benign when the target actually exists
      // (another identical-bytes writer — a loser's crash roll-forward
      // of the same recorded tmp — won the final step). Any OTHER
      // cause (quota, lease, a vanished parent) must FAIL the commit:
      // reporting success with no manifest would let the released slot
      // be re-claimed and a different commit land at this version,
      // silently losing this one.
      if (!fs.exists(target)) throw new java.io.IOException(
        s"manifest publish failed: rename $staged -> $target returned " +
          "false and no manifest exists at the target")
    }
    if (deleteTmp) fs.delete(tmp, false)
  }

  override def atomicClaim(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    val coord = coordinator(fs)
    if (coord.claim(target.toString, tmp.toString)) {
      if (fs.exists(target)) {
        // a committed manifest is NEVER rewritten: this is a re-claim
        // of a slot released (or cleaned up) after its commit became
        // durable — a stale writer that computed the slot from a stale
        // latestVersion. Surrender the claim and lose.
        coord.release(target.toString)
        return false
      }
      if (GraftLogStore.slotSuperseded(fs, target)) {
        // exists(target) alone does not prove the slot is open:
        // committed manifests legitimately DISAPPEAR (vacuum deletes
        // every manifest below its cutoff; DROP + re-CREATE wipes the
        // log dir). A maximally stale writer that computed this slot,
        // stalled past a vacuum, then woke would otherwise publish a
        // bogus manifest at an old version — an acknowledged commit no
        // current reader resolves, and a stray file below the
        // surviving floor. Validate against the log's CURRENT state
        // and surrender, same as the exists-true branch.
        coord.release(target.toString)
        return false
      }
      put(fs, tmp, target, deleteTmp = true)
      // durably visible: the claim's roll-forward pointer is dead
      // weight from here — release it so the in-process map stays
      // O(in-flight), not O(history)
      coord.release(target.toString)
      true
    } else {
      // lost the slot: if the winner crashed pre-upload, complete its
      // commit from the tmp path its claim recorded (identical bytes —
      // a duplicate copy is harmless; best-effort because a LIVE winner
      // mid-upload may hold a lease on the target, and then it will
      // finish the upload itself). A malformed/empty recorded value is
      // skipped, never fatal — the claim file is a hint, not the commit.
      // A SUPERSEDED slot is never rolled forward: if the manifest is
      // absent because vacuum reclaimed it (not because the winner
      // crashed), completing the "upload" would plant a stray manifest
      // below the surviving floor.
      if (!fs.exists(target) && !GraftLogStore.slotSuperseded(fs, target))
        try coord.claimedValue(target.toString).filter(_.trim.nonEmpty)
          .map(v => new Path(v.trim))
          .filter(fs.exists).foreach(wtmp =>
            put(fs, wtmp, target, deleteTmp = false))
        catch {
          case _: java.io.IOException | _: IllegalArgumentException => ()
        }
      false
    }
  }
}

object GraftLogStore {

  /** Session conf key naming a custom [[GraftLogStore]] class. */
  val ConfKey = "spark.graft.logstore.class"

  /** Claims directory for [[GraftCoordinatedLogStore]] — a path on a
    * strongly consistent filesystem (atomic no-overwrite create).
    */
  val CoordinatorDirKey = "spark.graft.logstore.coordinatorDir"

  /** Session conf key naming a custom [[GraftClaimCoordinator]] class
    * for [[GraftCoordinatedLogStore]] — the seam a service-backed
    * arbiter (DynamoDB, S3 conditional writes, etcd, SQL) plugs into
    * without re-implementing the commit protocol. Takes precedence
    * over [[CoordinatorDirKey]].
    */
  val CoordinatorClassKey = "spark.graft.logstore.coordinatorClass"

  /** True iff `target` names a DELTA-MANIFEST slot the log's CURRENT
    * state proves already decided or unreachable — i.e. a slot only a
    * maximally STALE writer would still try to publish. Two proofs:
    *  - the NEXT version's manifest exists → this slot's version is
    *    <= the latest committed version (manifests are dense above any
    *    surviving checkpoint; this version's own manifest can only be
    *    absent because vacuum reclaimed it);
    *  - the version is > 0 and the PREVIOUS version resolves neither
    *    as a manifest nor a checkpoint → the writer's basis is below
    *    the vacuum floor, or the whole log was dropped and re-created.
    * A winner must refuse such a slot: exists(target) alone cannot
    * arbitrate it, because committed manifests legitimately disappear
    * (vacuum, DROP + re-CREATE), and publishing there would acknowledge
    * a commit no current reader resolves. Non-manifest targets
    * (checkpoints — versions the publisher proved committed) are never
    * superseded by this rule.
    */
  def slotSuperseded(fs: FileSystem, target: Path): Boolean = {
    val name = target.getName
    if (!name.matches("\\d{8}\\.json")) return false
    val v = name.take(8).toInt
    val logDir = target.getParent
    def manifest(i: Int) = new Path(logDir, f"$i%08d.json")
    def checkpoint(i: Int) = new Path(logDir, f"$i%08d.checkpoint.json")
    fs.exists(manifest(v + 1)) ||
      (v > 0 && !fs.exists(manifest(v - 1)) && !fs.exists(checkpoint(v - 1)))
  }

  /** The built-in backend dispatch (see trait doc). The stale-slot
    * guard is kept OFF the contested path: the claim primitive itself
    * arbitrates first (link/exists — a loser exits with zero staleness
    * probes), and only an apparent WINNER pays the [[slotSuperseded]]
    * validation, rolling its claim back if the slot turns out to be
    * below the vacuum floor. The roll-back window (a stray manifest
    * visible for the probes' duration) is the same TOCTOU window the
    * probe-first ordering had between its probes and the link.
    */
  object Default extends GraftLogStore {
    override def atomicClaim(fs: FileSystem, tmp: Path,
                             target: Path): Boolean = {
      val won =
        if (fs.getScheme == "file")
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(target.toUri.getPath),
              java.nio.file.Paths.get(tmp.toUri.getPath))
            fs.delete(tmp, false)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        else !fs.exists(target) && fs.rename(tmp, target)
      if (!won) false
      else if (slotSuperseded(fs, target)) {
        // a maximally stale writer "won" a slot the log's current
        // state proves decided/unreachable — undo the claim (the
        // target is this writer's own just-linked bytes)
        fs.delete(target, false)
        false
      } else true
    }
  }

  /** Resolve the session's log store: the configured class, else the
    * built-in dispatch. Misconfiguration fails loudly at first use —
    * a silent fallback would run a different atomicity protocol than
    * the one the operator asked for.
    */
  def resolve(spark: SparkSession): GraftLogStore =
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case None => Default
      case Some(cn) =>
        try Class.forName(cn).getDeclaredConstructor().newInstance()
          .asInstanceOf[GraftLogStore]
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"$ConfKey = $cn could not be instantiated as a " +
              "graft.sources.GraftLogStore (no-arg constructor required)", e)
        }
    }
}
