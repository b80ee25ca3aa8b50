package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-snapshot table: the offline stand-in for Delta's
  * `DESCRIBE HISTORY` / `VERSION AS OF` surface
  * (reference: `Second Experiment/Claude 4 Sonnet.py:630-641`,
  * `First experiment/Claude Opus 4.py:359`), built the way a
  * transaction log actually works rather than by copying snapshots:
  *
  *  - each commit writes its NEW rows into a fresh data directory
  *    `v%05d/` and records a manifest `_graft_log/%08d.json` listing
  *    the FULL set of data directories visible at that version;
  *  - `append` extends the previous version's active set (history cost
  *    = the new files alone — at 100 TB a version must never rewrite
  *    or copy the table); `overwrite` starts a fresh active set while
  *    the old directories stay readable through old manifests;
  *  - `readAt(v)` unions exactly version v's active directories
  *    (mergeSchema — an evolving append widens later reads, old
  *    versions keep their shape); `history()` lists the manifests;
  *  - commits are ATOMIC via write-tmp + rename onto the next log slot:
  *    a crash mid-commit leaves an orphan data dir and/or a `.tmp`
  *    manifest, both ignored by readers and reclaimed by [[vacuum]];
  *    two racing writers contend on the same rename and the loser
  *    fails loudly (optimistic concurrency, single winner — the same
  *    protocol as Delta, minus the loser's automatic retry).
  *
  * [[vacuum]] is the retention pass: drop manifests older than the
  * last `keepLast` and delete data directories no kept version
  * references.
  */
class VersionedTable(spark: SparkSession, dir: String) {

  private val root = new Path(dir)
  private val logDir = new Path(root, "_graft_log")
  private def fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One committed manifest. `active` holds data-directory names in
    * commit order; `numRows` is the rows ADDED by this commit.
    */
  case class Commit(version: Int, op: String, active: Seq[String],
                    numRows: Long, tsMs: Long)

  private def manifestPath(v: Int): Path = new Path(logDir, f"$v%08d.json")

  private def parseManifest(p: Path): Commit = {
    val in = fs.open(p)
    val node = try mapper.readTree(in) finally in.close()
    val act = (0 until node.get("active").size())
      .map(i => node.get("active").get(i).asText())
    Commit(node.get("version").asInt(), node.get("op").asText(), act,
      node.get("num_rows").asLong(), node.get("ts_ms").asLong())
  }

  /** Latest committed version, or -1 for an empty/new table. Only
    * fully-committed manifests (`%08d.json`) count — `.tmp` leftovers
    * of a crashed commit are invisible.
    */
  def latestVersion: Int =
    if (!fs.exists(logDir)) -1
    else fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("\\d{8}\\.json"))
      .map(_.stripSuffix(".json").toInt)
      .foldLeft(-1)(math.max)

  private def commitAt(v: Int): Commit = {
    val p = manifestPath(v)
    require(fs.exists(p),
      s"version $v does not exist in $dir (latest: $latestVersion; " +
        "it may have been vacuumed)")
    parseManifest(p)
  }

  /** Atomically publish manifest `c` as version `c.version`: write to a
    * `.tmp` sibling, then rename onto the final slot. Rename-onto-
    * existing fails on every sane filesystem, so of two racing writers
    * exactly one wins; the loser must re-read the log and retry its
    * whole commit (we fail loudly instead of retrying silently — the
    * caller decides whether replaying its write is safe).
    */
  private def publish(c: Commit): Unit = {
    fs.mkdirs(logDir)
    // Writer-unique tmp name: two racers sharing one tmp path would
    // overwrite each other's half-written manifest before the rename
    // arbitrates — the rename onto the version-keyed TARGET is the
    // only shared slot.
    val tmp = new Path(logDir,
      f"${c.version}%08d.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try {
      val node = mapper.createObjectNode()
      node.put("version", c.version); node.put("op", c.op)
      node.put("num_rows", c.numRows); node.put("ts_ms", c.tsMs)
      val arr = node.putArray("active")
      c.active.foreach(arr.add)
      out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    } finally out.close()
    val target = manifestPath(c.version)
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent commit: version ${c.version} of $dir was published by " +
          "another writer; re-read the table and retry the commit")
    }
  }

  /** Write `df`'s rows as the data payload of version `v` and return
    * (dirName, rowsWritten). The name carries a random suffix so two
    * writers racing toward the same version number never write into
    * the same directory — the loser's rename fails at [[publish]] and
    * its orphan payload is reclaimed by [[vacuum]] (the same reason
    * Delta names data files by GUID while manifests are version-keyed).
    * The row count comes from the written files' parquet footers
    * (metadata-only), not a second data scan.
    */
  private def writePayload(df: DataFrame, v: Int): (String, Long) = {
    val name = f"v$v%05d-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = new Path(root, name)
    df.write.parquet(dataDir.toString)
    (name, spark.read.parquet(dataDir.toString).count())
  }

  /** Commit `df` as a new version extending the current active set.
    * Returns the committed version number.
    */
  def append(df: DataFrame): Int = {
    val prev = latestVersion
    val v = prev + 1
    val (name, rows) = writePayload(df, v)
    val prevActive = if (prev < 0) Seq.empty else commitAt(prev).active
    publish(Commit(v, "append", prevActive :+ name, rows,
      System.currentTimeMillis()))
    v
  }

  /** [[append]] with the optimistic-concurrency loser's retry — the
    * full Delta commit protocol: the payload is written ONCE (its
    * uniquely-named directory is version-agnostic; the `v%05d-` prefix
    * is advisory), then the manifest publish is retried against fresh
    * log state until it wins or `maxRetries` conflicts pass. Retrying
    * an append is always safe — each attempt re-reads the latest
    * active set, so the winner's files are incorporated, never
    * clobbered. Concurrent OVERWRITES deliberately have no retry
    * wrapper: replaying "replace the table" after someone else's
    * commit changes meaning, and that decision belongs to the caller.
    */
  def appendWithRetry(df: DataFrame, maxRetries: Int = 5): Int = {
    val (name, rows) = writePayload(df, latestVersion + 1)
    var attempt = 0
    while (true) {
      val v = latestVersion + 1
      val prevActive = if (v == 0) Seq.empty else commitAt(v - 1).active
      try {
        publish(Commit(v, "append", prevActive :+ name, rows,
          System.currentTimeMillis()))
        return v
      } catch {
        case e: IllegalStateException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    -1 // unreachable
  }

  /** Commit `df` as a new version REPLACING the active set. Old
    * versions stay readable until [[vacuum]].
    */
  def overwrite(df: DataFrame): Int = {
    val v = latestVersion + 1
    val (name, rows) = writePayload(df, v)
    publish(Commit(v, "overwrite", Seq(name), rows, System.currentTimeMillis()))
    v
  }

  /** `VERSION AS OF v`: the table exactly as version `v` committed it.
    * mergeSchema: a later evolving append must not change what an OLD
    * version reads, and an old version read after evolution pads
    * nothing — each version unions only its own directories.
    */
  def readAt(v: Int): DataFrame = {
    val c = commitAt(v)
    require(c.active.nonEmpty, s"version $v of $dir has no data directories")
    val dirs = c.active.map(n => new Path(root, n)) // fail fast on vacuumed data
    dirs.foreach(p => require(fs.exists(p),
      s"data directory $p of version $v was vacuumed; only versions >= " +
        "the retention window are readable"))
    spark.read.option("mergeSchema", "true").parquet(dirs.map(_.toString): _*)
  }

  /** The current snapshot (latest version). */
  def read(): DataFrame = {
    val v = latestVersion
    require(v >= 0, s"$dir has no committed versions")
    readAt(v)
  }

  /** DESCRIBE HISTORY stand-in: one row per committed version —
    * version, operation, rows added by the commit, directories active
    * at the version, commit wall-clock. Driver-side over #versions
    * manifests (a log is small by construction; Delta reads it on the
    * driver too).
    */
  def history(): DataFrame = {
    import spark.implicits._
    val rows = (0 to latestVersion).flatMap { v =>
      val p = manifestPath(v)
      if (fs.exists(p)) {
        val c = parseManifest(p)
        Some((c.version, c.op, c.numRows, c.active.length, c.tsMs))
      } else None // vacuumed prefix
    }
    rows.toDF("version", "op", "num_rows", "num_active_dirs", "ts_ms")
  }

  /** Retention: keep the last `keepLast` versions' manifests, delete
    * older manifests and every data directory no kept manifest
    * references (plus orphan directories a crashed commit left).
    * Returns the number of data directories deleted.
    */
  def vacuum(keepLast: Int): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val latest = latestVersion
    val cutoff = latest - keepLast + 1
    val kept = (math.max(0, cutoff) to latest)
      .filter(v => fs.exists(manifestPath(v))).map(commitAt)
    val referenced = kept.flatMap(_.active).toSet
    // Old manifests first: once they are gone no reader can resolve a
    // to-be-deleted directory (delete data first and a concurrent
    // readAt of an old version would resolve, then scan nothing).
    (0 until cutoff).foreach(v => fs.delete(manifestPath(v), false))
    // Crashed-commit leftovers: a `.tmp` manifest whose writer died
    // before the rename is invisible to readers but lives in the log
    // dir forever without this sweep. An IN-FLIGHT commit's tmp is
    // named `<version>.json.<uuid>.tmp` for a version >= the current
    // latest; only tmps targeting already-decided versions (<= latest)
    // are provably dead — the slot they were racing for has a winner.
    // Only names the commit protocol itself writes
    // (`%08d.json.<8-hex-uuid>.tmp`) are swept — an unrelated file that
    // merely starts with digits and ends in `.tmp` is left alone.
    if (fs.exists(logDir)) fs.listStatus(logDir).foreach { st =>
      val n = st.getPath.getName
      if (n.matches("\\d{8}\\.json\\.[0-9a-f]{8}\\.tmp") &&
          n.take(8).toInt <= latest) fs.delete(st.getPath, false)
    }
    var removed = 0
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.matches("v\\d{5}-.*") && !referenced.contains(n)) {
        fs.delete(st.getPath, true); removed += 1
      }
    }
    removed
  }
}
