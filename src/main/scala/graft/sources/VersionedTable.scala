package graft.sources

import scala.util.chaining._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-snapshot table: the offline stand-in for Delta's
  * `DESCRIBE HISTORY` / `VERSION AS OF` surface
  * (reference: `Second Experiment/Claude 4 Sonnet.py:630-641`,
  * `First experiment/Claude Opus 4.py:359`), built the way a
  * transaction log actually works rather than by copying snapshots:
  *
  *  - each commit writes its NEW rows into a fresh data directory
  *    `v%05d-<uuid>/` and records a DELTA manifest
  *    `_graft_log/%08d.json` listing only the directories it ADDED and
  *    REMOVED — so N appends write O(N) total log entries, not the
  *    O(N²) a full-active-set-per-commit log accrues;
  *  - every `checkpointInterval` commits the winner also writes a full
  *    checkpoint `%08d.checkpoint.json` (the complete active set at
  *    that version — Delta's checkpoint parquet, in JSON). Resolving a
  *    version replays only the deltas SINCE the nearest checkpoint:
  *    reads stay O(interval) regardless of table age;
  *  - `append` adds one directory (history cost = the new files alone
  *    — at 100 TB a version must never rewrite or copy the table);
  *    `overwrite` removes the previous active set and adds one, while
  *    the old directories stay readable through old versions;
  *  - `readAt(v)` unions exactly version v's active directories
  *    (mergeSchema — an evolving append widens later reads, old
  *    versions keep their shape); `history()` folds the manifests once
  *    (O(total deltas), not O(versions × active));
  *  - commits are ATOMIC via write-tmp + an atomic claim of the next
  *    log slot (hard-link on local filesystems, no-overwrite rename on
  *    HDFS — see [[atomicClaim]]): a crash mid-commit leaves an orphan
  *    data dir and/or a `.tmp` manifest, both ignored by readers and
  *    reclaimed by [[vacuum]];
  *    two racing writers contend on the same claim and the loser
  *    fails loudly (optimistic concurrency, single winner — the same
  *    protocol as Delta, minus the loser's automatic retry, which
  *    [[appendWithRetry]] adds for the always-safe append case).
  *
  * [[vacuum]] is the retention pass: checkpoint the oldest kept
  * version (so it stays resolvable), drop older manifests/checkpoints,
  * and delete data directories no kept version references.
  */
object VersionedTable {

  /** TABLE FEATURES (Delta's protocol / table-features action): names
    * a table's log can DEMAND of its readers and writers. The first
    * commit that uses a capability an oblivious reader would silently
    * corrupt on (serve deleted rows, stale names, truncated values)
    * records the feature; the snapshot fold unions them; and
    * [[VersionedTable.snapshotAt]] refuses any snapshot demanding a
    * feature outside [[KnownFeatures]] — so a FUTURE feature degrades
    * to a loud, actionable refusal instead of a wrong answer. Features
    * are monotonic once announced; versions before the announcement
    * keep reading.
    */
  val FeatureBitmapDv = "bitmap-dv"
  val FeatureColumnMapping = "column-mapping"
  val FeatureTypeWidening = "type-widening"
  val FeatureAbsolutePaths = "absolute-paths"

  /** Every feature THIS build implements end-to-end. */
  val KnownFeatures: Set[String] =
    Set(FeatureBitmapDv, FeatureColumnMapping, FeatureTypeWidening,
      FeatureAbsolutePaths)

  /** JVM-global bitmap-PATH cache for the vectorized DV read path,
    * keyed (table dir, sidecar set, requested dirs): manifests are
    * immutable per version, so repeated plans of the same DV'd
    * snapshot — dashboards, a join reading the table twice — skip the
    * per-plan sidecar listing. Entries hold file paths only (strings,
    * never positions — the executors decode their own bitmaps), so 64
    * retained entries are KBs, not GBs. Cleared wholesale past 64.
    */
  private val dvPathCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Seq[String]]]()

  private[sources] def dvPathsCached(key: String)
      (load: => Map[String, Seq[String]]): Map[String, Seq[String]] = {
    val hit = dvPathCache.get(key)
    if (hit != null) return hit
    val v = load
    if (dvPathCache.size > 64) dvPathCache.clear()
    dvPathCache.put(key, v)
    v
  }

  /** CONVERT an existing FLAT parquet directory into a versioned table
    * IN PLACE (Delta's `CONVERT TO DELTA`): every `*.parquet` file is
    * RENAMED (metadata-only — no data copied or rewritten, whatever
    * the table size) into the version-0 payload directory, and the v0
    * manifest records row counts and data-skipping stats from one
    * bounded scan of those files. The directory is thereafter a
    * transaction-log table: append/merge/delete/optimize/time-travel
    * and the graftvt DataSourceV2 all work on it. Partitioned/nested
    * layouts are rejected loudly (flat is the compaction-output shape;
    * a Hive-partitioned tree needs the partition columns materialized
    * into the data first). Fails loudly if the directory already has a
    * transaction log. Returns the table at version 0.
    */
  def convert(spark: SparkSession, dir: String): VersionedTable = {
    val vt = new VersionedTable(spark, dir)
    require(!vt.fs.exists(vt.logDir),
      s"$dir already has a transaction log; it is a versioned table")
    val entries = vt.fs.listStatus(vt.root).toSeq
    val files = entries.filter(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"nothing to convert: no *.parquet files in $dir")
    val dirs = entries.filter(st => st.isDirectory)
    require(dirs.isEmpty,
      s"cannot convert $dir: nested directories found " +
        s"(${dirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "convert supports flat parquet directories; materialize partition " +
        "columns into the data first")
    val name = f"v00000-conv-${java.util.UUID.randomUUID().toString.take(8)}"
    val target = new Path(vt.root, name)
    vt.fs.mkdirs(target)
    files.foreach(f =>
      vt.fs.rename(f.getPath, new Path(target, f.getPath.getName)))
    val (rows, stats, _) = vt.statsOf(target.toString)
    vt.publish(vt.Commit(0, "convert", Seq(name), Seq.empty, rows,
      System.currentTimeMillis(), addedStats = Map(name -> stats),
      addedRows = Map(name -> rows),
      schemaJson = Some(spark.read.option("mergeSchema", "true")
        .parquet(target.toString)
        .schema.pipe(graft.sources.SchemaCompat.nullableJson))))
    vt
  }
}

class VersionedTable(spark: SparkSession, dir: String,
                     checkpointInterval: Int = 10) {
  require(checkpointInterval >= 1,
    s"checkpointInterval must be >= 1: $checkpointInterval")

  private val root = new Path(dir)
  private val logDir = new Path(root, "_graft_log")
  private def fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Per-directory, per-column min/max + null count — the
    * data-skipping index (Delta's file statistics): `kind` is "l"
    * (integral/timestamp/date normalized to Long), "d" (fractional),
    * or "s" (string); bounds are inclusive over the directory's
    * NON-NULL rows. An ALL-NULL column records `min = max = null`
    * (pre-round-12 manifests simply omitted the entry — readers treat
    * both as "no non-null bounds known" where bounds are needed, but
    * the explicit entry lets range/IS NOT NULL predicates SKIP the
    * directory: no range matches a null). `nulls` is the column's
    * null-row count (-1 in pre-round-12 manifests = unknown), the fact
    * IS NULL pruning needs (`nulls == 0` → no row can satisfy it).
    */
  case class ColStat(kind: String, min: Any, max: Any, nulls: Long = -1L)

  /** One committed manifest — a DELTA against the previous version.
    * `numRows` is the rows ADDED by this commit. `txn` optionally tags
    * the commit with a (writer-app, batch-id) pair — the idempotence
    * token streaming sinks use (Delta's `txnAppId`/`txnVersion`).
    * `addedStats` carries the data-skipping bounds of each added
    * directory (empty for pre-stats manifests — readers keep such
    * directories conservatively).
    */
  case class Commit(version: Int, op: String, added: Seq[String],
                    removed: Seq[String], numRows: Long, tsMs: Long,
                    txn: Option[(String, Long)] = None,
                    addedStats: Map[String, Map[String, ColStat]] = Map.empty,
                    cdf: Option[String] = None,
                    constraintAdd: Option[(String, String)] = None,
                    constraintDrop: Option[String] = None,
                    addedRows: Map[String, Long] = Map.empty,
                    addedBytes: Map[String, Long] = Map.empty,
                    schemaJson: Option[String] = None,
                    propsSet: Map[String, String] = Map.empty,
                    propsUnset: Seq[String] = Nil,
                    partitionCols: Seq[String] = Nil,
                    dvAdd: Option[String] = None,
                    dvDirs: Seq[String] = Nil,
                    dvDirRows: Map[String, Long] = Map.empty,
                    dvReset: Option[(Map[String, Seq[String]],
                                     Map[String, Long])] = None,
                    featuresAdd: Seq[String] = Nil)

  private def manifestPath(v: Int): Path = new Path(logDir, f"$v%08d.json")
  private def checkpointPath(v: Int): Path =
    new Path(logDir, f"$v%08d.checkpoint.json")

  private def readArray(node: com.fasterxml.jackson.databind.JsonNode,
                        field: String): Seq[String] = {
    val arr = node.get(field)
    if (arr == null) Seq.empty
    else (0 until arr.size()).map(arr.get(_).asText())
  }

  private def parseStats(node: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, Map[String, ColStat]] = {
    if (node == null) return Map.empty
    import scala.jdk.CollectionConverters._
    node.properties().asScala.map { dirEnt =>
      dirEnt.getKey -> dirEnt.getValue.properties().asScala.map { colEnt =>
        val c = colEnt.getValue
        def v(f: String): Any =
          if (!c.has(f)) null // all-null column: no non-null bounds
          else c.get("k").asText() match {
            case "l" => c.get(f).asLong()
            case "d" => c.get(f).asDouble()
            case _ => c.get(f).asText()
          }
        val nulls = if (c.has("n")) c.get("n").asLong() else -1L
        colEnt.getKey -> ColStat(c.get("k").asText(), v("lo"), v("hi"), nulls)
      }.toMap
    }.toMap
  }

  private def writeStats(node: com.fasterxml.jackson.databind.node.ObjectNode,
                         field: String,
                         stats: Map[String, Map[String, ColStat]]): Unit = {
    if (stats.isEmpty) return
    val dirsNode = node.putObject(field)
    stats.foreach { case (dir, cols) =>
      val dirNode = dirsNode.putObject(dir)
      cols.foreach { case (col, st) =>
        val cn = dirNode.putObject(col)
        cn.put("k", st.kind)
        if (st.min != null) st.kind match {
          case "l" =>
            cn.put("lo", st.min.asInstanceOf[Long]); cn.put("hi", st.max.asInstanceOf[Long])
          case "d" =>
            cn.put("lo", st.min.asInstanceOf[Double]); cn.put("hi", st.max.asInstanceOf[Double])
          case _ =>
            cn.put("lo", st.min.asInstanceOf[String]); cn.put("hi", st.max.asInstanceOf[String])
        }
        if (st.nulls >= 0L) cn.put("n", st.nulls)
      }
    }
  }

  private def parseManifest(p: Path): Commit = {
    val in = fs.open(p)
    val node = try mapper.readTree(in) finally in.close()
    val txn =
      if (node.has("txn_app")) Some((node.get("txn_app").asText(),
        node.get("txn_batch").asLong()))
      else None
    Commit(node.get("version").asInt(), node.get("op").asText(),
      readArray(node, "added"), readArray(node, "removed"),
      node.get("num_rows").asLong(), node.get("ts_ms").asLong(), txn,
      parseStats(node.get("added_stats")),
      if (node.has("cdf")) Some(node.get("cdf").asText()) else None,
      if (node.has("constraint_add_name"))
        Some((node.get("constraint_add_name").asText(),
          node.get("constraint_add_expr").asText()))
      else None,
      if (node.has("constraint_drop")) Some(node.get("constraint_drop").asText())
      else None,
      {
        val ar = node.get("added_rows")
        if (ar == null) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          ar.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
        }
      },
      {
        val ab = node.get("added_bytes")
        if (ab == null) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          ab.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
        }
      },
      if (node.has("schema")) Some(node.get("schema").asText()) else None,
      {
        val ps = node.get("props_set")
        if (ps == null) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          ps.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
        }
      },
      readArray(node, "props_unset"),
      readArray(node, "partition_cols"),
      if (node.has("dv_name")) Some(node.get("dv_name").asText()) else None,
      readArray(node, "dv_dirs"),
      {
        val dr = node.get("dv_dir_rows")
        if (dr == null) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          dr.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
        }
      },
      {
        val rs = node.get("dv_reset")
        if (rs == null) None
        else {
          import scala.jdk.CollectionConverters._
          val dvs = rs.properties().asScala.map(e =>
            e.getKey -> (0 until e.getValue.size())
              .map(e.getValue.get(_).asText())).toMap
          val rr = node.get("dv_reset_rows")
          val rows =
            if (rr == null) Map.empty[String, Long]
            else rr.properties().asScala.map(e =>
              e.getKey -> e.getValue.asLong()).toMap
          Some((dvs, rows))
        }
      },
      readArray(node, "features_add"))
  }

  private val lastCheckpointPath = new Path(logDir, "_last_checkpoint")

  /** The `_last_checkpoint` HINT (Delta's trick to avoid a full log
    * listing per read): the version of the newest known checkpoint,
    * written best-effort after each checkpoint. It is advisory only —
    * torn/stale/missing hints fall back to listing, and the hinted
    * checkpoint's existence is verified before use, so correctness
    * never depends on it.
    */
  private def lastCheckpointHint: Option[Int] =
    try {
      if (!fs.exists(lastCheckpointPath)) None
      else {
        val in = fs.open(lastCheckpointPath)
        val node = try mapper.readTree(in) finally in.close()
        val v = node.get("version").asInt()
        if (fs.exists(checkpointPath(v))) Some(v) else None
      }
    } catch { case _: Exception => None }

  private def writeLastCheckpointHint(v: Int): Unit =
    try {
      val out = fs.create(lastCheckpointPath, true)
      try {
        val node = mapper.createObjectNode()
        node.put("version", v)
        out.write(mapper.writeValueAsBytes(node))
      } finally out.close()
    } catch { case _: Exception => () } // a failed hint write costs a listing

  /** Latest committed version, or -1 for an empty/new table. Only
    * fully-committed manifests (`%08d.json`) count — `.tmp` leftovers
    * of a crashed commit are invisible. With a `_last_checkpoint`
    * hint the cost is O(versions since the last checkpoint) existence
    * probes (manifests are dense above any surviving checkpoint);
    * without one it is a full log listing — so a million-commit table
    * answers in ≤ checkpointInterval probes, not a million-entry list.
    */
  def latestVersion: Int = lastCheckpointHint match {
    case Some(hint) if fs.exists(manifestPath(hint)) =>
      var v = hint
      while (fs.exists(manifestPath(v + 1))) v += 1
      v
    case _ =>
      if (!fs.exists(logDir)) -1
      else fs.listStatus(logDir).map(_.getPath.getName)
        .filter(_.matches("\\d{8}\\.json"))
        .map(_.stripSuffix(".json").toInt)
        .foldLeft(-1)(math.max)
  }

  /** The (op, added-directories) pair of one committed version — what
    * the streaming source replays the log by. Package-private: the
    * manifest schema stays an implementation detail.
    */
  private[sources] def commitSummary(v: Int): (String, Seq[String]) = {
    val c = commitAt(v)
    (c.op, c.added)
  }

  /** The directories one commit REMOVED — the change feed's `delete`
    * synthesis source (they remain readable until [[vacuum]]).
    */
  private[sources] def removedSummary(v: Int): Seq[String] = commitAt(v).removed

  /** One commit's persisted CDC directory, if any — the change-feed
    * source for merge-on-read deletes (which always write one).
    */
  private[sources] def cdfSummary(v: Int): Option[String] = commitAt(v).cdf

  /** The DV-FOLDED read of specific directories at a version, with the
    * version's log schema imposed — the DSv2 scan's fallback path when
    * a kept directory carries deletion vectors (a stock parquet scan
    * would resurrect the hidden rows).
    */
  /** Recorded (logical rows, physical bytes) of specific directories
    * at a version — the V1 fallback scan's reported statistics, so
    * joins against DV/renamed snapshots still plan sanely. None when
    * any directory predates recording.
    */
  private[sources] def dirStats(version: Int, dirs: Seq[String])
      : (Option[Long], Option[Long]) = {
    val snap = snapshotAt(version)
    val rows =
      if (dirs.forall(snap.dirRows.contains))
        Some(dirs.map(snap.dirRows).sum -
          dirs.flatMap(snap.dvRowsByDir.get).sum)
      else None
    val bytes =
      if (dirs.forall(snap.dirBytes.contains)) Some(dirs.map(snap.dirBytes).sum)
      else None
    (rows, bytes)
  }


  private def commitAt(v: Int): Commit = {
    val p = manifestPath(v)
    require(fs.exists(p),
      s"version $v does not exist in $dir (latest: $latestVersion; " +
        "it may have been vacuumed)")
    parseManifest(p)
  }

  /** The newest checkpoint at or below `v`, if any. The common case —
    * resolving a recent version — is served by the `_last_checkpoint`
    * hint without listing; time travel below the hinted checkpoint
    * falls back to the listing.
    */
  /** A resolved table state: active data directories, their
    * data-skipping stats, the newest txn tag per streaming app, and the
    * CHECK constraints in force.
    */
  private case class Snapshot(active: Seq[String],
                              stats: Map[String, Map[String, ColStat]],
                              txns: Map[String, Long],
                              constraints: Map[String, String],
                              dirRows: Map[String, Long],
                              dirBytes: Map[String, Long],
                              schemaJson: Option[String] = None,
                              props: Map[String, String] = Map.empty,
                              partitionCols: Seq[String] = Nil,
                              dvs: Map[String, Seq[String]] = Map.empty,
                              dvRowsByDir: Map[String, Long] = Map.empty,
                              features: Set[String] = Set.empty)

  private def checkpointAtOrBelow(v: Int): Option[(Int, Snapshot)] = {
    if (!fs.exists(logDir)) return None
    val best = lastCheckpointHint.filter(_ <= v).getOrElse {
      fs.listStatus(logDir).map(_.getPath.getName)
        .filter(_.matches("\\d{8}\\.checkpoint\\.json"))
        .map(_.take(8).toInt).filter(_ <= v)
        .foldLeft(-1)(math.max)
    }
    if (best < 0) None
    else {
      val in = fs.open(checkpointPath(best))
      val node = try mapper.readTree(in) finally in.close()
      import scala.jdk.CollectionConverters._
      def strMap(field: String, as: com.fasterxml.jackson.databind.JsonNode => String)
          : Map[String, String] = {
        val t = node.get(field)
        if (t == null) Map.empty
        else t.properties().asScala.map(e => e.getKey -> as(e.getValue)).toMap
      }
      val txns = strMap("txns", _.asText()).map { case (k, s) => k -> s.toLong }
      val dirRows = strMap("dir_rows", _.asText()).map { case (k, s) => k -> s.toLong }
      val dirBytes = strMap("dir_bytes", _.asText()).map { case (k, s) => k -> s.toLong }
      Some((best, Snapshot(readArray(node, "active"),
        parseStats(node.get("stats")), txns, strMap("constraints", _.asText()),
        dirRows, dirBytes,
        if (node.has("schema")) Some(node.get("schema").asText()) else None,
        strMap("props", _.asText()),
        readArray(node, "partition_cols"),
        {
          val dn = node.get("dvs")
          if (dn == null) Map.empty
          else dn.properties().asScala.map(e =>
            e.getKey -> (0 until e.getValue.size())
              .map(e.getValue.get(_).asText())).toMap
        },
        strMap("dv_rows_by_dir", _.asText()).map { case (k, s2) =>
          k -> s2.toLong },
        readArray(node, "features").toSet)))
    }
  }

  /** The resolved [[Snapshot]] of version `v`: nearest checkpoint plus
    * the delta manifests since it. O(checkpointInterval) manifest reads
    * on a checkpointed log, never O(v). Directories without recorded
    * stats map to an empty stat set (readers keep them conservatively).
    */
  /** Per-instance snapshot memo: a version's folded state is IMMUTABLE
    * once its manifest exists (publish is atomic, manifests are never
    * rewritten), so repeated `snapshotAt` of the same version — the
    * scan builder alone consults dvs/renames/stats/rows off one
    * version several times per plan — must not re-fold the log each
    * time. Bounded: cleared wholesale past 32 entries.
    */
  private val snapMemo =
    new java.util.concurrent.ConcurrentHashMap[Int, Snapshot]()

  private def snapshotAt(v: Int): Snapshot = {
    val hit = snapMemo.get(v)
    // a hit still verifies the version's log entry EXISTS — another
    // process's (or another instance's) vacuum may have reclaimed it,
    // and the contract is a loud error then, not a stale snapshot
    // served from memory (one exists() probe vs a full log re-fold)
    if (hit != null &&
        (fs.exists(manifestPath(v)) || fs.exists(checkpointPath(v))))
      return hit
    val computed = snapshotAtUncached(v)
    // PROTOCOL GATE (Delta's minReader/table-features check): a
    // snapshot demanding a feature this library does not implement is
    // refused OUTRIGHT — for reads and writes alike, since every
    // operation resolves a snapshot first. Silently ignoring an
    // unknown manifest requirement could serve deleted rows, stale
    // names, or truncated values; versions BEFORE the feature arrived
    // keep reading (the fold is per-version). Enforced before the
    // memo, so an unreadable snapshot is never cached.
    val unknown = computed.features -- VersionedTable.KnownFeatures
    if (unknown.nonEmpty) throw new IllegalStateException(
      s"table $dir (at version $v) requires feature(s) " +
        s"${unknown.toSeq.sorted.mkString(", ")} this reader/writer does " +
        s"not implement (implemented: " +
        s"${VersionedTable.KnownFeatures.toSeq.sorted.mkString(", ")}); " +
        "upgrade the library to operate on this table")
    if (snapMemo.size > 32) snapMemo.clear()
    snapMemo.put(v, computed)
    computed
  }

  private def snapshotAtUncached(v: Int): Snapshot = {
    val (start, base) = checkpointAtOrBelow(v).getOrElse(
      (-1, Snapshot(Seq.empty, Map.empty, Map.empty, Map.empty, Map.empty,
        Map.empty)))
    (start + 1 to v).foldLeft(base) { (s, i) =>
      val c = commitAt(i)
      Snapshot(
        s.active.filterNot(c.removed.toSet) ++ c.added,
        s.stats -- c.removed ++ c.addedStats,
        c.txn.fold(s.txns) { case (app, b) =>
          s.txns + (app -> math.max(b, s.txns.getOrElse(app, Long.MinValue))) },
        (s.constraints -- c.constraintDrop) ++ c.constraintAdd,
        s.dirRows -- c.removed ++ c.addedRows,
        s.dirBytes -- c.removed ++ c.addedBytes,
        c.schemaJson.orElse(s.schemaJson),
        (s.props -- c.propsUnset) ++ c.propsSet,
        if (c.partitionCols.nonEmpty) c.partitionCols else s.partitionCols,
        // Deletion-vector state: a rewritten (removed) directory's DV
        // entries die with it (the rewrite read them folded); a
        // delete-dv commit appends its sidecar to each touched
        // directory's list; RESTORE replaces the whole map with the
        // target version's.
        c.dvReset.map(_._1).getOrElse {
          val base = (s.dvs -- c.removed)
          c.dvAdd.fold(base)(n => c.dvDirs.foldLeft(base)((m, d) =>
            m + (d -> (m.getOrElse(d, Nil) :+ n))))
        },
        c.dvReset.map(_._2).getOrElse {
          val base = (s.dvRowsByDir -- c.removed)
          c.dvDirRows.foldLeft(base) { case (m, (d, r)) =>
            m + (d -> (m.getOrElse(d, 0L) + r)) }
        },
        // required table features are MONOTONIC (Delta's protocol
        // action): once announced, every later snapshot demands them
        s.features ++ c.featuresAdd)
    }
  }

  private def activeAt(v: Int): Seq[String] = snapshotAt(v).active

  /** The active data-directory NAMES of a version (default: latest) —
    * the unpruned denominator snapshot consumers (the DataSourceV2
    * scan) plan against; resolved from the manifest fold, no data
    * touched.
    */
  def activeDirs(version: Option[Int] = None): Seq[String] = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    activeAt(v)
  }

  /** Claim `target` with the content of `tmp`, atomically failing if
    * another writer already claimed it — the per-backend LogStore
    * primitive Delta builds its whole protocol on, now a PLUGGABLE
    * seam ([[GraftLogStore]]): local hard-link (link(2) fails EEXIST
    * atomically; a POSIX rename would REPLACE and let two racers both
    * "win") and HDFS exists+no-overwrite-rename ship built in; an
    * object store registers its external coordinator via
    * `spark.graft.logstore.class` — [[graft.LogStoreSpec]] carries the
    * reference S3-shaped implementation and the single-winner race
    * test a custom store must pass.
    */
  // The pluggable single-winner publish primitive — resolved once per
  // table instance ([[GraftLogStore]]: local hard-link / HDFS
  // no-overwrite rename by default; an object store plugs its external
  // coordinator in via spark.graft.logstore.class).
  private lazy val logStore: GraftLogStore = GraftLogStore.resolve(spark)

  private def atomicClaim(tmp: Path, target: Path): Boolean =
    logStore.atomicClaim(fs, tmp, target)

  /** Atomically publish manifest `c` as version `c.version`: write to a
    * `.tmp` sibling, then [[atomicClaim]] the final slot — of two
    * racing writers exactly one wins; the loser must re-read the log
    * and retry its whole commit (we fail loudly instead of retrying
    * silently — the caller decides whether replaying its write is
    * safe).
    */
  /** Total on-disk bytes of one data directory — a filesystem listing,
    * no data read.
    */
  private def dirSizeBytes(name: String): Long =
    fs.getContentSummary(new Path(root, name)).getLength

  private def publish(c0: Commit): Unit = {
    // Every committed directory carries its byte size in the log (the
    // listing is metadata-only), so DESCRIBE DETAIL and size-based
    // maintenance decisions never scan the table.
    val c1 = if (c0.added.nonEmpty && c0.addedBytes.isEmpty)
      c0.copy(addedBytes = c0.added.map(n => n -> dirSizeBytes(n)).toMap)
    else c0
    // TABLE FEATURES implied by commit CONTENT (Delta's protocol
    // action): a commit attaching or resetting bitmap deletion vectors
    // requires every future reader to understand them — record the
    // requirement on the commit itself, so a reader that does not
    // implement the feature refuses the TABLE up front instead of
    // tripping over a sidecar (or, worse, silently ignoring it and
    // resurrecting deleted rows). Explicit featuresAdd (widening,
    // column mapping, clones) ride through; re-announcing is free —
    // the snapshot folds features as a set.
    val c = if (c1.dvAdd.isDefined || c1.dvReset.exists(_._1.nonEmpty))
      c1.copy(featuresAdd = (c1.featuresAdd :+ VersionedTable.FeatureBitmapDv)
        .distinct)
    else c1
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
      val aArr = node.putArray("added")
      c.added.foreach(aArr.add)
      val rArr = node.putArray("removed")
      c.removed.foreach(rArr.add)
      c.txn.foreach { case (app, batch) =>
        node.put("txn_app", app); node.put("txn_batch", batch)
      }
      c.cdf.foreach(node.put("cdf", _))
      c.constraintAdd.foreach { case (n, ex) =>
        node.put("constraint_add_name", n); node.put("constraint_add_expr", ex)
      }
      c.constraintDrop.foreach(node.put("constraint_drop", _))
      if (c.addedRows.nonEmpty) {
        val rn = node.putObject("added_rows")
        c.addedRows.foreach { case (d, n) => rn.put(d, n) }
      }
      if (c.addedBytes.nonEmpty) {
        val bn = node.putObject("added_bytes")
        c.addedBytes.foreach { case (d, n) => bn.put(d, n) }
      }
      c.schemaJson.foreach(node.put("schema", _))
      if (c.propsSet.nonEmpty) {
        val pn = node.putObject("props_set")
        c.propsSet.foreach { case (k, v2) => pn.put(k, v2) }
      }
      if (c.propsUnset.nonEmpty) {
        val pu = node.putArray("props_unset")
        c.propsUnset.foreach(pu.add)
      }
      if (c.partitionCols.nonEmpty) {
        val pc = node.putArray("partition_cols")
        c.partitionCols.foreach(pc.add)
      }
      c.dvAdd.foreach { n =>
        node.put("dv_name", n)
        val dd = node.putArray("dv_dirs")
        c.dvDirs.foreach(dd.add)
        val dr = node.putObject("dv_dir_rows")
        c.dvDirRows.foreach { case (d, r) => dr.put(d, r) }
      }
      c.dvReset.foreach { case (dvs, rows) =>
        val rs = node.putObject("dv_reset")
        dvs.foreach { case (d, names) =>
          val arr = rs.putArray(d)
          names.foreach(arr.add)
        }
        val rr = node.putObject("dv_reset_rows")
        rows.foreach { case (d, r) => rr.put(d, r) }
      }
      if (c.featuresAdd.nonEmpty) {
        val fa = node.putArray("features_add")
        c.featuresAdd.foreach(fa.add)
      }
      writeStats(node, "added_stats", c.addedStats)
      out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    } finally out.close()
    val target = manifestPath(c.version)
    if (!atomicClaim(tmp, target)) {
      fs.delete(tmp, false)
      throw new GraftConflictException(
        s"concurrent commit: version ${c.version} of $dir was published by " +
          "another writer; re-read the table and retry the commit")
    }
    maybeCheckpoint(c.version)
  }

  /** Write the full-active-set checkpoint for `v` if it is on the
    * interval. Only the commit WINNER of `v` calls this, so there is
    * no checkpoint race; a crash before the rename just leaves the
    * interval uncheckpointed — readers fall back to the previous
    * checkpoint and replay a longer delta tail, correctness unchanged.
    */
  private def maybeCheckpoint(v: Int): Unit = {
    if (v <= 0 || v % checkpointInterval != 0 || fs.exists(checkpointPath(v)))
      return
    writeCheckpoint(v, snapshotAt(v))
  }

  private def writeCheckpoint(v: Int, snap: Snapshot): Unit = {
    val tmp = new Path(logDir,
      f"$v%08d.checkpoint.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try {
      val node = mapper.createObjectNode()
      node.put("version", v)
      val arr = node.putArray("active")
      snap.active.foreach(arr.add)
      writeStats(node, "stats", snap.stats)
      if (snap.txns.nonEmpty) {
        val tn = node.putObject("txns")
        snap.txns.foreach { case (app, b) => tn.put(app, b) }
      }
      if (snap.constraints.nonEmpty) {
        val cn = node.putObject("constraints")
        snap.constraints.foreach { case (n, ex) => cn.put(n, ex) }
      }
      if (snap.dirRows.nonEmpty) {
        val dr = node.putObject("dir_rows")
        snap.dirRows.foreach { case (d, n) => dr.put(d, n) }
      }
      if (snap.dirBytes.nonEmpty) {
        val db = node.putObject("dir_bytes")
        snap.dirBytes.foreach { case (d, n) => db.put(d, n) }
      }
      snap.schemaJson.foreach(node.put("schema", _))
      if (snap.props.nonEmpty) {
        val pn = node.putObject("props")
        snap.props.foreach { case (k, v2) => pn.put(k, v2) }
      }
      if (snap.partitionCols.nonEmpty) {
        val pc = node.putArray("partition_cols")
        snap.partitionCols.foreach(pc.add)
      }
      if (snap.dvs.nonEmpty) {
        val dn = node.putObject("dvs")
        snap.dvs.foreach { case (d, names) =>
          val arr = dn.putArray(d)
          names.foreach(arr.add)
        }
        val dr = node.putObject("dv_rows_by_dir")
        snap.dvRowsByDir.foreach { case (d, r) => dr.put(d, r) }
      }
      if (snap.features.nonEmpty) {
        val fn = node.putArray("features")
        snap.features.toSeq.sorted.foreach(fn.add)
      }
      out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    } finally out.close()
    if (atomicClaim(tmp, checkpointPath(v))) writeLastCheckpointHint(v)
    else fs.delete(tmp, false)
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
  private def writePayload(df: DataFrame, v: Int,
                           constraints: Map[String, String] = Map.empty,
                           l2p: Map[String, String] = Map.empty)
      : (String, Long, Map[String, ColStat]) = {
    val name = f"v$v%05d-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = new Path(root, name)
    // The stats/constraint aggregates ride the WRITE JOB ITSELF
    // (CollectMetrics directly under the file write, so it executes in
    // the write's result stage — accumulator updates deduplicate per
    // partition there, making the metrics exact even under task
    // retries). The read-back scan this replaces was a full second
    // pass over every written byte per commit — at table scale that
    // halves commit I/O; at gate scale it removes one whole
    // driver-sequenced job plus a schema-inference footer read per
    // commit. Values are identical by construction: the same aggregate
    // expressions over the same rows the write serializes (parquet
    // round-trips every indexed type losslessly — long, double,
    // micros-precision timestamp, string).
    val (statCols, cNames, aggs) = statAggPlan(df.schema, constraints)
    val obs = org.apache.spark.sql.Observation(
      s"graft_stats_$name")
    val observed = df.observe(obs,
      aggs.head.as("_0"),
      aggs.tail.zipWithIndex.map { case (a, i) => a.as(s"_${i + 1}") }: _*)
    // column mapping: files always spell PHYSICAL names
    toPhysicalDf(observed, l2p).write.parquet(dataDir.toString)
    // The metrics arrive via an ASYNC listener bus: poll briefly, and
    // if the bus dropped the event (bounded queue under pressure —
    // never observed, but a hung commit would be worse than a second
    // scan) fall back to the historical read-back, which computes the
    // same numbers from the files.
    val (rows, stats, violations) =
      awaitObserved(obs).map(m =>
        decodeStatRow(statCols, cNames, l2p, i => m.getOrElse(s"_$i", null)))
      .getOrElse(statsOf(dataDir.toString, constraints, l2p.map(_.swap)))
    val broken = violations.filter(_._2 > 0L)
    if (broken.nonEmpty) {
      // Abort BEFORE publish: nothing was committed, the orphan payload
      // is removed here rather than waiting for vacuum.
      fs.delete(dataDir, true)
      throw new IllegalArgumentException(
        s"write to $dir violates CHECK constraint(s): " +
          broken.map { case (n, c) =>
            s"$n [${constraints(n)}] on $c row(s)" }.mkString("; "))
    }
    (name, rows, stats)
  }

  /** [[writePayload]] routed by the table's declared partitioning:
    * unpartitioned tables (and payloads missing a partition column —
    * an evolving append reads it as null everywhere, no value to split
    * on) write ONE directory; partitioned tables split into one
    * directory PER DISTINCT partition tuple so the partition value is
    * an exact [min = max] per-directory stat and every reader's
    * manifest pruning serves partition pruning for free.
    */
  private def writePayloadAuto(df: DataFrame, v: Int,
                               constraints: Map[String, String],
                               base: Int,
                               keepPhysical: Boolean = true)
      : Seq[(String, Long, Map[String, ColStat])] = {
    val snap = if (base < 0) None else Some(snapshotAt(base))
    // keepPhysical = false (OVERWRITE): the payload REPLACES the active
    // set, so the files are written under the frame's own names and the
    // column map dissolves with the directories that needed it —
    // recording the old physical names would leave the new files
    // spelling names the new schema no longer maps.
    val l2p =
      if (!keepPhysical) Map.empty[String, String]
      else snap.flatMap(_.schemaJson).map(j => renameMap(schemaFromJson(j)))
        .getOrElse(Map.empty)
    val p2l = snap.flatMap(_.schemaJson)
      .map(j => renameMap(schemaFromJson(j)).map(_.swap))
      .getOrElse(Map.empty)
    // recorded partition columns are PHYSICAL (create-time) names; the
    // payload frame speaks logical
    val partCols = snap.map(_.partitionCols).getOrElse(Nil)
      .map(c => p2l.getOrElse(c, c))
    if (partCols.isEmpty ||
        partCols.exists(c => !df.columns.exists(_.equalsIgnoreCase(c))))
      Seq(writePayload(df, v, constraints, l2p))
    else writePayloadSplit(df, v, partCols, constraints, l2p)
  }

  /** The partitioned payload write — Hive layout rebuilt as manifest
    * state: the payload is written ONCE through `partitionBy` on
    * SHADOW copies of the partition columns (partitionBy strips its
    * keys from the data files; the shadows are stripped, the REAL
    * columns stay readable in every file), each staged leaf directory
    * is renamed (metadata-only) into a top-level data directory, and
    * its stats are computed like any other commit — the partition
    * value lands as an exact [min = max] bound, which is precisely
    * what [[pruneActiveAll]]/DPP prune on. No dedicated partition
    * index exists, so a `WHERE day = X` read, an OPTIMIZE WHERE, and
    * a stats-pruned DELETE all skip foreign partitions through the
    * one mechanism. Stats cost one bounded job per distinct tuple —
    * ingestion appends touch one or a few partitions; a backfill
    * across thousands should batch per partition upstream.
    */
  private def writePayloadSplit(df: DataFrame, v: Int,
                                partCols: Seq[String],
                                constraints: Map[String, String],
                                l2p: Map[String, String] = Map.empty)
      : Seq[(String, Long, Map[String, ColStat])] = {
    import org.apache.spark.sql.functions.col
    val shadow = partCols.map(c => "__graft_p_" + c)
    shadow.foreach(s => require(!df.columns.contains(s),
      s"payload column `$s` collides with the partition staging prefix"))
    val staged = toPhysicalDf(
      partCols.zip(shadow).foldLeft(df)((d, cs) =>
        d.withColumn(cs._2, col(cs._1))), l2p)
    val staging = new Path(root,
      f"_staging-v$v%05d-${java.util.UUID.randomUUID().toString.take(8)}")
    staged.write.partitionBy(shadow: _*).parquet(staging.toString)
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => leaves(st.getPath, depth - 1))
    val parts = leaves(staging, shadow.size).sortBy(_.toString)
    if (parts.isEmpty) { // empty payload: keep the 0-row schema holder
      fs.delete(staging, true)
      return Seq(writePayload(df, v, constraints, l2p))
    }
    val written = parts.zipWithIndex.map { case (p, i) =>
      val name = f"v$v%05d-p$i%03d-${java.util.UUID.randomUUID().toString.take(8)}"
      require(fs.rename(p, new Path(root, name)),
        s"staging rename $p -> $name failed")
      name
    }
    fs.delete(staging, true)
    // ONE grouped stats job over every new directory (was one job PER
    // distinct partition tuple — a backfill across k partitions paid k
    // driver-sequenced aggregate jobs plus k schema inferences; the
    // grouped form pays one two-stage job whose shuffle is one row per
    // directory).
    val grouped = statsOfDirs(written, constraints, l2p.map(_.swap))
    val out = written.map { name =>
      val (rows, stats, violations) = grouped.getOrElse(name,
        (0L, Map.empty[String, ColStat], Map.empty[String, Long]))
      (name, rows, stats, violations.filter(_._2 > 0L))
    }
    val broken = out.flatMap(_._4)
    if (broken.nonEmpty) {
      // abort BEFORE publish, reclaiming EVERY staged directory — a
      // partial payload must never outlive its failed commit
      written.foreach(n => fs.delete(new Path(root, n), true))
      throw new IllegalArgumentException(
        s"write to $dir violates CHECK constraint(s): " +
          broken.map { case (n, c) =>
            s"$n [${constraints(n)}] on $c row(s)" }.mkString("; "))
    }
    out.map(t => (t._1, t._2, t._3))
  }

  /** Row count, per-column min/max, and per-CHECK-constraint violation
    * count of one data directory — ONE aggregate job over the new
    * files only (never the table). This is a real column scan of the
    * just-written directory, not a footer read: parquet footer
    * statistics for string/binary columns may be TRUNCATED (inexact
    * bounds), and the data-skipping contract requires exact bounds — a
    * wrong max could prune a directory that holds matching rows. The
    * scan is bounded by the commit's own size and column-pruned to the
    * indexed/constrained columns.
    * Supported kinds: integral → Long, timestamp → epoch micros
    * (exact — a seconds-truncated max could wrongly prune the row
    * holding it), fractional → Double, string as-is; other types are
    * simply not indexed (readers keep the directory conservatively).
    */
  private def statsOf(dataDir: String,
                      constraints: Map[String, String] = Map.empty,
                      physToLogical: Map[String, String] = Map.empty)
      : (Long, Map[String, ColStat], Map[String, Long]) = {
    // Column mapping: CHECK constraints reference LOGICAL names, the
    // files spell PHYSICAL ones — evaluate over the aliased view, but
    // KEY the recorded stats by the raw (physical) file names: physical
    // names are stable across renames, so the stats index never needs
    // rewriting when a column does.
    val raw = spark.read.parquet(dataDir)
    val d =
      if (physToLogical.isEmpty) raw else raw.withColumnsRenamed(physToLogical)
    val logToPhys = physToLogical.map(_.swap)
    val (cols, cNames, aggs) = statAggPlan(d.schema, constraints)
    val row = d.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    decodeStatRow(cols, cNames, logToPhys, row.get)
  }

  /** The stat/constraint aggregate list of [[statsOf]] in reusable
    * form — ONE definition serves the read-back path ([[statsOf]]),
    * the write-fused path ([[writePayload]]'s observe), and the
    * grouped multi-directory path ([[statsOfDirs]]), so the three can
    * never drift. Layout (positional): count, then (min, max) per
    * indexable column, then a null count per indexable column, then a
    * violation count per CHECK constraint (sorted by name).
    * Supported kinds: integral → Long, timestamp → epoch micros
    * (exact — a seconds-truncated max could wrongly prune the row
    * holding it), fractional → Double, string as-is; other types are
    * simply not indexed (readers keep the directory conservatively).
    * CHECK violation counts use SQL semantics: a NULL constraint
    * result passes, so a violation is exactly `expr <=> false`. NULL
    * counts feed IS NULL / IS NOT NULL pruning and all-null-directory
    * range skipping (Delta's nullCount statistic).
    */
  private def statAggPlan(schema: org.apache.spark.sql.types.StructType,
                          constraints: Map[String, String])
      : (Array[(String, String, org.apache.spark.sql.Column)],
         Seq[String], Seq[org.apache.spark.sql.Column]) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val cols = schema.fields.flatMap { f =>
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Some((f.name, "l", col(f.name).cast("long")))
        case TimestampType | TimestampNTZType =>
          Some((f.name, "l", unix_micros(col(f.name).cast("timestamp"))))
        case FloatType | DoubleType =>
          Some((f.name, "d", col(f.name).cast("double")))
        case StringType => Some((f.name, "s", col(f.name)))
        case _ => None
      }
    }
    val cNames = constraints.keys.toSeq.sorted
    val cAggs = cNames.map(n =>
      sum(when(expr(constraints(n)) <=> lit(false), 1L).otherwise(0L)))
    val nullAggs = cols.map { case (n, _, _) =>
      sum(when(col(n).isNull, 1L).otherwise(0L)) }.toSeq
    val aggs = ((count(lit(1)) +:
      cols.flatMap { case (_, _, c) => Seq(min(c), max(c)) }.toSeq) ++
      nullAggs) ++ cAggs
    (cols, cNames, aggs)
  }

  /** Decode one [[statAggPlan]]-shaped value vector (`get(i)` = the
    * i-th aggregate, 0 = count) into the (rows, stats, violations)
    * triple [[statsOf]] returns. Stats are keyed by PHYSICAL name via
    * `logToPhys` — physical names are stable across renames, so the
    * stats index never needs rewriting when a column does. An all-null
    * column keeps an explicit (null, null) entry: it PROVES no row can
    * satisfy a range or IS NOT NULL predicate — omitting it (the
    * pre-round-12 shape) forced conservative keeps.
    */
  private def decodeStatRow(cols: Array[(String, String, org.apache.spark.sql.Column)],
                            cNames: Seq[String],
                            logToPhys: Map[String, String],
                            get: Int => Any)
      : (Long, Map[String, ColStat], Map[String, Long]) = {
    def longAt(i: Int): Long = get(i) match {
      case null => 0L
      case l: java.lang.Long => l.longValue()
      case other => other.toString.toLong
    }
    val nullBase = 1 + 2 * cols.length
    val stats = cols.zipWithIndex.map { case ((n, kind, _), i) =>
      logToPhys.getOrElse(n, n) ->
        ColStat(kind, get(1 + 2 * i), get(2 + 2 * i), longAt(nullBase + i))
    }.toMap
    val base = nullBase + cols.length
    val violations = cNames.zipWithIndex.map { case (n, i) =>
      n -> longAt(base + i)
    }.toMap
    (longAt(0), stats, violations)
  }

  /** Wait for a write-fused observation's metrics. The listener bus
    * delivering them is asynchronous, so the common case is a handful
    * of milliseconds after the write action returns; None after the
    * bound means the bus dropped the event — the caller falls back to
    * the read-back scan rather than hanging a commit forever.
    */
  private def awaitObserved(obs: org.apache.spark.sql.Observation,
                            maxWaitMs: Long = 30000L)
      : Option[Map[String, Any]] = {
    import org.apache.spark.sql.GraftSqlBridge.observedOrEmpty
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var m = observedOrEmpty(obs)
    while (m.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(2L)
      m = observedOrEmpty(obs)
    }
    if (m.isEmpty) None else Some(m.toMap)
  }

  /** Per-directory [[statsOf]] for SEVERAL directories in ONE job:
    * all paths are scanned in a single frame and grouped by the
    * file's parent directory name (the partial aggregation shrinks
    * the shuffle to one row per directory). Directory names here are
    * engine-generated (`v00001-p000-<uuid>`), so the
    * `input_file_name()` parse is never exposed to user path
    * characters. Returns a map keyed by directory NAME; a directory
    * absent from the map wrote zero rows.
    */
  private def statsOfDirs(names: Seq[String],
                          constraints: Map[String, String] = Map.empty,
                          physToLogical: Map[String, String] = Map.empty)
      : Map[String, (Long, Map[String, ColStat], Map[String, Long])] = {
    import org.apache.spark.sql.functions._
    if (names.isEmpty) return Map.empty
    val raw = spark.read.parquet(
      names.map(n => new Path(root, n).toString): _*)
    val d =
      if (physToLogical.isEmpty) raw else raw.withColumnsRenamed(physToLogical)
    val logToPhys = physToLogical.map(_.swap)
    val (cols, cNames, aggs) = statAggPlan(d.schema, constraints)
    val dirCol = regexp_extract(input_file_name(), "/([^/]+)/[^/]+$", 1)
    val rows = d.groupBy(dirCol.as("__graft_stats_dir"))
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()
    rows.map { r =>
      r.getString(0) -> decodeStatRow(cols, cNames, logToPhys, i => r.get(i + 1))
    }.toMap
  }

  /** Schema-compatibility gate for the append paths: validate `df`
    * against the current snapshot schema at COMMIT time (the shared
    * [[SchemaCompat]] policy — int→long widens and is cast to the
    * table's physical type, long→int and cross-family changes fail
    * loudly) instead of letting an incompatible append commit fine and
    * explode rows later inside a reader's parquet mergeSchema. New
    * columns pass (evolution — old directories read them as null);
    * missing columns pass (mergeSchema pads). Overwrite is exempt by
    * design: it replaces the active set, and each version unions only
    * its own directories.
    */
  private def schemaFromJson(j: String): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(j)
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  /** Align `df` for an append against version `base` AND compute the
    * post-commit table schema (recorded in the manifest so readers and
    * schema inference never pay an O(active-directories) parquet
    * footer merge — Delta stores its schema in the log for exactly
    * this reason). The evolved schema is the existing fields followed
    * by the genuinely-new incoming fields, nullable-normalized (file
    * reads are always nullable). Pre-schema logs fall back to one
    * footer merge. Taking `base` explicitly keeps alignment, schema,
    * and the commit slot CONSISTENT: the caller publishes at base + 1,
    * and a commit landing in between fails the publish instead of
    * letting a schema computed against an older snapshot land.
    */
  private def alignedForAppend(df: DataFrame, base: Int): (DataFrame, String) = {
    if (base < 0) return (df, df.schema.pipe(graft.sources.SchemaCompat.nullableJson))
    val snap = snapshotAt(base)
    // A constraint-only commit 0 (or a schema-holder-free state) has no
    // data directories — nothing to be compatible with.
    if (snap.active.isEmpty && snap.schemaJson.isEmpty)
      return (df, df.schema.pipe(graft.sources.SchemaCompat.nullableJson))
    val existing = snap.schemaJson.map(schemaFromJson)
      .getOrElse(readAt(base).schema)
    val aligned = SchemaCompat.alignWidening(df, existing, dir)
    val fresh = aligned.schema.fields.filterNot(f =>
      existing.fieldNames.contains(f.name))
    // Residue guard (same hazard addColumns refuses): an evolving
    // append introducing a column whose BYTES still live in active
    // directories — a previously dropped column, or a renamed column's
    // physical name — would resurface foreign values on every
    // schema-imposed read. The stats index records what files
    // physically hold; fail loudly and point at the rewrite.
    val ghost = fresh.map(_.name).filter(n => snap.active.exists(d =>
      snap.stats.get(d).exists(_.keys.exists(_.equalsIgnoreCase(n)))))
    require(ghost.isEmpty,
      s"append to $dir introduces column(s) ${ghost.mkString(", ")} whose " +
        "bytes still live in active directories (dropped or renamed " +
        "away) — re-adding would resurface old values; run OPTIMIZE " +
        "(full rewrite) first")
    val evolved = org.apache.spark.sql.types.StructType(existing.fields ++ fresh)
    (aligned, SchemaCompat.nullableJson(evolved))
  }

  /** Retry-loop support for the schema the loser recorded: the WINNER
    * may itself have evolved the table, so the retried manifest must
    * record the union of the CURRENT schema and this payload's fields
    * — re-publishing the pre-race schema would hide a concurrently
    * added column from every reader. A TYPE conflict on a shared
    * column aborts loudly and reclaims the payload: the already-written
    * files carry this writer's physical type, and committing them
    * under either schema would fail readers of the other.
    */
  private def reconcileSchemaOnRetry(asOf: Int, payloadName: String,
                                     payload: org.apache.spark.sql.types.StructType)
      : String = {
    if (asOf < 0) return SchemaCompat.nullableJson(payload)
    val snap = snapshotAt(asOf)
    // A pre-schema (legacy) log still has an EXISTING schema — the
    // footer merge readAt falls back to. Recording only the payload's
    // fields here would silently NARROW the table (columns the payload
    // lacks would vanish from every later read).
    val existing: Option[org.apache.spark.sql.types.StructType] =
      snap.schemaJson.map(schemaFromJson).orElse(
        if (snap.active.isEmpty) None else Some(readAt(asOf).schema))
    existing match {
      case None => SchemaCompat.nullableJson(payload)
      case Some(current) =>
        def loud(msg: String): Nothing = {
          fs.delete(new Path(root, payloadName), true)
          throw new GraftConflictException(
            s"retried append to $dir conflicts with a concurrent schema " +
              s"change ($msg); re-align and re-append")
        }
        val conflicts = payload.fields.flatMap(f =>
          current.find(_.name.equalsIgnoreCase(f.name)).filter(_.dataType !=
            SchemaCompat.nullableDeep(f.dataType)).map(c =>
            s"${f.name}: payload ${f.dataType.simpleString} vs table " +
              s"${c.dataType.simpleString}"))
        if (conflicts.nonEmpty) loud(conflicts.mkString("; "))
        // A payload field absent from the current schema is EITHER a
        // genuinely new column (this writer's evolution — union it) OR
        // one a concurrent DROP COLUMN just removed — re-recording that
        // one would resurrect its residual bytes in every unrewritten
        // directory. The stats index distinguishes them: a dropped
        // column's bytes still live in some active directory's stats.
        val extra = payload.fields.filterNot(f =>
          current.fieldNames.exists(_.equalsIgnoreCase(f.name)))
        val dropped = extra.map(_.name).filter(n => snap.active.exists(d =>
          snap.stats.get(d).exists(_.keys.exists(_.equalsIgnoreCase(n)))))
        if (dropped.nonEmpty) loud(
          s"column(s) ${dropped.mkString(", ")} were concurrently dropped " +
            "and this payload still carries them")
        SchemaCompat.nullableJson(org.apache.spark.sql.types.StructType(
          current.fields ++ extra))
    }
  }

  /** CREATE TABLE: commit version 0 with a declared SCHEMA and no data
    * — the catalog's table-creation primitive. The table reads as an
    * empty frame of that schema; the first append validates against it
    * through the shared widening policy (alignedForAppend), exactly as
    * if data already existed. Fails loudly when the directory already
    * holds a transaction log.
    */
  def create(schema: org.apache.spark.sql.types.StructType,
             properties: Map[String, String] = Map.empty,
             partitionCols: Seq[String] = Nil): Int = {
    require(latestVersion < 0,
      s"$dir already has a transaction log (latest version $latestVersion); " +
        "create() only initializes fresh tables")
    partitionCols.foreach(c => require(
      schema.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"partition column `$c` is not in the schema " +
        s"(${schema.fieldNames.mkString(", ")})"))
    publish(Commit(0, "create", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(),
      schemaJson = Some(SchemaCompat.nullableJson(schema)),
      propsSet = properties, partitionCols = partitionCols))
    0
  }

  /** The identity partition columns declared at CREATE (empty for an
    * unpartitioned table). Every append/overwrite to a partitioned
    * table splits its payload into one directory PER DISTINCT
    * partition tuple, with the partition value riding each directory's
    * exact [min = max] stat — so [[pruneActiveAll]], the DSv2 scan's
    * pushdown, and DPP all serve partition pruning from the SAME
    * manifest machinery that serves data skipping, no second index.
    */
  def partitionColumns(version: Option[Int] = None): Seq[String] = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    val snap = snapshotAt(v)
    // recorded names are PHYSICAL (create-time); serve logical
    val p2l = snap.schemaJson.map(j => renameMap(schemaFromJson(j)).map(_.swap))
      .getOrElse(Map.empty)
    snap.partitionCols.map(c => p2l.getOrElse(c, c))
  }

  /** The user TBLPROPERTIES in force at a version (default: latest) —
    * folded from the manifest log exactly like constraints, so they
    * survive restarts, checkpoints, and vacuum and are visible to
    * every reader (`loadTable().properties()`, DESCRIBE DETAIL).
    */
  def tableProperties(version: Option[Int] = None): Map[String, String] = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    snapshotAt(v).props
  }

  /** `ALTER TABLE ... SET TBLPROPERTIES` — a metadata-only commit
    * recording the new/updated keys; existing keys not named keep
    * their values. Returns the committed version.
    */
  def setProperties(props: Map[String, String]): Int = {
    require(props.nonEmpty, "setProperties needs at least one property")
    val v = latestVersion + 1
    require(v > 0, s"$dir has no committed versions")
    publish(Commit(v, "properties", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(), propsSet = props))
    v
  }

  /** `ALTER TABLE ... UNSET TBLPROPERTIES` — metadata-only removal;
    * unknown keys fail loudly (matching Spark's default, which has no
    * IF EXISTS here).
    */
  def unsetProperties(names: Seq[String]): Int = {
    require(names.nonEmpty, "unsetProperties needs at least one property")
    val latest = latestVersion
    require(latest >= 0, s"$dir has no committed versions")
    val cur = snapshotAt(latest).props
    val missing = names.filterNot(cur.contains)
    require(missing.isEmpty,
      s"propert${if (missing.size == 1) "y" else "ies"} " +
        s"${missing.mkString(", ")} not set on $dir " +
        s"(has: ${cur.keys.toSeq.sorted.mkString(", ")})")
    publish(Commit(latest + 1, "properties", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(), propsUnset = names))
    latest + 1
  }

  /** ALTER TABLE ADD COLUMNS — METADATA-ONLY schema evolution, Delta's
    * shape: the commit records the evolved schema and touches no data
    * file; existing directories read the new columns as NULL (the
    * parquet reader pads missing columns), time travel keeps each
    * version's own schema, and RESTORE rolls the schema back with the
    * data. New columns must be nullable-representable (file reads
    * always are); duplicate names fail loudly.
    */
  def addColumns(cols: org.apache.spark.sql.types.StructType): Int = {
    require(cols.nonEmpty, "addColumns needs at least one column")
    val latest = latestVersion
    require(latest >= 0, s"$dir has no committed versions")
    val existing = tableSchemaAt(latest)
    val dup = cols.fieldNames.filter(n =>
      existing.fieldNames.exists(_.equalsIgnoreCase(n)))
    require(dup.isEmpty,
      s"column(s) ${dup.mkString(", ")} already exist on $dir")
    // Re-adding a previously DROPPED column would resurface its old
    // bytes in unrewritten directories instead of reading null (this
    // engine has no column mapping to separate logical from physical
    // names — Delta needs exactly that feature here). The per-directory
    // stats index records which columns a directory's files physically
    // hold, so the hazard is detectable: fail loudly and point at the
    // rewrite that clears it. (Stat-less column TYPES — arrays, maps —
    // escape this guard; documented residue.)
    val snap = snapshotAt(latest)
    val ghost = cols.fieldNames.filter(n => snap.active.exists(d =>
      snap.stats.get(d).exists(_.keys.exists(_.equalsIgnoreCase(n)))))
    require(ghost.isEmpty,
      s"column(s) ${ghost.mkString(", ")} were dropped but their bytes " +
        s"still live in active directories of $dir — re-adding would " +
        "resurface old values; run OPTIMIZE (full rewrite) first")
    val evolved = org.apache.spark.sql.types.StructType(
      existing.fields ++ cols.fields)
    val v = latest + 1
    publish(Commit(v, "alter", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(),
      schemaJson = Some(SchemaCompat.nullableJson(evolved))))
    v
  }

  /** The LOSSLESS type-widening allowlist (Delta's type widening,
    * restricted to conversions Spark 4's vectorized parquet reader
    * upcasts natively — probe-verified): integral chain
    * byte→short→int→long, float→double, byte/short/int→double (exact
    * in a 52-bit mantissa), date→timestamp_ntz (midnight), integral→
    * decimal with enough integer digits, and decimal→decimal growing
    * both scale headroom and integer digits. long→double and any
    * narrowing are NOT widenings (lossy) and refuse.
    */
  private def widensTo(from: org.apache.spark.sql.types.DataType,
                       to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    def intDigits(dt: DataType): Int = dt match {
      case ByteType => 3
      case ShortType => 5
      case IntegerType => 10
      case LongType => 19
      case _ => Int.MaxValue
    }
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case (DateType, TimestampNTZType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale &&
          (t.precision > f.precision || t.scale > f.scale)
      case (i @ (ByteType | ShortType | IntegerType | LongType), d: DecimalType) =>
        d.precision - d.scale >= intDigits(i)
      case _ => false
    }
  }

  /** ALTER TABLE ALTER COLUMN TYPE — METADATA-ONLY type widening: the
    * commit records the schema with the column's type widened and
    * touches no data file; existing files keep their narrow physical
    * type and the parquet reader UPCASTS at scan (int32 pages read as
    * long — Spark 4's reader supports every conversion [[widensTo]]
    * allows), new files write the wide type, time travel keeps each
    * version's own type, and stat pruning keeps working because the
    * stats domain was already type-normalized (integrals→long,
    * floats→double, mixed compares coerce). Narrowing, incompatible
    * changes, and partition columns refuse loudly (identity partition
    * directories are named by the ingest-time type's rendering).
    */
  def widenColumn(name: String, to: org.apache.spark.sql.types.DataType): Int = {
    val latest = latestVersion
    require(latest >= 0, s"$dir has no committed versions")
    val schema = tableSchemaAt(latest)
    val field = schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"column `$name` does not exist on $dir " +
          s"(schema: ${schema.fieldNames.mkString(", ")})"))
    require(field.dataType != to,
      s"column `$name` already has type ${to.simpleString}")
    require(widensTo(field.dataType, to),
      s"cannot change column `$name` from ${field.dataType.simpleString} " +
        s"to ${to.simpleString}: only lossless widenings are metadata-only " +
        "(byte/short/int->long, float->double, byte/short/int->double, " +
        "date->timestamp_ntz, integral/decimal->wider decimal); anything " +
        "else needs a rewrite")
    val snap = snapshotAt(latest)
    require(!snap.partitionCols.exists(_.equalsIgnoreCase(name)),
      s"cannot widen partition column `$name` on $dir: identity partition " +
        "directories are named by the written type's rendering")
    // metadata (the column-mapping physical name) rides the widened
    // field untouched — widening never changes where the bytes live
    val widened = org.apache.spark.sql.types.StructType(schema.fields.map(f =>
      if (f.name.equalsIgnoreCase(name)) f.copy(dataType = to) else f))
    val v = latest + 1
    publish(Commit(v, "alter", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(),
      schemaJson = Some(SchemaCompat.nullableJson(widened)),
      featuresAdd = Seq(VersionedTable.FeatureTypeWidening)))
    v
  }

  /** ALTER TABLE DROP COLUMNS — metadata-only column removal: the
    * recorded schema stops carrying the columns, readers never project
    * them again, and time travel still serves them at old versions.
    * The BYTES stay in existing files until those directories are
    * rewritten (OPTIMIZE/UPDATE/DELETE) — which is why [[addColumns]]
    * refuses to re-add a name whose bytes still live in an active
    * directory (no column mapping separates logical from physical
    * names here). Dropping every column, or a column that does not
    * exist, fails loudly.
    */
  def dropColumns(names: Seq[String]): Int = {
    require(names.nonEmpty, "dropColumns needs at least one column")
    val latest = latestVersion
    require(latest >= 0, s"$dir has no committed versions")
    val existing = tableSchemaAt(latest)
    val missing = names.filterNot(n =>
      existing.fieldNames.exists(_.equalsIgnoreCase(n)))
    require(missing.isEmpty,
      s"column(s) ${missing.mkString(", ")} do not exist on $dir " +
        s"(schema: ${existing.fieldNames.mkString(", ")})")
    val keep = existing.fields.filterNot(f =>
      names.exists(_.equalsIgnoreCase(f.name)))
    require(keep.nonEmpty, s"cannot drop every column of $dir")
    // same dependency rule as renameColumn: a CHECK constraint
    // referencing a dropped column would fail analysis on every later
    // write's validation job
    val refd = snapshotAt(latest).constraints.filter { case (_, ex) =>
      names.exists(n =>
        ("(?i)\\b" + java.util.regex.Pattern.quote(n) + "\\b").r
          .findFirstIn(ex).isDefined)
    }
    require(refd.isEmpty,
      s"cannot drop column(s) ${names.mkString(", ")} on $dir: CHECK " +
        s"constraint(s) ${refd.keys.mkString(", ")} reference them — " +
        "drop or rewrite the constraints first")
    val v = latest + 1
    publish(Commit(v, "alter", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(),
      schemaJson = Some(SchemaCompat.nullableJson(
        org.apache.spark.sql.types.StructType(keep)))))
    v
  }

  /** The table schema of a version: the log-recorded schema when the
    * manifest carries one, else the snapshot read's inferred schema.
    */
  private def tableSchemaAt(v: Int): org.apache.spark.sql.types.StructType =
    snapshotAt(v).schemaJson.map(schemaFromJson).getOrElse(readAt(v).schema)

  // ---- Column mapping (ALTER TABLE RENAME COLUMN) --------------------
  // A renamed field keeps its PHYSICAL parquet name (the name its bytes
  // carry in every file — stable across any number of renames) in the
  // schema field's metadata under this key; the field's `name` is the
  // LOGICAL name users see. Delta separates the two with column IDs for
  // exactly this feature; here the log schema carries the map, reads
  // physicalize-then-alias, writes back-rename — data files are never
  // touched by a rename, and time travel keeps each version's names.
  private val PhysicalKey = "graftPhysical"

  private def physicalNameOf(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  /** logical → physical, only where they differ (empty for tables that
    * never renamed — every mapped path is a no-op then).
    */
  private def renameMap(schema: org.apache.spark.sql.types.StructType)
      : Map[String, String] =
    schema.fields.iterator.flatMap { f =>
      val p = physicalNameOf(f)
      if (p != f.name) Some(f.name -> p) else None
    }.toMap

  /** The schema as the parquet FILES spell it (physical names, same
    * types/order/metadata-free).
    */
  private[sources] def physicalize(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(schema.fields.map(f =>
      f.copy(name = physicalNameOf(f),
        metadata = org.apache.spark.sql.types.Metadata.empty)))

  /** Map a LOGICAL column name to its physical stats/file name at a
    * version (identity for never-renamed tables and unknown names).
    */
  private def toPhysicalName(colName: String, snap: Snapshot): String =
    snap.schemaJson.map(schemaFromJson) match {
      case Some(s) => s.fields.find(_.name.equalsIgnoreCase(colName))
        .map(physicalNameOf).getOrElse(colName)
      case None => colName
    }

  /** Rename a DataFrame's columns logical→physical before a file write
    * (identity when the table never renamed).
    */
  private def toPhysicalDf(df: DataFrame,
                           l2p: Map[String, String]): DataFrame =
    if (l2p.isEmpty) df else df.withColumnsRenamed(l2p)

  /** ALTER TABLE RENAME COLUMN — METADATA-ONLY, via the column map: the
    * commit records the schema with the field renamed and its physical
    * name pinned; no data file is touched, old versions keep their own
    * names, and mutations/reads address the new name immediately. The
    * new name must not collide with a live logical name NOR with
    * physical bytes still in active directories (the same residue guard
    * as [[addColumns]] — a collision would silently resurface foreign
    * values). Renaming a column BACK to its own physical name drops the
    * mapping entry.
    */
  def renameColumn(oldName: String, newName: String): Int = {
    import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructType}
    require(oldName.nonEmpty && newName.nonEmpty, "names must be non-empty")
    val latest = latestVersion
    require(latest >= 0, s"$dir has no committed versions")
    val schema = tableSchemaAt(latest)
    val field = schema.fields.find(_.name.equalsIgnoreCase(oldName)).getOrElse(
      throw new IllegalArgumentException(
        s"column `$oldName` does not exist on $dir " +
          s"(schema: ${schema.fieldNames.mkString(", ")})"))
    require(!newName.equalsIgnoreCase(oldName),
      s"rename to the same name: $oldName")
    require(!schema.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column `$newName` already exists on $dir")
    val physical = physicalNameOf(field)
    // a CHECK constraint referencing the old name would fail analysis
    // on every later write — refuse, like Delta's constraint dependency
    // check (word-boundary match: conservative, never silent)
    val refd = snapshotAt(latest).constraints.filter { case (_, ex) =>
      ("""(?i)\b""" + java.util.regex.Pattern.quote(oldName) + """\b""").r
        .findFirstIn(ex).isDefined
    }
    require(refd.isEmpty,
      s"cannot rename `$oldName` on $dir: CHECK constraint(s) " +
        s"${refd.keys.mkString(", ")} reference it — drop or rewrite " +
        "them first")
    // residue guard: bytes named `newName` in any active directory
    // (a dropped column, or another live column's physical name) would
    // be mis-addressed the moment physical(new) == newName anywhere
    val snap = snapshotAt(latest)
    if (!physical.equalsIgnoreCase(newName)) {
      val ghost = snap.active.exists(d => snap.stats.get(d)
        .exists(_.keys.exists(_.equalsIgnoreCase(newName))))
      require(!ghost,
        s"cannot rename `$oldName` to `$newName` on $dir: bytes named " +
          s"`$newName` still live in active directories — run OPTIMIZE " +
          "(full rewrite) first")
    }
    val renamed = StructType(schema.fields.map { g =>
      if (!g.name.equalsIgnoreCase(oldName)) g
      else if (physical.equalsIgnoreCase(newName))
        // renamed back to its own physical: the mapping entry dissolves
        g.copy(name = newName, metadata = Metadata.empty)
      else g.copy(name = newName, metadata = new MetadataBuilder()
        .withMetadata(g.metadata).putString(PhysicalKey, physical).build())
    })
    val v = latest + 1
    publish(Commit(v, "alter", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(),
      schemaJson = Some(SchemaCompat.nullableJson(renamed)),
      // a rename-BACK dissolves the mapping, but readers of the
      // in-between versions still need the feature — announce whenever
      // the rename machinery is in play
      featuresAdd = Seq(VersionedTable.FeatureColumnMapping)))
    v
  }

  /** STREAM SERVABILITY of one log-recorded schema under a reader's
    * schema PINNED at stream start (Delta pins the query schema the
    * same way): the pinned read stays correct as long as every pinned
    * column's bytes can still be served AS the pinned type — files
    * written under the recorded schema may spell a pinned column
    * NARROWER (the reader upcasts, exactly the [[widensTo]] set), may
    * LACK it (parquet pads null), or may carry EXTRA columns (pruned
    * away); matching is by PHYSICAL name, so a rename (metadata-only,
    * bytes unmoved) never breaks a running stream. What CANNOT be
    * served is a pinned column the table now writes WIDER (or
    * incompatibly — an overwrite's arbitrary new type): the vectorized
    * reader has no lossless narrowing. Returns the violation text for
    * the stream's explicit restart-required error, or None when the
    * recorded schema is servable. Both sides must be physicalized
    * metadata-free schemas.
    */
  private[sources] def streamSchemaViolation(
      pinnedPhys: org.apache.spark.sql.types.StructType,
      recordedJson: String): Option[String] = {
    val committed = physicalize(schemaFromJson(recordedJson))
    val byName = committed.fields.iterator
      .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType).toMap
    val broken = pinnedPhys.fields.flatMap { f =>
      byName.get(f.name.toLowerCase(java.util.Locale.ROOT)) match {
        case Some(t) if t != f.dataType && !widensTo(t, f.dataType) =>
          Some(s"column `${f.name}` is pinned as ${f.dataType.simpleString} " +
            s"but the table now records ${t.simpleString}")
        case _ => None
      }
    }
    if (broken.isEmpty) None else Some(broken.mkString("; "))
  }

  /** The schema one COMMIT recorded, if any — what the streaming
    * source's mid-stream schema-change guard inspects per replayed
    * version.
    */
  private[sources] def commitSchemaJson(v: Int): Option[String] =
    commitAt(v).schemaJson

  /** The folded schema of a version (None for pre-schema legacy logs)
    * — the snapshot-initial batch's guard input.
    */
  private[sources] def snapshotSchemaJson(v: Int): Option[String] =
    snapshotAt(v).schemaJson

  /** The table schema from PURE metadata (the log-recorded schema) —
    * what schema-inference callers (the catalog's loadTable, the DSv2
    * provider) must use instead of `readAt(v).schema`, whose file-index
    * construction lists every active directory on every call. Only a
    * pre-schema legacy log pays the footer-merge fallback.
    */
  def tableSchema(version: Option[Int] = None)
      : org.apache.spark.sql.types.StructType = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    tableSchemaAt(v)
  }

  /** Commit `df` as a new version extending the current active set.
    * Returns the committed version number. Delta-encoded: the manifest
    * records only the one added directory, whatever the table size.
    */
  def append(df0: DataFrame): Int = {
    val base = latestVersion
    val (df, schemaJson) = alignedForAppend(df0, base)
    val armed = Some(maintenanceArmed(base))
    val v = base + 1
    val parts = writePayloadAuto(df, v,
      if (base < 0) Map.empty else snapshotAt(base).constraints, base)
    publish(Commit(v, "append", parts.map(_._1), Seq.empty,
      parts.map(_._2).sum, System.currentTimeMillis(),
      addedStats = parts.map(p => p._1 -> p._3).toMap,
      addedRows = parts.map(p => p._1 -> p._2).toMap,
      schemaJson = Some(schemaJson)))
    runPostCommitMaintenance(v, armed)
    v
  }

  /** Metadata-only COUNT(*) — Delta answers `SELECT COUNT(*)` from its
    * log, and so does this: the sum of the active directories' recorded
    * row counts, resolved from the manifest fold with NO data scan (at
    * 100 TB, a few KB of log instead of every parquet footer). Works at
    * any time-travel version. Returns None when an active directory
    * predates row-count recording — a scan is then the only truth;
    * never guesses.
    */
  def fastCount(version: Option[Int] = None): Option[Long] = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    val snap = snapshotAt(v)
    if (snap.active.forall(snap.dirRows.contains))
      // deletion vectors hide recorded rows — their per-directory
      // counts ride the log, so the metadata answer stays EXACT
      Some(snap.active.map(snap.dirRows).sum -
        snap.active.flatMap(snap.dvRowsByDir.get).sum)
    else None
  }

  /** Metadata-only MIN/MAX of a column — the same manifest fold as
    * [[fastCount]]: per-directory bounds are exact (computed from the
    * data at write time), so the min of mins / max of maxes IS the
    * global answer, with no scan. Returns None when any active
    * directory lacks recorded stats for the column (unsupported type,
    * all-null directory, pre-stats commit) — never guesses. NOTE: rows
    * deleted by [[delete]]/[[merge]] rewrites are truly gone from the
    * rewritten directories' re-computed stats, so bounds stay exact
    * through row-level operations.
    */
  def statRange(colName: String, version: Option[Int] = None)
      : Option[(Any, Any)] = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    val snap = snapshotAt(v)
    // a deletion vector may have hidden exactly the row holding a
    // bound — recorded bounds stay valid SUPERSETS for pruning, but
    // are no longer exact MIN/MAX answers
    if (snap.active.exists(snap.dvs.contains)) return None
    val physName = toPhysicalName(colName, snap)
    val bounds = snap.active.map(d => snap.stats.get(d).flatMap(_.get(physName)))
    // An all-null directory records (null, null) bounds — MIN/MAX over
    // it has no exact metadata answer, same contract as missing stats.
    if (bounds.isEmpty || bounds.exists(b => b.isEmpty || b.exists(_.min == null)))
      None
    else {
      val bs = bounds.flatten
      Some((bs.map(_.min).reduce((a, b) => if (cmpBound(a, b) <= 0) a else b),
        bs.map(_.max).reduce((a, b) => if (cmpBound(a, b) >= 0) a else b)))
    }
  }

  /** DESCRIBE DETAIL from PURE metadata — version, active directory
    * count, row count, byte size, constraint count, all resolved from
    * the manifest fold with no data scan (Delta's detail reads its log
    * the same way). Row/byte totals are None when any active directory
    * predates their recording.
    */
  def detail(version: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    val snap = snapshotAt(v)
    def total(m: Map[String, Long]): Option[Long] =
      if (snap.active.forall(m.contains)) Some(snap.active.map(m).sum) else None
    // logical rows: recorded rows minus DV-hidden rows (exact);
    // size_bytes stays physical, like Delta's detail
    val dvHidden = snap.active.flatMap(snap.dvRowsByDir.get).sum
    // user TBLPROPERTIES render deterministically (key-sorted k=v)
    val props = snap.props.toSeq.sortBy(_._1)
      .map { case (k, v2) => s"$k=$v2" }.mkString(",")
    Seq((v, snap.active.size, total(snap.dirRows).map(_ - dvHidden),
      total(snap.dirBytes), snap.constraints.size, props,
      snap.features.toSeq.sorted.mkString(",")))
      .toDF("version", "num_dirs", "num_rows", "size_bytes",
        "num_constraints", "properties", "features")
  }

  /** The REQUIRED TABLE FEATURES of a version (empty for tables that
    * never used a gated capability) — the protocol surface
    * [[VersionedTable.KnownFeatures]] is checked against on every
    * snapshot resolution.
    */
  def tableFeatures(version: Option[Int] = None): Set[String] = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    snapshotAt(v).features
  }

  /** The CHECK constraints in force at the latest version (empty for a
    * new table).
    */
  def currentConstraints: Map[String, String] = {
    val latest = latestVersion
    if (latest < 0) Map.empty else snapshotAt(latest).constraints
  }

  /** Add a Delta-style CHECK constraint: `sqlExpr` (any Spark SQL
    * boolean expression over the table's columns) must not evaluate to
    * FALSE for any row — SQL semantics, so a NULL result passes. The
    * EXISTING table is validated first (one aggregate scan, exactly
    * like ALTER TABLE ADD CONSTRAINT); every subsequent write
    * (append/overwrite/streaming/merge) then validates its new rows in
    * the same job that computes their data-skipping stats and ABORTS
    * before publishing on a violation — at 100 TB the check costs the
    * new files' scan, never the table's. The constraint rides the
    * manifest log and checkpoints, so it survives restarts and vacuum
    * and is seen by every writer. Returns the committed version.
    */
  def addConstraint(name: String, sqlExpr: String): Int = {
    import org.apache.spark.sql.functions.{expr, lit, sum, when}
    require(name.nonEmpty, "constraint name must be non-empty")
    val latest = latestVersion
    val existing = currentConstraints
    require(!existing.contains(name),
      s"constraint `$name` already exists on $dir: ${existing(name)}")
    // The slot is CAPTURED before the validation scan: a commit landing
    // in the window takes this version and our publish fails loudly —
    // recomputing the slot after validation would silently constrain
    // data the scan never saw.
    val v = latest + 1
    if (latest >= 0 && activeAt(latest).nonEmpty) {
      val bad = readAt(latest).agg(
        sum(when(expr(sqlExpr) <=> lit(false), 1L).otherwise(0L))).head()
      val n = if (bad.isNullAt(0)) 0L else bad.getLong(0)
      require(n == 0L,
        s"cannot add constraint `$name` [$sqlExpr] to $dir: " +
          s"$n existing row(s) violate it")
    }
    publish(Commit(v, "constraint", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(), constraintAdd = Some((name, sqlExpr))))
    v
  }

  /** Drop a CHECK constraint (commits a manifest; old versions keep
    * enforcing it historically). Returns the committed version.
    */
  def dropConstraint(name: String): Int = {
    val latest = latestVersion
    require(currentConstraints.contains(name),
      s"no constraint `$name` on $dir (has: " +
        s"${currentConstraints.keys.toSeq.sorted.mkString(", ")})")
    val v = latest + 1
    publish(Commit(v, "constraint", Seq.empty, Seq.empty, 0L,
      System.currentTimeMillis(), constraintDrop = Some(name)))
    v
  }

  /** [[append]] with the optimistic-concurrency loser's retry — the
    * full Delta commit protocol: the payload is written ONCE (its
    * uniquely-named directory is version-agnostic; the `v%05d-` prefix
    * is advisory), then the manifest publish is retried against fresh
    * log state until it wins or `maxRetries` conflicts pass. Retrying
    * an append is always safe — a delta manifest adds this writer's
    * directory regardless of what the winner committed, so nothing is
    * clobbered. Concurrent OVERWRITES deliberately have no retry
    * wrapper: replaying "replace the table" after someone else's
    * commit changes meaning, and that decision belongs to the caller.
    */
  /** Test seam: runs once after an appendWithRetry payload is fully
    * written and before its first publish attempt — specs inject a
    * concurrent commit here deterministically.
    */
  private[graft] var beforeAppendPublish: () => Unit = () => ()

  def appendWithRetry(df0: DataFrame, maxRetries: Int = 5): Int = {
    val base = latestVersion
    val (df, schemaJson0) = alignedForAppend(df0, base)
    val armed = Some(maintenanceArmed(base))
    var schemaJson = schemaJson0
    var validated = if (base < 0) Map.empty[String, String]
      else snapshotAt(base).constraints
    val parts = writePayloadAuto(df, base + 1, validated, base)
    val names = parts.map(_._1)
    beforeAppendPublish()
    var attempt = 0
    // The attempted slot is ALWAYS the successor of a version this
    // writer has reconciled against (base at first; the re-read latest
    // after each loss). Recomputing the slot fresh per attempt would
    // let a slow writer land a STALE manifest at a later free slot
    // without ever hitting the conflict path — hiding, for example, a
    // column a concurrent evolving append added.
    var expected = base + 1
    while (true) {
      try {
        publish(Commit(expected, "append", names, Seq.empty,
          parts.map(_._2).sum, System.currentTimeMillis(),
          addedStats = parts.map(p => p._1 -> p._3).toMap,
          addedRows = parts.map(p => p._1 -> p._2).toMap,
          schemaJson = Some(schemaJson)))
        runPostCommitMaintenance(expected, armed)
        return expected
      } catch {
        case e: IllegalStateException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
          // The winner may have been an addConstraint: re-validate the
          // already-written payload (EVERY directory of a partitioned
          // split, each against the SAME pre-loss baseline — the first
          // directory's refreshed map must not hide a fresh constraint
          // from the second) before re-claiming a slot — retrying blind
          // would publish data the new constraint never checked. Any
          // abort reclaims the whole payload, not just the violating
          // directory.
          val baseline = validated
          // ONE constraint read covers the whole loop AND becomes the
          // next baseline — a constraint committed between a per-
          // directory re-read and a post-loop re-read would be marked
          // validated without ever being checked against the payload.
          val nowConstraints = currentConstraints
          try names.foreach(n =>
            revalidatePayload(n, baseline, Some(nowConstraints)))
          catch { case t: Throwable =>
            names.foreach(n => fs.delete(new Path(root, n), true)); throw t
          }
          validated = nowConstraints
          // ...or an EVOLVING append: re-merge the schema so the
          // retried manifest never hides the winner's columns (loud on
          // a type conflict — the payload's physical types are final).
          // Latest is read ONCE and the next attempt targets exactly
          // its successor: anything landing after this read makes the
          // next publish fail and re-enter this reconciliation.
          val upTo = latestVersion
          try schemaJson = reconcileSchemaOnRetry(upTo, names.head, df.schema)
          catch { case t: Throwable =>
            names.foreach(n => fs.delete(new Path(root, n), true)); throw t
          }
          expected = upTo + 1
      }
    }
    -1 // unreachable
  }

  /** Re-check the written payload `name` against constraints that
    * appeared since `validated` was read (retry-loop support): returns
    * the now-current constraint set, or deletes the payload and throws
    * if a new constraint rejects it. Callers revalidating SEVERAL
    * directories must pass ONE `nowSnapshot` read before the loop and
    * assign exactly that snapshot afterwards — re-reading per directory
    * (or once more after the loop) opens a window where a constraint
    * committed between the reads is marked validated without any
    * directory ever being checked against it.
    */
  private def revalidatePayload(name: String,
                                validated: Map[String, String],
                                nowSnapshot: Option[Map[String, String]] = None)
      : Map[String, String] = {
    val now = nowSnapshot.getOrElse(currentConstraints)
    val fresh = now.filter { case (n, ex) => !validated.get(n).contains(ex) }
    if (fresh.nonEmpty) {
      val latestNow = latestVersion
      val p2l =
        if (latestNow < 0) Map.empty[String, String]
        else renameMap(tableSchemaAt(latestNow)).map(_.swap)
      val (_, _, violations) =
        statsOf(new Path(root, name).toString, fresh, p2l)
      val broken = violations.filter(_._2 > 0L)
      if (broken.nonEmpty) {
        fs.delete(new Path(root, name), true)
        throw new IllegalArgumentException(
          s"retried write to $dir violates CHECK constraint(s) added " +
            s"concurrently: " + broken.map { case (n, c) =>
              s"$n [${fresh(n)}] on $c row(s)" }.mkString("; "))
      }
    }
    now
  }

  /** EXACTLY-ONCE streaming append — the Delta `txnAppId`/`txnVersion`
    * idempotence protocol: commit `df` tagged (`app`, `batchId`) and
    * SKIP the write (returning None) when a commit with the same app
    * and a batch id at or above `batchId` already exists. Structured
    * Streaming's foreachBatch replays only the last uncommitted batch
    * with monotonically increasing ids, so "newest committed batch id
    * for this app >= mine" exactly identifies a replay — a crash
    * between the table commit and the checkpoint commit heals as a
    * skip instead of a double-append. Interleaved commits by OTHER
    * writers (plain appends, other apps) are walked past when looking
    * up this app's newest batch id; the walk is bounded in practice by
    * the interleave distance between this app's commits.
    */
  def appendStreamBatch(df0: DataFrame, app: String, batchId: Long,
                        maxRetries: Int = 5): Option[Int] = {
    require(app.nonEmpty, "app id must be non-empty")
    if (lastCommittedBatch(app).exists(_ >= batchId)) return None
    val base = latestVersion
    val (df, schemaJson0) = alignedForAppend(df0, base)
    val armed = Some(maintenanceArmed(base))
    var schemaJson = schemaJson0
    var validated = if (base < 0) Map.empty[String, String]
      else snapshotAt(base).constraints
    val parts = writePayloadAuto(df, base + 1, validated, base)
    val names = parts.map(_._1)
    var attempt = 0
    // Slot discipline identical to appendWithRetry: attempt only the
    // successor of a version this writer has reconciled against.
    var expected = base + 1
    while (true) {
      try {
        publish(Commit(expected, "append", names, Seq.empty,
          parts.map(_._2).sum, System.currentTimeMillis(),
          Some((app, batchId)),
          addedStats = parts.map(p => p._1 -> p._3).toMap,
          addedRows = parts.map(p => p._1 -> p._2).toMap,
          schemaJson = Some(schemaJson)))
        runPostCommitMaintenance(expected, armed)
        return Some(expected)
      } catch {
        case e: IllegalStateException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
          // The winner might have been a replay racer of the SAME
          // batch: re-check before re-publishing, dropping our orphan
          // payload if the batch landed.
          if (lastCommittedBatch(app).exists(_ >= batchId)) {
            names.foreach(n => fs.delete(new Path(root, n), true))
            return None
          }
          // ...or an addConstraint / evolving append: re-validate and
          // re-merge the schema before re-claiming (same multi-
          // directory baseline-and-reclaim discipline as
          // appendWithRetry).
          val baseline = validated
          try {
            // same single-read discipline as appendWithRetry
            val nowConstraints = currentConstraints
            names.foreach(n =>
              revalidatePayload(n, baseline, Some(nowConstraints)))
            validated = nowConstraints
            val upTo = latestVersion
            schemaJson = reconcileSchemaOnRetry(upTo, names.head, df.schema)
            expected = upTo + 1
          } catch { case t: Throwable =>
            names.foreach(n => fs.delete(new Path(root, n), true)); throw t
          }
      }
    }
    None // unreachable
  }

  /** The newest committed batch id for `app`: checkpoints fold every
    * app's newest txn tag into a `txns` map (exactly Delta's
    * checkpointed SetTransaction actions), so the lookup replays only
    * the delta tail since the nearest checkpoint — O(interval), never
    * a full-log walk, even for an app that has never committed.
    */
  private def lastCommittedBatch(app: String): Option[Long] = {
    val latest = latestVersion
    if (latest < 0) None else snapshotAt(latest).txns.get(app)
  }

  /** The newest batch id committed under writer-app `app`, if any —
    * Delta's `txnVersion(appId)` lookup, public so streaming sinks can
    * refuse a configuration that would silently skip data (a reused
    * app id with a fresh checkpoint replays batch ids from 0, and the
    * idempotence protocol would discard every one of them as a replay).
    */
  def lastTxnBatch(app: String): Option[Long] = lastCommittedBatch(app)

  /** Commit `df` as a new version REPLACING the active set. Old
    * versions stay readable until [[vacuum]].
    */
  def overwrite(df: DataFrame): Int = {
    val base = latestVersion
    val v = base + 1
    val parts = writePayloadAuto(df, v, currentConstraints, base,
      keepPhysical = false)
    val prevActive = if (v == 0) Seq.empty else activeAt(v - 1)
    publish(Commit(v, "overwrite", parts.map(_._1), prevActive,
      parts.map(_._2).sum, System.currentTimeMillis(),
      addedStats = parts.map(p => p._1 -> p._3).toMap,
      addedRows = parts.map(p => p._1 -> p._2).toMap,
      schemaJson = Some(df.schema.pipe(graft.sources.SchemaCompat.nullableJson))))
    v
  }

  /** Union-read a set of this table's data directories (mergeSchema,
    * same as [[readAt]]).
    */
  private def readDirs(dirs: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(dirs.map(n => new Path(root, n).toString): _*)

  /** [[readDirs]] with the TABLE schema imposed: directories missing an
    * evolved column read it as null, and a dropped column's residual
    * bytes stay hidden — the read every row-level mutation must use
    * (a physical mergeSchema read would crash on evolved columns the
    * touched directories never held, and resurrect dropped ones).
    */
  private def readDirsAs(schema: org.apache.spark.sql.types.StructType,
                         dirs: Seq[String]): DataFrame = {
    // column mapping: files spell physical names — read them, serve
    // logical (identity for never-renamed tables)
    val l2p = renameMap(schema)
    val raw = spark.read.schema(physicalize(schema))
      .parquet(dirs.map(n => new Path(root, n).toString): _*)
    if (l2p.isEmpty) raw else raw.withColumnsRenamed(l2p.map(_.swap))
  }

  /** The deletion-vector state of a version: data directory → the DV
    * sidecar directories whose (file, row-position) entries hide rows
    * from it. Package-private: the DSv2 scan consults it to route
    * DV-bearing snapshots through the folding read path.
    */
  private[graft] def dvsAt(v: Int): Map[String, Seq[String]] =
    snapshotAt(v).dvs

  /** The column-mapping state of a version (logical → physical, only
    * where differing; empty for never-renamed tables) — the DSv2 scan
    * consults it to route renamed snapshots through the aliasing read
    * path, exactly like [[dvsAt]] routes DV-bearing ones.
    */
  private[graft] def renamesAt(v: Int): Map[String, String] =
    snapshotAt(v).schemaJson.map(j => renameMap(schemaFromJson(j)))
      .getOrElse(Map.empty)

  /** Per-directory DV-hidden row counts of a version (empty when no
    * DVs are outstanding) — the DSv2 scan's effective-row arithmetic
    * (limit-prefix coverage, inline-position budgeting) without any
    * sidecar read.
    */
  private[sources] def dvRowCountsAt(v: Int): Map[String, Long] =
    snapshotAt(v).dvRowsByDir

  /** The bitmap paths hiding rows of the given directories at a
    * version, keyed `"<dir>/<file>"` — what the vectorized DV read
    * path ships in its one-file input partitions. Metadata-sized
    * (paths, never positions: each EXECUTOR decodes exactly the
    * bitmaps of the file it reads), so there is no inline budget, no
    * driver collect, and no fallback — a table's total hidden count
    * never concentrates on one machine.
    */
  private[sources] def dvBitmapPaths(v: Int, dirs: Seq[String])
      : Map[String, Seq[String]] = {
    val dvs = snapshotAt(v).dvs
    val sidecars = dirs.flatMap(dvs.get).flatten.distinct
    if (sidecars.isEmpty) return Map.empty
    // manifests are immutable per version: repeated plans of the same
    // DV'd snapshot serve from the JVM-global cache, no sidecar
    // re-listing. The key carries the SIDECAR names (UUID-suffixed),
    // not just the version — a DROP + re-CREATE at the same path
    // reuses versions but can never reuse a sidecar name.
    VersionedTable.dvPathsCached(
      s"$dir@${sidecars.sorted.mkString("+")}@${dirs.sorted.mkString(",")}") {
      GraftDvBitmap.pathsByFile(spark, root, sidecars, dirs)
    }
  }

  /** A DV sidecar frame: the (directory, file, row-position) triples of
    * every row the given sidecars hide — decoded distributedly from
    * the per-file bitmaps (the anti-join fold consumers' view).
    */
  private def dvFrame(names: Seq[String]): DataFrame =
    GraftDvBitmap.asFrame(spark, root, names)

  /** Read `dirs` with DELETION VECTORS folded — the merge-on-read path:
    * directories without DVs read untouched (the common case pays
    * nothing); DV-bearing directories read with the parquet reader's
    * `_metadata` row identity (file path + row index) and anti-join
    * the sidecar's hidden positions away. The sidecar is deleted-rows-
    * sized (AQE broadcasts it when small), so a selective merge-on-read
    * DELETE costs its matches at read time instead of a directory
    * rewrite at write time — OPTIMIZE compacts the debt away (its
    * rewrite reads folded and drops the rewritten directories' DV
    * entries). `schema` imposed when given, mergeSchema otherwise,
    * matching [[readDirsAs]]/[[readDirs]].
    */
  private def readDirsFolded(schema: Option[org.apache.spark.sql.types.StructType],
                             dirs: Seq[String],
                             dvs: Map[String, Seq[String]],
                             physToLogical: Map[String, String] = Map.empty)
      : DataFrame = {
    import org.apache.spark.sql.functions.{col, element_at, split}
    // column mapping: an imposed schema carries its own map; a
    // mergeSchema read gets the caller's current physical→logical map
    val p2l = schema.map(sc => renameMap(sc).map(_.swap))
      .getOrElse(physToLogical)
    def alias(df: DataFrame): DataFrame =
      if (p2l.isEmpty) df else df.withColumnsRenamed(p2l)
    def read(ds: Seq[String]): DataFrame = schema match {
      case Some(s) => spark.read.schema(physicalize(s))
        .parquet(ds.map(n => new Path(root, n).toString): _*)
      case None => spark.read.option("mergeSchema", "true")
        .parquet(ds.map(n => new Path(root, n).toString): _*)
    }
    val dvd = dirs.filter(dvs.contains)
    if (dvd.isEmpty) return alias(read(dirs))
    val clean = dirs.filterNot(dvs.contains)
    val hidden = dvFrame(dvd.flatMap(dvs).distinct)
    val tagged = read(dvd)
      .withColumn("__graft_d",
        element_at(split(col("_metadata.file_path"), "/"), -2))
      .withColumn("__graft_f",
        element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn("__graft_i", col("_metadata.row_index"))
    val folded = tagged.join(hidden,
      tagged("__graft_d") === hidden("__graft_dv_dir") &&
        tagged("__graft_f") === hidden("__graft_dv_file") &&
        tagged("__graft_i") === hidden("__graft_dv_pos"), "left_anti")
      .drop("__graft_d", "__graft_f", "__graft_i")
    alias(if (clean.isEmpty) folded
      else read(clean).unionByName(folded, allowMissingColumns = schema.isEmpty))
  }

  /** [[readDirsFolded]] RETAINING the source file path as column `tag`
    * (and, when `withPos`, the row index as `posTag`) — the mutation
    * discovery scans need the file identity of each surviving row, and
    * `input_file_name()` is only reliable BEFORE a join/exchange, so
    * the identity is captured from the parquet reader's `_metadata` on
    * the scan side of the DV anti-join.
    */
  private def readDirsFoldedTagged(
      schema: Option[org.apache.spark.sql.types.StructType],
      dirs: Seq[String], dvs: Map[String, Seq[String]],
      tag: String, posTag: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, element_at, split}
    val p2l = schema.map(sc => renameMap(sc).map(_.swap)).getOrElse(Map.empty)
    def alias(df: DataFrame): DataFrame =
      if (p2l.isEmpty) df else df.withColumnsRenamed(p2l)
    def read(ds: Seq[String]): DataFrame = {
      val r = schema match {
        case Some(s) => spark.read.schema(physicalize(s))
          .parquet(ds.map(n => new Path(root, n).toString): _*)
        case None => spark.read.option("mergeSchema", "true")
          .parquet(ds.map(n => new Path(root, n).toString): _*)
      }
      val t = r.withColumn(tag, col("_metadata.file_path"))
      posTag.fold(t)(pt => t.withColumn(pt, col("_metadata.row_index")))
    }
    val dvd = dirs.filter(dvs.contains)
    if (dvd.isEmpty) return alias(read(dirs))
    val clean = dirs.filterNot(dvs.contains)
    val hidden = dvFrame(dvd.flatMap(dvs).distinct)
    val tagged = read(dvd)
      .withColumn("__graft_d", element_at(split(col(tag), "/"), -2))
      .withColumn("__graft_f", element_at(split(col(tag), "/"), -1))
      .withColumn("__graft_i",
        posTag.map(col).getOrElse(col("_metadata.row_index")))
    val folded = tagged.join(hidden,
      tagged("__graft_d") === hidden("__graft_dv_dir") &&
        tagged("__graft_f") === hidden("__graft_dv_file") &&
        tagged("__graft_i") === hidden("__graft_dv_pos"), "left_anti")
      .drop("__graft_d", "__graft_f", "__graft_i")
    // alias on the DV branch too: a caller's condition addresses the
    // LOGICAL names whether or not sidecars are outstanding
    alias(if (clean.isEmpty) folded
      else read(clean).unionByName(folded, allowMissingColumns = schema.isEmpty))
  }

  /** Test seam: the candidate directories the last [[delete]]/[[update]]
    * discovery scan actually read (after stats pruning) — specs pin
    * that a stat-expressible predicate bounds discovery to the
    * manifest-admitted subset instead of the whole active set.
    */
  private[graft] var lastDiscoveryDirs: Seq[String] = Nil

  /** Stats-pruned candidate set for a row-level mutation's
    * touched-directory DISCOVERY scan (Delta's data-skipping
    * DELETE/UPDATE): split the predicate into conjuncts, translate
    * each independently to a v1 [[org.apache.spark.sql.sources.Filter]]
    * ([[org.apache.spark.sql.execution.datasources.DataSourceStrategy
    * .translateFilter]] — per-conjunct, so one untranslatable term
    * never discards the others' pruning power), fold the translated
    * terms into stat-domain ranges and null-ness facts
    * ([[GraftVtFilters]] — the SAME translation the DSv2 scan pushes),
    * and keep only the active directories whose recorded bounds can
    * intersect them ([[pruneActiveAll]]). Pruning is a superset
    * guarantee at directory granularity, so the discovery scan's
    * row-level filter stays authoritative; a predicate with no
    * stat-expressible conjunct falls back to the full active set.
    * At 100 TB this is the difference between a `DELETE WHERE day = X`
    * scanning one ingestion-day's directories and scanning the table
    * to discover the 1% it will rewrite.
    */
  private def discoveryCandidates(condition: org.apache.spark.sql.Column,
                                  schema: org.apache.spark.sql.types.StructType,
                                  active: Seq[String],
                                  version: Int): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGe, In => CIn, InSet => CInSet, IsNotNull => CNotNull, IsNull => CIsNull, LessThan => CLt, LessThanOrEqual => CLe, Literal => CLit}
    import org.apache.spark.sql.types._
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // Top-level column name of a resolved attribute reference (the
    // condition is ANALYZED against the table schema below, so names
    // are resolved and implicit casts sit on the literal side);
    // anything else is not stat-indexable.
    def attrOf(e: Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        Some(a.name)
      case _ => None
    }
    // A LITERAL's value in the manifest-stat domain. Internal values:
    // timestamps are already epoch micros (the stats' exact unit);
    // NTZ micros convert through the session zone, matching how
    // [[statsOf]] recorded them (exact when writer and reader agree —
    // this engine pins UTC; a mismatched pair keeps conservatively at
    // the comparison site like any other NTZ consumer). Non-literal
    // FOLDABLE expressions (the analyzer's Cast-on-the-literal-side
    // coercions) evaluate once on the driver and recurse.
    def litOf(e: Expression): Option[Any] = e match {
      case CLit(null, _) => None
      case CLit(v, t) => t match {
        case ByteType => Some(v.asInstanceOf[Byte].toLong)
        case ShortType => Some(v.asInstanceOf[Short].toLong)
        case IntegerType => Some(v.asInstanceOf[Int].toLong)
        case LongType => Some(v.asInstanceOf[Long])
        case FloatType => Some(v.asInstanceOf[Float].toDouble)
        case DoubleType => Some(v.asInstanceOf[Double])
        case StringType => Some(v.toString)
        case TimestampType => Some(v.asInstanceOf[Long])
        case TimestampNTZType =>
          val zone = java.time.ZoneId.of(
            spark.sessionState.conf.sessionLocalTimeZone)
          val micros = v.asInstanceOf[Long]
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
          val i = ldt.atZone(zone).toInstant
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case _ => None
      }
      case other if other.foldable =>
        try litOf(CLit(other.eval(null), other.dataType))
        catch { case _: Exception => None }
      case _ => None
    }
    type StatRange = (String, Option[Any], Option[Any])
    def ranged(a: Expression, l: Expression,
               mk: (String, Any) => StatRange)
        : (Seq[StatRange], Seq[String], Seq[String]) =
      ((for { n <- attrOf(a); v <- litOf(l) } yield mk(n, v)).toSeq, Nil, Nil)
    // One conjunct's contribution: stat ranges, IS NOT NULL columns,
    // IS NULL columns. Strict bounds relax to inclusive (superset —
    // the discovery scan's row filter stays authoritative); reversed
    // operand orders flip; anything else contributes nothing.
    def facts(e: Expression): (Seq[StatRange], Seq[String], Seq[String]) = e match {
      case CEq(a, l) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, Some(v), Some(v)))
      case CEq(l, a) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, Some(v), Some(v)))
      case CGt(a, l) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, Some(v), None))
      case CGe(a, l) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, Some(v), None))
      case CLt(a, l) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, None, Some(v)))
      case CLe(a, l) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, None, Some(v)))
      case CGt(l, a) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, None, Some(v)))
      case CGe(l, a) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, None, Some(v)))
      case CLt(l, a) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, Some(v), None))
      case CLe(l, a) if attrOf(a).isDefined =>
        ranged(a, l, (n, v) => (n, Some(v), None))
      case CIn(a, vs) if attrOf(a).isDefined && vs.nonEmpty =>
        // envelope under the SAME order the stats prune with — null
        // members never match (SQL IN) and drop; an untranslatable
        // member keeps conservatively
        val bs = vs.map(litOf)
        val nonNullLits = vs.count { case CLit(null, _) => false; case _ => true }
        if (bs.flatten.size < nonNullLits || bs.flatten.isEmpty) (Nil, Nil, Nil)
        else {
          val bounds = bs.flatten
          val lo = bounds.reduce((x, y) => if (cmpBound(x, y) <= 0) x else y)
          val hi = bounds.reduce((x, y) => if (cmpBound(x, y) >= 0) x else y)
          (Seq((attrOf(a).get, Some(lo), Some(hi))), Nil, Nil)
        }
      case s: CInSet if attrOf(s.child).isDefined && s.hset.nonEmpty =>
        // hset holds INTERNAL values — wrap with the raw constructor
        // (Literal.create expects external ones)
        val lits = s.hset.toSeq.filter(_ != null).map(v =>
          litOf(CLit(v, s.child.dataType)))
        if (lits.exists(_.isEmpty) || lits.isEmpty) (Nil, Nil, Nil)
        else {
          val bounds = lits.flatten
          val lo = bounds.reduce((x, y) => if (cmpBound(x, y) <= 0) x else y)
          val hi = bounds.reduce((x, y) => if (cmpBound(x, y) >= 0) x else y)
          (Seq((attrOf(s.child).get, Some(lo), Some(hi))), Nil, Nil)
        }
      case CNotNull(a) => (Nil, attrOf(a).toSeq, Nil)
      case CIsNull(a) => (Nil, Nil, attrOf(a).toSeq)
      case _ => (Nil, Nil, Nil)
    }
    // The condition is ANALYZED against an empty frame of the table
    // schema (pure driver-side — nothing is listed or read): names
    // resolve, implicit casts land on the literal side where litOf
    // folds them. A condition that fails analysis here keeps the full
    // active set — the real discovery scan then raises the proper
    // error.
    val condExpr: Option[Expression] =
      try {
        val probe = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        probe.filter(condition).queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
      } catch { case _: Exception => None }
    val all = condExpr.toSeq.flatMap(conjuncts)
      .map(c => try facts(c) catch { case _: Exception => (Nil, Nil, Nil) })
    val ranges = all.flatMap(_._1)
    val notNull = all.flatMap(_._2)
    val isNull = all.flatMap(_._3)
    val kept =
      if (ranges.isEmpty && notNull.isEmpty && isNull.isEmpty) active
      else pruneActiveAll(ranges, Some(version), notNull, isNull)._1
    lastDiscoveryDirs = kept
    kept
  }

  /** Delta-style MERGE — copy-on-write upsert in ONE atomic commit:
    * every source row replaces the target row with the same `keys`
    * (when matched → update, whole-row) or is inserted (when not
    * matched). Only TOUCHED directories are rewritten: the source's
    * [min, max] on EVERY indexable key is computed first (one scalar
    * agg) and [[pruneActiveAll]] splits the active set conjunctively —
    * a directory whose recorded range on ANY key cannot intersect the
    * source's span provably holds no matching row and survives the
    * merge untouched. At 100 TB
    * this is the difference between rewriting an ingestion-day and
    * rewriting the table; after an [[optimize]] clustered on the merge
    * key, touched ≈ the key span's chunks exactly (clustering layout
    * and merge write-amplification are the same decision, as in Delta).
    *
    * Old versions still read the pre-merge rows until [[vacuum]]. The
    * caller must ensure source keys are UNIQUE (Delta raises on
    * multi-match; here the last-writer row would be both kept and
    * joined ambiguously — same contract, enforced upstream). Source
    * schema must equal the snapshot schema up to column order.
    *
    * `writeChangeData = true` additionally persists the commit's exact
    * row-level change feed (Delta's CDC files) next to the data:
    * matched target rows as `update_preimage`, their source
    * replacements as `update_postimage`, unmatched source rows as
    * `insert` — [[changes]] then serves the merge precisely instead of
    * the coarse added/removed synthesis. Costs two extra joins over the
    * touched directories at write time; off by default.
    */
  def merge(source: DataFrame, keys: Seq[String],
            writeChangeData: Boolean = false, maxRetries: Int = 5,
            useDeletionVectors: Boolean = false): Int = {
    import org.apache.spark.sql.functions.{col, lit}
    require(keys.nonEmpty, "merge needs at least one key column")
    keys.foreach(k => require(source.columns.contains(k),
      s"merge key `$k` missing from source (has: ${source.columns.mkString(", ")})"))
    val latest = latestVersion
    if (latest < 0) return append(source) // empty table: all inserts
    val snapCols = read().columns
    require(source.columns.sorted.sameElements(snapCols.sorted),
      s"merge source schema ${source.columns.sorted.mkString(",")} != " +
        s"table schema ${snapCols.sorted.mkString(",")}")
    val srcAligned = source.select(snapCols.map(col).toIndexedSeq: _*)

    // Touched-directory pruning over EVERY indexable merge key, in the
    // stat domain ([[mergeSpanState]]) — conjunctive, matching the
    // equality semantics: a target row matches only when ALL keys
    // equal, so a directory is touched only when EVERY key's recorded
    // range can intersect the source's span ([[pruneActiveAll]]); a
    // multi-key merge therefore never rewrites a directory a single
    // key's span alone would admit.
    val snapState = snapshotAt(latest)
    val active = snapState.active
    val spanState = mergeSpanState(source, keys)
    val touched: Seq[String] = spanState match {
      case None => active
      case Some(None) => Seq.empty
      case Some(Some(preds)) => pruneActiveAll(preds, Some(latest))._1
    }
    // Align touched directories to the SNAPSHOT schema: an evolving
    // append means an old directory can predate a column — pad it with
    // typed nulls so a merge whose key span only touches old data still
    // runs (and unions cleanly with the source).
    // the LOG schema, not read().schema: the read aliases physical →
    // logical and drops the column-mapping metadata the rename paths
    // need (types and names are identical)
    val snapSchema = tableSchemaAt(latest)
    val mergeL2p = renameMap(snapSchema)
    def alignTo(df: DataFrame): DataFrame =
      snapCols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(snapSchema(c).dataType)))
        .select(snapCols.map(col).toIndexedSeq: _*)
    // Which of a concurrent winner's added directories may hold rows
    // matching the merge keys: its recorded stats tested against the
    // source's conjunctive span, same rule as the touched prune.
    // (Hoisted above the merge-on-read branch — both commit shapes ride
    // the same disjointness test.)
    val addedMayMatch = mergeAddedMayMatch(spanState, mergeL2p)
    val srcKeys = source.select(keys.map(col).toIndexedSeq: _*)
    if (useDeletionVectors && touched.nonEmpty)
      mergeViaDv(srcAligned, srcKeys, keys, latest, snapSchema, mergeL2p,
        snapState.dvs, snapState.constraints, touched, addedMayMatch,
        maxRetries) match {
        case Some(v) => return v
        case None => () // matched fraction too large: rewrite pays off
      }
    val touchedData =
      if (touched.isEmpty) None
      else Some(alignTo(readDirsFolded(None, touched, snapState.dvs,
        mergeL2p.map(_.swap))))
    val newData = touchedData match {
      case Some(td) =>
        td.join(srcKeys, keys, "left_anti").unionByName(srcAligned)
      case None => srcAligned
    }
    val v = latest + 1
    val (name, rows, st) = writePayload(newData, v, snapState.constraints,
      renameMap(snapSchema))
    if (touched.isEmpty && rows == 0L) {
      // Empty/all-null-key source touching nothing: a no-op. Committing
      // would add a stat-less empty directory every prune keeps forever.
      fs.delete(new Path(root, name), true)
      return latest
    }
    val cdfName =
      if (!writeChangeData) None
      else {
        val n = f"cdf-v$v%05d-${java.util.UUID.randomUUID().toString.take(8)}"
        val tgtKeys = touchedData.map(_.select(keys.map(col).toIndexedSeq: _*))
        val pre = touchedData.map(_.join(srcKeys, keys, "left_semi")
          .withColumn("_change_type", lit("update_preimage")))
        val post = tgtKeys.map(tk => srcAligned.join(tk, keys, "left_semi")
          .withColumn("_change_type", lit("update_postimage")))
        val ins = tgtKeys.fold(srcAligned)(tk => srcAligned.join(tk, keys, "left_anti"))
          .withColumn("_change_type", lit("insert"))
        toPhysicalDf((pre.toSeq ++ post.toSeq :+ ins).reduce(_.unionByName(_)),
          mergeL2p).write.parquet(new Path(root, n).toString)
        Some(n)
      }
    publishMutationRetrying("merge", latest, maxRetries, touched,
      revalidate = Seq(name), addedMayMatch,
      mkCommit = vv => Commit(vv, "merge", Seq(name), touched, rows,
        System.currentTimeMillis(), addedStats = Map(name -> st),
        cdf = cdfName, addedRows = Map(name -> rows)),
      validated0 = snapState.constraints)
  }

  /** Conjunctive per-key span of a merge source in the STAT domain —
    * the shared foundation of touched-directory pruning and the
    * concurrent-add conflict test for every merge commit shape.
    * `None` = unprovable (an unindexable key TYPE contributes no
    * predicate — any concurrently added data may match); `Some(None)`
    * = provably matchless (a key whose source values are ALL NULL —
    * SQL equality never matches null, so no source row can match any
    * target row); `Some(Some(preds))` = the conjunctive bounds. All
    * spans ride ONE scalar aggregate over the source.
    */
  private def mergeSpanState(source: DataFrame, keys: Seq[String])
      : Option[Option[Seq[(String, Option[Any], Option[Any])]]] =
    mergeSpanAndDupState(source, keys, needDup = false)._1

  /** The merge source's key-span state and (optionally) its
    * duplicate-key flag in ONE pass. When `needDup` is set, the span
    * min/max fold over the `groupBy(keys)` counts — min over distinct
    * keys equals min over rows, and the keyed shuffle is exactly the
    * one the duplicate gate paid as its own separate job before the
    * fusion (one full source pass per merge removed). Without
    * `needDup` (insert-only merges, the CDC append shape) the span
    * stays the cheap global aggregate: map-side partials to one row,
    * no keyed shuffle.
    */
  private def mergeSpanAndDupState(source: DataFrame, keys: Seq[String],
                                   needDup: Boolean)
      : (Option[Option[Seq[(String, Option[Any], Option[Any])]]], Boolean) = {
    import org.apache.spark.sql.functions.{col, count, lit, max => fmax, min => fmin, unix_micros}
    import org.apache.spark.sql.types._
    val keyDomain: Seq[(String, Option[org.apache.spark.sql.Column])] =
      keys.map { k =>
        k -> (source.schema(k).dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            Some(col(k).cast("long"))
          case TimestampType | TimestampNTZType =>
            Some(unix_micros(col(k).cast("timestamp")))
          case FloatType | DoubleType => Some(col(k).cast("double"))
          case StringType => Some(col(k))
          case _ => None
        })
      }
    val indexable = keyDomain.collect { case (k, Some(c)) => (k, c) }
    if (indexable.isEmpty) {
      // span unprovable (unindexable key type); the duplicate gate
      // still needs its own bounded probe when asked for
      val dups = needDup &&
        source.groupBy(keys.map(col): _*).count()
          .filter(col("count") > 1).limit(1).count() > 0
      (None, dups)
    } else {
      val spanAggs = indexable.flatMap { case (_, c) => Seq(fmin(c), fmax(c)) }
      val (row, dups) =
        if (!needDup) {
          (source.agg(spanAggs.head, spanAggs.tail.toIndexedSeq: _*).head(),
            false)
        } else {
          val grouped = source.groupBy(keys.map(col): _*)
            .agg(count(lit(1)).as("__graft_kn"))
          val aggs = spanAggs :+ fmax(col("__graft_kn"))
          val r = grouped.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
          val dupIdx = 2 * indexable.size
          (r, !r.isNullAt(dupIdx) && r.getLong(dupIdx) > 1L)
        }
      val spans = indexable.zipWithIndex.map { case ((k, _), i) =>
        if (row.isNullAt(2 * i)) None
        else Some((k, Some(row.get(2 * i)): Option[Any],
          Some(row.get(2 * i + 1)): Option[Any]))
      }
      // an all-null key: no matches
      if (spans.exists(_.isEmpty)) (Some(None), dups)
      else (Some(Some(spans.flatten)), dups)
    }
  }

  /** Stat test of a concurrent winner's added directories against a
    * merge span — the retry protocol's added-data conflict rule,
    * shared by every merge commit shape.
    */
  private def mergeAddedMayMatch(
      spanState: Option[Option[Seq[(String, Option[Any], Option[Any])]]],
      mergeL2p: Map[String, String]): Commit => Seq[String] = c =>
    spanState match {
      case Some(None) => Seq.empty // pure insert: nothing can match
      case None => c.added // unindexable keys: unprovable, conservative
      case Some(Some(preds)) => c.added.filter { d =>
        c.addedStats.get(d) match {
          case None => true // no stats recorded: conservative
          case Some(st) => preds.forall { case (cn0, lo, hi) =>
            val cn = mergeL2p.getOrElse(cn0, cn0)
            st.get(cn) match {
              case None => true
              case Some(cs) if cs.min == null => false // all-null key: no match
              case Some(cs) =>
                !(lo.exists(l => cmpBound(cs.max, normBound(l)) < 0) ||
                  hi.exists(h => cmpBound(cs.min, normBound(h)) > 0))
            }
          }
        }
      }
    }

  /** The FULL Delta-shaped MERGE clause surface in one atomic commit:
    * `WHEN MATCHED [AND c] THEN UPDATE SET .../DELETE`, `WHEN NOT
    * MATCHED [AND c] THEN INSERT ...`, `WHEN NOT MATCHED BY SOURCE
    * [AND c] THEN UPDATE SET .../DELETE` — first-match-wins within
    * each group, a target row no clause claims is carried through
    * unchanged, a source row no INSERT claims is dropped.
    *
    * The join is ONE full-outer join on the same-name equality `keys`
    * (the same contract as [[merge]] — per-key conjunctive stat
    * pruning and the disjoint-writer retry both hang off the key
    * spans), with each side packed into a struct named by its alias so
    * clause expressions reference `t.col` / `s.col` naturally and the
    * keys stay available unqualified. Clause conditions evaluate as
    * one CASE chain per row class — no per-clause re-scan; the
    * evaluated join is persisted and every output (payload, deletion
    * vector, CDC, policy counts) projects from it.
    *
    * Commit shapes, decided by what the clauses actually DID:
    *   - nothing affected, nothing inserted → no-op (no commit);
    *   - inserts only → append-shaped commit (touched directories are
    *     provably unchanged — rewriting them would be pure write
    *     amplification);
    *   - `useDeletionVectors` and the affected rows pass the same
    *     cumulative-fraction policy as delete/update → merge-on-read:
    *     ONE sidecar hides every updated/deleted target row, the
    *     payload appends post-images + inserts, data files stay
    *     byte-identical, exact CDC always persists;
    *   - otherwise copy-on-write: touched directories are rewritten
    *     (carried rows + post-images + inserts).
    *
    * `WHEN NOT MATCHED BY SOURCE` reads the WHOLE active set (any
    * target row may be claimed), so span pruning is off and any
    * concurrent add conflicts — the price of the clause, same as
    * Delta. A target row matched by MORE than one source row fails
    * loudly (the update/delete/carry outcome would be
    * nondeterministic); dedupe the source on the keys first.
    *
    * `evolveSchema` (Delta's withSchemaEvolution; SQL spelling
    * `MERGE WITH SCHEMA EVOLUTION INTO ...`): source columns absent
    * from the table are added — nullable, metadata-only, the
    * [[addColumns]] widening composed into the MERGE COMMIT ITSELF
    * (atomic: a failed or no-op merge leaves no orphan schema change).
    * Star forms then expand over the SOURCE's columns: `UPDATE SET *`
    * leaves table-only columns at their target values, `INSERT *`
    * fills them with null; existing files read the new columns as
    * null. Adding a name whose bytes still live in active directories
    * (a dropped column, a renamed column's physical name) fails
    * loudly — same residue rule as [[addColumns]]. Existing columns
    * the source spells WIDER (the [[widenColumn]] allowlist) widen on
    * the same commit; any other type difference is not evolution and
    * the images cast to the table's type, as always. The reference's
    * driver-side schema reconciliation
    * (`Second Experiment/GPT 5 nano.py:106-175` —
    * add-missing-as-typed-null, reorder) is this feature's ancestor.
    */
  def mergeClauses(source: DataFrame, keys: Seq[String],
                   matched: Seq[MergeClause],
                   notMatched: Seq[MergeClause],
                   notMatchedBySource: Seq[MergeClause] = Nil,
                   targetAlias: String = "t", sourceAlias: String = "s",
                   writeChangeData: Boolean = false, maxRetries: Int = 5,
                   useDeletionVectors: Boolean = false,
                   evolveSchema: Boolean = false,
                   txn: Option[(String, Long)] = None): Int = {
    import org.apache.spark.sql.functions.{coalesce, col, element_at, lit, split, struct, sum, when}
    import MergeAction.{Delete => MDelete, Insert => MInsert, Update => MUpdate}
    require(keys.nonEmpty, "merge needs at least one key column")
    keys.foreach(k => require(source.columns.contains(k),
      s"merge key `$k` missing from source (has: ${source.columns.mkString(", ")})"))
    require(matched.nonEmpty || notMatched.nonEmpty || notMatchedBySource.nonEmpty,
      "mergeClauses needs at least one WHEN clause")
    matched.foreach(c => require(!c.action.isInstanceOf[MInsert],
      "WHEN MATCHED supports UPDATE/DELETE, not INSERT"))
    notMatchedBySource.foreach(c => require(!c.action.isInstanceOf[MInsert],
      "WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE, not INSERT"))
    notMatched.foreach(c => require(c.action.isInstanceOf[MInsert],
      "WHEN NOT MATCHED supports INSERT only"))
    def lastOnlyUnconditioned(cs: Seq[MergeClause], label: String): Unit =
      cs.dropRight(1).foreach(c => require(c.condition.isDefined,
        s"only the last $label clause may omit its AND condition — " +
          "clauses after an unconditioned one are unreachable"))
    lastOnlyUnconditioned(matched, "WHEN MATCHED")
    lastOnlyUnconditioned(notMatched, "WHEN NOT MATCHED")
    lastOnlyUnconditioned(notMatchedBySource, "WHEN NOT MATCHED BY SOURCE")
    keys.foreach(k => Seq(targetAlias, sourceAlias).foreach(a =>
      require(!a.equalsIgnoreCase(k),
        s"merge alias `$a` collides with key column `$k` — alias the " +
          "table/source explicitly in the MERGE statement")))
    require(!targetAlias.equalsIgnoreCase(sourceAlias),
      s"target and source aliases must differ (both `$targetAlias`)")

    // Idempotent REPLAY protocol (Delta's txnAppId/txnVersion, the
    // appendStreamBatch rule applied to merges): a batch this app
    // already committed is SKIPPED — the foreachBatch CDC-apply sink's
    // crash-between-commit-and-checkpoint heals as a no-op instead of
    // double-applying a batch. Replays are the restart shape
    // (sequential); a concurrent same-batch racer loses on the
    // touched-directory conflict like any other concurrent mutation.
    txn.foreach { case (app, b) =>
      require(app.nonEmpty, "app id must be non-empty")
      if (lastCommittedBatch(app).exists(_ >= b)) return latestVersion
    }
    val latest = latestVersion
    require(latest >= 0, s"$dir has no committed versions")
    val snapState = snapshotAt(latest)
    val snapSchema0 = tableSchemaAt(latest)
    // MERGE SCHEMA EVOLUTION (Delta's withSchemaEvolution, composed
    // with this table's metadata-only widening): source columns absent
    // from the table are ADDED — nullable, metadata-free — and the
    // evolved schema rides the MERGE COMMIT ITSELF (one atomic commit:
    // a failed merge leaves no orphan alter; a no-op merge evolves
    // nothing). Existing files keep scanning, reading the new columns
    // as null, exactly like addColumns. Same residue guard as
    // addColumns: bytes under the new name still living in an active
    // directory (a dropped column, or a renamed column's physical
    // name) would resurface foreign values — fail loudly. Existing
    // columns widen below when the source spells them wider; any
    // OTHER type difference is not evolution and the image casts keep
    // the table's type, as before.
    val newFields: Seq[org.apache.spark.sql.types.StructField] =
      if (!evolveSchema) Seq.empty
      else source.schema.fields.toSeq
        .filterNot(f => snapSchema0.fieldNames.exists(_.equalsIgnoreCase(f.name)))
        .map(f => org.apache.spark.sql.types.StructField(
          f.name, f.dataType, nullable = true))
    newFields.foreach { f =>
      val ghost = snapState.active.exists(d => snapState.stats.get(d)
        .exists(_.keys.exists(_.equalsIgnoreCase(f.name))))
      require(!ghost,
        s"MERGE schema evolution cannot add column `${f.name}` to $dir: " +
          "bytes under that name still live in active directories (a " +
          "dropped column, or a renamed column's physical name) and " +
          "would resurface old values; run OPTIMIZE (full rewrite) first")
    }
    // Evolution also WIDENS existing columns the source spells wider
    // (the widensTo allowlist — a long-keyed CDC feed into an int
    // column): the widened type rides the same merge commit, old files
    // upcast at scan, post-images and carried rows cast to the wide
    // type. A source type that neither matches nor widens is NOT
    // evolution — the image cast keeps the table's type, as always.
    val widenedCols: Map[String, org.apache.spark.sql.types.DataType] =
      if (!evolveSchema) Map.empty
      else source.schema.fields.flatMap { f =>
        snapSchema0.fields.find(_.name.equalsIgnoreCase(f.name)) match {
          case Some(ex) if widensTo(ex.dataType, f.dataType) =>
            require(!snapState.partitionCols.exists(_.equalsIgnoreCase(ex.name)),
              s"MERGE schema evolution cannot widen partition column " +
                s"`${ex.name}` on $dir (identity partition directories " +
                "are named by the written type's rendering)")
            Some(ex.name -> f.dataType)
          case _ => None
        }
      }.toMap
    // NESTED-FIELD CONTRACT (explicit, not silent): evolution operates
    // on TOP-LEVEL columns. A source column whose type differs from
    // the table's, is no widening, and involves a nested type on
    // either side can neither evolve metadata-only nor cast safely —
    // refuse loudly (scalar non-widening diffs keep the historical
    // cast-to-table-type rule, documented below on the image casts).
    if (evolveSchema) source.schema.fields.foreach { f =>
      snapSchema0.fields.find(_.name.equalsIgnoreCase(f.name)).foreach { ex =>
        def nested(dt: org.apache.spark.sql.types.DataType): Boolean =
          dt match {
            case _: org.apache.spark.sql.types.StructType |
                 _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType => true
            case _ => false
          }
        // nullability normalizes away: file reads always serve
        // nullable, so struct-internal nullable flags are not a diff
        require(SchemaCompat.nullableDeep(ex.dataType) ==
            SchemaCompat.nullableDeep(f.dataType) ||
          widensTo(ex.dataType, f.dataType) ||
          (!nested(ex.dataType) && !nested(f.dataType)),
          s"MERGE schema evolution cannot reconcile nested column " +
            s"`${f.name}`: table has ${ex.dataType.simpleString}, source " +
            s"has ${f.dataType.simpleString} — nested-field evolution is " +
            "not supported; cast the source to the table's nested type " +
            "upstream (top-level add/widen evolve fine)")
      }
    }
    val snapSchema =
      if (newFields.isEmpty && widenedCols.isEmpty) snapSchema0
      else org.apache.spark.sql.types.StructType(
        snapSchema0.fields.map(f =>
          widenedCols.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f))
          ++ newFields)
    val snapCols = snapSchema.fieldNames.toSeq
    keys.foreach(k => require(snapCols.contains(k),
      s"merge key `$k` missing from table (has: ${snapCols.mkString(", ")})"))
    val starForms = matched.exists(_.action == MUpdate(None)) ||
      notMatched.exists(_.action == MInsert(None))
    // Without evolution the star forms demand schema EQUALITY (the
    // historical contract — a silently-dropped source column would be
    // a wrong answer). With evolution the source is a SUBSET of the
    // evolved schema by construction: UPDATE SET * assigns the source
    // columns (table-only columns keep their target values), INSERT *
    // fills table-only columns with null — Delta's evolved-star
    // semantics.
    if (starForms && !evolveSchema)
      require(source.columns.sorted.sameElements(snapCols.sorted),
        s"UPDATE SET * / INSERT * need source schema = table schema " +
          "(or evolveSchema = true); " +
          s"source has ${source.columns.sorted.mkString(",")}, table has " +
          snapCols.sorted.mkString(","))
    def validCols(names: Iterable[String], what: String): Unit =
      names.foreach(c => require(snapCols.contains(c),
        s"$what column `$c` is not a table column (${snapCols.mkString(", ")})"))
    (matched ++ notMatchedBySource).foreach(_.action match {
      case MUpdate(Some(a)) => validCols(a.keys, "UPDATE SET")
      case _ => ()
    })
    notMatched.foreach(_.action match {
      case MInsert(Some(v)) => validCols(v.keys, "INSERT")
      case _ => ()
    })
    val mergeL2p = renameMap(snapSchema)
    val active = snapState.active
    // the commit carries the evolved schema; a concurrent schema
    // change would make it stale — refuse loudly in the retry loop.
    // "Schema change" means the intervening commit's recorded schema
    // DIFFERS from this merge's base schema: every plain append also
    // carries a schemaJson (of the unchanged table schema), and
    // treating presence alone as a conflict would non-retryably abort
    // an evolving merge on any concurrent schema-identical append —
    // the overwhelmingly common race at ingestion scale. Both sides
    // normalize through the same codec so the comparison never trips
    // on serialization noise.
    val evolvedJson: Option[String] =
      if (newFields.isEmpty && widenedCols.isEmpty) None
      else Some(SchemaCompat.nullableJson(snapSchema))
    // a merge-borne WIDENING makes old files upcast-read forever —
    // announce the feature on the merge commit itself
    val mergeFeatures: Seq[String] =
      if (widenedCols.isEmpty) Nil
      else Seq(VersionedTable.FeatureTypeWidening)
    val baseSchemaCanon = SchemaCompat.nullableJson(snapSchema0)
    val schemaRace: Commit => Boolean =
      if (evolvedJson.isEmpty) _ => false
      else _.schemaJson.exists(j =>
        SchemaCompat.nullableJson(schemaFromJson(j)) != baseSchemaCanon)
    val tCol = col(targetAlias)
    val sCol = col(sourceAlias)
    // The source pipeline is evaluated ONCE and cached: the span
    // aggregate, the duplicate-key gate, the clause join (twice, when
    // the full-outer decomposition's anti side runs), and the
    // copy-on-write carried recompute all read this projection — an
    // unpersisted source would re-run an arbitrary pipeline for each
    // (the same reasoning as mergeViaDv's srcAligned persist), and a
    // non-deterministic one could diverge between them.
    val src = source.select((keys.map(col) :+
      struct(source.columns.toIndexedSeq.map(col): _*).as(sourceAlias)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // NOT MATCHED BY SOURCE claims rows no key span can bound: every
    // active directory is read and every concurrent add conflicts.
    // Spans are computed from the PERSISTED projection (keys are
    // top-level columns there), so this is a cache read, not a
    // source re-evaluation.
    // ONE cached-source pass serves BOTH the span state and the
    // duplicate-key gate (the gate's groupBy(keys) was previously its
    // own full source pass per merge); insert-only merges keep the
    // cheap global span aggregate (no keyed shuffle).
    val needDupGate = matched.nonEmpty || notMatchedBySource.nonEmpty
    val (spanState, srcHasDupKeys) =
      if (notMatchedBySource.nonEmpty) {
        // NOT MATCHED BY SOURCE touches every directory — no span is
        // computed; the duplicate gate keeps its own bounded probe.
        val dups = active.nonEmpty &&
          src.groupBy(keys.map(col): _*).count()
            .filter(col("count") > 1).limit(1).count() > 0
        (None: Option[Option[Seq[(String, Option[Any], Option[Any])]]], dups)
      } else mergeSpanAndDupState(src, keys, needDup = needDupGate)
    val touched: Seq[String] = spanState match {
      case None => active
      case Some(None) => Seq.empty
      case Some(Some(preds)) => pruneActiveAll(preds, Some(latest))._1
    }
    val addedMayMatch = mergeAddedMayMatch(spanState, mergeL2p)
    // Join shape by what the clauses can CLAIM — a full-outer join can
    // never broadcast, so one is never planned:
    //   - no NOT MATCHED clauses → target-side rows suffice: LEFT
    //     OUTER, and a small source broadcasts into the touched scan;
    //   - NOT MATCHED only (no MATCHED/BY SOURCE) → per-target-row
    //     outcomes don't exist: the source anti-joins the target KEYS
    //     (a column-pruned scan) and no target row enters the frame;
    //   - otherwise the full-outer row set is DECOMPOSED as
    //     LEFT OUTER ∪ (source ANTI target-keys): identical rows, but
    //     both halves broadcast when the source is small, and the
    //     second scan of the touched set reads KEY COLUMNS only — at
    //     worst ~the key width extra in the large-source regime, vs 2×
    //     in the small-source one (measured: ScaleProbe mclauses).
    def nullTagged(df: DataFrame): DataFrame = {
      val tgtStructT = org.apache.spark.sql.types.StructType(
        snapSchema.fields.map(_.copy(
          metadata = org.apache.spark.sql.types.Metadata.empty)))
      df.withColumn("__graft_file",
          lit(null).cast(org.apache.spark.sql.types.StringType))
        .withColumn("__graft_pos",
          lit(null).cast(org.apache.spark.sql.types.LongType))
        .withColumn(targetAlias, lit(null).cast(tgtStructT))
    }
    val insertOnly = matched.isEmpty && notMatchedBySource.isEmpty
    val joined0 =
      if (touched.isEmpty) {
        // span-disjoint (or empty-active) target: every source row is
        // a NOT MATCHED row; a typed null struct keeps one code path
        nullTagged(src)
      } else {
        lazy val tgt = readDirsFoldedTagged(Some(snapSchema), touched,
          snapState.dvs, "__graft_file", Some("__graft_pos"))
          .select((keys.map(col) :+ col("__graft_file") :+
            col("__graft_pos") :+
            struct(snapCols.map(col): _*).as(targetAlias)): _*)
        lazy val srcOnly = nullTagged(src.join(
          readDirsFoldedTagged(Some(snapSchema), touched, snapState.dvs,
            "__graft_file").select(keys.map(col): _*),
          keys, "left_anti"))
        if (insertOnly) srcOnly
        else if (notMatched.isEmpty) tgt.join(src, keys, "left_outer")
        else tgt.join(src, keys, "left_outer").unionByName(srcOnly)
      }
    // Clause expressions must be DETERMINISTIC: the classification is
    // evaluated more than once (counts + payload + CDC project from
    // the cached claimed rows, but the copy-on-write rewrite re-derives
    // the carried rows from the unpersisted join), and a rand()-style
    // condition would let a row be BOTH post-imaged and carried.
    // Checked on the ANALYZED form (an unresolved function node cannot
    // know its own determinism), resolved against the clause join.
    def requireDet(c: org.apache.spark.sql.Column, what: String): Unit =
      require(joined0.select(c.as("__graft_det_probe"))
        .queryExecution.analyzed.expressions.forall(_.deterministic),
        s"$what must be deterministic, got: $c — a non-deterministic " +
          "clause expression can classify a row differently between " +
          "the counted outcome and the rewrite")
    (matched ++ notMatched ++ notMatchedBySource).foreach { cl =>
      cl.condition.foreach(requireDet(_, "a MERGE clause condition"))
      cl.action match {
        case MUpdate(Some(a)) =>
          a.values.foreach(requireDet(_, "an UPDATE SET expression"))
        case MInsert(Some(v)) =>
          v.values.foreach(requireDet(_, "an INSERT value expression"))
        case _ => ()
      }
    }
    val isM = tCol.isNotNull && sCol.isNotNull
    val isS = tCol.isNull && sCol.isNotNull
    val isT = tCol.isNotNull && sCol.isNull
    // first-match-wins: one CASE chain per row class; 0 = no clause
    // claims the row (matched/target-only rows carry, source-only drop)
    def chain(cs: Seq[MergeClause]): org.apache.spark.sql.Column =
      cs.zipWithIndex.reverse.foldLeft(lit(0)) { case (els, (cl, i)) =>
        when(cl.condition.map(c => coalesce(c, lit(false)))
          .getOrElse(lit(true)), lit(i + 1)).otherwise(els)
      }
    val acted = joined0.withColumn("__graft_act",
        when(isM, chain(matched))
          .when(isS, chain(notMatched))
          .when(isT, chain(notMatchedBySource))
          .otherwise(lit(0)))
    // Persist only the rows some clause CLAIMED — deleted/updated/
    // inserted-sized, not touched-sized. A 0.3%-selectivity merge into
    // a 100×-scale table must not materialize the whole touched join
    // (the specialized upsert path persists its semi-join matches for
    // the same reason); carried rows are re-derived only by the
    // copy-on-write rewrite, which re-reads everything by definition.
    val actedHot = acted.filter(col("__graft_act") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val act = col("__graft_act")
      def idxs(cs: Seq[MergeClause])(p: MergeAction => Boolean): Seq[Int] =
        cs.zipWithIndex.collect { case (c, i) if p(c.action) => i + 1 }
      val isUpd: MergeAction => Boolean =
        { case _: MUpdate => true; case _ => false }
      val mUpd = idxs(matched)(isUpd)
      val mDel = idxs(matched)(_ == MDelete)
      val nUpd = idxs(notMatchedBySource)(isUpd)
      val nDel = idxs(notMatchedBySource)(_ == MDelete)
      def actIn(is: Seq[Int]): org.apache.spark.sql.Column =
        if (is.isEmpty) lit(false) else act.isin(is: _*)
      val affected = (isM || isT) && act > 0
      val insApplied = isS && act > 0
      // Multi-match detection pays only when it CAN happen: a target
      // row matched twice implies the source carries a duplicate key —
      // one small agg on the source gates the (join-sized) exact test.
      // the flag rode the span job (or the BY SOURCE probe) above
      val srcDups = !insertOnly && touched.nonEmpty && srcHasDupKeys
      if (srcDups) {
        val dup = acted.filter(isM)
          .groupBy(col("__graft_file"), col("__graft_pos")).count()
          .filter(col("count") > 1).limit(1).count() > 0
        require(!dup, "MERGE found a target row matched by more than one " +
          "source row — the update/delete/carry outcome would be " +
          "nondeterministic; dedupe the source on the merge keys first")
      }
      // one pass over the (cached, claimed-rows-only) join
      val cRow = actedHot.agg(
        sum(when(affected, 1L).otherwise(0L)),
        sum(when(insApplied, 1L).otherwise(0L))).head()
      def cnt(i: Int): Long = if (cRow.isNullAt(i)) 0L else cRow.getLong(i)
      val (affectedCnt, insertCnt) = (cnt(0), cnt(1))
      if (affectedCnt == 0L && insertCnt == 0L) return latest // no-op

      val castTo = snapSchema.fields.map(f => f.name -> f.dataType).toMap
      def tF(c: String) = tCol.getField(c)
      def sF(c: String) = sCol.getField(c)
      val tImage: Seq[org.apache.spark.sql.Column] =
        snapCols.map(c => tF(c).cast(castTo(c)).as(c))
      // Star-form expansion covers the SOURCE's columns: identical to
      // all-of-snapCols in the strict (equality-checked) case; under
      // schema evolution the source is a subset of the evolved schema,
      // and table-only columns keep their target value (UPDATE) or
      // insert as null (INSERT).
      val starCols: Map[String, org.apache.spark.sql.Column] =
        snapCols.filter(c => source.columns.exists(_.equalsIgnoreCase(c)))
          .map(c => c -> sF(c)).toMap
      def updImage(assignments: Option[Map[String, org.apache.spark.sql.Column]])
          : Seq[org.apache.spark.sql.Column] = {
        val a = assignments.getOrElse(starCols)
        snapCols.map(c => a.getOrElse(c, tF(c)).cast(castTo(c)).as(c))
      }
      def insImage(values: Option[Map[String, org.apache.spark.sql.Column]])
          : Seq[org.apache.spark.sql.Column] = {
        val v = values.getOrElse(starCols)
        snapCols.map(c => v.getOrElse(c, lit(null)).cast(castTo(c)).as(c))
      }
      def unionAll(dfs: Seq[DataFrame]): Option[DataFrame] =
        dfs.reduceOption(_.unionByName(_))
      // post-images/inserts are per-clause projections (each clause has
      // its own expressions); pre-images are one filter over t.*
      def perClause(cs: Seq[MergeClause], rowClass: org.apache.spark.sql.Column)
          (img: MergeAction => Option[Seq[org.apache.spark.sql.Column]])
          : Seq[DataFrame] =
        cs.zipWithIndex.flatMap { case (cl, i) =>
          img(cl.action).map(cols =>
            actedHot.filter(rowClass && act === (i + 1)).select(cols: _*))
        }
      val updOf: MergeAction => Option[Seq[org.apache.spark.sql.Column]] = {
        case MUpdate(a) => Some(updImage(a))
        case _ => None
      }
      val updPost = unionAll(
        perClause(matched, isM)(updOf) ++
          perClause(notMatchedBySource, isT)(updOf))
      val inserts = unionAll(perClause(notMatched, isS) {
        case MInsert(v) => Some(insImage(v))
        case _ => None
      })
      val updPre =
        if (mUpd.isEmpty && nUpd.isEmpty) None
        else Some(actedHot.filter((isM && actIn(mUpd)) || (isT && actIn(nUpd)))
          .select(tImage: _*))
      val delPre =
        if (mDel.isEmpty && nDel.isEmpty) None
        else Some(actedHot.filter((isM && actIn(mDel)) || (isT && actIn(nDel)))
          .select(tImage: _*))
      def cdcFrame: DataFrame =
        (updPre.map(_.withColumn("_change_type", lit("update_preimage"))).toSeq ++
          updPost.map(_.withColumn("_change_type", lit("update_postimage"))) ++
          delPre.map(_.withColumn("_change_type", lit("delete"))) ++
          inserts.map(_.withColumn("_change_type", lit("insert"))))
          .reduce(_.unionByName(_))
      val v0 = latest + 1
      val constraints = snapState.constraints

      if (affectedCnt == 0L) {
        // inserts only: the touched directories are provably unchanged
        // — an append-shaped commit, never a rewrite
        val (name, rows, st) =
          writePayload(inserts.get, v0, constraints, mergeL2p)
        val cdfName =
          if (!writeChangeData) None
          else {
            val n = f"cdf-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
            toPhysicalDf(cdcFrame, mergeL2p)
              .write.parquet(new Path(root, n).toString)
            Some(n)
          }
        return publishMutationRetrying("merge", latest, maxRetries, touched,
          revalidate = Seq(name), addedMayMatch,
          mkCommit = vv => Commit(vv, "merge", Seq(name), Seq.empty, rows,
            System.currentTimeMillis(), txn, addedStats = Map(name -> st),
            cdf = cdfName, addedRows = Map(name -> rows),
            schemaJson = evolvedJson, featuresAdd = mergeFeatures),
          validated0 = constraints, schemaConflicts = schemaRace, txn = txn)
      }

      val dirOf = element_at(split(col("__graft_file"), "/"), -2)
      // the sidecar is written optimistically and the per-dir counts
      // ride its write job (one pass over the claimed rows instead of
      // a groupBy(dir) count first — see [[deleteViaDv]]); a policy
      // refusal deletes it and falls through to copy-on-write
      val dvAttempt: Option[(String, Map[String, Long])] =
        if (!useDeletionVectors) None
        else {
          val dvName = f"dv-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
          val perDir = GraftDvBitmap.write(spark, root, dvName,
            actedHot.filter(affected).select(
              dirOf.as("__graft_dv_dir"),
              element_at(split(col("__graft_file"), "/"), -1).as("__graft_dv_file"),
              col("__graft_pos").as("__graft_dv_pos")))
          if (dvFractionOk(perDir, latest)) Some((dvName, perDir))
          else { fs.delete(new Path(root, dvName), true); None }
        }
      dvAttempt match {
        case Some((dvName, perDir)) =>
          // merge-on-read: hide the claimed rows, append images+inserts
          val payload = unionAll(updPost.toSeq ++ inserts.toSeq)
          val (added, addedRows, addedStats, rows) =
            try payload match {
              case Some(p) =>
                val (name, r, st) = writePayload(p, v0, constraints, mergeL2p)
                (Seq(name), Map(name -> r), Map(name -> st), r)
              case None => // pure delete clauses: sidecar-only commit
                (Seq.empty[String], Map.empty[String, Long],
                  Map.empty[String, Map[String, ColStat]], 0L)
            } catch { case t: Throwable =>
              fs.delete(new Path(root, dvName), true); throw t
            }
          // exact CDC ALWAYS: the change feed has no synthesis for a DV
          // commit
          val cdfName = f"cdf-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
          toPhysicalDf(cdcFrame, mergeL2p)
            .write.parquet(new Path(root, cdfName).toString)
          return publishMutationRetrying("merge-dv", latest, maxRetries,
            touched, revalidate = added, addedMayMatch,
            mkCommit = vv => Commit(vv, "merge-dv", added, Seq.empty, rows,
              System.currentTimeMillis(), txn, addedStats = addedStats,
              cdf = Some(cdfName), addedRows = addedRows,
              dvAdd = Some(dvName), dvDirs = perDir.keys.toSeq.sorted,
              dvDirRows = perDir, schemaJson = evolvedJson, featuresAdd = mergeFeatures),
            validated0 = constraints, schemaConflicts = schemaRace, txn = txn)
        case None => ()
      }

      // copy-on-write: rewrite the touched directories — carried rows
      // byte-equal, claimed rows replaced by their post-images, plus
      // the inserts
      // copy-on-write re-derives the carried rows from the UNPERSISTED
      // join — the rewrite reads every touched row by definition
      val carried = acted.filter((isM || isT) && act === 0).select(tImage: _*)
      val payload = unionAll(Seq(carried) ++ updPost.toSeq ++ inserts.toSeq).get
      val (name, rows, st) = writePayload(payload, v0, constraints, mergeL2p)
      val cdfName =
        if (!writeChangeData) None
        else {
          val n = f"cdf-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
          toPhysicalDf(cdcFrame, mergeL2p)
            .write.parquet(new Path(root, n).toString)
          Some(n)
        }
      publishMutationRetrying("merge", latest, maxRetries, touched,
        revalidate = Seq(name), addedMayMatch,
        mkCommit = vv => Commit(vv, "merge", Seq(name), touched, rows,
          System.currentTimeMillis(), txn, addedStats = Map(name -> st),
          cdf = cdfName, addedRows = Map(name -> rows),
          schemaJson = evolvedJson, featuresAdd = mergeFeatures),
        validated0 = constraints, schemaConflicts = schemaRace, txn = txn)
    } finally actedHot.unpersist()
    } finally src.unpersist()
  }

  /** Test seam: runs once after a merge/delete result is fully written
    * and before its first publish attempt — specs inject a concurrent
    * commit here deterministically instead of racing threads.
    */
  private[graft] var beforeMutationPublish: () => Unit = () => ()

  /** The optimistic-concurrency loser's retry for row-level MUTATIONS
    * (merge/delete) — Delta's conflict-detection protocol: on a slot
    * conflict, re-read the log and re-commit iff every intervening
    * commit is provably DISJOINT from this mutation. Disjoint means:
    * the winner removed none of the directories this mutation rewrote
    * (its inputs would be gone — re-committing would resurrect rows
    * the winner rewrote and lose the winner's changes), the winner
    * added no data that may satisfy this mutation's predicate (checked
    * by `addedMayMatch` — a matching row the mutation never saw would
    * silently survive), and any concurrently added CHECK constraint
    * re-validates the `revalidate` payloads. Anything unprovable fails
    * loudly with the conflicting commit named; `maxRetries` bounds the
    * loop. A plain concurrent APPEND of out-of-range data — the
    * overwhelmingly common race at ingestion scale — retries through
    * without a rewrite.
    */
  private def publishMutationRetrying(op: String, base: Int, maxRetries: Int,
      touched: Seq[String], revalidate: Seq[String],
      addedMayMatch: Commit => Seq[String], mkCommit: Int => Commit,
      validated0: Map[String, String],
      schemaConflicts: Commit => Boolean = _ => false,
      txn: Option[(String, Long)] = None): Int = {
    beforeMutationPublish()
    var validated = validated0
    var checkedThrough = base
    var attempt = 0
    while (true) {
      val v = checkedThrough + 1
      // the post-commit maintenance hook runs OUTSIDE this try: an
      // IllegalStateException escaping it must never read as a slot
      // conflict here, or the already-committed mutation would retry
      // and commit twice
      var committed = false
      try {
        publish(mkCommit(v))
        committed = true
      } catch {
        case e: IllegalStateException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
          val newLatest = latestVersion
          // The winner may have been a REPLAY RACER of this very
          // (app, batch) — re-check the txn tag BEFORE the conflict
          // scan (mirroring appendStreamBatch's loop): where the
          // conflict detectors are inert (an all-null-key span yields
          // no addedMayMatch) a blind retry would commit the same
          // batch twice, and even where they fire, the racer should
          // SKIP gracefully, not fail loudly. The orphan payload this
          // attempt wrote is unreferenced and reclaimed by vacuum —
          // the same policy as any lost-race payload.
          txn.foreach { case (app, b) =>
            if (lastCommittedBatch(app).exists(_ >= b)) return newLatest
          }
          (checkedThrough + 1 to newLatest).foreach { w =>
            val c = commitAt(w)
            val removedHit = c.removed.toSet.intersect(touched.toSet)
            if (removedHit.nonEmpty) throw new GraftConflictException(
              s"concurrent commit $w (${c.op}) of $dir rewrote directories " +
                s"this $op read (${removedHit.mkString(", ")}); re-run the " +
                s"$op on the new snapshot", e)
            // A winner that ATTACHED a deletion vector to a directory
            // this mutation read is as fatal as a rewrite of it: this
            // mutation's output (a rewrite computed from the pre-DV
            // fold, or a second DV whose per-dir counts would double-
            // count) would resurrect the winner's deleted rows or
            // corrupt the metadata-exact COUNT(*). Same rule as Delta:
            // any concurrent modification of a read file conflicts.
            val dvHit =
              (if (c.dvAdd.isDefined) c.dvDirs.toSet else Set.empty[String])
                .intersect(touched.toSet)
            if (dvHit.nonEmpty) throw new GraftConflictException(
              s"concurrent commit $w (${c.op}) of $dir attached deletion " +
                s"vectors to directories this $op read " +
                s"(${dvHit.mkString(", ")}); re-run the $op on the new " +
                "snapshot", e)
            // A RESTORE replaces the whole DV map — the rows this
            // mutation read may no longer be the table. Unprovable:
            // fail loudly. coalesce-dv is the one PROVABLY-SAFE
            // dvReset: it merges existing sidecars without changing a
            // single row's visibility or any per-dir hidden count, so
            // everything this mutation read — and the sidecar/rewrite
            // it computed — remains exactly valid; background sidecar
            // maintenance must never kill a concurrent writer.
            if (c.dvReset.isDefined && c.op != "coalesce-dv")
              throw new GraftConflictException(
              s"concurrent commit $w (${c.op}) of $dir reset the table's " +
                s"deletion-vector state while this $op was in flight; " +
                s"re-run the $op on the new snapshot", e)
            val conflicts = addedMayMatch(c)
            if (conflicts.nonEmpty) throw new GraftConflictException(
              s"concurrent commit $w (${c.op}) of $dir added data that may " +
                s"match this $op's predicate (${conflicts.mkString(", ")}); " +
                s"re-run the $op on the new snapshot", e)
            if (schemaConflicts(c)) throw new GraftConflictException(
              s"concurrent commit $w (${c.op}) of $dir changed the table " +
                s"schema while this $op carried its own schema commit; " +
                s"re-run the $op on the new snapshot", e)
            if (c.constraintAdd.isDefined) {
              // one read, every payload checked against it, that same
              // snapshot becomes the baseline (see revalidatePayload)
              val nowConstraints = currentConstraints
              revalidate.foreach(p =>
                revalidatePayload(p, validated, Some(nowConstraints)))
              validated = nowConstraints
            }
          }
          checkedThrough = newLatest
      }
      if (committed) {
        runPostCommitMaintenance(v)
        return v
      }
    }
    -1 // unreachable
  }

  /** Post-commit OPT-IN auto-maintenance (Delta's auto-compaction
    * shape): after every successful row-level mutation OR append
    * commit, the table's own TBLPROPERTIES decide whether a
    * maintenance commit piggybacks in the same session — without it a
    * 100 TB table under a steady delete stream accrues DV debt, and a
    * steady append stream accrues small files, until a human notices.
    * At most ONE maintenance commit per property per trigger:
    *  - `graft.autoCompact.minFiles` = k >= 2 (with
    *    `graft.autoCompact.smallBytes`, default 32 MiB): when k active
    *    DV-free directories each sit under the byte threshold, they
    *    are folded into one via [[compactDirs]] (unpartitioned tables;
    *    recorded manifest bytes decide — no filesystem walk);
    *  - `graft.autoOptimize.dvFraction` = x in (0, 1]: directories
    *    whose cumulative hidden fraction reached x are rewritten via
    *    [[optimizeDvDebt]] (chunk count = #debt directories, or
    *    `graft.autoOptimize.targetChunks`);
    *  - `graft.autoCoalesce.minSidecars` = k >= 2: directories
    *    stacking >= k sidecars get them merged metadata-only via
    *    [[coalesceDv]].
    * Maintenance LOSES races gracefully: a concurrent commit aborts
    * the attempt silently — the user's mutation already succeeded, and
    * the next mutation re-triggers the check. Never recursive: the
    * maintenance this hook triggers never re-triggers it (the rewrite
    * path commits through the same retry loop, so a thread-local
    * guard breaks the cycle; a triggered optimize also never
    * auto-coalesces behind the user's back). Malformed property values
    * are ignored (a typo must not fail a committed mutation).
    *
    * FAILURE CONTRACT (the hook runs AFTER the user's commit is
    * durable, so no outcome here may make that commit look failed —
    * a caller that retried "the failure" would double-apply a
    * committed mutation):
    *  - a lost maintenance race ([[GraftConflictException]]) is
    *    swallowed — the mutation already succeeded, and the next
    *    mutation re-triggers the check;
    *  - ANY OTHER failure (a genuine invariant violation inside
    *    optimizeDvDebt/coalesceDv/compaction) propagates, but wrapped
    *    as [[GraftPostCommitMaintenanceException]] — a distinct
    *    non-IllegalStateException type carrying the committed version,
    *    documented as "your mutation committed; do not retry it".
    *    Never silent, never mistakable for a commit failure.
    */
  private val maintaining = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** The TBLPROPERTIES keys that can arm the post-commit hook. */
  private val maintenanceKeys = Seq("graft.autoCompact.minFiles",
    "graft.autoOptimize.dvFraction", "graft.autoCoalesce.minSidecars")

  /** True iff the base snapshot's properties arm the post-commit hook
    * — computed BEFORE the commit (the base snapshot is already folded
    * there), so acknowledging a committed write never performs work
    * that could fail. A property set concurrently with the write arms
    * the hook from the next commit on — the same next-commit semantics
    * any post-commit trigger has.
    */
  private def maintenanceArmed(base: Int): Boolean =
    base >= 0 && maintenanceKeys.exists(snapshotAt(base).props.contains)

  private def runPostCommitMaintenance(committedVersion: Int,
      armed: Option[Boolean] = None): Unit = {
    // ZERO-COST WHEN UNCONFIGURED: tables that never opted in pay
    // nothing per commit — not even the latest-version probe; armed
    // tables re-read the post-commit state properly inside the hook.
    if (armed.contains(false)) return
    try autoMaintain()
    catch {
      case _: GraftConflictException => () // race loss: best-effort hook
      case t: Throwable => throw new GraftPostCommitMaintenanceException(
        committedVersion,
        s"the mutation COMMITTED at version $committedVersion of $dir; " +
          "only the post-commit auto-maintenance failed — do NOT retry " +
          s"the mutation (cause: ${t.getMessage})", t)
    }
  }

  /** Test seam: runs at the top of each triggered maintenance pass —
    * specs inject failures deterministically to pin the contract above.
    */
  private[graft] var autoMaintainFault: () => Unit = () => ()

  private def autoMaintain(): Unit = {
    if (maintaining.get()) return
    maintaining.set(true)
    try autoMaintainBody() finally maintaining.set(false)
  }

  private def autoMaintainBody(): Unit = {
    autoMaintainFault()
    val latest = latestVersion
    if (latest < 0) return
    val snap = snapshotAt(latest)
    val props = snap.props
    // APPEND small-file debt (Delta's auto-compaction): when >=
    // `graft.autoCompact.minFiles` active DV-free directories each sit
    // under `graft.autoCompact.smallBytes` (recorded manifest bytes —
    // no filesystem walk), ONE maintenance commit folds exactly those
    // directories into one. DV'd directories belong to the DV hooks
    // below; identity-partitioned tables are skipped (their directory-
    // per-value layout is the point — compact them deliberately with
    // OPTIMIZE ... WHERE). The trigger recounts from zero after each
    // fold, so a steady append stream holds at most minFiles+1 small
    // directories at rest.
    props.get("graft.autoCompact.minFiles").flatMap(_.toIntOption)
      .filter(_ >= 2).foreach { k =>
        val smallBytes = props.get("graft.autoCompact.smallBytes")
          .flatMap(_.toLongOption).filter(_ > 0L)
          .getOrElse(32L * 1024 * 1024)
        if (snap.partitionCols.isEmpty) {
          val small = snap.active.filter(d => !snap.dvs.contains(d) &&
            snap.dirBytes.get(d).exists(_ < smallBytes))
          if (small.size >= k)
            try compactDirs(small, latest)
            catch { case _: GraftConflictException => () }
        }
      }
    props.get("graft.autoOptimize.dvFraction").flatMap(_.toDoubleOption)
      .filter(x => x > 0.0 && x <= 1.0).foreach { x =>
        val debtDirs = snap.active.count { d =>
          val hidden = snap.dvRowsByDir.getOrElse(d, 0L)
          hidden > 0L && (snap.dirRows.get(d) match {
            case Some(rows) if rows > 0L => hidden.toDouble / rows >= x
            case _ => true
          })
        }
        if (debtDirs > 0) {
          val chunks = props.get("graft.autoOptimize.targetChunks")
            .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(debtDirs)
          try optimizeDvDebt(x, chunks)
          catch { case _: GraftConflictException => () }
        }
      }
    props.get("graft.autoCoalesce.minSidecars").flatMap(_.toIntOption)
      .filter(_ >= 2).foreach { k =>
        if (snap.dvs.values.exists(_.distinct.size >= k))
          try coalesceDv(k, maxRetries = 0)
          catch { case _: GraftConflictException => () }
      }
  }

  /** Delta-style RESTORE — roll the table back to version `v` as a NEW
    * commit (history is preserved; nothing is rewritten or copied: the
    * manifest removes the current active set and re-adds version v's
    * directories, which still exist until [[vacuum]] — at 100 TB a
    * rollback is a metadata operation, not a data move). Stats ride
    * along so data skipping keeps working on the restored snapshot;
    * constraints are NOT rolled back (they bind the table, not a
    * snapshot — same as Delta). Returns the committed version. Fails
    * loudly if `v`'s data directories were already vacuumed.
    */
  def restore(v: Int): Int = {
    val latest = latestVersion
    require(v >= 0 && v <= latest,
      s"restore($v) out of range for $dir (latest $latest)")
    commitAt(v) // loud on a vacuumed manifest
    val target = snapshotAt(v)
    target.active.foreach(n => require(fs.exists(new Path(root, n)),
      s"cannot restore $dir to version $v: data directory $n was vacuumed"))
    target.dvs.values.flatten.toSeq.distinct.foreach(n =>
      require(fs.exists(new Path(root, n)),
        s"cannot restore $dir to version $v: deletion vector $n was vacuumed"))
    val cur = snapshotAt(latest)
    val newV = latest + 1
    val removed = cur.active.filterNot(target.active.toSet)
    val added = target.active.filterNot(cur.active.toSet)
    // The restored snapshot reads with the TARGET version's schema (a
    // later evolution must roll back with the data); a pre-schema
    // target pays one footer merge here, once.
    val restoredSchema = target.schemaJson.orElse(
      if (target.active.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(target.active.map(n => new Path(root, n).toString): _*)
        .schema.pipe(graft.sources.SchemaCompat.nullableJson)))
    publish(Commit(newV, "restore", added, removed, 0L,
      System.currentTimeMillis(),
      addedStats = target.stats.filter(kv => added.contains(kv._1)),
      addedRows = target.dirRows.filter(kv => added.contains(kv._1)),
      schemaJson = restoredSchema,
      // the DV state is part of the snapshot: a restore must roll it
      // back too (an explicit RESET — merging would leak later DVs
      // onto directories both versions share)
      dvReset = Some((target.dvs, target.dvRowsByDir))))
    newV
  }

  /** SHALLOW CLONE (Delta's `CREATE TABLE ... SHALLOW CLONE`): fork
    * this table's CURRENT state (or `version`) into a NEW transaction
    * log at `targetDir` whose v0 manifest REFERENCES the source's data
    * directories by absolute path — zero data files copied, whatever
    * the table size: forking a 100 TB table for a dev/eval run is one
    * manifest write. Stats, schema, TBLPROPERTIES, partition columns,
    * deletion-vector state, and required features all ride the clone
    * commit (the clone additionally requires the `absolute-paths`
    * feature, so an older reader refuses it loudly instead of
    * resolving foreign names against the wrong root); CHECK
    * constraints are re-published as follow-up constraint commits
    * (already validated — the rows are the source's). Streaming txn
    * tags are NOT copied (a clone is a new table; replaying a source
    * stream into it must not skip). Time travel on the clone starts at
    * the clone: version 0 IS the fork point.
    *
    * Divergence after the fork is free in both directions: mutations
    * on the clone rewrite touched directories into the CLONE's root
    * and drop the foreign references from its manifest (the source's
    * files are never touched — the clone's own vacuum lists only its
    * root, so it can never reclaim source data); the source keeps
    * writing normally.
    *
    * THE VACUUM HAZARD (the same caveat Delta documents): the source
    * does NOT know about clones — a `vacuum` on the SOURCE that
    * reclaims a directory the clone still references breaks the
    * clone's reads (loudly, at scan planning: the path is gone).
    * Retain source history for as long as clones of it must live, or
    * OPTIMIZE the clone (a full rewrite localizes every reference) to
    * cut the tie. Both tables must live on one filesystem (the
    * references are scheme-less absolute paths). Returns the clone's
    * committed version (0).
    */
  def shallowClone(targetDir: String, version: Option[Int] = None): Int = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    val target = new VersionedTable(spark, targetDir)
    require(target.latestVersion < 0,
      s"cannot clone into $targetDir: it already has a transaction log")
    require(fs.getUri == target.fs.getUri,
      s"shallow clone must stay on one filesystem (source ${fs.getUri}, " +
        s"target ${target.fs.getUri}): the clone references the source's " +
        "directories by absolute path")
    val snap = snapshotAt(v)
    def abs(n: String): String = new Path(root, n).toUri.getPath
    val rows = snap.active.map(n => snap.dirRows.getOrElse(n, 0L)).sum
    target.publish(target.Commit(0, "clone",
      added = snap.active.map(abs),
      removed = Seq.empty,
      numRows = rows,
      tsMs = System.currentTimeMillis(),
      // ColStat is instance-path-dependent: rebuild under the target
      addedStats = snap.stats.map { case (d, st) => abs(d) -> st.map {
        case (c, cs) => c -> target.ColStat(cs.kind, cs.min, cs.max, cs.nulls)
      } },
      addedRows = snap.dirRows.map { case (d, r) => abs(d) -> r },
      addedBytes = snap.dirBytes.map { case (d, b) => abs(d) -> b },
      schemaJson = snap.schemaJson,
      propsSet = snap.props,
      partitionCols = snap.partitionCols,
      dvReset =
        if (snap.dvs.isEmpty) None
        else Some((
          snap.dvs.map { case (d, scs) => abs(d) -> scs.map(abs) },
          snap.dvRowsByDir.map { case (d, r) => abs(d) -> r })),
      featuresAdd =
        (snap.features + VersionedTable.FeatureAbsolutePaths).toSeq.sorted))
    // constraints bind the table, not a snapshot: re-announce each on
    // its own commit (no validation scan — these exact rows already
    // passed it on the source)
    snap.constraints.toSeq.sortBy(_._1).zipWithIndex.foreach {
      case ((name, ex), i) =>
        target.publish(target.Commit(i + 1, "constraint", Seq.empty,
          Seq.empty, 0L, System.currentTimeMillis(),
          constraintAdd = Some((name, ex))))
    }
    0
  }

  /** Delta-style DELETE — copy-on-write row deletion in ONE atomic
    * commit. One scan over the current snapshot (tagged with
    * `input_file_name`) finds the directories that actually hold
    * matching rows — only those are rewritten without the matches;
    * every other directory survives untouched, so the write
    * amplification is bounded by where the condition's rows live, not
    * the table size (after an [[optimize]] clustered on the predicate
    * column, that's the matching chunks exactly). SQL DELETE null
    * semantics: rows where `condition` is NULL are KEPT (only
    * provably-true rows are deleted). Directories whose every row
    * matches simply disappear (no empty payload is written), except
    * that emptying the whole table keeps one 0-row directory as the
    * schema holder so the table still reads as an empty frame. Returns
    * the committed version, or the CURRENT version unchanged when
    * nothing matches (no empty commit).
    *
    * `writeChangeData = true` persists the deleted rows as the
    * commit's CDC (`_change_type = "delete"`), making [[changes]]
    * exact; without it the synthesis reports the rewritten
    * directories' survivors as delete+insert pairs too.
    */
  /** Resolve scanned FILE paths back to the MANIFEST names of their
    * parent directories. The last path segment is NOT always the
    * manifest key: a shallow clone references foreign directories by
    * absolute path, so the resolution goes through each candidate's
    * fully-resolved location. Unmatched parents fail loudly — a file
    * outside the candidate set would mean the scan read something the
    * snapshot never planned.
    */
  private def touchedManifestNames(filePaths: Seq[String],
                                   candidates: Seq[String]): Seq[String] = {
    val byPath: Map[String, String] =
      candidates.map(n => new Path(root, n).toUri.getPath -> n).toMap
    filePaths.map(f => new Path(f).getParent.toUri.getPath)
      .distinct.map(p => byPath.getOrElse(p,
        sys.error(s"scanned file parent $p is not a candidate directory " +
          s"of $dir — snapshot/scan mismatch")))
      .sorted
  }

  def delete(condition: org.apache.spark.sql.Column,
             writeChangeData: Boolean = false, maxRetries: Int = 5,
             useDeletionVectors: Boolean = false): Int = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val latest = latestVersion
    require(latest >= 0, s"$dir has no committed versions")
    val active = snapshotAt(latest).active
    if (active.isEmpty) return latest // created-but-never-written: no-op
    // Log-recorded schema, like [[update]]: a condition on an evolved
    // column works before any file holds it, dropped columns stay
    // invisible to both the condition and the rewritten payload.
    val tblSchema = tableSchemaAt(latest)
    // Which directories hold matching rows? The candidate set is first
    // bounded by the manifest stats ([[discoveryCandidates]] — a
    // stat-expressible predicate scans only the directories whose
    // recorded ranges can intersect it, not the table), then ONE scan
    // over the candidates yields a metadata-sized result (distinct FILE
    // names → their parent directories).
    val candidates = discoveryCandidates(condition, tblSchema, active, latest)
    if (candidates.isEmpty) return latest // provably nothing matches
    val dvState = snapshotAt(latest).dvs
    val snap = readDirsFoldedTagged(Some(tblSchema), candidates, dvState,
      "__graft_file")
    val touched = touchedManifestNames(
      snap.filter(condition).select(col("__graft_file")).distinct()
        .collect().map(_.getString(0)).toSeq, candidates)
    if (touched.isEmpty) return latest
    if (useDeletionVectors)
      deleteViaDv(condition, latest, tblSchema, dvState, touched,
        maxRetries) match {
        case Some(v) => return v
        case None => () // matched fraction too large: rewrite pays off
      }
    val keep = not(coalesce(condition, lit(false)))
    val v = latest + 1
    val survivors = readDirsFolded(Some(tblSchema), touched, dvState).filter(keep)
    val (name, rows, st) = writePayload(survivors, v,
      l2p = renameMap(tblSchema))
    val (added, addedStats) =
      if (rows == 0L && touched.size < active.size) {
        // every row of every touched dir matched; other dirs remain
        fs.delete(new Path(root, name), true)
        (Seq.empty[String], Map.empty[String, Map[String, ColStat]])
      } else if (rows == 0L) {
        // the delete empties the TABLE: keep the 0-row directory as the
        // schema holder so read()/merge() keep working (an empty table
        // must read as an empty frame, not throw)
        (Seq(name), Map.empty[String, Map[String, ColStat]])
      } else (Seq(name), Map(name -> st))
    val cdfName =
      if (!writeChangeData) None
      else {
        val n = f"cdf-v$v%05d-${java.util.UUID.randomUUID().toString.take(8)}"
        toPhysicalDf(readDirsFolded(Some(tblSchema), touched, dvState)
          .filter(coalesce(condition, lit(false)))
          .withColumn("_change_type", lit("delete")), renameMap(tblSchema))
          .write.parquet(new Path(root, n).toString)
        Some(n)
      }
    // A concurrent winner's added directories conflict iff they hold
    // any row the condition matches — checked EXACTLY by scanning just
    // those directories (bounded by the winner's own commit size), not
    // by stats: an arbitrary Column has no stat-domain form.
    val addedMayMatch: Commit => Seq[String] = c =>
      if (c.added.isEmpty) Seq.empty
      else if (!readDirsAs(tblSchema, c.added)
        .filter(coalesce(condition, lit(false))).isEmpty) c.added
      else Seq.empty
    // No constraint revalidation on retry: the survivors are a subset
    // of rows a concurrently added constraint already validated (its
    // own table scan saw the pre-delete snapshot, which contains them).
    publishMutationRetrying("delete", latest, maxRetries, touched,
      revalidate = Seq.empty, addedMayMatch,
      mkCommit = vv => Commit(vv, "delete", added, touched, rows,
        System.currentTimeMillis(), addedStats = addedStats, cdf = cdfName,
        addedRows = added.map(_ -> rows).toMap),
      validated0 = Map.empty)
  }

  /** MERGE-ON-READ update (Delta's DV-based UPDATE): ONE commit hides
    * the matched rows behind a DV sidecar AND appends a directory
    * holding their updated images — no touched directory is rewritten,
    * so a selective UPDATE costs the matched rows twice (the sidecar
    * and the new images) instead of the touched directories once;
    * the win is exactly Delta's: wherever matches are a small fraction
    * of the directories they live in. The appended images validate
    * against CHECK constraints like any payload, carry fresh stats
    * (so pruning serves them), and the exact CDC
    * (update_preimage/postimage) is always persisted — the change feed
    * has no synthesis for a DV commit. OPTIMIZE compacts the sidecar
    * debt away; readers fold it like any DV.
    */
  private def updateViaDv(condition: org.apache.spark.sql.Column,
                          assignments: Map[String, org.apache.spark.sql.Column],
                          latest: Int,
                          schema: org.apache.spark.sql.types.StructType,
                          dvState: Map[String, Seq[String]],
                          touched: Seq[String],
                          constraints: Map[String, String],
                          maxRetries: Int): Option[Int] = {
    import org.apache.spark.sql.functions.{coalesce, col, element_at, lit, split}
    val hit = coalesce(condition, lit(false))
    val v0 = latest + 1
    val matched = readDirsFoldedTagged(Some(schema), touched, dvState,
      "__graft_file", Some("__graft_pos")).filter(hit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dirOf = element_at(split(col("__graft_file"), "/"), -2)
      // sidecar written optimistically, per-dir counts ride its write
      // job — the same DV-vs-rewrite policy as delete, checked after
      // (a refused sidecar is deleted; see [[deleteViaDv]])
      val dvName = f"dv-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
      val perDir = GraftDvBitmap.write(spark, root, dvName, matched.select(
        dirOf.as("__graft_dv_dir"),
        element_at(split(col("__graft_file"), "/"), -1).as("__graft_dv_file"),
        col("__graft_pos").as("__graft_dv_pos")))
      if (perDir.isEmpty) { // raced to nothing: no commit
        fs.delete(new Path(root, dvName), true)
        return Some(latest)
      }
      if (!dvFractionOk(perDir, latest)) { // rewrite instead
        fs.delete(new Path(root, dvName), true)
        return None
      }
      // the updated images: every assigned column replaced, CAST to the
      // physical type (the schema never drifts) — same projection as
      // the copy-on-write path, applied to the matches only
      val updatedCols = schema.fields.map { f =>
        assignments.get(f.name) match {
          case Some(e) => e.cast(f.dataType).as(f.name)
          case None => col(f.name)
        }
      }.toIndexedSeq
      val pre = matched.drop("__graft_file", "__graft_pos")
      val images = pre.select(updatedCols: _*)
      // images are a PAYLOAD: constraint-validated in their stats job;
      // an abort must reclaim the already-written sidecar too (a
      // violation is a NORMAL outcome, not a crash for vacuum)
      val (name, rows, st) =
        try writePayload(images, v0, constraints, renameMap(schema))
        catch { case t: Throwable =>
          fs.delete(new Path(root, dvName), true); throw t
        }
      val cdfName = f"cdf-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
      toPhysicalDf(pre.withColumn("_change_type", lit("update_preimage"))
        .unionByName(images.withColumn("_change_type", lit("update_postimage"))),
        renameMap(schema))
        .write.parquet(new Path(root, cdfName).toString)
      val addedMayMatch: Commit => Seq[String] = c =>
        if (c.added.isEmpty) Seq.empty
        else if (!readDirsAs(schema, c.added).filter(hit).isEmpty) c.added
        else Seq.empty
      Some(publishMutationRetrying("update-dv", latest, maxRetries, touched,
        revalidate = Seq(name), addedMayMatch,
        mkCommit = vv => Commit(vv, "update-dv", Seq(name), Seq.empty, rows,
          System.currentTimeMillis(), addedStats = Map(name -> st),
          cdf = Some(cdfName), addedRows = Map(name -> rows),
          dvAdd = Some(dvName), dvDirs = perDir.keys.toSeq.sorted,
          dvDirRows = perDir),
        validated0 = constraints))
    } finally matched.unpersist()
  }

  /** MERGE-ON-READ upsert (the DV commit shape applied to MERGE — the
    * reference's whole append+dedup ingestion pattern, and Delta's
    * headline DV use case): ONE commit hides the MATCHED target rows
    * behind a DV sidecar and appends a directory holding every source
    * row (updated images AND inserts) — no touched directory is
    * rewritten, so an upsert-heavy pipeline pays the matched rows
    * twice instead of every touched directory once. Directories whose
    * key span admitted them but held no actual match are left entirely
    * alone (the CoW path rewrites them; the DV path provably cannot
    * change them). The appended payload validates against CHECK
    * constraints and carries fresh stats; the exact CDC
    * (update_preimage / update_postimage / insert) is ALWAYS persisted
    * — the change feed has no synthesis for a DV commit. The same
    * cumulative-fraction policy as delete/update decides DV vs
    * rewrite; `None` = caller falls back to copy-on-write.
    */
  private def mergeViaDv(srcAligned0: DataFrame, srcKeys: DataFrame,
                         keys: Seq[String], latest: Int,
                         schema: org.apache.spark.sql.types.StructType,
                         mergeL2p: Map[String, String],
                         dvState: Map[String, Seq[String]],
                         constraints: Map[String, String],
                         touched: Seq[String],
                         addedMayMatch: Commit => Seq[String],
                         maxRetries: Int): Option[Int] = {
    // The source is evaluated THREE times on this path (the appended
    // payload, the CDC post-images semi-join, the CDC inserts
    // anti-join) — cache it, or an expensive source pipeline costs the
    // whole merge 3× and the merge-on-read saving evaporates. Both
    // persists release in finally even when CONSTRUCTION throws (a
    // leaked cache entry pins the plan for the session).
    val srcAligned = srcAligned0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try mergeViaDvBody(srcAligned, srcKeys, keys, latest, schema, mergeL2p,
      dvState, constraints, touched, addedMayMatch, maxRetries)
    finally srcAligned.unpersist()
  }

  private def mergeViaDvBody(srcAligned: DataFrame, srcKeys: DataFrame,
                             keys: Seq[String], latest: Int,
                             schema: org.apache.spark.sql.types.StructType,
                             mergeL2p: Map[String, String],
                             dvState: Map[String, Seq[String]],
                             constraints: Map[String, String],
                             touched: Seq[String],
                             addedMayMatch: Commit => Seq[String],
                             maxRetries: Int): Option[Int] = {
    import org.apache.spark.sql.functions.{col, element_at, lit, split}
    val v0 = latest + 1
    // the matched target rows WITH file identity (existing DVs folded —
    // a row an earlier delete hid must not be re-hidden or double-
    // counted); the imposed schema pads evolved-away columns with null
    val matched = readDirsFoldedTagged(Some(schema), touched, dvState,
      "__graft_file", Some("__graft_pos"))
      .join(srcKeys, keys, "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dirOf = element_at(split(col("__graft_file"), "/"), -2)
      // sidecar written optimistically, per-dir counts ride its write
      // job (one pass over the matches — see [[deleteViaDv]]); a
      // match-free merge is a pure insert into the touched span and
      // carries no DV, a policy refusal drops the sidecar and falls
      // back to copy-on-write
      val dvTry = f"dv-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
      val perDir = GraftDvBitmap.write(spark, root, dvTry, matched.select(
        dirOf.as("__graft_dv_dir"),
        element_at(split(col("__graft_file"), "/"), -1).as("__graft_dv_file"),
        col("__graft_pos").as("__graft_dv_pos")))
      if (perDir.nonEmpty && !dvFractionOk(perDir, latest)) {
        fs.delete(new Path(root, dvTry), true)
        return None
      }
      val dvName =
        if (perDir.isEmpty) { // pure insert into touched span: no DV
          fs.delete(new Path(root, dvTry), true)
          None
        } else Some(dvTry)
      val (name, rows, st) =
        try writePayload(srcAligned, v0, constraints, mergeL2p)
        catch { case t: Throwable =>
          dvName.foreach(n => fs.delete(new Path(root, n), true)); throw t
        }
      if (rows == 0L && perDir.isEmpty) {
        // empty source touching nothing: a no-op, not an empty commit
        fs.delete(new Path(root, name), true)
        return Some(latest)
      }
      val pre = matched.drop("__graft_file", "__graft_pos")
      val tgtKeys = pre.select(keys.map(col).toIndexedSeq: _*)
      val cdfName = f"cdf-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
      toPhysicalDf(
        pre.withColumn("_change_type", lit("update_preimage"))
          .unionByName(srcAligned.join(tgtKeys, keys, "left_semi")
            .withColumn("_change_type", lit("update_postimage")))
          .unionByName(srcAligned.join(tgtKeys, keys, "left_anti")
            .withColumn("_change_type", lit("insert"))),
        mergeL2p).write.parquet(new Path(root, cdfName).toString)
      Some(publishMutationRetrying("merge-dv", latest, maxRetries, touched,
        revalidate = Seq(name), addedMayMatch,
        mkCommit = vv => Commit(vv, "merge-dv", Seq(name), Seq.empty, rows,
          System.currentTimeMillis(), addedStats = Map(name -> st),
          cdf = Some(cdfName), addedRows = Map(name -> rows),
          dvAdd = dvName, dvDirs = perDir.keys.toSeq.sorted,
          dvDirRows = perDir),
        validated0 = constraints))
      // srcAligned is released by mergeViaDv's own finally — exactly
      // one owner, even on the success path
    } finally matched.unpersist()
  }

  /** MERGE-ON-READ delete (Delta's deletion vectors): instead of
    * rewriting the touched directories, commit a DV SIDECAR — the
    * (directory, file, row-index) triples of the matched rows — and
    * let every reader anti-join them away ([[readDirsFolded]]). Every
    * data file stays byte-identical, so a selective DELETE on a 100 TB
    * table costs the matched rows' scan and a deleted-rows-sized write
    * instead of rewriting whole directories; OPTIMIZE later compacts
    * the read-side debt away (its rewrite folds the DVs and the
    * rewritten directories' DV entries die with them). The deleted
    * rows are ALWAYS persisted as the commit's exact CDC — the change
    * feed has no add/remove synthesis to fall back on here, and the
    * CDC write is the same deleted-rows size as the DV itself.
    * Metadata answers stay honest: COUNT(*) subtracts the recorded
    * per-directory DV row counts (still exact, still scan-free);
    * MIN/MAX/COUNT(col) decline (a deleted row may have held the
    * bound). Conflict rules ride [[publishMutationRetrying]] with the
    * same exact-scan added-data test as the copy-on-write path.
    */
  private def deleteViaDv(condition: org.apache.spark.sql.Column,
                          latest: Int,
                          tblSchema: org.apache.spark.sql.types.StructType,
                          dvState: Map[String, Seq[String]],
                          touched: Seq[String], maxRetries: Int)
      : Option[Int] = {
    import org.apache.spark.sql.functions.{coalesce, col, element_at, lit, split}
    val hit = coalesce(condition, lit(false))
    val v0 = latest + 1
    val matched = readDirsFoldedTagged(Some(tblSchema), touched, dvState,
      "__graft_file", Some("__graft_pos")).filter(hit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dirOf = element_at(split(col("__graft_file"), "/"), -2)
      // The sidecar is written OPTIMISTICALLY and the per-directory
      // counts ride its write job ([[GraftDvBitmap.write]]'s return) —
      // one pass over the matches instead of a separate groupBy(dir)
      // count job first. The POLICY still gates the commit: when the
      // matches dominate the touched directories, accumulating a
      // rows-sized sidecar every reader must anti-join forever is
      // strictly worse than the rewrite — drop the just-written
      // sidecar and fall back to copy-on-write (Delta tunes the same
      // trade; the sidecar is for SELECTIVE deletes). The wasted write
      // on that path is deleted-rows-sized, paid only when a full
      // directory rewrite follows anyway.
      val dvName = f"dv-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
      val perDir = GraftDvBitmap.write(spark, root, dvName, matched.select(
        dirOf.as("__graft_dv_dir"),
        element_at(split(col("__graft_file"), "/"), -1).as("__graft_dv_file"),
        col("__graft_pos").as("__graft_dv_pos")))
      if (perDir.isEmpty) { // raced to nothing: no commit
        fs.delete(new Path(root, dvName), true)
        return Some(latest)
      }
      if (!dvFractionOk(perDir, latest)) { // rewrite instead
        fs.delete(new Path(root, dvName), true)
        return None
      }
      val cdfName = f"cdf-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
      toPhysicalDf(matched.drop("__graft_file", "__graft_pos")
        .withColumn("_change_type", lit("delete")), renameMap(tblSchema))
        .write.parquet(new Path(root, cdfName).toString)
      // A concurrent winner's added data conflicts iff the condition
      // matches any of it — exact scan, same rule as copy-on-write.
      val addedMayMatch: Commit => Seq[String] = c =>
        if (c.added.isEmpty) Seq.empty
        else if (!readDirsAs(tblSchema, c.added).filter(hit).isEmpty) c.added
        else Seq.empty
      Some(publishMutationRetrying("delete-dv", latest, maxRetries, touched,
        revalidate = Seq.empty, addedMayMatch,
        mkCommit = vv => Commit(vv, "delete-dv", Seq.empty, Seq.empty, 0L,
          System.currentTimeMillis(), cdf = Some(cdfName),
          dvAdd = Some(dvName), dvDirs = perDir.keys.toSeq.sorted,
          dvDirRows = perDir),
        validated0 = Map.empty))
    } finally matched.unpersist()
  }

  /** The DV-vs-rewrite policy: a DV commits only while every touched
    * directory's CUMULATIVE hidden fraction (existing sidecar debt plus
    * this mutation's matches) stays at or below the threshold — table
    * property `graft.deletionVectors.maxFraction`, default 0.5. A
    * directory without a recorded row count declines (a rewrite is
    * always correct; an unbounded sidecar is not).
    */
  private def dvFractionOk(matchedPerDir: Map[String, Long],
                           latest: Int): Boolean = {
    val snap = snapshotAt(latest)
    val threshold = snap.props.get("graft.deletionVectors.maxFraction")
      .flatMap(_.toDoubleOption).getOrElse(0.5)
    matchedPerDir.forall { case (d, m) =>
      snap.dirRows.get(d) match {
        case Some(rows) if rows > 0L =>
          (snap.dvRowsByDir.getOrElse(d, 0L) + m).toDouble / rows <= threshold
        case _ => false // unknown size: rewrite, never an unbounded sidecar
      }
    }
  }

  /** Delta-style UPDATE — copy-on-write row update in ONE atomic
    * commit, the third row-level mutation next to [[merge]] and
    * [[delete]]. One snapshot scan (tagged with `input_file_name`)
    * finds the directories actually holding matching rows; ONLY those
    * are rewritten, with each assigned column replaced by its new
    * expression on the matching rows (CAST to the column's physical
    * type — the table schema never drifts) and every other row carried
    * through byte-equal. SQL UPDATE null semantics: rows where
    * `condition` is NULL are NOT updated. Write amplification is
    * bounded by where the condition's rows live, exactly like
    * [[delete]] — after an [[optimize]] clustered on the predicate
    * column, that's the matching chunks only. New values are validated
    * against the table's CHECK constraints in the same stats job that
    * indexes the rewrite ([[writePayload]]). Returns the committed
    * version, or the CURRENT version unchanged when nothing matches.
    *
    * Conflict semantics ride [[publishMutationRetrying]]: a concurrent
    * append of rows that cannot match the condition retries through; a
    * winner that rewrote this update's inputs, or added data the
    * condition may match (checked EXACTLY by scanning just the winner's
    * added directories — an arbitrary Column has no stat form), fails
    * loudly. `writeChangeData = true` persists the exact row-level CDC
    * (`update_preimage`/`update_postimage`), making [[changes]] serve
    * this commit precisely instead of the coarse delete+insert
    * synthesis.
    */
  def update(condition: org.apache.spark.sql.Column,
             assignments: Map[String, org.apache.spark.sql.Column],
             writeChangeData: Boolean = false, maxRetries: Int = 5,
             useDeletionVectors: Boolean = false): Int = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    require(assignments.nonEmpty, "update needs at least one SET assignment")
    val latest = latestVersion
    require(latest >= 0, s"$dir has no committed versions")
    val snapState = snapshotAt(latest)
    val active = snapState.active
    if (active.isEmpty) return latest // created-but-never-written: no-op
    // The LOG-RECORDED table schema, not a physical mergeSchema read:
    // a metadata-only evolved column must be assignable even before any
    // file holds it, a dropped column must stay invisible, and touched
    // directories missing an evolved column must read it as null.
    val schema = tableSchemaAt(latest)
    assignments.keys.foreach(k => require(schema.fieldNames.contains(k),
      s"update SET column `$k` is not in the table schema " +
        s"(${schema.fieldNames.mkString(", ")})"))
    val hit = coalesce(condition, lit(false))
    // Which directories hold matching rows? Stats-bounded candidates,
    // then one scan — same discovery as [[delete]].
    val candidates = discoveryCandidates(condition, schema, active, latest)
    if (candidates.isEmpty) return latest // provably nothing matches
    val dvState = snapState.dvs
    val snap = readDirsFoldedTagged(Some(schema), candidates, dvState,
      "__graft_file")
    val touched = touchedManifestNames(
      snap.filter(hit).select(col("__graft_file")).distinct()
        .collect().map(_.getString(0)).toSeq, candidates)
    if (touched.isEmpty) return latest
    if (useDeletionVectors)
      updateViaDv(condition, assignments, latest, schema, dvState,
        touched, snapState.constraints, maxRetries) match {
        case Some(v) => return v
        case None => () // matched fraction too large: rewrite pays off
      }
    val v = latest + 1
    val updatedCols = schema.fields.map { f =>
      assignments.get(f.name) match {
        case Some(e) =>
          when(hit, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }.toIndexedSeq
    val rewritten =
      readDirsFolded(Some(schema), touched, dvState).select(updatedCols: _*)
    // New values validate against the CURRENT constraints inside the
    // stats job; a violation aborts before anything publishes.
    val (name, rows, st) = writePayload(rewritten, v, snapState.constraints,
      renameMap(schema))
    val cdfName =
      if (!writeChangeData) None
      else {
        val n = f"cdf-v$v%05d-${java.util.UUID.randomUUID().toString.take(8)}"
        val matched = readDirsFolded(Some(schema), touched, dvState).filter(hit)
        toPhysicalDf(matched.withColumn("_change_type", lit("update_preimage"))
          .unionByName(matched.select(updatedCols: _*)
            .withColumn("_change_type", lit("update_postimage"))),
          renameMap(schema))
          .write.parquet(new Path(root, n).toString)
        Some(n)
      }
    // A concurrent winner's added directories conflict iff they hold
    // any row the condition matches — exact scan, same rule as delete.
    val addedMayMatch: Commit => Seq[String] = c =>
      if (c.added.isEmpty) Seq.empty
      else if (!readDirsAs(schema, c.added).filter(hit).isEmpty) c.added
      else Seq.empty
    // The payload carries NEW values a concurrently added constraint
    // never saw — revalidate it on retry, same as merge.
    publishMutationRetrying("update", latest, maxRetries, touched,
      revalidate = Seq(name), addedMayMatch,
      mkCommit = vv => Commit(vv, "update", Seq(name), touched, rows,
        System.currentTimeMillis(), addedStats = Map(name -> st),
        cdf = cdfName, addedRows = Map(name -> rows)),
      validated0 = snapState.constraints)
  }

  /** Per-directory recorded row counts of a version's snapshot (the
    * manifest fold's `dir_rows`) — metadata only; directories predating
    * row-count recording are absent. The DSv2 limit pushdown sizes its
    * directory prefix from this.
    */
  def dirRowCounts(version: Option[Int] = None): Map[String, Long] = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    snapshotAt(v).dirRows
  }

  /** Metadata-only COUNT(col) — the non-null count of a column from
    * the manifest fold alone: per-directory `rows - nulls`, summed over
    * the active set. Returns None (never guesses) when any active
    * directory predates row-count recording, lacks a stats entry for
    * the column (unsupported type, or the column was appended later and
    * this directory's files never held it — its rows READ as null, but
    * the manifest cannot prove that), or recorded stats before null
    * counts existed (`nulls = -1`).
    */
  def fastNonNullCount(colName: String, version: Option[Int] = None)
      : Option[Long] = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    val snap = snapshotAt(v)
    val parts = snap.active.map { d =>
      for {
        rows <- snap.dirRows.get(d)
        // a deletion vector may have hidden null or non-null rows —
        // the manifest cannot tell which; never guess
        if !snap.dvs.contains(d)
        cs <- snap.stats.get(d).flatMap(_.get(toPhysicalName(colName, snap)))
        if cs.nulls >= 0L
      } yield rows - cs.nulls
    }
    if (parts.exists(_.isEmpty)) None else Some(parts.flatten.sum)
  }

  /** Change data feed (Delta's `readChangeFeed`): every row added or
    * removed by commits `fromVersion..toVersion` (both inclusive),
    * tagged `_change_type` and `_commit_version`. Appends synthesize
    * `insert` rows from their added directories and overwrites also
    * `delete` rows from their removed ones — no extra storage, exactly
    * like Delta serving CDF from add/remove actions. An `optimize`
    * commit emits NOTHING (the data is identical by contract). A merge
    * or delete committed with `writeChangeData = true` serves its
    * persisted row-level CDC (`update_preimage`/`update_postimage`/
    * `insert`, or `delete`); without it they degrade to the coarse
    * synthesis — rewritten-but-unchanged rows then appear as
    * delete+insert pairs, the documented trade-off of not paying the
    * CDC write.
    */
  def changes(fromVersion: Int, toVersion: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val latest = latestVersion
    require(0 <= fromVersion && fromVersion <= toVersion && toVersion <= latest,
      s"changes($fromVersion, $toVersion) out of range for $dir (latest $latest)")
    def existing(dirs: Seq[String], v: Int): Seq[String] = {
      dirs.foreach(n => require(fs.exists(new Path(root, n)),
        s"data directory $n of commit $v was vacuumed; its changes are gone"))
      dirs
    }
    val p2lNow = snapshotAt(toVersion).schemaJson
      .map(j => renameMap(schemaFromJson(j)).map(_.swap)).getOrElse(Map.empty)
    def aliasNow(df: DataFrame): DataFrame =
      if (p2lNow.isEmpty) df else df.withColumnsRenamed(p2lNow)
    // When every commit up to toVersion recorded the SAME schema (the
    // common case: no evolution, no rename, no widen in the table's
    // whole history), every data file AND every persisted CDC payload
    // provably spells exactly that physical schema — impose it on
    // every read below and skip the per-version parquet footer
    // inference (one driver-side listing + schema job per frame,
    // O(versions) of them per changes() call). Any schema variation
    // in history falls back to the historical mergeSchema inference,
    // byte-for-byte the old behavior. Metadata-only check: commit
    // manifests are already parsed and cached.
    val uniformPhys: Option[org.apache.spark.sql.types.StructType] = {
      val defined = (0 to toVersion).iterator
        .flatMap(v => commitAt(v).schemaJson).toSeq.distinct
      if (defined.size == 1) Some(physicalize(schemaFromJson(defined.head)))
      else None
    }
    val frames = (fromVersion to toVersion).flatMap { v =>
      val c = commitAt(v)
      c.op match {
        case "optimize" => Nil
        case _ if c.cdf.isDefined => // merge/delete committed with CDC
          val cdfPath = new Path(root, c.cdf.get).toString
          val cdfRead = uniformPhys match {
            case Some(ps) => spark.read
              .schema(ps.add("_change_type", org.apache.spark.sql.types.StringType))
              .parquet(cdfPath)
            case None => spark.read.parquet(cdfPath)
          }
          Seq(aliasNow(cdfRead).withColumn("_commit_version", lit(v)))
        case _ =>
          // synthesis folds DELETION VECTORS: an added directory serves
          // its rows as visible AT v (a restore re-adds dirs with their
          // DV state), a removed one as visible at v-1 — raw reads
          // would re-report rows an earlier DV delete already emitted
          val ins =
            if (c.added.isEmpty) Nil
            else Seq(aliasNow(readDirsFolded(uniformPhys, existing(c.added, v),
              snapshotAt(v).dvs))
              .withColumn("_change_type", lit("insert")))
          val del =
            if (c.removed.isEmpty) Nil
            else Seq(aliasNow(readDirsFolded(uniformPhys, existing(c.removed, v),
              snapshotAt(v - 1).dvs))
              .withColumn("_change_type", lit("delete")))
          (ins ++ del).map(_.withColumn("_commit_version", lit(v)))
      }
    }
    frames.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(readAt(toVersion).limit(0)
        .withColumn("_change_type", lit(""))
        .withColumn("_commit_version", lit(0)))
  }

  /** Transactional OPTIMIZE [ZORDER] — Delta's compaction as ONE
    * commit: rewrite the current active set into `targetChunks`
    * RANGE-DISJOINT directories clustered on `clusterBy` (chunk
    * boundaries from approximate quantiles), then publish a single
    * "optimize" manifest removing the old directories and adding the
    * chunks. Readers never see a half-compacted table (old versions
    * stay readable until vacuum), and because data-skipping stats are
    * per-directory, range-disjoint chunks make [[pruneActive]] TIGHT
    * after compaction — a range predicate keeps ~1/targetChunks of the
    * table instead of every append-order directory it used to
    * straddle. Rows with a NULL cluster key ride the last chunk.
    * Returns the committed version.
    */
  def optimize(clusterBy: String, targetChunks: Int): Int = {
    require(targetChunks >= 1, s"targetChunks must be >= 1: $targetChunks")
    import org.apache.spark.sql.functions.col
    // The snapshot is pinned BEFORE the rewrite: a commit landing while
    // it runs trips the optimistic publish, and the retry re-commits
    // IFF no intervening commit removed this rewrite's inputs (a plain
    // concurrent append — the common ingestion race — rides through;
    // its directories stay active untouched).
    val base = latestVersion
    require(base >= 0, s"$dir has no committed versions")
    val snap = readAt(base)
    // approxQuantile wants a numeric column: timestamps/integrals
    // shadow-cast to double for the BOUNDARIES only — rows are
    // filtered on the shadow, written with their original columns.
    val ck = "__graft_ck"
    snap.schema(clusterBy).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => ()
      case other => throw new IllegalArgumentException(
        s"optimize clusterBy must be numeric or timestamp, got " +
          s"${other.simpleString} (a string cast would null every key)")
    }
    val keyed = snap.withColumn(ck, col(clusterBy).cast("double"))
    rewriteClustered(keyed, ck, targetChunks, base, activeAt(base))
  }

  /** Predicate-scoped OPTIMIZE — Delta's `OPTIMIZE ... WHERE`: rewrite
    * ONLY the active directories whose recorded `scopeCol` range can
    * intersect [lower, upper] (the [[pruneActive]] survivors),
    * clustered on `clusterBy` into `targetChunks` range-disjoint
    * chunks; every other directory survives BYTE-IDENTICAL (it is
    * neither read nor renamed). At 100 TB a full-table optimize is
    * impractical — the scale-safe maintenance loop compacts the recent
    * ingestion window (`WHERE day BETWEEN ...`) while the cold bulk
    * stays untouched. Directories without stats for `scopeCol` are
    * conservatively IN scope (they may hold matching rows, and leaving
    * them unclustered would silently skip exactly the pre-stats
    * directories maintenance most wants to rewrite). Returns the
    * committed version, or the current version unchanged when nothing
    * is in scope.
    */
  def optimizeWhere(clusterBy: String, targetChunks: Int, scopeCol: String,
                    lower: Option[Any], upper: Option[Any]): Int = {
    import org.apache.spark.sql.functions.col
    require(lower.isDefined || upper.isDefined,
      "optimizeWhere needs at least one bound (use optimize() for the " +
        "whole table)")
    val base = latestVersion
    require(base >= 0, s"$dir has no committed versions")
    val (kept, _) = pruneActive(scopeCol, lower, upper, Some(base))
    if (kept.isEmpty) return base
    val scopeSnap = snapshotAt(base)
    val scope = readDirsFolded(None, kept, scopeSnap.dvs,
      scopeSnap.schemaJson.map(j => renameMap(schemaFromJson(j)).map(_.swap))
        .getOrElse(Map.empty))
    scope.schema(clusterBy).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => ()
      case other => throw new IllegalArgumentException(
        s"optimize clusterBy must be numeric or timestamp, got " +
          s"${other.simpleString}")
    }
    val ck = "__graft_ck"
    rewriteClustered(scope.withColumn(ck, col(clusterBy).cast("double")),
      ck, targetChunks, base, kept)
  }

  /** Fold EXACTLY `dirs` (small-file debt — the auto-compaction hook's
    * unit of work) into one directory via the clustered-rewrite
    * machinery with a constant key and a single chunk: the same
    * commit protocol, column-mapping back-rename, and
    * concurrent-ingestion retry as OPTIMIZE, scoped to the named
    * directories — every other directory survives byte-identical.
    * Callers pass DV-free directories only (a DV'd directory's debt is
    * [[optimizeDvDebt]]'s job). Returns the committed version.
    */
  private def compactDirs(dirs: Seq[String], base: Int): Int = {
    import org.apache.spark.sql.functions.lit
    val snap = snapshotAt(base)
    val p2l = snap.schemaJson
      .map(j => renameMap(schemaFromJson(j)).map(_.swap))
      .getOrElse(Map.empty)
    val scope = readDirsFolded(None, dirs, snap.dvs, p2l)
    rewriteClustered(
      scope.withColumn("__graft_ck", lit(0.0).cast("double")),
      "__graft_ck", targetChunks = 1, base, dirs)
  }

  /** METADATA-ONLY DV maintenance: merge every directory's stacked
    * sidecars into ONE (per-file bitmaps unioned) without touching a
    * single data file. N DV commits against a hot directory leave N
    * bitmaps per file that every reader unions at decode time; a data
    * rewrite ([[optimizeDvDebt]]) removes the debt entirely but pays
    * the directory's full write cost. This is the cheap middle step —
    * one deleted-rows-sized job, one commit, k→1 bitmaps per file —
    * triggered by sidecar COUNT the way [[optimizeDvDebt]] triggers on
    * hidden fraction. Hidden-row counts (and therefore the
    * metadata-exact COUNT(*)) are carried through unchanged; older
    * versions keep reading their own sidecars until [[vacuum]].
    * Returns the committed version (unchanged when no directory stacks
    * `minSidecars`). A concurrent commit of any kind invalidates the
    * merged map — the loser recomputes from the new snapshot, up to
    * `maxRetries` times.
    */
  def coalesceDv(minSidecars: Int = 2, maxRetries: Int = 5): Int = {
    import org.apache.spark.sql.functions.col
    require(minSidecars >= 2, s"minSidecars must be >= 2: $minSidecars")
    var attempt = 0
    while (true) {
      val latest = latestVersion
      require(latest >= 0, s"$dir has no committed versions")
      val snap = snapshotAt(latest)
      val victims = snap.dvs.collect {
        case (d, scs) if scs.distinct.size >= minSidecars => d -> scs.distinct
      }
      if (victims.isEmpty) return latest
      val v0 = latest + 1
      val merged = f"dv-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
      val victimSet = victims.keySet
      GraftDvBitmap.write(spark, root, merged,
        GraftDvBitmap.asFrame(spark, root,
          victims.values.flatten.toSeq.distinct)
          .filter(col("__graft_dv_dir").isInCollection(victimSet)))
      val newDvs = snap.dvs.map { case (d, scs) =>
        d -> (if (victimSet.contains(d)) Seq(merged) else scs)
      }
      try {
        publish(Commit(v0, "coalesce-dv", Seq.empty, Seq.empty, 0L,
          System.currentTimeMillis(),
          dvReset = Some((newDvs, snap.dvRowsByDir))))
        return v0
      } catch {
        case e: IllegalStateException =>
          // lost the slot: the merged map may be stale (the winner may
          // have attached or folded sidecars) — drop this attempt's
          // merge and recompute from the new snapshot
          fs.delete(new Path(root, merged), true)
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    sys.error("unreachable: the retry loop returns or throws")
  }

  /** METADATA-ONLY migration of pre-bitmap deletion-vector sidecars
    * (the earlier (dir, file, pos) positions-parquet layout) to the
    * GDV1 bitmap layout: every legacy sidecar's triples are transcoded
    * into ONE new bitmap sidecar per migration commit, the affected
    * directories' sidecar lists are re-pointed in a single `dvReset`
    * commit, and the per-directory HIDDEN COUNTS are carried verbatim
    * — no data file is read, touched, or rewritten (the upgrade cliff
    * the loud-fail in [[GraftDvBitmap.listBitmaps]] would otherwise
    * resolve only through a full OPTIMIZE). Directories mixing legacy
    * and bitmap sidecars fold BOTH into the merged sidecar (same
    * union the read would have performed). Returns the current version
    * unchanged when no legacy sidecar is live, so running it on an
    * already-migrated table is free. Time travel to versions BELOW the
    * migration still resolves the legacy sidecars and keeps failing
    * loudly — the migration upgrades the live state, not history;
    * vacuum reclaims the legacy files with those versions. Losing a
    * commit race drops the transcode and recomputes, same protocol as
    * [[coalesceDv]].
    */
  def migrateDv(maxRetries: Int = 5): Int = {
    import org.apache.spark.sql.functions.col
    var attempt = 0
    while (true) {
      val latest = latestVersion
      require(latest >= 0, s"$dir has no committed versions")
      val snap = snapshotAt(latest)
      val all = snap.dvs.values.flatten.toSeq.distinct
      val legacy = all.filter { sc =>
        val p = new Path(root, sc)
        fs.exists(p) && fs.listStatus(p).exists(e =>
          e.isFile && e.getPath.getName.endsWith(".parquet"))
      }.toSet
      if (legacy.isEmpty) return latest
      val victims = snap.dvs.collect {
        case (d, scs) if scs.exists(legacy.contains) => d -> scs.distinct
      }
      val victimSet = victims.keySet
      val legacyNames = victims.values.flatten.filter(legacy.contains)
        .toSeq.distinct
      val bitmapNames = victims.values.flatten.filterNot(legacy.contains)
        .toSeq.distinct
      val v0 = latest + 1
      val merged = f"dv-v$v0%05d-${java.util.UUID.randomUUID().toString.take(8)}"
      val legacyDf = spark.read
        .parquet(legacyNames.map(n => new Path(root, n).toString): _*)
        .select(col("__graft_dv_dir").cast("string"),
          col("__graft_dv_file").cast("string"),
          col("__graft_dv_pos").cast("long"))
      val triples =
        if (bitmapNames.isEmpty) legacyDf
        else legacyDf.unionByName(
          GraftDvBitmap.asFrame(spark, root, bitmapNames))
      GraftDvBitmap.write(spark, root, merged,
        triples.filter(col("__graft_dv_dir").isInCollection(victimSet)))
      val newDvs = snap.dvs.map { case (d, scs) =>
        d -> (if (victimSet.contains(d)) Seq(merged) else scs.distinct)
      }
      try {
        publish(Commit(v0, "migrate-dv", Seq.empty, Seq.empty, 0L,
          System.currentTimeMillis(),
          dvReset = Some((newDvs, snap.dvRowsByDir))))
        return v0
      } catch {
        case e: IllegalStateException =>
          // lost the slot: recompute from the new snapshot (the winner
          // may itself have migrated or reset sidecars)
          fs.delete(new Path(root, merged), true)
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    sys.error("unreachable: the retry loop returns or throws")
  }

  /** DV-DEBT-scoped OPTIMIZE — `OPTIMIZE t WHERE __dv_fraction >= x`:
    * rewrite ONLY the directories whose cumulative hidden fraction
    * (sidecar rows over recorded rows) has reached `minFraction` —
    * the maintenance selector merge-on-read tables need: predicate
    * scope says WHERE the data lives, but DV debt accrues wherever
    * mutations LANDED, and at 100 TB the two are unrelated. All
    * bookkeeping is manifest metadata (per-directory hidden counts) —
    * no data or sidecar is read to pick the scope. Clusters on
    * `clusterBy` when given, else deterministic hash bin-packing (the
    * [[compact]] key). Returns the current version unchanged when no
    * directory carries that much debt, so a cron'd
    * debt sweep is free while the table is clean.
    */
  def optimizeDvDebt(minFraction: Double, targetChunks: Int,
                     clusterBy: Option[String] = None): Int = {
    import org.apache.spark.sql.functions.{col, lit, pmod, struct, xxhash64}
    require(minFraction > 0.0 && minFraction <= 1.0,
      s"minFraction must be in (0, 1]: $minFraction")
    val base = latestVersion
    require(base >= 0, s"$dir has no committed versions")
    val snap = snapshotAt(base)
    val kept = snap.active.filter { d =>
      val hidden = snap.dvRowsByDir.getOrElse(d, 0L)
      hidden > 0L && (snap.dirRows.get(d) match {
        case Some(rows) if rows > 0L => hidden.toDouble / rows >= minFraction
        case _ => true // debt of unknown proportion: compact it
      })
    }
    if (kept.isEmpty) return base
    val p2l = snap.schemaJson
      .map(j => renameMap(schemaFromJson(j)).map(_.swap)).getOrElse(Map.empty)
    val scope = readDirsFolded(None, kept, snap.dvs, p2l)
    val ck = "__graft_ck"
    val keyed = clusterBy match {
      case Some(c) =>
        scope.schema(c).dataType match {
          case _: org.apache.spark.sql.types.NumericType => ()
          case org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType => ()
          case other => throw new IllegalArgumentException(
            s"optimize clusterBy must be numeric or timestamp, got " +
              s"${other.simpleString}")
        }
        scope.withColumn(ck, col(c).cast("double"))
      case None =>
        def hashable(dt: org.apache.spark.sql.types.DataType): Boolean =
          dt match {
            case _: org.apache.spark.sql.types.MapType => false
            case a: org.apache.spark.sql.types.ArrayType =>
              hashable(a.elementType)
            case s: org.apache.spark.sql.types.StructType =>
              s.fields.forall(f => hashable(f.dataType))
            case _ => true
          }
        val hashCols = scope.schema.fields
          .filter(f => hashable(f.dataType)).map(f => col(f.name))
        if (hashCols.isEmpty) scope.withColumn(ck, lit(0.0))
        else scope.withColumn(ck,
          pmod(xxhash64(struct(hashCols.toIndexedSeq: _*)), lit(1000000L))
            .cast("double"))
    }
    rewriteClustered(keyed, ck, targetChunks, base, kept)
  }

  /** Bare OPTIMIZE — bin-packing compaction without a cluster key
    * (Delta's no-ZORDER form): rewrite the active set into
    * `targetChunks` directories in ONE transactional commit, rows
    * spread deterministically by a hash of the hashable columns (the
    * same transactional staging/publish as [[optimize]], with a hash
    * key instead of a range key — re-runs land identical chunks, but
    * no range-pruning benefit accrues; use a clustered form for that).
    * The small-files problem this solves is real at any scale: a
    * streaming sink committing every micro-batch leaves thousands of
    * tiny directories whose per-file open cost dominates reads.
    */
  def compact(targetChunks: Int): Int = {
    import org.apache.spark.sql.functions.{col, lit, pmod, struct, xxhash64}
    require(targetChunks >= 1, s"targetChunks must be >= 1: $targetChunks")
    val base = latestVersion
    require(base >= 0, s"$dir has no committed versions")
    val snap = readAt(base)
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val hashCols = snap.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name))
    val ck = "__graft_ck"
    val keyed =
      if (hashCols.isEmpty) snap.withColumn(ck, lit(0.0))
      else snap.withColumn(ck,
        pmod(xxhash64(struct(hashCols.toIndexedSeq: _*)), lit(1000000L))
          .cast("double"))
    rewriteClustered(keyed, ck, targetChunks, base, activeAt(base))
  }

  /** The chunk count a size-driven maintenance pass targets: recorded
    * active bytes over `targetBytes` (Delta's ~128 MB–1 GB file-size
    * contract), from PURE metadata; directory count when byte totals
    * predate recording.
    */
  def defaultTargetChunks(targetBytes: Long = 128L << 20): Int = {
    val v = latestVersion
    require(v >= 0, s"$dir has no committed versions")
    val snap = snapshotAt(v)
    val bytes =
      if (snap.active.forall(snap.dirBytes.contains))
        Some(snap.active.map(snap.dirBytes).sum)
      else None
    bytes.map(b => math.max(1L, (b + targetBytes - 1) / targetBytes).toInt)
      .getOrElse(math.max(1, snap.active.size))
  }

  /** Multi-dimensional OPTIMIZE ZORDER BY: rewrite the active set into
    * chunks clustered on the Z-ORDER (Morton) curve over 2+ columns, so
    * [[pruneActive]] skips directories on a range predicate over ANY of
    * them — the locality trade Delta's ZORDER makes. Each column is
    * first equi-depth bucketed (approximate quantile cuts → bucket id,
    * the skew-robust choice: a uniform-width grid would collapse a
    * skewed column into one cell), the per-column bucket ids are
    * bit-interleaved into the z-value with plain shift/and/or column
    * arithmetic (codegen'd, no UDF), and the z-value becomes the chunk
    * key for the same transactional range-chunk rewrite as the
    * single-column form. Null/NaN keys ride the top bucket. With k
    * columns at `bitsPerCol` bits, a narrow range on one column keeps
    * ~targetChunks^((k-1)/k) chunks instead of all of them — strictly
    * coarser per-dimension than a single-column cluster, the price of
    * serving every dimension at once.
    */
  def optimizeZOrder(clusterBy: Seq[String], targetChunks: Int,
                     bitsPerCol: Int = 8): Int = {
    import org.apache.spark.sql.functions._
    require(clusterBy.size >= 2,
      "optimizeZOrder needs >= 2 columns (use optimize(col, n) for one)")
    require(bitsPerCol >= 1 && bitsPerCol * clusterBy.size <= 48,
      s"bitsPerCol * columns must fit a double-exact long: " +
        s"$bitsPerCol * ${clusterBy.size}")
    val base = latestVersion
    require(base >= 0, s"$dir has no committed versions")
    val snap = readAt(base)
    clusterBy.foreach(c => snap.schema(c).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => ()
      case other => throw new IllegalArgumentException(
        s"optimizeZOrder column `$c` must be numeric or timestamp, got " +
          other.simpleString)
    })
    val buckets = 1 << bitsPerCol
    // Equi-depth bucket id per column: value → #quantile-cuts below it.
    // The cuts are a driver-side constant (≤255 per column), so the
    // assignment is a pure column expression the planner folds into one
    // codegen'd projection — no second shuffle, no UDF.
    val shadow = clusterBy.map(c => s"__graft_z_$c")
    var keyed = clusterBy.zip(shadow).foldLeft(snap) { case (df, (c, s)) =>
      df.withColumn(s, col(c).cast("double"))
    }
    // ONE multi-column quantile job for every dimension's cuts (a
    // per-column call would scan the full table k times).
    val allCuts = keyed.stat.approxQuantile(shadow.toArray,
      (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
    val bucketIds = shadow.zip(allCuts).map { case (s, rawCuts) =>
      val cuts = rawCuts.distinct.sorted
      // Balanced when-tree binary search: id = #cuts strictly below the
      // value — log2(buckets) comparisons per row, not buckets.
      def search(loIdx: Int, hiIdx: Int): org.apache.spark.sql.Column =
        if (loIdx == hiIdx) lit(loIdx.toLong)
        else {
          val mid = (loIdx + hiIdx) / 2
          when(col(s) <= cuts(mid), search(loIdx, mid))
            .otherwise(search(mid + 1, hiIdx))
        }
      // nulls/NaN to the top bucket (approxQuantile ignored them)
      when(col(s).isNull || isnan(col(s)), lit((buckets - 1).toLong))
        .otherwise(search(0, cuts.length))
    }
    // Morton interleave: bit j of column i lands at position j*k + i.
    val k = clusterBy.size
    val zTerms = for (i <- bucketIds.indices; j <- 0 until bitsPerCol)
      yield shiftleft(shiftright(bucketIds(i), j).bitwiseAND(lit(1L)),
        j * k + i)
    val ck = "__graft_ck"
    keyed = keyed.withColumn(ck,
      zTerms.reduce(_ bitwiseOR _).cast("double")).drop(shadow: _*)
    rewriteClustered(keyed, ck, targetChunks, base, activeAt(base))
  }

  /** The shared transactional rewrite behind [[optimize]] and
    * [[optimizeZOrder]]: chunk `keyed` into up-to-`targetChunks`
    * range-disjoint directories on the `ck` double column (boundaries
    * from approximate quantiles, rows sorted by `ck` within chunks,
    * null keys riding the last chunk — assigned by chunk ID, so they
    * are written exactly once), drop `ck`, and publish ONE "optimize"
    * commit at `base + 1` swapping `removed` (the full active set, or
    * [[optimizeWhere]]'s in-scope subset) for the chunks (a concurrent
    * commit takes the slot and this publish fails loudly — nothing it
    * added can be silently dropped).
    *
    * The write is a SINGLE pass: rows get a chunk id (when-tree binary
    * search over the cuts), shuffle once on it, sort within tasks by
    * (chunk, key), and a partitionBy write emits every chunk directory
    * in one job — not one filtered scan per chunk. The staged
    * partition directories are then renamed (metadata-only) into
    * top-level data directories.
    */
  private def rewriteClustered(keyed0: DataFrame, ck: String,
                               targetChunks: Int, base: Int,
                               removed: Seq[String]): Int = {
    require(targetChunks >= 1, s"targetChunks must be >= 1: $targetChunks")
    import org.apache.spark.sql.functions.{col, lit, when}
    val v = base + 1
    // Column mapping at the rewrite: a FULL rewrite (every active
    // directory removed) NORMALIZES — files are written under the
    // current logical names and the committed schema drops its
    // physical-name map, restoring the vectorized DSv2 path a renamed
    // table traded away; a partial rewrite (OPTIMIZE ... WHERE)
    // back-renames so all files keep spelling physical names.
    val logSchema = snapshotAt(base).schemaJson.map(schemaFromJson)
    val l2pAll = logSchema.map(renameMap).getOrElse(Map.empty)
    val normalizing =
      l2pAll.nonEmpty && removed.toSet == activeAt(base).toSet
    val writeL2p = if (normalizing) Map.empty[String, String] else l2pAll
    val normalizedSchemaJson =
      if (!normalizing) None
      else logSchema.map(sc => SchemaCompat.nullableJson(
        org.apache.spark.sql.types.StructType(sc.fields.map(f =>
          f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))))
    // Recorded partition columns are create-time PHYSICAL names; a
    // normalizing rewrite dissolves the physical map, so they must be
    // re-recorded under the logical names the map-free schema now
    // spells — otherwise partitionColumns() serves a name absent from
    // the schema and later appends silently stop splitting.
    val normalizedPartitionCols = {
      val recorded = snapshotAt(base).partitionCols
      if (!normalizing || recorded.isEmpty) Nil
      else {
        val p2l = l2pAll.map(_.swap)
        recorded.map(c => p2l.getOrElse(c, c))
      }
    }
    // The cluster key is evaluated ONCE: the quantile pass and the
    // write re-scan this frame, and a z-order key in particular is an
    // expensive projection that must not be recomputed per pass.
    val keyed = keyed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cuts =
        if (targetChunks == 1) Array.empty[Double]
        else keyed.stat.approxQuantile(ck,
          (1 until targetChunks).map(_.toDouble / targetChunks).toArray, 0.01)
          .distinct.sorted // duplicate cuts would emit empty chunks
      // chunk id = #cuts strictly below the key (balanced when-tree);
      // null keys go to the LAST chunk by id — never duplicated.
      def search(loIdx: Int, hiIdx: Int): org.apache.spark.sql.Column =
        if (loIdx == hiIdx) lit(loIdx.toLong)
        else {
          val mid = (loIdx + hiIdx) / 2
          when(col(ck) <= cuts(mid), search(loIdx, mid))
            .otherwise(search(mid + 1, hiIdx))
        }
      val chunkId =
        if (cuts.isEmpty) lit(0L)
        else when(col(ck).isNull, lit(cuts.length.toLong))
          .otherwise(search(0, cuts.length))
      val staging = new Path(root,
        f"_staging-v$v%05d-${java.util.UUID.randomUUID().toString.take(8)}")
      toPhysicalDf(keyed.withColumn("__graft_chunk", chunkId)
        .repartition(col("__graft_chunk"))
        .sortWithinPartitions(col("__graft_chunk"), col(ck))
        .drop(ck), writeL2p)
        .write.partitionBy("__graft_chunk").parquet(staging.toString)
      val renamed = fs.listStatus(staging).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .map(st => (st.getPath.getName.split('=').last.toLong, st.getPath))
        .sortBy(_._1)
        .zipWithIndex.map { case ((id, p), i) =>
          val name = f"v$v%05d-opt$i%03d-${java.util.UUID.randomUUID().toString.take(8)}"
          fs.rename(p, new Path(root, name))
          (id, name)
        }
      // ONE grouped stats job per rewrite (was one job PER chunk until
      // round 17, then one grouped READ-BACK job) — now grouped by
      // chunk id over the CACHED cluster frame instead of re-reading
      // every byte just written: same aggregates over the same rows
      // the write serialized (parquet round-trips every indexed type
      // losslessly — the writePayload-fusion argument), keyed back to
      // directories through the chunk ids the staging layout recorded.
      // At table scale this removes a full re-read of the rewritten
      // data per OPTIMIZE/ZORDER/auto-compaction.
      val statsFrame = keyed.withColumn("__graft_chunk", chunkId).drop(ck)
      val (cols, cNames, aggs) = statAggPlan(
        org.apache.spark.sql.types.StructType(
          statsFrame.schema.fields.filterNot(_.name == "__graft_chunk")),
        Map.empty)
      val chunkStats = statsFrame.groupBy(col("__graft_chunk"))
        .agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()
        .map(r => r.getLong(0) ->
          decodeStatRow(cols, cNames, writeL2p, i => r.get(i + 1)))
        .toMap
      val written = renamed.flatMap { case (id, name) =>
        chunkStats.get(id) match {
          case Some((rows, stats, _)) if rows > 0L => Some((name, rows, stats))
          case _ => fs.delete(new Path(root, name), true); None
        }
      }
      fs.delete(staging, true) // _SUCCESS and friends
      if (written.isEmpty) return base // empty table: nothing to compact
      // A compaction must SURVIVE concurrent ingestion — at 100 TB a
      // multi-hour rewrite losing its slot to one tiny append would be
      // wasted work forever. The loser's retry rides the same protocol
      // as merge/delete with the simplest possible conflict rule: the
      // rewrite holds IDENTICAL rows, so the ONLY true conflict is an
      // intervening commit that removed one of this rewrite's input
      // directories (another optimize/mutation/restore took them —
      // re-committing would resurrect rewritten rows). Winner-added
      // data stays active untouched (it is not in `removed`); a
      // concurrently added constraint already validated these exact
      // rows in its own table scan; and the commit records no schema
      // (the fold keeps a concurrent evolution's columns) — EXCEPT a
      // normalizing full rewrite, which commits the map-free schema its
      // files now spell. A concurrent schema change would take the slot
      // first and this retry re-reads nothing schema-dependent, so the
      // normalized JSON stays consistent with the rewritten files.
      publishMutationRetrying("optimize", base, maxRetries = 5,
        touched = removed, revalidate = Seq.empty,
        addedMayMatch = _ => Seq.empty,
        mkCommit = vv => Commit(vv, "optimize", written.map(_._1), removed,
          written.map(_._2).sum, System.currentTimeMillis(),
          addedStats = written.map(w => w._1 -> w._3).toMap,
          addedRows = written.map(w => w._1 -> w._2).toMap,
          schemaJson = normalizedSchemaJson,
          partitionCols = normalizedPartitionCols),
        validated0 = Map.empty,
        // a normalizing rewrite re-records the schema: a concurrent
        // schema commit (alter/evolving append) in the retry window
        // must fail loudly, not be silently overwritten
        schemaConflicts = c => normalizing && c.schemaJson.isDefined)
    } finally keyed.unpersist()
  }

  /** `VERSION AS OF v`: the table exactly as version `v` committed it —
    * read with THAT VERSION's log-recorded schema (a later evolving
    * append must not change what an old version reads, and an old
    * version read after evolution pads nothing — each version unions
    * only its own directories, and its schema travels in its own
    * manifests). The explicit schema means NO parquet footer is opened
    * at plan time — at 10k active directories the old mergeSchema
    * inference was an O(directories) footer sweep per query; files
    * missing an evolved column pad null under an explicit schema
    * exactly as they did under mergeSchema. Pre-schema logs keep the
    * footer-merge fallback.
    */
  def readAt(v: Int): DataFrame = {
    commitAt(v) // fail fast on a vacuumed/unknown version
    val snap = snapshotAt(v)
    val active = snap.active
    // A CREATEd-but-never-written table (or a schema-recorded version
    // whose every directory a later delete dropped) reads as an EMPTY
    // frame with the recorded schema — never an error.
    if (active.isEmpty && snap.schemaJson.isDefined)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaFromJson(snap.schemaJson.get))
    require(active.nonEmpty, s"version $v of $dir has no data directories")
    val dirs = active.map(n => new Path(root, n)) // fail fast on vacuumed data
    dirs.foreach(p => require(fs.exists(p),
      s"data directory $p of version $v was vacuumed; only versions >= " +
        "the retention window are readable"))
    readDirsFolded(snap.schemaJson.map(schemaFromJson), active, snap.dvs)
  }

  /** Normalize a caller-supplied bound to the stat domain: integrals
    * and timestamps → Long (micros), fractionals → Double, strings
    * as-is.
    */
  private def normBound(v: Any): Any = v match {
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case l: Long => l
    case f: Float => f.toDouble
    case d: Double => d
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"unsupported pruning bound type: ${other.getClass.getName}")
  }

  /** stat-domain comparison; numeric kinds coerce to Double when
    * mixed. Strings compare in UNSIGNED UTF-8 BYTE order — the order
    * Spark's min/max (UTF8String) computed the stats in; Java's
    * `compareTo` (UTF-16 code units) disagrees with it for
    * supplementary-plane characters, and a mismatched order could
    * prune a directory that actually holds matching rows.
    */
  private[sources] def cmpBound(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) =>
      val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < xb.length && i < yb.length) {
        val c = (xb(i) & 0xFF) - (yb(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      xb.length - yb.length
    case (_: String, _) | (_, _: String) => throw new IllegalArgumentException(
      s"cannot compare string and numeric pruning bounds ($a vs $b)")
    case _ =>
      val d = (v: Any) => v match { case l: Long => l.toDouble; case d: Double => d }
      java.lang.Double.compare(d(a), d(b))
  }

  /** Data skipping (Delta file statistics): split version `v`'s
    * (default: latest) active directories into (kept, skipped) for a
    * range predicate `lower <= colName <= upper` — a directory is
    * skipped only when its recorded [min, max] provably cannot
    * intersect the range; directories without stats for the column
    * (unsupported type, all-null, pre-stats commits) are kept
    * conservatively. Pruning happens on MANIFEST metadata before any
    * parquet footer is opened — at 100 TB this is the difference
    * between touching one ingestion-day's directories and listing
    * them all; parquet row-group skipping then prunes WITHIN the kept
    * directories when the caller applies the same predicate.
    */
  def pruneActive(colName: String, lower: Option[Any] = None,
                  upper: Option[Any] = None,
                  version: Option[Int] = None): (Seq[String], Seq[String]) =
    pruneActiveAll(Seq((colName, lower, upper)), version)

  /** Conjunctive multi-column data skipping: a directory survives only
    * if EVERY (column, lower, upper) range can intersect its recorded
    * bounds — the reader shape a Z-ORDERED table exists for (each
    * predicate independently eliminates chunks, and the intersection is
    * never larger than the tightest single-column prune). Missing stats
    * for a column keep the directory conservatively, same as
    * [[pruneActive]]. A bounded predicate also skips directories whose
    * column is recorded ALL-NULL (no range matches a null — SQL
    * comparison semantics); an UNBOUNDED (None, None) entry keeps
    * everything, unchanged.
    *
    * `notNullCols` skips directories whose recorded column is all-null
    * (`IS NOT NULL` can match nothing there); `isNullCols` skips
    * directories whose recorded null count is ZERO (`IS NULL` can
    * match nothing) — Delta's nullCount statistics, the shape the
    * DataSourceV2 scan pushes. Unknown null counts (pre-round-12
    * manifests) keep conservatively.
    */
  def pruneActiveAll(predicates: Seq[(String, Option[Any], Option[Any])],
                     version: Option[Int] = None,
                     notNullCols: Seq[String] = Nil,
                     isNullCols: Seq[String] = Nil): (Seq[String], Seq[String]) = {
    require(predicates.nonEmpty || notNullCols.nonEmpty || isNullCols.nonEmpty,
      "pruneActiveAll needs at least one predicate")
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    val snapState = snapshotAt(v)
    // predicates arrive in LOGICAL names; the stats index is keyed by
    // the stable PHYSICAL names (identity for never-renamed tables)
    val norm = predicates.map { case (c, lo, hi) =>
      (toPhysicalName(c, snapState), lo.map(normBound), hi.map(normBound)) }
    snapState.active.partition { d =>
      def statOf(c: String): Option[ColStat] =
        snapState.stats.get(d).flatMap(_.get(c))
      norm.forall { case (c, lo, hi) =>
        statOf(c) match {
          case None => true
          case Some(st) if st.min == null => // all-null (or empty) column
            lo.isEmpty && hi.isEmpty // any actual bound proves no match
          case Some(st) =>
            !(lo.exists(l => cmpBound(st.max, l) < 0) ||
              hi.exists(h => cmpBound(st.min, h) > 0))
        }
      } && notNullCols.forall(c => statOf(toPhysicalName(c, snapState)) match {
        case Some(st) => st.min != null // all-null: IS NOT NULL matches nothing
        case None => true
      }) && isNullCols.forall(c => statOf(toPhysicalName(c, snapState)) match {
        case Some(st) => st.nulls != 0L // zero nulls: IS NULL matches nothing
        case None => true
      })
    }
  }

  /** Exact IN-list data skipping — the runtime-filter (dynamic
    * partition pruning) shape: keep a directory iff AT LEAST ONE of
    * `values` falls inside its recorded [min, max]. Strictly tighter
    * than collapsing the list to its envelope (a scattered key set
    * envelopes the whole table but may intersect few directories) at
    * O(|dirs| · log |values|): values sort once, each directory binary-
    * searches for a member ≥ its min. Null values never match (SQL IN
    * semantics); all-null or statless directories keep conservatively
    * only when stats are absent — an all-null column provably holds no
    * match and prunes. Returns (kept, skipped) like [[pruneActiveAll]].
    */
  def pruneActiveIn(colName0: String, values: Seq[Any],
                    version: Option[Int] = None): (Seq[String], Seq[String]) = {
    val v = version.getOrElse(latestVersion)
    require(v >= 0, s"$dir has no committed versions")
    val snapState = snapshotAt(v)
    val colName = toPhysicalName(colName0, snapState)
    val norm = values.filter(_ != null).map(normBound).distinct
      .sortWith((a, b) => cmpBound(a, b) < 0).toIndexedSeq
    if (norm.isEmpty)
      // IN (NULL,…) or an empty list matches nothing anywhere — but a
      // statless directory still keeps (cannot prove its column kind)
      return snapState.active.partition(d =>
        snapState.stats.get(d).flatMap(_.get(colName)).isEmpty)
    snapState.active.partition { d =>
      snapState.stats.get(d).flatMap(_.get(colName)) match {
        case None => true // no stats: conservative keep
        case Some(st) if st.min == null => false // all-null: IN never matches
        case Some(st) =>
          // smallest value >= st.min; a match exists iff it's <= st.max
          var lo = 0
          var hi = norm.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cmpBound(norm(mid), st.min) < 0) lo = mid + 1 else hi = mid
          }
          lo < norm.length && cmpBound(norm(lo), st.max) <= 0
      }
    }
  }

  /** [[readAt]] restricted to the [[pruneActiveAll]] survivors of a
    * conjunction of ranges (superset guarantee — the caller still
    * applies the row filter).
    */
  def readPrunedAll(predicates: Seq[(String, Option[Any], Option[Any])],
                    version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion)
    commitAt(v)
    val (kept, _) = pruneActiveAll(predicates, Some(v))
    // every directory pruned is a legitimate answer (the range holds
    // no rows): an empty frame with the snapshot's schema
    if (kept.isEmpty) readAt(v).limit(0)
    else {
      val sn = snapshotAt(v)
      readDirsFolded(None, kept, sn.dvs,
        sn.schemaJson.map(j => renameMap(schemaFromJson(j)).map(_.swap))
          .getOrElse(Map.empty))
    }
  }

  /** [[readAt]] with [[pruneActive]] data skipping applied: the
    * returned frame unions only directories that can hold rows with
    * `colName` in [lower, upper]. The caller still applies the actual
    * row filter — pruning is a superset guarantee, not a filter.
    */
  def readPruned(colName: String, lower: Option[Any] = None,
                 upper: Option[Any] = None,
                 version: Option[Int] = None): DataFrame =
    readPrunedAll(Seq((colName, lower, upper)), version)

  /** `TIMESTAMP AS OF`: the newest version committed at or before
    * `tsMs` (epoch millis) — Delta's second time-travel axis. Commit
    * timestamps are the writers' wall clocks, monotone in version
    * order for a single writer but only approximately so across
    * racing writers (same caveat Delta documents); the scan walks
    * back from latest, so recent-timestamp queries cost O(versions
    * since tsMs).
    */
  def readAtTimestamp(tsMs: Long): DataFrame = readAt(versionAtTimestamp(tsMs))

  /** The version [[readAtTimestamp]] resolves `tsMs` to — exposed so
    * snapshot consumers (the DataSourceV2 relation's `timestampAsOf`
    * option) can PIN the resolved version once instead of racing a
    * concurrent writer between schema inference and scan planning.
    */
  def versionAtTimestamp(tsMs: Long): Int = {
    var v = latestVersion
    require(v >= 0, s"$dir has no committed versions")
    while (v >= 0 && (!fs.exists(manifestPath(v)) || commitAt(v).tsMs > tsMs))
      v -= 1
    require(v >= 0,
      s"no version of $dir existed at or before timestamp $tsMs " +
        s"(earliest surviving commit is later, or was vacuumed)")
    v
  }

  /** The current snapshot (latest version). */
  def read(): DataFrame = {
    val v = latestVersion
    require(v >= 0, s"$dir has no committed versions")
    readAt(v)
  }

  /** DESCRIBE HISTORY stand-in: one row per committed version —
    * version, operation, rows added by the commit, directories active
    * at the version, commit wall-clock. ONE incremental fold over the
    * surviving manifests (seeded from the checkpoint below the oldest
    * one), so the cost is O(total delta entries) — a million-commit
    * log parses each manifest once, not once per version. Driver-side:
    * a log is small by construction; Delta reads its log on the driver
    * too.
    */
  def history(): DataFrame = {
    import spark.implicits._
    val latest = latestVersion
    val first = survivingFloor.filter(_ <= latest)
    val rows = first match {
      case None => Seq.empty[(Int, String, Long, Int, Long)]
      case Some(f) =>
        // Seed: a vacuumed log always has a checkpoint AT its oldest
        // surviving version (vacuum writes it) — that checkpoint
        // already includes version f's own delta, so skip re-applying
        // it. An unvacuumed log starts from the empty set at f = 0.
        val ckptAtF = checkpointAtOrBelow(f).filter(_._1 == f)
        var active: Set[String] = ckptAtF.map(_._2.active.toSet).getOrElse(Set.empty)
        (f to latest).flatMap { v =>
          if (fs.exists(manifestPath(v))) {
            val c = parseManifest(manifestPath(v))
            if (!(v == f && ckptAtF.isDefined))
              active = active -- c.removed ++ c.added
            Some((c.version, c.op, c.numRows, active.size, c.tsMs))
          } else None
        }
    }
    rows.toDF("version", "op", "num_rows", "num_active_dirs", "ts_ms")
  }

  /** Retention: keep the last `keepLast` versions, delete older
    * manifests/checkpoints and every data directory no kept version
    * references (plus orphan directories a crashed commit left). The
    * oldest kept version is checkpointed first so it stays resolvable
    * once the delta chain before it is gone. Returns the number of
    * data directories deleted.
    */
  /** The oldest version whose manifest still exists — ONE log listing,
    * not a 0..latest probe walk ([[vacuum]] guarantees the survivor
    * prefix is dense and checkpointed at its floor).
    */
  private def survivingFloor: Option[Int] =
    if (!fs.exists(logDir)) None
    else fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("\\d{8}\\.json"))
      .map(_.stripSuffix(".json").toInt)
      .reduceOption(_ min _)

  def vacuum(keepLast: Int): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val latest = latestVersion
    // memoized snapshots of about-to-be-vacuumed versions must not
    // outlive their manifests (a later snapshotAt must throw, not serve
    // a state whose data directories are being reclaimed)
    snapMemo.clear()
    // Clamp to the oldest SURVIVING version: a keepLast larger than a
    // previous vacuum's window cannot resurrect deleted manifests, and
    // resolving below them would walk off the log.
    val cutoff = math.max(math.max(0, latest - keepLast + 1),
      survivingFloor.getOrElse(0))
    if (cutoff > 0 && fs.exists(manifestPath(cutoff)) &&
        !fs.exists(checkpointPath(cutoff)))
      writeCheckpoint(cutoff, snapshotAt(cutoff))
    // Everything a kept version can reference: the oldest kept
    // version's active set plus every directory added after it.
    val referenced: Set[String] =
      if (latest < 0) Set.empty
      else activeAt(cutoff).toSet ++
        (cutoff + 1 to latest).flatMap(v =>
          if (fs.exists(manifestPath(v))) commitAt(v).added else Seq.empty)
    // Old manifests first: once they are gone no reader can resolve a
    // to-be-deleted directory (delete data first and a concurrent
    // readAt of an old version would resolve, then scan nothing).
    (0 until cutoff).foreach { v =>
      fs.delete(manifestPath(v), false)
      fs.delete(checkpointPath(v), false)
    }
    // Crashed-commit leftovers: a `.tmp` manifest whose writer died
    // before the rename is invisible to readers but lives in the log
    // dir forever without this sweep. An IN-FLIGHT commit's tmp is
    // named `<version>.json[.<uuid>].tmp` for a version >= the current
    // latest; only tmps targeting already-decided versions (<= latest)
    // are provably dead — the slot they were racing for has a winner.
    // Only names the commit protocol itself writes are swept — an
    // unrelated digit-prefixed `.tmp` file is left alone.
    if (fs.exists(logDir)) fs.listStatus(logDir).foreach { st =>
      val n = st.getPath.getName
      if (n.matches("\\d{8}\\.(checkpoint\\.)?json(\\.[0-9a-f]{8})?\\.tmp") &&
          n.take(8).toInt <= latest) fs.delete(st.getPath, false)
    }
    // CDC directories follow their commit's manifest: referenced while
    // the manifest survives, reclaimed with it (orphans of a lost merge
    // race were never referenced at all).
    val referencedCdf: Set[String] =
      (cutoff to math.max(cutoff, latest)).flatMap(v =>
        if (fs.exists(manifestPath(v))) commitAt(v).cdf else None).toSet
    // Deletion-vector sidecars a kept version can reference: the
    // oldest kept snapshot's DV state plus every DV a later commit
    // added or a later RESTORE re-referenced (its reset map may point
    // at sidecars older than the cutoff snapshot's).
    val referencedDv: Set[String] =
      if (latest < 0) Set.empty
      else snapshotAt(cutoff).dvs.values.flatten.toSet ++
        (cutoff + 1 to latest).flatMap { v =>
          if (!fs.exists(manifestPath(v))) Seq.empty
          else {
            val c = commitAt(v)
            c.dvAdd.toSeq ++
              c.dvReset.map(_._1.values.flatten.toSeq).getOrElse(Nil)
          }
        }
    var removed = 0
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val deadData =
        st.isDirectory && n.matches("v\\d{5}-.*") && !referenced.contains(n)
      val deadCdf =
        st.isDirectory && n.matches("cdf-v\\d{5}-.*") && !referencedCdf.contains(n)
      val deadDv =
        st.isDirectory && n.matches("dv-v\\d{5}-.*") && !referencedDv.contains(n)
      // A crashed optimize's staging dir is dead once its target slot
      // is decided (same rule as tmp manifests).
      val deadStaging =
        st.isDirectory && n.matches("_staging-v\\d{5}-.*") &&
          n.substring(10, 15).toInt <= latest
      if (deadData || deadCdf || deadDv || deadStaging) {
        fs.delete(st.getPath, true); removed += 1
      }
    }
    // Re-point the `_last_checkpoint` hint at the newest SURVIVING
    // checkpoint — the old hint may reference one just deleted (the
    // verified read would fall back to a listing forever otherwise).
    if (fs.exists(logDir)) {
      val best = fs.listStatus(logDir).map(_.getPath.getName)
        .filter(_.matches("\\d{8}\\.checkpoint\\.json"))
        .map(_.take(8).toInt).foldLeft(-1)(math.max)
      if (best >= 0) writeLastCheckpointHint(best)
    }
    // vacuum's own reference computation may have memoized versions it
    // then deleted — drop them so later snapshotAt calls fail loudly
    snapMemo.clear()
    removed
  }
}
