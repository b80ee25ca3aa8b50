package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.StructType

/** Stream OFFSET = a committed version number: the transaction log IS
  * the write-ahead log a streaming source needs, so offsets are exact,
  * replayable, and human-readable (`{"version": 7}` = "everything
  * through commit 7 has been served").
  */
case class GraftVtOffset(version: Int) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

/** Shared change-feed/stream file planning: the parquet files one
  * commit contributes, each tagged with the (change-type,
  * commit-version) PARTITION VALUES the reader appends to every row —
  * constants never touch the data files, exactly how a partitioned
  * table serves its partition columns. `cdfCols` is the REQUESTED
  * subset (column pruning may drop either), in requested order.
  */
private[sources] object GraftVtChangeFiles {

  val ChangeType = "_change_type"
  val CommitVersion = "_commit_version"
  val cdfSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField(ChangeType,
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField(CommitVersion,
      org.apache.spark.sql.types.IntegerType, nullable = false)))

  def partitionValues(cdfCols: Seq[String], changeType: String,
                      version: Int): InternalRow =
    InternalRow.fromSeq(cdfCols.map {
      case ChangeType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(changeType)
      case CommitVersion => version
    })

  /** The (directory, change-type) pairs commit `v` contributes to a
    * CHANGE FEED: appends synthesize `insert` from their added
    * directories, mutations also `delete` from their removed ones —
    * the same add/remove synthesis [[VersionedTable.changes]] serves
    * (the coarse form: rewritten-but-unchanged rows appear as
    * delete+insert pairs; exact persisted CDC stays a batch `changes()`
    * feature). `optimize` emits nothing — identical data by contract.
    */
  def changeDirs(vt: VersionedTable, v: Int): Seq[(String, String)] = {
    val (op, added) = vt.commitSummary(v)
    op match {
      case "optimize" | "constraint" | "properties" => Nil
      case "delete-dv" =>
        // a merge-on-read delete adds/removes nothing — its exact
        // deleted rows ride the CDC sidecar it always persists (the
        // file holds the base columns plus an unprojected embedded
        // _change_type; the injected partition value supplies the type)
        vt.cdfSummary(v).map((_, "delete")).toSeq
      case "update-dv" =>
        // a DV update's CDC mixes pre- and post-images in ONE sidecar —
        // file-level synthesis injects a single type per directory and
        // cannot split them; the row-level batch feed serves it exactly
        throw new IllegalStateException(
          s"change-feed commit $v is a merge-on-read UPDATE; file-level " +
            "synthesis cannot split its pre/post images — use the batch " +
            "change feed (VersionedTable.changes), which serves the " +
            "persisted CDC exactly")
      case _ =>
        val removed = vt.removedSummary(v)
        // a removed directory whose rows were partly DV-hidden cannot
        // be synthesized at FILE granularity (the hidden rows would be
        // re-reported as deletes); the row-level batch feed
        // (VersionedTable.changes) folds them — point there, loudly
        if (v > 0 && removed.exists(vt.dvsAt(v - 1).contains))
          throw new IllegalStateException(
            s"change-feed commit $v removed directories carrying " +
              "deletion vectors; file-level synthesis cannot serve it — " +
              "use the batch change feed (VersionedTable.changes), which " +
              "folds DVs exactly")
        // a RESTORE can re-add directories WITH their DV state — same
        // file-granularity limit, same loud pointer
        if (added.exists(vt.dvsAt(v).contains))
          throw new IllegalStateException(
            s"change-feed commit $v added directories carrying deletion " +
              "vectors (a restore); use the batch change feed " +
              "(VersionedTable.changes), which folds DVs exactly")
        added.map((_, "insert")) ++ removed.map((_, "delete"))
    }
  }

  def filesOf(spark: SparkSession, root: Path, vt: VersionedTable,
              dirsWithType: Seq[(String, String)], v: Int,
              cdfCols: Seq[String]): Seq[PartitionedFile] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dirsWithType.flatMap { case (d, changeType) =>
      val p = new Path(root, d)
      require(fs.exists(p),
        s"data directory $d of version $v was vacuumed; its rows cannot " +
          "be served — start from a retained version")
      fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => PartitionedFile(partitionValues(cdfCols, changeType, v),
          org.apache.spark.paths.SparkPath.fromPath(st.getPath),
          0L, st.getLen, Array.empty[String],
          st.getModificationTime, st.getLen, Map.empty))
    }
  }
}

/** BATCH change feed — Delta's
  * `spark.read.option("readChangeFeed", true).option("startingVersion",
  * a).option("endingVersion", b)`: one Batch whose partitions are the
  * change files of versions [a, b], change-type and commit-version
  * injected as partition values. The plan-time cost is the manifest
  * fold; only the commits' own directories are read.
  */
private[sources] class GraftVtCdfBatch(spark: SparkSession,
                                       vt: VersionedTable, rootPath: String,
                                       fromV: Int, toV: Int,
                                       cdfCols: Seq[String],
                                       mkReaderFactory: () => PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.Batch {

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new Path(rootPath)
    val files = (fromV to toV).flatMap(v =>
      GraftVtChangeFiles.filesOf(spark, root, vt,
        GraftVtChangeFiles.changeDirs(vt, v), v, cdfCols))
    FilePartition.getFilePartitions(spark, files,
      spark.sessionState.conf.filesMaxPartitionBytes).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = mkReaderFactory()
}

/** The versioned table as a STREAMING SOURCE (Delta's streaming reads):
  * `spark.readStream.format("graftvt").load(dir)` serves each commit's
  * added rows exactly once, in commit order — micro-batch (start, end]
  * replays the delta manifests of versions start+1..end and reads ONLY
  * the directories those commits added (never a snapshot rescan; at
  * 100 TB the incremental read costs the new data alone). Exactly-once
  * falls out of the offsets being log versions: Structured Streaming
  * checkpoints the offset, and replaying (start, end] is deterministic
  * from the immutable manifests.
  *
  * Commit-kind semantics (Delta's contract):
  *  - `append` commits stream their added directories;
  *  - `optimize` commits are SKIPPED — a compaction rewrites the same
  *    rows (dataChange = false), and replaying them would duplicate;
  *  - any other mutation (overwrite / merge / delete / restore) fails
  *    LOUDLY unless `option("ignoreChanges", "true")`, which then
  *    streams the commit's added directories — rewritten-but-unchanged
  *    rows arrive again, the same documented duplication Delta's
  *    ignoreChanges accepts.
  *
  * Options: `startingVersion` (a number = first version to serve,
  * inclusive; `"latest"` = only commits after stream start; default 0
  * — the whole table as the initial batch, Delta's initial snapshot),
  * `maxVersionsPerTrigger` (admission control: at most that many
  * commits per micro-batch, bounding batch size by write cadence).
  *
  * Readers are stock [[ParquetPartitionReaderFactory]] instances over
  * [[FilePartition]]s sized by `spark.sql.files.maxPartitionBytes` —
  * the same vectorized read path as the batch scan. The read schema is
  * pinned at stream start (columns appended later are not served
  * mid-stream — Delta pins the query schema the same way).
  */
class GraftVtMicroBatchStream(spark: SparkSession, vt: VersionedTable,
                              rootPath: String, dataSchema: StructType,
                              readSchema: StructType,
                              options: Map[String, String],
                              mkReaderFactory: () => PartitionReaderFactory,
                              changeFeed: Boolean = false,
                              cdfCols: Seq[String] = Nil)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val root = new Path(rootPath)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Initial-batch semantics: WITHOUT `startingVersion` the first
    * micro-batch serves the CURRENT SNAPSHOT (Delta's initial snapshot
    * — correct even when history contains overwrites/merges/deletes,
    * which a log replay would refuse) and the stream tails commits
    * after it; an EXPLICIT `startingVersion` asks for the log replay
    * from that version (`"latest"` = tail only).
    */
  private val snapshotInit: Boolean = !options.contains("startingversion")
  private val startingVersion: Int = options.get("startingversion") match {
    case Some(v) if v.trim.equalsIgnoreCase("latest") => vt.latestVersion + 1
    case Some(v) => v.trim.toInt
    case None => 0
  }
  private val maxVersionsPerTrigger: Option[Int] =
    options.get("maxversionspertrigger").map(_.trim.toInt)
  private val ignoreChanges: Boolean =
    options.get("ignorechanges").exists(_.trim.toBoolean)

  override def initialOffset(): Offset = GraftVtOffset(startingVersion - 1)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled form")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftVtOffset].version
    val latest = vt.latestVersion
    // The snapshot-initial batch is ONE snapshot at the stream-start
    // version, never capped: capping would pin an older snapshot and
    // then replay the pre-stream commits it omitted — including
    // mutations the snapshot semantics exist to fold away.
    if (snapshotInit && s < 0 && !changeFeed) GraftVtOffset(latest)
    else GraftVtOffset(maxVersionsPerTrigger
      .map(m => math.min(latest, s + m)).getOrElse(latest).max(s))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset = {
    val m = """\{\s*"version"\s*:\s*(-?\d+)\s*\}""".r
    json.trim match {
      case m(v) => GraftVtOffset(v.toInt)
      case other => throw new IllegalArgumentException(
        s"not a graftvt offset: $other")
    }
  }

  /** The parquet files commit `v` streams, per the commit-kind rules.
    * A CHANGE FEED stream serves the add/remove synthesis (every
    * commit kind welcome); a plain row stream requires append-only
    * history unless ignoreChanges.
    */
  private def filesOf(v: Int): Seq[PartitionedFile] = {
    val dirsWithType: Seq[(String, String)] =
      if (changeFeed) GraftVtChangeFiles.changeDirs(vt, v)
      else {
        val (op, added) = vt.commitSummary(v)
        op match {
          case "append" | "convert" => added.map((_, "insert"))
          case "optimize" => Nil // dataChange = false: same rows, never replay
          case "constraint" | "properties" => Nil // metadata-only commits
          case _ if ignoreChanges => added.map((_, "insert"))
          case other => throw new IllegalStateException(
            s"streaming read of $rootPath hit a '$other' commit at version $v — " +
              "a streamed table must be append-only past the stream's start; " +
              "set option(\"ignoreChanges\", \"true\") to receive the commit's " +
              "rewritten rows (rows the rewrite did not change arrive AGAIN), " +
              "or option(\"readChangeFeed\", \"true\") for tagged changes")
        }
      }
    GraftVtChangeFiles.filesOf(spark, root, vt, dirsWithType, v, cdfCols)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVtOffset].version
    val e = end.asInstanceOf[GraftVtOffset].version
    val files =
      if (!changeFeed && snapshotInit && s < 0)
        // The initial batch IS the snapshot at `e`: active directories,
        // not a commit-by-commit replay — a historical overwrite or
        // merge is already folded into the active set.
        GraftVtChangeFiles.filesOf(spark, root, vt,
          vt.activeDirs(Some(e)).map((_, "insert")), e, cdfCols)
      else (s + 1 to e).flatMap(filesOf)
    FilePartition.getFilePartitions(spark, files,
      spark.sessionState.conf.filesMaxPartitionBytes).toArray
  }

  /** Delegated to the batch [[org.apache.spark.sql.execution
    * .datasources.v2.parquet.ParquetScan]]'s own factory: its
    * createReaderFactory prepares the broadcast hadoop conf (read
    * support class, requested-schema JSON, timezone/rebase settings)
    * that a hand-built [[ParquetPartitionReaderFactory]] would have to
    * replicate key by key — and the factory is file-agnostic, so it
    * reads any [[FilePartition]] this stream plans.
    */
  override def createReaderFactory(): PartitionReaderFactory = mkReaderFactory()

  override def commit(end: Offset): Unit = () // the engine's checkpoint is the record
  override def stop(): Unit = ()
  override def toString: String = s"GraftVtStream($rootPath from v$startingVersion)"
}
