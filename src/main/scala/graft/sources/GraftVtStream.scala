package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Stream OFFSET = a committed version number: the transaction log IS
  * the write-ahead log a streaming source needs, so offsets are exact,
  * replayable, and human-readable (`{"version": 7}` = "everything
  * through commit 7 has been served").
  */
case class GraftVtOffset(version: Int) extends Offset {
  override def json(): String = s"""{"version":$version}"""
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
                              mkReaderFactory: () => PartitionReaderFactory)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val root = new Path(rootPath)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

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
    GraftVtOffset(maxVersionsPerTrigger
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

  /** The parquet files commit `v` streams, per the commit-kind rules. */
  private def filesOf(v: Int): Seq[PartitionedFile] = {
    val (op, added) = vt.commitSummary(v)
    val dirs = op match {
      case "append" => added
      case "optimize" => Nil // dataChange = false: same rows, never replay
      case "constraint" => Nil // metadata-only commit
      case other if ignoreChanges => added
      case other => throw new IllegalStateException(
        s"streaming read of $rootPath hit a '$other' commit at version $v — " +
          "a streamed table must be append-only past the stream's start; " +
          "set option(\"ignoreChanges\", \"true\") to receive the commit's " +
          "rewritten rows (rows the rewrite did not change arrive AGAIN)")
    }
    dirs.flatMap { d =>
      val p = new Path(root, d)
      require(fs.exists(p),
        s"data directory $d of version $v was vacuumed; restart the stream " +
          "from a retained version (startingVersion)")
      fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => PartitionedFile(InternalRow.empty,
          org.apache.spark.paths.SparkPath.fromPath(st.getPath),
          0L, st.getLen, Array.empty[String],
          st.getModificationTime, st.getLen, Map.empty))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVtOffset].version
    val e = end.asInstanceOf[GraftVtOffset].version
    val files = (s + 1 to e).flatMap(filesOf)
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
