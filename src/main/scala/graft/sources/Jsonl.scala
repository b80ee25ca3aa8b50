package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Line-delimited JSON ingestion with corrupt-record quarantine — the
  * entry path of a real training corpus (web-crawl dumps ship as
  * JSONL, and a multi-TB dump ALWAYS contains broken lines; an
  * ingestion job that dies on line 4 billion, or silently drops bad
  * lines with no accounting, fails the pipeline either way).
  *
  * PERMISSIVE parse: unparseable lines survive as rows whose
  * `corruptCol` holds the raw line, everything else null; [[good]] and
  * [[quarantine]] split the same scan. (The reference ingests columnar
  * JSON API payloads — `First experiment/GPT 5.py:83-96` — and has no
  * malformed-input story at all; this is the corpus-scale analogue.)
  *
  * Scale shape: JSONL splits on line boundaries, so the scan
  * parallelizes by `maxPartitionBytes` like any text source; the parse
  * is a single pass per line, and both consumers are filters of the
  * same projection — no shuffle anywhere. The explicit schema is
  * required: schema inference would scan the corpus twice and race
  * against drifting payloads.
  */
object Jsonl {

  val CorruptCol = "_corrupt"

  /** The full PERMISSIVE frame: `schema`'s fields plus `CorruptCol`
    * (null for clean rows, the raw line for broken ones).
    *
    * Parsed as a text scan + `from_json` rather than `spark.read.json`:
    * the raw-file reader forbids plans whose pruned columns are only
    * the corrupt record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    * [[quarantine]] would need to cache the parsed corpus — the exact
    * corpus-sized pin this module avoids. Same single Jackson pass,
    * same line-splittable scan, no restriction.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    parseLines(spark.read.text(path), schema)

  /** Parse a frame of raw lines (a `value` string column — what both
    * `spark.read.text` and `spark.readStream.text` produce) into
    * `schema` + `CorruptCol`. Shared by the batch reader above and
    * [[graft.streaming.StreamingJobs.jsonlStream]], so batch and
    * streaming ingestion CANNOT disagree on quarantine semantics.
    *
    * Accounting contract: every NON-BLANK line lands in exactly one of
    * [[good]] / [[quarantine]]. Whitespace-only lines are dropped up
    * front — they are line-terminator artifacts (trailing newline,
    * CRLF dumps), not payloads, and JSONL has no meaning for them; a
    * consumer that needs them counted should diff `count(text scan)`
    * against `count(good) + count(quarantine)`.
    */
  def parseLines(lines: DataFrame, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"caller schema must not contain reserved column '$CorruptCol' " +
        "(it is appended to carry the quarantined raw line)")
    // Any column beside `value` rides through unparsed — that is how a
    // partition-discovered column (the shard id of [[readSharded]])
    // survives the parse.
    val passthroughNames = lines.columns.filterNot(_ == "value").toSeq
    val clash = passthroughNames.toSet.intersect(schema.fieldNames.toSet)
    require(clash.isEmpty,
      s"schema fields collide with passthrough columns ${clash.mkString(", ")} — " +
        "the parse would emit duplicate column names and every downstream " +
        "reference would be ambiguous; rename one side")
    val passthrough = passthroughNames.map(col)
    lines
      .filter(length(trim(col("value"))) > 0)
      .select(passthrough :+ from_json(col("value"), schema.add(CorruptCol, "string"),
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("__j"): _*)
      .select(passthrough :+ col("__j.*"): _*)
  }

  /** Rows that parsed cleanly, corrupt column dropped. */
  def good(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema).filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine: one row per broken line, carrying the raw text so
    * the bad payloads can be re-parsed or audited later.
    */
  def quarantine(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema).filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))

  /** Sharded JSONL training EXPORT — the other end of the ingest path:
    * a curated corpus leaves the engine as `shard=K/` directories of
    * line-delimited JSON, the layout every training loader consumes.
    * The shard id is [[graft.operators.Sampling.shardOf]] of `keyCol`
    * — a pure function of the row's KEY, so shard MEMBERSHIP is
    * deterministic and layout-independent (re-running the export on a
    * repartitioned corpus produces the same shard sets; row order
    * within a file is not part of the contract, exactly like any
    * distributed sink). Line order therefore never carries meaning —
    * a loader wanting a reproducible read order applies
    * [[graft.operators.Sampling.shuffleDeterministic]]'s (shard, pos).
    *
    * Scale shape: one hash-repartition by shard id, then a streaming
    * JSON serialize per task — no sort, no driver materialization;
    * `maxRecordsPerFile` bounds individual file size so a 100 TB
    * export emits many bounded files per shard directory rather than
    * one unbounded file.
    */
  def writeSharded(df: DataFrame, path: String, keyCol: String, shards: Int,
                   salt: String = "graft", maxRecordsPerFile: Long = 0L,
                   mode: String = "overwrite"): Unit = {
    // "overwrite" is the right default for a re-runnable export job,
    // but it IS destructive — a caller protecting an existing corpus
    // passes mode = "errorifexists" and gets a loud failure instead of
    // a silent erase.
    // The shard id is DERIVED here; a frame already carrying one (e.g.
    // Sampling.shuffleDeterministic output) would be silently
    // re-sharded and the column dropped from the JSON payload
    // (partition columns never land in data files) — fail loudly, the
    // caller drops or renames theirs first.
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — writeSharded derives its own " +
        "shard id and partitionBy would drop the column from the payload; " +
        "drop or rename it before exporting")
    df.withColumn("shard", graft.operators.Sampling.shardOf(col(keyCol), shards, salt))
      .repartition(shards, col("shard"))
      .write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .json(path)
  }

  /** Read a [[writeSharded]] export back with the same PERMISSIVE
    * quarantine contract as [[read]]: the text scan discovers the
    * `shard=K` partition directories, and the shard id rides through
    * the parse as a passthrough column next to `schema`'s fields.
    */
  def readSharded(spark: SparkSession, path: String, schema: StructType): DataFrame =
    parseLines(
      spark.read.option("basePath", path).text(path)
        .withColumn("shard", col("shard").cast("int")),
      schema)
}
