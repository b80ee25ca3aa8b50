package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timestamp-encoding normalization for ingested event data.
  *
  * Parquet writers disagree on how an epoch instant is encoded:
  * pandas/pyarrow default to TIMESTAMP_MICROS with isAdjustedToUTC=false
  * (Spark reads TIMESTAMP_NTZ), Spark itself writes TIMESTAMP_MICROS
  * adjusted-to-UTC (TIMESTAMP_LTZ), some pipelines emit TIMESTAMP(NANOS)
  * (a LongType under spark.sql.legacy.parquet.nanosAsLong) or a bare
  * INT64 epoch with no logical annotation at all. The reference ingests
  * whatever the API hands it and normalizes (`First experiment/GPT 5.py:63`
  * `to_timestamp`; `Third Experiment/GPT 5.py:151-171` cast-repair);
  * this object is the engine's single equivalent — every batch reader
  * and stream source funnels its ts column through here, so a fixture
  * or upstream re-encode changes behavior in exactly one place.
  *
  * Sessions are pinned to UTC in every harness main and test suite, so
  * the NTZ→LTZ cast is a pure type change, never a value shift.
  */
object Timestamps {

  /** Logical encodings [[normalized]] can repair. `Ltz` is already the
    * target type; `Ntz` needs only a cast; the long encodings carry the
    * epoch unit decided by [[unitOf]].
    */
  sealed trait TsEncoding
  case object Ltz extends TsEncoding
  case object Ntz extends TsEncoding
  final case class RawLong(unit: String) extends TsEncoding

  /** Epoch unit of a raw INT64 timestamp, decided by magnitude: a
    * present-day instant is ~1.7e9 in seconds, ~1.7e12 in millis,
    * ~1.7e15 in micros, ~1.7e18 in nanos — four decades apart, so the
    * geometric midpoints 5e10/5e13/5e16 separate them unambiguously
    * for any date between 1972 and 3500. (Instants within ~30 minutes
    * of the 1970 epoch are inherently ambiguous; no fixture or real
    * event feed lives there.)
    */
  def unitOf(v: Long): String = {
    val a = math.abs(v)
    if (a >= 50000000000000000L) "nanos" // 5e16
    else if (a >= 50000000000000L) "micros" // 5e13
    else if (a >= 50000000000L) "millis" // 5e10
    else "seconds"
  }

  /** One probe result per source path — the one-agg job that decides a
    * raw-long column's unit runs once per source, not once per query.
    * Value carries the mtime token observed at probe time: a stale
    * entry is REPLACED (bounded size — one entry per (path, column)),
    * not accumulated under an mtime-suffixed key.
    */
  private val encodingCache = new ConcurrentHashMap[String, (String, TsEncoding)]()

  /** Latest mtime under `path` (one listing level — parquet data files
    * sit directly in the table dir), folded into the probe cache key so
    * a fixture regenerated IN-SESSION re-probes instead of serving the
    * stale unit. Non-local / vanished paths contribute a constant: the
    * cache then degrades to plain per-path (the pre-mtime behavior),
    * never to an error.
    */
  private def mtimeToken(path: String): String =
    try {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.mapToLong(f =>
            java.nio.file.Files.getLastModifiedTime(f).toMillis)
          .max().orElse(0L).toString
        finally s.close()
      } else if (java.nio.file.Files.exists(p))
        java.nio.file.Files.getLastModifiedTime(p).toMillis.toString
      else "0"
    } catch { case _: Exception => "0" }

  /** The encoding of `name` in BATCH frame `df` (streaming frames can't
    * run the probe — probe the batch twin, then [[applyEncoding]] to
    * the stream). `cacheKey` identifies the source (file path) so
    * repeated reads skip the probe; the file mtime rides in the key so
    * an in-session regeneration invalidates it.
    */
  def encodingOf(df: DataFrame, name: String, cacheKey: String): TsEncoding =
    df.schema(name).dataType match {
      case TimestampType => Ltz
      case TimestampNTZType => Ntz
      case LongType =>
        // The mtime listing is one level of driver I/O per call; it
        // stays outside the map key so the cache is bounded at one
        // entry per (path, column) — a stale mtime replaces in place.
        val token = mtimeToken(cacheKey)
        val key = s"$cacheKey#$name"
        val cached = encodingCache.get(key)
        if (cached != null && cached._1 == token) cached._2
        else {
          // The probe is a Spark aggregation job — it must run OUTSIDE
          // any map lock (a compute() remapping function would hold the
          // bin lock for the job's duration, stalling concurrent probes
          // of other columns hashing to the same bin; JDK docs forbid
          // long computations there). Plain get → probe → merge: the
          // merge remapper is trivial and token-checked, so if another
          // thread won the race with a same-token probe we keep its
          // (identical) result instead of overwriting.
          // max(abs(ts)) — not the first row in file order: a leading
          // zero/near-epoch sentinel would classify the whole column,
          // while the column's LARGEST magnitude is the value the unit
          // decades separate unambiguously. Same cost class (one agg
          // job, parquet-stats prunable).
          val probed: (String, TsEncoding) = (token,
            RawLong(df.agg(max(abs(col(name)))).head(1)
              .headOption.filterNot(_.isNullAt(0)).map(r => unitOf(r.getLong(0)))
              // Empty source: any unit yields an empty result; micros is
              // the parquet-ecosystem default.
              .getOrElse("micros")))
          encodingCache.merge(key, probed,
            (old, neu) => if (old._1 == token) old else neu)._2
        }
      case other =>
        sys.error(s"unsupported timestamp encoding for `$name`: $other " +
          "(expected TIMESTAMP, TIMESTAMP_NTZ, or INT64 epoch)")
    }

  /** Rewrite `name` in `df` to session-TZ TimestampType per `enc`.
    * Works on batch and streaming frames alike (no probe here).
    */
  def applyEncoding(df: DataFrame, name: String, enc: TsEncoding): DataFrame =
    enc match {
      case Ltz => df
      case Ntz => df.withColumn(name, col(name).cast(TimestampType))
      case RawLong(unit) => df.withColumn(name, longEpochToTimestamp(name, unit))
    }

  /** Epoch long → TimestampType. Integer `div` for nanos — double math
    * at 1e18 would lose precision.
    */
  def longEpochToTimestamp(name: String, unit: String): Column = unit match {
    case "nanos" => expr(s"timestamp_micros(`$name` div 1000)")
    case "micros" => expr(s"timestamp_micros(`$name`)")
    case "millis" => expr(s"timestamp_millis(`$name`)")
    case "seconds" => expr(s"timestamp_seconds(`$name`)")
    case other => sys.error(s"unknown epoch unit: $other")
  }

  /** Batch entry point: `df(name)` normalized to TimestampType from any
    * supported encoding, probing at most one row once per `cacheKey`.
    */
  def normalized(df: DataFrame, name: String, cacheKey: String): DataFrame =
    applyEncoding(df, name, encodingOf(df, name, cacheKey))
}
