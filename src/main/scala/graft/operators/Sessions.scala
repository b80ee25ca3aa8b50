package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: split each user's event timeline into sessions at
  * inactivity gaps — the canonical event-pipeline operator between raw
  * events and engagement features. (Beyond the reference's surface,
  * which aggregates on fixed calendar buckets only — e.g.
  * `Second Experiment/GPT 5.py:76-83` groups by month; sessions are
  * the data-driven equivalent.)
  *
  * Scale shape: ONE shuffle on the user key; the gap detection and the
  * running session counter are both frames over the same
  * (partitionBy user, orderBy ts) sort, so Catalyst plans a single
  * Window node — no second exchange. Per-session stats afterwards are
  * a partial-aggregable groupBy on (user, session) that inherits the
  * window's hash partitioning on user.
  */
object Sessions {

  /** Rows of `df` with a `session_num` column: 1-based per-user counter
    * that increments whenever the gap since the previous event exceeds
    * `gapSec`. `tieBreak` disambiguates equal timestamps so the
    * numbering is deterministic.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gapSec: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    // Epoch seconds as double (sub-second precision survives; integer
    // unix_timestamp would truncate and move gap boundaries).
    val ts = col(tsCol).cast("double")
    val gap = ts - lag(ts, 1).over(w)
    val isNew = when(gap.isNull || gap > gapSec, 1).otherwise(0)
    df.withColumn("session_num",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session stats: event count, start/end, duration in seconds. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   gapSec: Long, tieBreak: Seq[String] = Nil): DataFrame =
    sessionize(df, userCol, tsCol, gapSec, tieBreak)
      .groupBy(col(userCol), col("session_num"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol).cast("double")) - min(col(tsCol).cast("double")))
          .as("duration_sec"))
}
