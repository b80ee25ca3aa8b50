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
    // unix_timestamp would truncate and move gap boundaries). The
    // timestamp hop first: TIMESTAMP_NTZ input has no direct double
    // cast, and the session TZ is pinned UTC so the hop is value-exact.
    val ts = col(tsCol).cast("timestamp").cast("double")
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
        (max(col(tsCol).cast("timestamp").cast("double")) -
          min(col(tsCol).cast("timestamp").cast("double")))
          .as("duration_sec"))

  /** Conversion funnel over ordered step types: a user completes step
    * i when an event of `steps(i)` exists STRICTLY AFTER their
    * earliest completion of step i−1 (first-touch attribution — the
    * standard product-analytics funnel). Output: one row per step,
    * (step, n_users), in funnel order via the step index prefix.
    *
    * Scale shape: each stage is a partial-aggregable groupBy on the
    * user key filtered to ONE event type (the filter prunes before
    * the shuffle), joined to the previous stage's per-user frame —
    * user-keyed both sides, so AQE co-partitions; no windows, no
    * per-user event lists. All stage counts are lazy single-row
    * aggregates unioned into one DataFrame — the driver triggers ONE
    * job, same as the hygiene funnel.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step required")
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      df.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col("__t").as("__prev_t")), userCol)
        .filter(col(tsCol) > col("__prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    }
    stages.zip(steps.zipWithIndex).map { case (stage, (step, i)) =>
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(s"s${i}_$step").as("step"), col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** Exact inter-event gap percentiles per event type: for each user's
    * consecutive events OF THAT TYPE, the gap in microseconds, rolled
    * up to exact interpolated p50/p90 per type — the cadence profile
    * (polling intervals, retry storms, organic pacing) behind rate
    * limits and bot detection. Pass `tieBreak` (e.g. the event id)
    * when (user, type, ts) can collide — like [[sessionize]], the
    * window order must be total or the lag pairing (and thus the
    * percentiles) varies run to run.
    *
    * Scale shape: one shuffle on (user, type) for the lag window —
    * partitions are single-user slivers, never a global sort; the
    * rollup shrinks to #types rows. Exact `percentile` holds one
    * gap-count map per (type) group in the aggregation buffer — fine
    * for type-like cardinalities; a per-user percentile at 100 TB
    * would switch to `approx_percentile` (the q47 path).
    */
  def gapPercentiles(df: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    // unix_micros is TIMESTAMP-only; the cast makes NTZ input work
    // (no-op on LTZ, session pinned UTC).
    val us = unix_micros(col(tsCol).cast("timestamp"))
    df.select(col(typeCol), (us - lag(us, 1).over(w)).as("__gap_us"))
      .filter(col("__gap_us").isNotNull)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gaps"),
        percentile(col("__gap_us"), lit(0.5)).as("p50_gap_us"),
        percentile(col("__gap_us"), lit(0.9)).as("p90_gap_us"))
  }

  /** Event-type transition matrix (first-order Markov counts): for
    * each user's time-ordered events, count (previous type → type)
    * transitions corpus-wide, with each source type's outgoing share —
    * the navigation-flow / behavioral-model summary. `tieBreak` as in
    * [[gapPercentiles]]: the per-user order must be total.
    *
    * Scale shape: one shuffle on the user key for the lag window; the
    * rollup collapses to ≤ #types² rows, so the share window runs on
    * a driver-scale frame.
    */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    val counts = df
      .select(lag(col(typeCol), 1).over(w).as("from_type"), col(typeCol).as("to_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    counts.withColumn("share",
      col("n_trans") / sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
  }

  /** Rolling N-day active users (WAU for windowDays = 7): for every
    * day with any activity, the count of users active in the trailing
    * window [day − N + 1, day].
    *
    * Scale shape: a rolling COUNT DISTINCT is NOT windowable without
    * holding per-day user sets, so this uses the
    * dedup-then-bounded-expand form: collapse events to distinct
    * (user, day) FIRST (the only event-volume shuffle), then explode
    * each active day to the ≤ N window days it feeds — a bounded N×
    * expansion of the already-collapsed frame — dedup per (user,
    * window day), and count. The observed-days semi-join keeps output
    * days meaningful; that side is #days rows, AQE broadcasts it.
    */
  def rollingActiveUsers(df: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val daily = df.select(col(userCol), to_date(col(tsCol)).as("__day")).distinct()
    val contrib = daily
      .select(col(userCol), explode(
        sequence(col("__day"), date_add(col("__day"), windowDays - 1))).as("day"))
      .distinct()
    contrib
      .join(daily.select(col("__day").as("day")).distinct(), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Weekly retention cohorts: users are cohorted by the Monday-start
    * week of their FIRST event; `n_active` counts cohort members with
    * any event in cohort week + `period_week` weeks. The
    * engagement-decay curve every event pipeline reports.
    *
    * Scale shape: the (user, week) distinct is the only event-volume
    * shuffle; the cohort min and the join both reuse the user-key
    * partitioning, and each (user, week) pair maps to exactly one
    * (cohort, period) cell, so the final rollup needs plain counts,
    * not a COUNT DISTINCT expand.
    */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // Week starts are DATEs (so does DuckDB's date_trunc('week')) —
    // a midnight timestamp would just be a date wearing a clock.
    val active = df.select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("__wk"))
      .distinct()
    val cohorts = active.groupBy(col(userCol)).agg(min(col("__wk")).as("cohort_week"))
    active.join(cohorts, userCol)
      .select(col("cohort_week"),
        expr("datediff(__wk, cohort_week) div 7").cast("int").as("period_week"))
      .groupBy(col("cohort_week"), col("period_week"))
      .agg(count(lit(1)).as("n_active"))
  }
}
