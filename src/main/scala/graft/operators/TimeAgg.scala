package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed aggregation (SURVEY.md §2.4 A2–A6, the E2 "Gold"
  * aggregate: `Second Experiment/Qwen3-235B-A22B-2507.py:125-136`).
  *
  * The programmatic agg-expression-list pattern (A3) is first-class: a
  * metric list expands into one hash-aggregate pass — partial (map-side)
  * + final, one shuffle on the bucket keys, regardless of metric count.
  */
object TimeAgg {

  /** groupBy(year, month) with avg per metric, aliased `avg_<m>` —
    * byte-for-byte the reference's monthly table shape.
    */
  def monthlyAvg(df: DataFrame, tsCol: String, metrics: Seq[String]): DataFrame =
    df.groupBy(year(col(tsCol)).as("year"), month(col(tsCol)).as("month"))
      .agg(
        metrics.map(m => avg(col(m)).as(s"avg_$m")).head,
        metrics.map(m => avg(col(m)).as(s"avg_$m")).tail: _*
      )

  /** Generic bucketed multi-stat: avg/min/max/count per metric in a
    * single pass (A5's 28-aggregate shape).
    */
  def bucketedStats(df: DataFrame, buckets: Seq[Column], metrics: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = metrics.flatMap { m =>
      Seq(
        avg(col(m)).as(s"avg_$m"),
        min(col(m)).as(s"min_$m"),
        max(col(m)).as(s"max_$m"),
        count(col(m)).as(s"cnt_$m")
      )
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(buckets: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Conditional aggregates (A4): avg over rows passing `cond` only. */
  def conditionalAvg(df: DataFrame, buckets: Seq[Column], m: String, cond: Column): DataFrame =
    df.groupBy(buckets: _*)
      .agg(
        avg(when(cond, col(m))).as(s"avg_${m}_cond"),
        count(when(cond, lit(1))).as("n_cond"),
        count(lit(1)).as("n_total")
      )
}
