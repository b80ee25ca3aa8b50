package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximations — the scale drop-ins for exact operators
  * whose state would not fit at 100 TB (SURVEY §2.4 A9 note: exact
  * `countDistinct` shuffles every distinct value; HyperLogLog shuffles
  * a fixed-size sketch).
  */
object Sketches {

  /** HLL distinct count: fixed-memory, mergeable, one partial-agg pass. */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"approx_${cols.head}"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"approx_$c")): _*)

  /** Approximate quantiles per column (Greenwald-Khanna sketch). */
  def approxQuantiles(df: DataFrame, column: String, probs: Seq[Double],
                      relativeError: Double = 0.01): Seq[Double] =
    df.stat.approxQuantile(column, probs.toArray, relativeError).toSeq

  /** describe()/summary() profiling (SURVEY §2.4 A10) — count, mean,
    * stddev, min, max per numeric column.
    */
  def describe(df: DataFrame, cols: String*): DataFrame = df.describe(cols: _*)

  /** Fixed-width histogram of `valCol`, optionally per group: bin i
    * covers [i·binWidth, (i+1)·binWidth). One partial-aggregable
    * groupBy — the distribution profile without q34's percentile
    * state or `histogram_numeric`'s non-deterministic centroids.
    * Bin membership is engine-portable: IEEE division and floor are
    * exactly specified, so the same double lands in the same bin
    * everywhere.
    */
  def histogram(df: DataFrame, valCol: String, binWidth: Double,
                groupCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = floor(col(valCol) / binWidth).cast("long").as("bin")
    val lo = (col("bin") * binWidth).as("bin_lo")
    df.groupBy((groupCols.map(col) :+ (bin: Column)): _*)
      .agg(count(lit(1)).as("n_rows"))
      .select((groupCols.map(col) ++ Seq(col("bin"), lo, col("n_rows"))): _*)
  }
}
