package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` examples — the Dataset-native
  * custom-aggregation surface (SURVEY §2.11: the reference registers no
  * UDAFs; this is where they'd enter). Aggregators partial-aggregate
  * map-side and merge like built-ins, so they scale identically.
  */
object TypedAggregators {

  /** Geometric mean via exp(mean(ln x)) — numerically stable (sums
    * logs, not products), mergeable, and oracle-expressible as
    * `exp(avg(ln(x)))` in any ANSI engine. Ignores nulls and
    * non-positive values (log-domain), like built-in avg ignores nulls.
    */
  object GeometricMean extends Aggregator[java.lang.Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
      if (a == null || a <= 0.0) b else (b._1 + math.log(a), b._2 + 1)
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form, usable in untyped agg: `df.agg(geomean(col))`. */
  def geomean(column: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(GeometricMean).apply(column)
}
