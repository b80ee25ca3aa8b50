package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus construction and data mixing.
  *
  * `sample()`/TABLESAMPLE are seeded per-partition, so their output
  * changes with the file layout — useless when a sample must be
  * reproducible across engines, re-runs, and cluster sizes. The hash
  * sampler here buckets each row by the first byte of
  * `md5(salt || key)`: pure map work (no shuffle, no state), stable
  * under repartitioning, consistent across any engine with md5, and
  * rows can be re-drawn with a different salt. Bucket granularity is
  * 1/256 — rate resolution for corpus mixing, where weights are
  * coarse by nature.
  */
object Sampling {

  /** Two-hex-char bucket ('00'..'ff') of md5(salt || key) — uniform
    * over 256 values, deterministic, engine-portable.
    */
  def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 2)

  /** Keep a row iff its bucket falls below `rate` (rounded down to a
    * multiple of 1/256).
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < lit(cutHex(rate)))

  /** Stratified corpus mixing: an independent hash-sample rate per
    * stratum (e.g. per source, the up/down-weighting step of a
    * training-data mixture). Strata absent from `rates` are dropped.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       rates: Map[String, Double], salt: String = "graft"): DataFrame = {
    val cut = rates.foldLeft(lit(null).cast("string")) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, lit(cutHex(rate))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < cut)
  }

  /** `floor(rate*256)` as a 2-digit lowercase hex literal — the string
    * bound the hex bucket compares against lexicographically. rate=1.0
    * maps to "g", which sorts after every hex pair, keeping all rows.
    */
  def cutHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val n = math.floor(rate * 256).toInt
    if (n >= 256) "g" else f"$n%02x"
  }
}
