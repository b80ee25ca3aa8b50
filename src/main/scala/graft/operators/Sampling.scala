package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Token-BUDGET mixture sampling: training mixtures are specified in
    * tokens per source, not keep-rates — "50M tokens of src0, 20M of
    * src1". Documents are admitted per stratum in deterministic
    * md5-hash order (an engine-portable random permutation) while the
    * running token total stays within that stratum's budget; strata
    * without a budget drop entirely. Deterministic, layout-independent,
    * re-drawable with a different salt — the same properties as
    * [[stratifiedSample]], but budgeted by token mass instead of row
    * fraction. Output keeps `n_tokens` and the running `cum_tokens`
    * so the mixture report is free.
    *
    * Scale shape: ONE shuffle on the stratum key, then a per-stratum
    * sort by 128-bit hash for the running sum — a range-partitioned
    * sort Spark handles at any size; no driver state, no collect. The
    * admission boundary cuts mid-document never: the last admitted doc
    * is the one that keeps cum ≤ budget.
    */
  def tokenBudgetSample(df: DataFrame, strataCol: String, keyCol: String,
                        textCol: String, budgets: Map[String, Long],
                        salt: String = "graft"): DataFrame = {
    val budget = budgets.foldLeft(lit(null).cast("long")) { case (acc, (stratum, b)) =>
      when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket32(col(keyCol), salt))
    df.select(col(keyCol), col(strataCol),
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Full md5 hex of (salt || key) — the deterministic per-stratum
    * permutation order for [[tokenBudgetSample]]; unique per key, so
    * the window order is total and engine-portable.
    */
  def hashBucket32(key: Column, salt: String): Column =
    md5(concat(lit(salt), key.cast("string")).cast("binary"))
}
