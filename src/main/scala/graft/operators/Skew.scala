package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join strategies for the 100 TB path.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`) is the
  * first line of defense and needs no code. Salting is the explicit
  * fallback for the cases AQE can't fix — e.g. one hot key holding >50%
  * of a fact table joined against a non-broadcastable dimension side:
  * the fact side's hot keys are split across `saltBuckets` shuffle
  * partitions, and the other side is replicated `saltBuckets`× so every
  * salted partition finds its match.
  */
object Skew {

  /** Spread an under-split source before a compute-heavy per-row pass
    * (tokenize, shingle, normalize) — and ONLY then. A local
    * single-file corpus arrives as one split, so an unconditional
    * repartition looks free; at corpus scale the scan already has
    * thousands of splits and the same repartition is a full-data
    * shuffle bought for nothing.
    *
    * The decision must not execute the frame: under AQE, a `df.rdd`
    * probe on a plan containing exchanges materializes every upstream
    * shuffle as a real job whose work is then thrown away — and no
    * static physical inspection can see those exchanges, because both
    * `sparkPlan` and AQE's input plan predate `EnsureRequirements`.
    * So the rule is SIZE-based, from optimizer statistics (driver-side
    * plan metadata, runs nothing): a frame whose estimated bytes scan
    * in fewer than par/4 splits is the under-split case AND is cheap
    * to shuffle — spread it; a frame above that is either a well-split
    * scan or a shuffle output, both already parallel, and shuffling it
    * is exactly the corpus-scale cost this gate exists to avoid. The
    * two errors the estimate can make are both benign: over-estimating
    * skips a cheap redundant shuffle; under-estimating repartitions
    * something small.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    // Streaming input: no-op. Accessing optimizedPlan.stats would
    // build a BATCH QueryExecution over the streaming source (which
    // throws), and the gate targets under-split single-file batch
    // scans — a micro-batch's partitioning is the file feed's concern.
    if (df.isStreaming) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    val maxPB = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val estSplits = df.queryExecution.optimizedPlan.stats.sizeInBytes / maxPB
    if (estSplits * 4 < par) df.repartition(par) else df
  }

  /** Salted inner equi-join on `key`: `left` (large, skewed) gets a
    * random-but-deterministic salt derived from stable row content;
    * `right` is exploded `saltBuckets`×. Result equals the plain join
    * (salting only affects partitioning).
    *
    * @param saltOn stable columns of `left` used to derive the salt —
    *               deterministic across retries (no rand()), which
    *               matters for speculative execution and reruns.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltOn: Seq[String], saltBuckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltOn.map(col): _*), lit(saltBuckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Top-N heaviest keys with their frequencies — the diagnostic that
    * decides between broadcast, AQE, and salting. One partial-agg scan.
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
}
