package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Hot-bucket guard for banded candidate self-joins (MinHash bands,
  * SimHash chunks, sign-LSH buckets).
  *
  * Every banded near-dup path joins a (bucket_key, id) frame with
  * itself, so its cost is Σ O(|bucket|²) — bounded ONLY by the bucket
  * populations. One degenerate bucket re-creates the all-pairs blowup
  * inside a single key: millions of short docs sharing a SimHash chunk
  * value, a dense embedding cluster in one LSH bucket, a boilerplate
  * band every page of a crawl emits. Exact-dedup-first ordering
  * mitigates (identical docs collapse before banding) but cannot bound
  * it — near-identical inputs survive exact dedup and still collide.
  *
  * [[capBuckets]] bounds it: each bucket keeps at most `cap` rows — a
  * deterministic pseudo-random subsample, ordered by `xxhash64(id)` so
  * the kept set is unbiased w.r.t. insertion order and stable across
  * runs — making the self-join's worst case Σ O(cap²) per bucket. The
  * cost is recall on degenerate buckets only (healthy buckets sit far
  * below any sane cap and are untouched); the dropped-row count is
  * surfaced through a [[LongAccumulator]] so the loss is observable,
  * and the recall gates (`ann_lsh_recall`, `dedup_simhash_planted`,
  * the MinHash exact-pair oracle) keep the guard honest.
  *
  * Plan shape: the row_number window hash-partitions on the bucket key
  * — the SAME partitioning the candidate self-join needs — so the
  * guard adds one within-partition sort and NO extra shuffle.
  */
private[graft] object BucketGuard {

  /** Default population cap: 1000 rows/bucket ⇒ ≤ ~500k candidate
    * pairs per degenerate bucket — bounded work per key at any corpus
    * size, while sitting far above the bucket sizes a healthy banding
    * produces (buckets exist to be selective; a bucket thousands deep
    * is the pathology, not the signal).
    */
  val DefaultMaxBucket = 1000

  /** `banded` filtered to at most `cap` rows per distinct value of
    * `bucketCols`, keeping the `cap` lowest `xxhash64(idCol)` rows
    * (ties broken by id — a deterministic total order). When
    * `dropCounter` is set, every dropped row increments it; in a
    * self-join the guarded subtree evaluates once per side, so read
    * the counter as "guard engaged, magnitude ~N", not an exact count.
    */
  def capBuckets(banded: DataFrame, bucketCols: Seq[String], idCol: String,
                 cap: Int, dropCounter: Option[LongAccumulator] = None): DataFrame = {
    require(cap > 0, s"bucket cap must be positive, got $cap")
    val w = Window.partitionBy(bucketCols.map(col): _*)
      .orderBy(xxhash64(col(idCol)), col(idCol))
    val rn = banded.withColumn("__rn", row_number().over(w))
    val kept = dropCounter match {
      case Some(acc) =>
        val spark = banded.sparkSession
        // Registered through the function registry like the other
        // stateful expressions (graft_centroid_scores): the builder
        // captures THIS call's accumulator and the filter below is
        // analyzed eagerly, so sequential calls cannot cross-bind.
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_bucket_gate",
          exprs => graft.plans.DropCounted(exprs.head, acc), "built-in")
        rn.filter(call_function("graft_bucket_gate", col("__rn") <= cap))
      case None => rn.filter(col("__rn") <= cap)
    }
    kept.drop("__rn")
  }
}
