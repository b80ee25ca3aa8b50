package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.5 W1–W3, §2.6 D1–D2).
  *
  * The reference's keep-first dedup is mostly non-deterministic — it
  * windows `partitionBy("time").orderBy("time")`, a no-op ordering
  * (`Third Experiment/Claude Sonnet 4.py:239-244`). Only one variant
  * pins an order (`Third Experiment/Gpt 5 mini.py:190-197`). We adopt
  * the deterministic form: the caller supplies an explicit tie-break
  * ordering, so "first" is well-defined across retries and cluster
  * sizes — a hard requirement for an oracle-checked engine.
  */
object Dedup {

  /** Non-deterministic fast path (D1): Spark's hash-based dropDuplicates.
    * One shuffle on the key columns; keeps an arbitrary row per key.
    */
  def dropDuplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic keep-first (W3 semantics): exactly one row per key,
    * the minimum under `order`. Implemented as row_number over a window
    * — a single shuffle on `keys`, sort within partitions only.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** keepFirst via min_by-style aggregation instead of a window — same
    * semantics when `order` is a single unique-per-key column, but
    * partial-aggregates map-side (cheaper shuffle than the window form
    * when duplicates are abundant).
    */
  def keepFirstAgg(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(
        min_by(struct(payload.toIndexedSeq.map(col): _*), col(orderCol)).as("__row")
      )
      .select(keys.map(col) ++ payload.map(p => col(s"__row.$p").as(p)): _*)
  }

  /** Full-row distinct (D2). */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** Exact content dedup for a corpus: group by a content hash so the
    * shuffle carries (hash, min id) instead of full text — the 100 TB
    * form of "dropDuplicates(text)". Returns the surviving doc ids.
    */
  def exactByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(contentCol).cast("binary"), 256).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("group_size"))
}
