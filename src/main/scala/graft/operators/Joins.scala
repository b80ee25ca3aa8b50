package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3 J1–J4).
  *
  * The reference's single join shape — inner equi-join on a timestamp —
  * maps directly to `Dataset.join(..., Seq(key), "inner")`; Catalyst
  * picks BroadcastHashJoin at reference row counts and SortMergeJoin at
  * scale with no code change. We add the helpers the shape implies:
  * column disambiguation (J4), explicit broadcast for known-small dims,
  * and anti/semi variants for "rows removed" reporting.
  */
object Joins {

  /** J1: USING-style inner equi-join; join keys appear once in output. */
  def equi(left: DataFrame, right: DataFrame, keys: Seq[String], how: String = "inner"): DataFrame =
    left.join(right, keys, how)

  /** J4: prefix-rename every non-key column of `df` (merge prep /
    * disambiguation: `Third Experiment/Claude Haiku 3.5.py:137-158`).
    */
  def prefixed(df: DataFrame, prefix: String, except: Seq[String]): DataFrame =
    df.select(df.columns.map { c =>
      if (except.contains(c)) col(c) else col(c).as(s"${prefix}_$c")
    }.toIndexedSeq: _*)

  /** Dimension join with an explicit broadcast hint — at 100 TB the fact
    * side must never shuffle for a kilobyte-scale dimension table.
    */
  def withDim(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "inner")

  /** Rows of `left` whose key has no match in `right` (the "what was
    * dropped by the inner join" report the reference computes with two
    * counts; one anti-join job here).
    */
  def dropped(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Binned range join: pairs (l, r) sharing `keys` with
    * |l.leftTs − r.rightTs| ≤ `toleranceSec` — the interval join that
    * would otherwise plan as a cartesian product with a filter. Both
    * sides bucket their timestamps into tolerance-sized bins; a left
    * row can only match right rows in its own or adjacent bins, so the
    * left side explodes into 3 bin keys and the join runs as a plain
    * equi-join on (keys, bin) before the exact predicate. Shuffle is
    * O(3·|L| + |R|) keyed rows; no cross product ever materializes.
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String, toleranceSec: Long): DataFrame = {
    val lBin = (unix_timestamp(col(leftTs)) / toleranceSec).cast("long")
    val rBin = (unix_timestamp(col(rightTs)) / toleranceSec).cast("long")
    val l = left.withColumn("__bin", explode(array(lBin - 1, lBin, lBin + 1)))
    val r = right.withColumn("__bin", rBin)
    l.join(r, keys :+ "__bin")
      .filter(abs(unix_timestamp(col(leftTs)) - unix_timestamp(col(rightTs))) <= toleranceSec)
      .drop("__bin")
  }

  /** As-of join: for every left row, the single most recent right row
    * with `rightTs` ≤ `leftTs` within the same key (the time-series
    * join Spark lacks natively). Composed, not custom-planned: both
    * sides union into one keyed timeline, and a carry-forward window
    * (`last(_, ignoreNulls)`) attaches the latest right payload to
    * each left row. ONE shuffle on the key, sort within partitions —
    * the same cost profile a dedicated as-of SparkPlan would have.
    *
    * `rightCols` are the right-side columns to attach (emitted with an
    * `asof_` prefix, null when no right row precedes the left row).
    * Both timestamp columns must be named differently from `asof_ts`.
    * Ties on (key, ts) between sides resolve as right-before-left
    * (i.e., `≤`, matching ASOF semantics); ties among right rows
    * resolve to the later row in `tieBreak` order.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightCols: Seq[String],
           tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val rightTagged = right
      .select((keys ++ Seq(rightTs) ++ rightCols ++ tieBreak).distinct.map(col): _*)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(rightCols.map(col): _*))
    val unioned = leftTagged.select(
        (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")) ++
          left.columns.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
      .unionByName(
        rightTagged.select(
          (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")): _*)
          .withColumns(left.columns.filterNot(keys.contains)
            .map(c => s"__l_$c" -> lit(null).cast(left.schema(c).dataType)).toMap))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(col("__ts"), col("__side")) ++ tieBreak.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c =>
          (if (keys.contains(c)) col(c) else col(s"__l_$c")).as(c)) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
