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

  /** As-of join: for every left row, the single nearest right row on
    * the `direction` side of `leftTs` within the same key (the
    * time-series join Spark lacks natively). Composed: both sides
    * union into one keyed timeline, and a carry-forward window
    * (`last(_, ignoreNulls)`) attaches the nearest right payload to
    * each left row — ONE shuffle on the key, but it carries BOTH
    * sides and the sort runs over their union. The custom-planned
    * [[graft.plans.AsOfJoinPlan.asOfNative]] shuffles each side alone
    * and merges with O(1) state (~2× faster at 16M rows, PLANS.md);
    * this composed form remains the variant with right-side tie-break
    * columns, and the two are gated against the same ASOF oracle.
    *
    * `rightCols` are the right-side columns to attach (emitted with an
    * `asof_` prefix, null when no matching right row exists).
    * `direction = "backward"` (default) matches the most recent right
    * row with `rightTs` ≤ `leftTs`; `"forward"` matches the earliest
    * right row with `rightTs` ≥ `leftTs`. `toleranceSec`, when set,
    * nulls out matches farther than that many seconds from `leftTs`
    * (the left row is kept — as-of is a left join). Ties on (key, ts)
    * between sides match (`≤`/`≥` are inclusive, as in ASOF); ties
    * among right rows at the same ts resolve via `tieBreak` — to the
    * last row in tieBreak order for backward, the first for forward.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightCols: Seq[String],
           tieBreak: Seq[String] = Nil, direction: String = "backward",
           toleranceSec: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asOf direction must be backward|forward, got $direction")
    import org.apache.spark.sql.expressions.Window
    // Payload carries the matched right ts (field __mts, needed for the
    // tolerance test) ahead of the requested rightCols.
    val payloadFields = right.select(
      (col(rightTs).as("__mts") +: rightCols.map(col)): _*).schema.fields
    // Tie-break columns survive the union as __tb_i (null on the left
    // side, where they are never compared — left rows carry no payload).
    val tbAliases = tieBreak.zipWithIndex
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(payloadFields)))
    val rightTagged = right
      .select((keys ++ Seq(rightTs) ++ rightCols ++ tieBreak).distinct.map(col): _*)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload",
        struct((col(rightTs).as("__mts") +: rightCols.map(col)): _*))
    val unioned = leftTagged.select(
        (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")) ++
          tbAliases.map { case (c, i) =>
            lit(null).cast(right.schema(c).dataType).as(s"__tb_$i") } ++
          left.columns.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
      .unionByName(
        rightTagged.select(
          (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")) ++
            tbAliases.map { case (c, i) => col(c).as(s"__tb_$i") }: _*)
          .withColumns(left.columns.filterNot(keys.contains)
            .map(c => s"__l_$c" -> lit(null).cast(left.schema(c).dataType)).toMap))
    // Backward walks the timeline ascending; forward walks it descending
    // (so "carry forward the last right row seen" becomes "the earliest
    // right row at-or-after"). Right rows (__side 0) sort before left
    // rows at equal ts in both directions, keeping the bound inclusive.
    val orderCols =
      if (direction == "backward")
        Seq(col("__ts").asc, col("__side").asc) ++
          tbAliases.map { case (_, i) => col(s"__tb_$i").asc }
      else
        Seq(col("__ts").desc, col("__side").asc) ++
          tbAliases.map { case (_, i) => col(s"__tb_$i").desc }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // On surviving (left) rows __ts IS leftTs; the raw left columns are
    // only reachable under their __l_ aliases at this point.
    // The timestamp hop before the double cast keeps the tolerance test
    // working on TIMESTAMP_NTZ inputs (NTZ has no direct double cast;
    // session TZ is pinned UTC so the hop is value-exact).
    val withinTol = toleranceSec match {
      case Some(tol) =>
        abs(col("__ts").cast("timestamp").cast("double") -
          col("__asof.__mts").cast("timestamp").cast("double")) <= tol
      case None => col("__asof").isNotNull
    }
    unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(c =>
          (if (keys.contains(c)) col(c) else col(s"__l_$c")).as(c)) ++
        rightCols.map(c => when(withinTol, col(s"__asof.$c")).as(s"asof_$c")): _*)
  }
}
