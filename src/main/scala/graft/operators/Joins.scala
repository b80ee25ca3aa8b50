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
}
