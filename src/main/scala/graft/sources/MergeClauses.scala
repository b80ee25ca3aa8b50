package graft.sources

import org.apache.spark.sql.Column

/** One action of a MERGE WHEN clause — the full Delta-shaped surface
  * (conditional update / delete / column-list insert), bound to Spark
  * [[Column]] expressions. Reference scope: the reference's pipelines
  * express upserts as drop-and-recreate reconciliation
  * (`Third Experiment/GPT 5.py:100-137`,
  * `Second Experiment/GPT 5 nano.py:106-175`); the clause surface is
  * how those jobs grow conditional CDC-apply / SCD semantics without
  * leaving one atomic commit.
  */
sealed trait MergeAction

object MergeAction {

  /** `UPDATE SET ...`: `None` = `SET *` (every table column takes the
    * source's value — requires source schema = table schema);
    * `Some(m)` assigns the named table columns their expressions and
    * carries every other column from the target row.
    */
  final case class Update(assignments: Option[Map[String, Column]])
      extends MergeAction

  /** `DELETE`: the matched (or not-matched-by-source) target row is
    * removed.
    */
  case object Delete extends MergeAction

  /** `INSERT ...`: `None` = `INSERT *` (the source row verbatim —
    * requires source schema = table schema); `Some(m)` fills the named
    * table columns from their expressions and NULLs the rest.
    */
  final case class Insert(values: Option[Map[String, Column]])
      extends MergeAction
}

/** One `WHEN ... [AND condition] THEN action` clause. Within a clause
  * group, clauses apply first-match-wins in declaration order; a
  * clause without a condition always applies (and must therefore be
  * last in its group). Conditions and expressions reference the target
  * row as `<targetAlias>.<col>` and the source row as
  * `<sourceAlias>.<col>`; the merge keys are also available
  * unqualified.
  */
final case class MergeClause(condition: Option[Column], action: MergeAction)
