package graft.operators

import org.apache.spark.sql.DataFrame

/** Persist-lifecycle helper. `DataFrame.persist` registers the plan in
  * the session CacheManager, which holds a strong reference — blocks
  * stay pinned until an explicit `unpersist`, so an operator that
  * persists an intermediate and returns a lazy result leaks cache in a
  * long-lived session. Operators whose RESULT is small relative to the
  * cached intermediate instead materialize the result eagerly
  * (`localCheckpoint(true)` — its blocks are reference-tracked and
  * freed by the ContextCleaner once the DataFrame is unreachable) and
  * release the pinned intermediates before returning.
  */
private[graft] object Caching {

  /** Eagerly materialize `result`, then unpersist every frame in
    * `cached` (non-blocking). Returns the checkpointed result — same
    * rows, lineage truncated, no CacheManager entries left behind.
    *
    * ONLY for results small relative to the corpus: checkpoint blocks
    * are non-replicated and non-recomputable, so a corpus-sized result
    * would duplicate the corpus into executor storage and turn any
    * executor loss into an unrecoverable downstream failure —
    * corpus-sized outputs return LAZY instead and skip persisting
    * (removeBoilerplate / dedupParagraphs / hygieneSurvivors). The
    * near-dup PAIR frames routed through here qualify because pair
    * volume tracks true duplicate density — hygiene pipelines run
    * exact dedup first — and a corpus degenerate enough to make
    * pairwise output O(n²) defeats any pairwise representation, in
    * any engine, before it defeats this cache policy.
    */
  def materializeAndRelease(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist(false))
    out
  }
}
