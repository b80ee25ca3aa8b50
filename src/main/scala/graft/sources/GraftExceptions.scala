package graft.sources

/** A LOST OPTIMISTIC-CONCURRENCY RACE — another writer committed the
  * version slot (or intervening commits are not provably disjoint from
  * this operation's read set). The documented recovery is always the
  * same: re-read the table and re-run the operation against the new
  * snapshot. Distinct from a generic [[IllegalStateException]] so that
  * policy code can tell a benign race loss (safe to swallow in
  * best-effort background work, safe to retry in a loop) from a
  * genuine invariant violation — the post-commit auto-maintenance hook
  * swallows exactly this type and nothing else. Extends
  * IllegalStateException so every pre-existing retry loop that catches
  * the broad type keeps working unchanged.
  */
class GraftConflictException(message: String, cause: Throwable = null)
    extends IllegalStateException(message, cause)

/** POST-COMMIT MAINTENANCE FAILED — **the user's mutation COMMITTED**
  * (durably, at [[committedVersion]]) and only the best-effort
  * auto-maintenance that piggybacks after it blew up. Callers must NOT
  * retry the mutation on this exception: the write is already in the
  * log, and re-running it would double-apply (an `UPDATE SET v = v+1`
  * applied twice; a non-txn streaming batch merged twice). A distinct
  * non-IllegalStateException type, so no commit-retry loop can mistake
  * it for a slot conflict. Recovery: read [[committedVersion]] as the
  * mutation's result, then investigate/re-run the maintenance
  * (OPTIMIZE / coalesceDv) on its own.
  */
class GraftPostCommitMaintenanceException(val committedVersion: Int,
                                          message: String, cause: Throwable)
    extends RuntimeException(message, cause)
