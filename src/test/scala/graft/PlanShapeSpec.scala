package graft

/** Plan-shape regression pins for the heaviest lazily-planned gates:
  * shuffle-exchange count, broadcast count, join strategy, and filter
  * pushdown are snapshotted from the reviewed plans, so a planner or
  * operator regression (a broadcast degrading to sort-merge, a new
  * shuffle sneaking into a one-pass pipeline, a filter lifting off the
  * scan) fails `sbt test` BEFORE it shows up as a bench delta.
  *
  * Counts are from the ADAPTIVE INITIAL plan (AQE's runtime re-plan
  * can only improve on it); they are intentionally exact — a pin that
  * only bounds from above would let a second redundant shuffle in
  * silently. When an intentional plan change moves a number, the
  * failure message prints the full formatted plan to re-review and
  * re-pin.
  */
class PlanShapeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  private def shape(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def c(plan: String, pat: String): Int = pat.r.findAllIn(plan).length

  /** Assert the five load-bearing operator counts of one query's plan:
    * shuffle exchanges, broadcast exchanges, sort-merge joins,
    * broadcast hash joins, broadcast nested-loop joins (the one-row
    * crossJoin composition pattern — anything unexpected here is a
    * real cartesian risk).
    */
  private def pin(name: String, exch: Int, bcast: Int, smj: Int, bhj: Int,
                  bnl: Int, pushedFilters: Int = 0): Unit = {
    val p = shape(name)
    def chk(what: String, pat: String, want: Int): Unit =
      assert(c(p, pat) === want, s"$name: $what expected $want\n$p")
    chk("shuffle exchanges", """[)] Exchange""", exch)
    chk("broadcast exchanges", """[)] BroadcastExchange""", bcast)
    chk("sort-merge joins", """[)] SortMergeJoin""", smj)
    chk("broadcast hash joins", """[)] BroadcastHashJoin""", bhj)
    chk("nested-loop joins", """[)] BroadcastNestedLoopJoin""", bnl)
    assert(c(p, """CartesianProduct""") === 0, s"$name: cartesian!\n$p")
    chk("non-empty PushedFilters", """PushedFilters: \[[^\]]""", pushedFilters)
    spark.catalog.clearCache()
  }

  test("q3_join_revenue: one broadcast dim join, two agg exchanges, filters pushed") {
    pin("q3_join_revenue", exch = 2, bcast = 1, smj = 0, bhj = 1, bnl = 0,
      pushedFilters = 2)
  }

  test("q2_monthly_avg: one exchange total — partial aggregation, no join") {
    pin("q2_monthly_avg", exch = 1, bcast = 0, smj = 0, bhj = 0, bnl = 0)
  }

  test("dedup_exact_text: digest groupBy is the only shuffle; text never joins") {
    pin("dedup_exact_text", exch = 1, bcast = 0, smj = 0, bhj = 0, bnl = 0)
  }

  test("decon_overlap: corpus is scanned once, never joined or re-shuffled") {
    // The one exchange is Skew.spread's round-robin of the under-split
    // scan; the benchmark rides INSIDE the expression, so there is no
    // join operator of any kind in the plan.
    pin("decon_overlap", exch = 1, bcast = 0, smj = 0, bhj = 0, bnl = 0)
  }

  test("text_tfidf: every join side broadcasts; no sort-merge joins") {
    pin("text_tfidf", exch = 5, bcast = 2, smj = 0, bhj = 1, bnl = 1)
  }

  test("text_lm_score: LM stats broadcast into scoring; nothing sort-merges") {
    pin("text_lm_score", exch = 9, bcast = 3, smj = 0, bhj = 2, bnl = 1,
      pushedFilters = 3)
  }

  test("text_ppl_buckets: final frame reads the materialized stage, zero exchanges") {
    pin("text_ppl_buckets", exch = 0, bcast = 0, smj = 0, bhj = 0, bnl = 0)
  }

  test("q58_asof_native: custom exec, two exchanges, pruned scans, no built-in join") {
    // The native as-of's contract plan: exactly one exchange per side
    // (each hash-partitioned on its OWN keys — the zipPartitions merge
    // silently assumes this co-partitioning, which is exactly what the
    // pin is for), no union, no window, no join of any built-in kind,
    // and the event_type filters pushed to both scans. ReadSchema must
    // exclude `props` on both sides — the unselected payload column —
    // proving AsOfJoinPruning reached the parquet scans.
    val p = shape("q58_asof_native")
    assert(p.contains("AsOfJoinExec"), p)
    assert(c(p, """[)] Exchange""") === 2, s"q58 exchanges\n$p")
    assert(c(p, """[)] BroadcastExchange""") === 0, p)
    assert(c(p, """SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct""") === 0,
      s"no built-in join may appear\n$p")
    assert(!p.contains("Union") && !p.contains("Window"), p)
    assert(c(p, """PushedFilters: \[[^\]]""") === 2, s"event_type must push\n$p")
    val readSchemas = """ReadSchema: [^\n]+""".r.findAllIn(p).toList
    assert(readSchemas.length === 2, p)
    assert(readSchemas.forall(!_.contains("props")),
      s"unselected payload must not reach a scan\n$p")
  }

  test("q61_asof_broadcast: zero shuffles, zero sorts, one broadcast, pruned scans") {
    // The broadcast physical form's contract plan: the click (fact)
    // side reaches the join straight from its scan — NO exchange and
    // NO sort anywhere in the plan, exactly one BroadcastExchange on
    // the dimension-sized signups. At 100 TB this is the difference
    // between re-partitioning the fact stream and never touching it.
    val p = shape("q61_asof_broadcast")
    assert(p.contains("BroadcastAsOfJoinExec"), p)
    assert(c(p, """[)] Exchange""") === 0, s"q61 must not shuffle\n$p")
    assert(c(p, """[)] BroadcastExchange""") === 1, p)
    assert(c(p, """[)] Sort""") === 0, s"q61 must not sort\n$p")
    assert(c(p, """SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct""") === 0,
      s"no built-in join may appear\n$p")
    assert(c(p, """PushedFilters: \[[^\]]""") === 2, s"event_type must push\n$p")
    val readSchemas = """ReadSchema: [^\n]+""".r.findAllIn(p).toList
    assert(readSchemas.length === 2, p)
    assert(readSchemas.forall(!_.contains("props")),
      s"unselected payload must not reach a scan\n$p")
    spark.catalog.clearCache()
  }

  test("sample_importance: top-k reads the materialized scored stage, no global sort") {
    // The two LM trainings now run ONE tagged explode each (unigrams +
    // bigrams in a single tokenization pass, persisted counts) and the
    // scored frame materializes eagerly, releasing both caches — so
    // the residual plan the consumer sees is a checkpoint scan plus a
    // TakeOrderedAndProject top-k (per-partition heaps, never a global
    // sort), exactly like text_ppl_buckets' materialized stage. The
    // heavy stage's arithmetic equivalence is pinned by the
    // importanceScore spec in OperatorsSpec.
    val p = shape("sample_importance")
    assert(c(p, """[)] Exchange""") === 0, s"sample_importance exchanges\n$p")
    assert(c(p, """[)] SortMergeJoin""") === 0, p)
    // `X (n)` counts tree occurrences only (the detail section repeats
    // the node name without the id suffix).
    assert(c(p, """TakeOrderedAndProject \(""") === 1,
      s"top-k must stay TakeOrderedAndProject (no global sort)\n$p")
    assert(c(p, """CartesianProduct""") === 0, p)
    spark.catalog.clearCache()
  }
}
