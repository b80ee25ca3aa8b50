package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.plans.{AsOfJoinExec, AsOfJoinPlan, AsOfJoinStrategy, GraftExtensions}

class AsOfNativeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private lazy val leftDf = Seq(
    (1L, ts(10), "L10"), (1L, ts(20), "L20"), (2L, ts(5), "L5"))
    .toDF("k", "t", "lv")
  private lazy val rightDf = Seq(
    (1L, ts(5), "a"), (1L, ts(15), "b"), (1L, ts(20), "c"), (2L, ts(50), "z"))
    .toDF("k", "rt", "rv")

  private def run(direction: String, tol: Option[Long],
                  hint: Option[String] = None) =
    AsOfJoinPlan.asOfNative(leftDf, rightDf, Seq("k"), "t", "rt",
        direction = direction, toleranceSec = tol, hint = hint)
      .select(col("k"), col("lv"), col("asof_rv"))
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet

  // Both physical forms (shuffled merge and broadcast) must reproduce
  // the same hand-computed truth — parametrized over the hint.
  for (h <- Seq(Some("merge"), Some("broadcast")))
  test(s"native as-of (${h.get}): hand-computed backward/forward/tolerance semantics") {
    assert(run("backward", None, h) === Set(
      (1L, "L10", Some("a")),  // last rt <= 10 is 5
      (1L, "L20", Some("c")),  // bound is inclusive: rt == 20 matches
      (2L, "L5", None)))       // only future right rows exist
    assert(run("forward", None, h) === Set(
      (1L, "L10", Some("b")),  // first rt >= 10 is 15
      (1L, "L20", Some("c")),
      (2L, "L5", Some("z"))))
    // Tolerance boundary: |t - rt| == tol still matches, tol-1 doesn't.
    assert(run("backward", Some(5L), h) === Set(
      (1L, "L10", Some("a")), (1L, "L20", Some("c")), (2L, "L5", None)))
    assert(run("backward", Some(4L), h) === Set(
      (1L, "L10", None), (1L, "L20", Some("c")), (2L, "L5", None)))
    assert(run("forward", Some(10L), h) === Set(
      (1L, "L10", Some("b")), (1L, "L20", Some("c")), (2L, "L5", None)))
  }

  test("native as-of equals the composed operator on the real events fixture") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"), col("event_id").as("signup_id"))
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(86400L))) {
      val composed = graft.operators.Joins.asOf(clicks, signups, Seq("user_id"),
          "ts", "signup_ts", Seq("signup_id"), direction = dir, toleranceSec = tol)
        .select(col("event_id"), col("asof_signup_id"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      for (h <- Seq(Some("merge"), Some("broadcast"))) {
        val native = AsOfJoinPlan.asOfNative(clicks, signups, Seq("user_id"),
            "ts", "signup_ts", direction = dir, toleranceSec = tol, hint = h)
          .select(col("event_id"), col("asof_signup_id"))
          .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
        assert(native === composed, s"dir=$dir tol=$tol hint=$h")
        assert(native.nonEmpty)
      }
    }
  }

  test("native as-of plans its own exec: two exchanges, no union, no window") {
    val q = AsOfJoinPlan.asOfNative(leftDf, rightDf, Seq("k"), "t", "rt",
      hint = Some("merge"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 2, plan)
    assert(!plan.contains("Union"), plan)
    assert(!plan.contains("Window"), plan)
    // The composed form's shape, for contrast: union + window, and the
    // payload rides one combined stream.
    val composed = graft.operators.Joins.asOf(
      leftDf, rightDf, Seq("k"), "t", "rt", Seq("rv"))
    val cplan = composed.queryExecution.executedPlan.toString
    assert(cplan.contains("Union") && cplan.contains("RunningWindowFunction") ||
      cplan.contains("Window"), cplan)
  }

  for (h <- Seq(Some("merge"), Some("broadcast")))
  test(s"native as-of (${h.get}): empty right null-extends; null keys/times never match") {
    val emptyRight = rightDf.filter(lit(false))
    val r = AsOfJoinPlan.asOfNative(leftDf, emptyRight, Seq("k"), "t", "rt", hint = h)
      .select(col("asof_rv")).collect()
    assert(r.length === 3 && r.forall(_.isNullAt(0)))
    val nullishLeft = Seq(
      (Option(1L), Option(ts(10)), "ok"),
      (Option.empty[Long], Option(ts(10)), "nullkey"),
      (Option(1L), Option.empty[Timestamp], "nulltime"))
      .toDF("k", "t", "lv")
    val nullishRight = Seq(
      (Option(1L), Option(ts(5)), "a"),
      (Option.empty[Long], Option(ts(1)), "nk"),
      (Option(1L), Option.empty[Timestamp], "nt"))
      .toDF("k", "rt", "rv")
    val out = AsOfJoinPlan.asOfNative(nullishLeft, nullishRight, Seq("k"), "t", "rt",
        hint = h)
      .select(col("lv"), col("asof_rv"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out === Map("ok" -> Some("a"), "nullkey" -> None, "nulltime" -> None))
  }

  test("GraftExtensions wires the strategy through the spark.sql.extensions path") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    val strategies = org.apache.spark.sql.GraftSqlBridge.plannerStrategies(e, spark)
    assert(strategies.contains(AsOfJoinStrategy), strategies.toString)
  }

  test("AsOfJoinPruning drops unselected right payload before the exchange") {
    // The right side carries a junk payload column nobody selects; the
    // optimizer rule must prune it below the node so it never rides
    // the right-side shuffle (and would shrink a parquet ReadSchema
    // the same way, through PhysicalOperation collapsing).
    val fat = rightDf.withColumn("zz_payload", concat(lit("x"), col("rv")))
    val q = graft.plans.AsOfJoinPlan.asOfNative(leftDf, fat, Seq("k"), "t", "rt")
      .select(col("k"), col("lv"), col("asof_rv"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("zz_payload"), plan)
    // And the result is unchanged by the pruning.
    val out = q.collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(out === Set((1L, "L10", Some("a")), (1L, "L20", Some("c")), (2L, "L5", None)))
    // Keys/time survive pruning even when unselected: selecting ONLY a
    // left column still works (the node needs its keys internally).
    val only = graft.plans.AsOfJoinPlan.asOfNative(leftDf, fat, Seq("k"), "t", "rt")
      .select(col("lv"))
    assert(only.collect().length === 3)
    assert(!only.queryExecution.optimizedPlan.toString.contains("zz_payload"))
  }

  test("AsOfJoinExec exposes SQLMetrics: output rows and matched rows") {
    // The custom exec must be as observable as a built-in join: after a
    // run, the UI-visible metrics carry (rows out = left rows) and the
    // match count — the operational signal (a collapsing match rate
    // means the right feed is late) a 100 TB operator owner watches.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Option[AsOfJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan) // stages hide their plan from children
      case e: AsOfJoinExec => Some(e)
      case other => other.children.flatMap(find(_)).headOption
    }
    val q = AsOfJoinPlan.asOfNative(leftDf, rightDf, Seq("k"), "t", "rt",
      hint = Some("merge"))
    // collect() drives THIS frame's QueryExecution (count() would plan
    // and execute a separate one, leaving these metrics untouched).
    assert(q.collect().length === 3)
    val exec = find(q.queryExecution.executedPlan)
      .getOrElse(fail(s"no AsOfJoinExec in\n${q.queryExecution.executedPlan}"))
    // Backward over the hand data: L10→a, L20→c match; (2, L5) doesn't.
    assert(exec.metrics("numOutputRows").value === 3)
    assert(exec.metrics("numMatchedRows").value === 2)
  }

  test("broadcast as-of: no shuffle at all, one BroadcastExchange, same metrics") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Option[graft.plans.BroadcastAsOfJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case e: graft.plans.BroadcastAsOfJoinExec => Some(e)
      case other => other.children.flatMap(find(_)).headOption
    }
    val q = AsOfJoinPlan.asOfNative(leftDf, rightDf, Seq("k"), "t", "rt",
      hint = Some("broadcast"))
    assert(q.collect().length === 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoinExec"), plan)
    // The fact side is never exchanged or sorted: zero shuffles, zero
    // sorts, exactly one broadcast of the dimension side.
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, plan)
    assert(!plan.contains("Sort "), plan)
    // AQE prints Final + Initial plan sections, so assert presence here;
    // PlanShapeSpec pins the exact single-BroadcastExchange count.
    assert(plan.contains("BroadcastExchange IdentityBroadcastMode"), plan)
    val exec = find(q.queryExecution.executedPlan)
      .getOrElse(fail(s"no BroadcastAsOfJoinExec in\n${q.queryExecution.executedPlan}"))
    assert(exec.metrics("numOutputRows").value === 3)
    assert(exec.metrics("numMatchedRows").value === 2)
  }

  test("auto selection: small right broadcasts, threshold -1 falls back to merge") {
    // No hint: the strategy sizes the right side like JoinSelection.
    val auto = AsOfJoinPlan.asOfNative(leftDf, rightDf, Seq("k"), "t", "rt")
    assert(auto.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoinExec"),
      auto.queryExecution.executedPlan.toString)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merge = AsOfJoinPlan.asOfNative(leftDf, rightDf, Seq("k"), "t", "rt")
      val p = merge.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastAsOfJoinExec") && p.contains("AsOfJoinExec"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("native as-of survives AQE and repartitioned ragged inputs") {
    // Many partitions, deliberately mismatched pre-shuffle layouts —
    // EnsureRequirements must co-partition both sides.
    val l = leftDf.repartition(7)
    val r = rightDf.repartition(3)
    val out = AsOfJoinPlan.asOfNative(l, r, Seq("k"), "t", "rt", hint = Some("merge"))
      .select(col("k"), col("lv"), col("asof_rv"))
      .collect().map(x => (x.getLong(0), x.getString(1), Option(x.getString(2)))).toSet
    assert(out === Set((1L, "L10", Some("a")), (1L, "L20", Some("c")), (2L, "L5", None)))
    assert(out.hashCode !== 0) // touch AsOfJoinExec path is exercised above
  }
}
