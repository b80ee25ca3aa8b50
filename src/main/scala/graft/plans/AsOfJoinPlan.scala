package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** AS-OF JOIN as a first-class planner operator — the escalation tier
  * for semantics the built-in operators can't express EFFICIENTLY:
  * the composed form ([[graft.operators.Joins.asOf]]) unions both
  * sides into one stream and runs an unbounded-preceding window over
  * it, which shuffles left+right TOGETHER and sorts the union; this
  * operator instead asks the planner for the join's natural physical
  * form — each side hash-partitioned by its OWN keys and sorted by
  * (keys, time) — and merges the two sorted streams with O(1) state
  * per partition (the single best-so-far right row). At 100 TB the
  * difference is one union-sized shuffle+sort versus two
  * independently-sized exchanges that AQE can also reuse, plus a
  * merge pass that never materializes per-key windows.
  *
  * Semantics: for every left row, the LAST right row with the same
  * keys and `rightTime <= leftTime` (direction "backward") or the
  * FIRST with `rightTime >= leftTime` ("forward"), optionally within
  * `toleranceSec`; unmatched left rows null-extend (left-outer, like
  * DuckDB/pandas ASOF). Null join keys and null times never match.
  * Ties on equal (keys, rightTime) are resolved by sort order — use
  * the composed form's tie-break columns when the right side is
  * ambiguous there.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                    leftTime: Attribute, rightTime: Attribute,
                    direction: String, toleranceSec: Option[Long],
                    hint: Option[String] = None)
    extends BinaryNode {
  require(direction == "backward" || direction == "forward",
    s"asOf direction must be backward|forward, got $direction")
  require(hint.forall(h => h == "merge" || h == "broadcast"),
    s"asOf hint must be merge|broadcast|None(auto), got $hint")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"asOf key types disagree: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  Seq(leftTime, rightTime).foreach(t =>
    require(t.dataType == TimestampType || t.dataType == TimestampNTZType ||
      t.dataType == LongType,
      s"asOf time column must be timestamp-like, got ${t.dataType} for ${t.name}"))

  // Right side null-extends on unmatched left rows; exprIds are kept so
  // the physical projection binds against the raw child outputs.
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoin]] → [[AsOfJoinExec]] (shuffled merge) or
  * [[BroadcastAsOfJoinExec]] (dimension-sized right). Physical
  * selection mirrors Spark's own JoinSelection: an explicit `hint`
  * wins; otherwise broadcast iff the right side's estimated size fits
  * under `spark.sql.autoBroadcastJoinThreshold`. Registered either at
  * runtime ([[AsOfJoinPlan.register]]) or at session build via the
  * `spark.sql.extensions` conf ([[GraftExtensions]]).
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val useBroadcast = j.hint match {
        case Some("broadcast") => true
        case Some("merge") => false
        case _ => threshold > 0 && j.right.stats.sizeInBytes >= 0 &&
          j.right.stats.sizeInBytes <= threshold
      }
      if (useBroadcast)
        BroadcastAsOfJoinExec(planLater(j.left), planLater(j.right),
          j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
          j.direction, j.toleranceSec, j.output) :: Nil
      else
        AsOfJoinExec(planLater(j.left), planLater(j.right),
          j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
          j.direction, j.toleranceSec, j.output) :: Nil
    case _ => Nil
  }
}

/** Column pruning THROUGH the custom node — the `Rule[LogicalPlan]`
  * half of the extension tier. The built-in ColumnPruning rule doesn't
  * know [[AsOfJoin]]'s internals, so without this a right-side payload
  * column nobody selects still rides the right exchange and sort. The
  * rule narrows each child to (columns the parent projection uses) ∪
  * (the node's own keys and time); the inserted Project reaches the
  * scan through PhysicalOperation collapsing at planning time, so
  * parquet ReadSchema shrinks too. Idempotent: a second pass finds
  * nothing left to drop.
  */
object AsOfJoinPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, j: AsOfJoin) =>
      val neededL = AttributeSet(j.leftKeys :+ j.leftTime) ++ p.references
      val neededR = AttributeSet(j.rightKeys :+ j.rightTime) ++ p.references
      val keepL = j.left.output.filter(neededL.contains)
      val keepR = j.right.output.filter(neededR.contains)
      if (keepL.length == j.left.output.length &&
          keepR.length == j.right.output.length) p
      else p.copy(child = j.copy(
        left = if (keepL.length == j.left.output.length) j.left
               else Project(keepL, j.left),
        right = if (keepR.length == j.right.output.length) j.right
                else Project(keepR, j.right)))
  }
}

/** `spark.sql.extensions`-loadable entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy((_: SparkSession) => AsOfJoinStrategy)
    e.injectOptimizerRule((_: SparkSession) => AsOfJoinPruning)
    // SQL frontend: `... ASOF [LEFT] JOIN ... ON k-eq AND time-ineq`
    // parses into the same custom operator (see AsOfSql.scala).
    e.injectParser((_: SparkSession, delegate) => new GraftSqlParser(delegate))
    e.injectResolutionRule((_: SparkSession) => ResolveAsOfJoin)
  }
}

/** Physical as-of merge join. EnsureRequirements satisfies the
  * declared needs exactly as for a sort-merge join: one hash exchange
  * per side (clustered on that side's keys — co-partitioning checked
  * the same way SMJ's is) and a (keys, time) sort within partitions.
  * The merge then consumes both sorted iterators in lockstep holding
  * at most ONE buffered right row and one best-match copy — state is
  * O(1) regardless of key cardinality or time density.
  *
  * Skew: like every keys-clustered join, a single pathologically hot
  * key serializes into one task (AQE skew-join splitting does not
  * apply — it requires a join the planner knows how to split, and the
  * O(1)-state merge cannot process a key's time range out of order
  * without replaying the right side per split). The mitigation at
  * 100 TB is upstream: time-bucket the hot key into (key, epoch-day)
  * composite keys and as-of join within buckets, carrying the previous
  * bucket's last right row as a seed — the composed-operator form of
  * that rewrite works today via [[graft.operators.Joins.asOf]] on the
  * widened key.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        direction: String, toleranceSec: Option[Long],
                        output: Seq[Attribute])
    extends BinaryExecNode {

  override def nodeName: String = "AsOfJoinExec"

  // Observable in the Spark UI / SQLAppStatusStore like every built-in
  // join: total rows out (= left rows — as-of is left-preserving) and
  // how many of them actually matched a right row. The match rate is
  // the number an operator owner watches at scale: a collapsing rate
  // after a deploy means the right feed is late/empty, long before
  // anyone reads result data.
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val forward = direction == "forward"
    val tolMicros = toleranceSec.map(_ * 1000000L)
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOut = left.output; val rOut = right.output
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // Bind the output against a RIGHT-side-nullable input schema: the
      // join null-extends unmatched left rows, so even a non-nullable
      // right column (typed Datasets from Seq; NOT NULL parquet) must
      // be read with a null check — binding it non-nullable would read
      // the null-extension's storage as zeros.
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // One buffered (unconsumed) right row + its key/time.
        private var rRow: UnsafeRow = _
        private var rKey: UnsafeRow = _
        private var rTimeVal: Long = 0L
        private var rExhausted = false
        // Backward only: the best match so far for its key.
        private var best: UnsafeRow = _
        private var bestKey: UnsafeRow = _
        private var bestTime: Long = 0L

        /** Pull the next usable right row into the buffer (skipping
          * null-key/null-time rows, which can never match).
          */
        private def fillRight(): Unit = {
          while (rRow == null && !rExhausted) {
            if (!rIter.hasNext) { rExhausted = true; return }
            val r = rIter.next()
            val k = rKeyProj(r)
            val t = rTimeProj(r)
            if (!k.anyNull && !t.isNullAt(0)) {
              // Copies: unsafe rows are reused by the upstream iterator.
              rRow = r.asInstanceOf[UnsafeRow].copy()
              rKey = k.copy()
              rTimeVal = t.getLong(0)
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          if (lk.anyNull || lt.isNullAt(0)) {
            numOutputRows += 1
            return resultProj(joined(l, nullRight))
          }
          val ltv = lt.getLong(0)
          // Advance the right side past everything that can no longer
          // match any future left row (left is sorted, so a right row
          // behind the current position is behind every later one too).
          var advancing = true
          while (advancing) {
            fillRight()
            if (rRow == null) advancing = false
            else {
              val cmp = keyOrd.compare(rKey, lk)
              if (cmp < 0) rRow = null // dead key, discard
              else if (cmp == 0 && !forward && rTimeVal <= ltv) {
                best = rRow; bestKey = rKey; bestTime = rTimeVal // consume
                rRow = null
              } else if (cmp == 0 && forward && rTimeVal < ltv) {
                rRow = null // forward: strictly-earlier rows are dead
              } else advancing = false // right is ahead of this left row
            }
          }
          val m: UnsafeRow =
            if (forward) {
              // First right at-or-after: it is exactly the buffered row
              // (NOT consumed — it may serve later left rows too).
              if (rRow != null && keyOrd.compare(rKey, lk) == 0 &&
                  tolMicros.forall(tol => rTimeVal - ltv <= tol)) rRow else null
            } else {
              if (best != null && keyOrd.compare(bestKey, lk) == 0 &&
                  tolMicros.forall(tol => ltv - bestTime <= tol)) best else null
            }
          numOutputRows += 1
          if (m != null) numMatchedRows += 1
          resultProj(joined(l, if (m == null) nullRight else m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join: the physical form for a dimension-sized right
  * side (reference prices, config versions, any slowly-changing
  * dimension). The merge exec shuffles BOTH sides on their keys — at
  * 100 TB that re-partitions the fact stream just to meet a feed that
  * fits in memory. This exec instead declares
  * `BroadcastDistribution(IdentityBroadcastMode)` on the right and
  * NOTHING on the left: EnsureRequirements inserts one
  * BroadcastExchange, the fact side is never exchanged or sorted, its
  * upstream partitioning and ordering pass through for reuse by later
  * stages, and the join is embarrassingly parallel.
  *
  * Per partition the broadcast rows are indexed once into a per-key
  * time-sorted array (O(dim log dim), dimension-sized by the selection
  * rule that chose this exec); each left row then costs one hash
  * lookup + binary search, in arrival order — no sort of the left side
  * at all. Tie semantics match [[AsOfJoinExec]]: among equal right
  * (keys, time) rows, backward takes the last in sort order, forward
  * the first; ambiguous ties should be broken upstream exactly as
  * documented on [[AsOfJoin]].
  */
case class BroadcastAsOfJoinExec(left: SparkPlan, right: SparkPlan,
                                 leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                                 leftTime: Expression, rightTime: Expression,
                                 direction: String, toleranceSec: Option[Long],
                                 output: Seq[Attribute])
    extends BinaryExecNode {

  override def nodeName: String = "BroadcastAsOfJoinExec"

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // The whole point: left rows pass through untouched, so whatever
  // partitioning/ordering the fact side already has survives the join.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val forward = direction == "forward"
    val tolMicros = toleranceSec.map(_ * 1000000L)
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOut = left.output; val rOut = right.output
    val outAttrs = output
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    // Cache key carries the application id: broadcast ids restart from
    // 0 per SparkContext, so in a JVM that outlives a context (tests,
    // notebooks) a bare id could serve a PREVIOUS session's index for a
    // different dataset.
    val cacheKey = s"${sparkContext.applicationId}#${bcast.id}"
    left.execute().mapPartitions({ lIter =>
      // The per-key sorted-time index is built ONCE PER EXECUTOR and
      // shared by every task ([[BroadcastAsOfJoinExec.indexFor]]) — N
      // concurrent tasks each building a private copy would multiply
      // the dimension's footprint by the task slots (the same sharing
      // BroadcastHashJoin gets from its HashedRelation). Rows in the
      // broadcast are already materialized copies; projected keys are
      // copied because UnsafeProjection reuses its buffer.
      val index = BroadcastAsOfJoinExec.indexFor(cacheKey, () => {
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
        val grouped = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        bcast.value.foreach { r =>
          val k = rKeyProj(r)
          val t = rTimeProj(r)
          if (!k.anyNull && !t.isNullAt(0)) {
            var buf = grouped.get(k)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]()
              grouped.put(k.copy(), buf)
            }
            buf += ((t.getLong(0), r))
          }
        }
        val built = new java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])](
          math.max(8, grouped.size() * 2))
        grouped.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1) // stable: array order breaks equal-time ties
          built.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
        built
      })
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      // Right side binds nullable for the same reason as the merge exec:
      // unmatched left rows null-extend even NOT-NULL right columns.
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        var m: InternalRow = null
        if (!lk.anyNull && !lt.isNullAt(0)) {
          val entry = index.get(lk)
          if (entry != null) {
            val ltv = lt.getLong(0)
            val times = entry._1
            if (forward) {
              // Leftmost i with times(i) >= ltv.
              var lo = 0; var hi = times.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) >= ltv) hi = mid else lo = mid + 1
              }
              if (lo < times.length && tolMicros.forall(times(lo) - ltv <= _))
                m = entry._2(lo)
            } else {
              // Rightmost i with times(i) <= ltv.
              var lo = 0; var hi = times.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= ltv) lo = mid + 1 else hi = mid
              }
              if (lo > 0 && tolMicros.forall(ltv - times(lo - 1) <= _))
                m = entry._2(lo - 1)
            }
          }
        }
        numOutputRows += 1
        if (m != null) numMatchedRows += 1
        resultProj(joined(l, if (m == null) nullRight else m))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  private type Index =
    java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])]

  // One built index per (executor JVM, application, broadcast id),
  // SoftReference'd so memory pressure can reclaim it (it rebuilds from
  // the broadcast). Stale cleared refs are purged on the build path.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[Index]]()

  private[plans] def indexFor(id: String, build: () => Index): Index = {
    val ref = cache.get(id)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) return hit
    cache.synchronized {
      val ref2 = cache.get(id)
      val hit2 = if (ref2 == null) null else ref2.get()
      if (hit2 != null) hit2
      else {
        val built = build()
        cache.entrySet().removeIf(e => e.getValue.get() == null)
        cache.put(id, new java.lang.ref.SoftReference(built))
        built
      }
    }
  }
}

/** DataFrame-level API + strategy registration for the native as-of
  * join.
  */
object AsOfJoinPlan {

  /** Idempotently add [[AsOfJoinStrategy]] to an EXISTING session
    * (sessions built with `spark.sql.extensions=graft.plans.GraftExtensions`
    * don't need this).
    */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ (AsOfJoinStrategy: org.apache.spark.sql.execution.SparkStrategy)
    val curOpt = spark.experimental.extraOptimizations
    if (!curOpt.contains(AsOfJoinPruning))
      spark.experimental.extraOptimizations = curOpt :+ AsOfJoinPruning
  }

  /** Native as-of join of two DataFrames. Output = every left column
    * (original names) followed by every right column prefixed with
    * `rightPrefix` (the key/time columns included — drop what you
    * don't need; the prefix exists because the right side usually
    * repeats the key names).
    *
    * `hint`: None (default) lets the planner pick — broadcast when the
    * right side's estimated size fits `autoBroadcastJoinThreshold`,
    * shuffled merge otherwise; Some("merge")/Some("broadcast") force a
    * physical form, exactly like Spark's own join hints.
    */
  def asOfNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 direction: String = "backward",
                 toleranceSec: Option[Long] = None,
                 rightPrefix: String = "asof_",
                 hint: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = GraftSqlBridge.analyzed(left)
    // Re-alias the right side with FRESH exprIds unconditionally: a
    // self-as-of-join (both sides derived from one source — the events
    // fixture shape) carries the SAME attribute ids on both sides, and
    // the analyzer's DeduplicateRelations only rewrites ids under
    // nodes it knows. Duplicate ids under a custom node make column
    // pruning drop the right key as "already provided by the left".
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val rAliases = GraftSqlBridge.analyzed(right).output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, GraftSqlBridge.analyzed(right))
    val rAttrs = rAliases.map(_.toAttribute)
    def attr(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asOfNative: no column `$n` on the $side side " +
            s"(has: ${out.map(_.name).mkString(", ")})"))
    val node = AsOfJoin(lPlan, rPlan,
      keys.map(attr(lPlan.output, _, "left")), keys.map(attr(rAttrs, _, "right")),
      attr(lPlan.output, leftTs, "left"), attr(rAttrs, rightTs, "right"),
      direction, toleranceSec, hint)
    GraftSqlBridge.ofRows(spark, node)
      .toDF(lPlan.output.map(_.name) ++
        rPlan.output.map(a => s"$rightPrefix${a.name}"): _*)
  }
}
