package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns
  * near-duplicate PAIRS (MinHash/SimHash/embedding output) into dedup
  * CLUSTERS with one canonical representative each. A training-data
  * pipeline needs this closure: near-dup similarity is not transitive,
  * but the keep/drop decision must be (keep one doc per component).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round a node takes the min of its own and
  * its neighbors' labels; converged when no label changes. Rounds are
  * O(component diameter) — near-dup components are overwhelmingly tiny
  * (pairs/triples), so 3–5 rounds settle real corpora. Each round is
  * one shuffle-join + one aggregation; lineage is cut per round with
  * localCheckpoint so the plan stays flat. At extreme diameters use
  * [[connectedComponentsStar]], whose round count is O(log² n)
  * independent of diameter.
  */
object Components {

  /** Labels every node that appears in `edges` (`id_a`, `id_b`) with
    * `cluster_id` = the minimum node id reachable from it. Output:
    * (node, cluster_id), one row per distinct node.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // Symmetrize once: propagation must flow both directions.
    // Lazy checkpoints here and per round: the convergence count that
    // immediately follows each construction materializes the blocks in
    // the same job, so an eager checkpoint would only add a
    // driver-sequenced job of fixed overhead per round.
    val sym = edges.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .union(edges.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .localCheckpoint(false)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(false)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym.join(labels, sym("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      val updated = labels.join(neighborMin, labels("node") === neighborMin("src"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(false)
      val changed = updated.join(labels.withColumnRenamed("label", "prev"), "node")
        .filter(col("label") =!= col("prev")).limit(1).count()
      labels = updated
      converged = changed == 0
      i += 1
    }
    // Partial labels are WRONG labels: a component with diameter >
    // maxIter would carry non-minimum cluster ids whose "canonical"
    // node is itself unkept — keepDecision would then drop every doc
    // of that component. Fail loudly instead.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "a component has diameter > maxIter; raise maxIter")
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  /** Dedup decision per clustered node: the canonical keeper is the
    * cluster's minimum id (== cluster_id by construction).
    */
  def keepDecision(components: DataFrame): DataFrame =
    components.withColumn("keep", col("node") === col("cluster_id"))

  /** Quality-aware keeper election: instead of the minimum id, each
    * cluster keeps the node MAXIMIZING `score` (smallest id on ties) —
    * the policy real corpus curation ships (keep the longest /
    * highest-quality copy of a near-dup group, per Dolma/RefinedWeb
    * practice), where min-id keep is only the deterministic default.
    *
    * `attrs` supplies the score inputs, one row per node id in `idCol`
    * (nodes absent from `attrs` are dropped — the caller's contract is
    * that attrs covers the corpus). `score` may be any orderable
    * Column over `attrs`' columns, e.g. `col("n_chars")` or a computed
    * quality signal; composite policies pass a `struct(...)`.
    *
    * Scale shape: the election is a `max_by` over (score, -node) —
    * a declarative aggregate with map-side partial combine, NOT a
    * cluster-partitioned window (no sort, no single-task giant
    * cluster); winners (one row per cluster) join back on cluster_id.
    * Output: (node, cluster_id, keep) — same contract as
    * [[keepDecision]] so downstream anti-joins are policy-agnostic.
    */
  def keepBest(components: DataFrame, attrs: DataFrame, idCol: String,
               score: Column): DataFrame = {
    val scored = components.join(
      attrs.select(col(idCol).cast("long").as("node"), score.as("__score")),
      Seq("node"))
    // (-node) tiebreak: larger is the SMALLER id, so equal scores
    // elect the minimum id — a total order because node is unique.
    val winners = scored.groupBy(col("cluster_id"))
      .agg(max_by(col("node"), struct(col("__score"), (-col("node")).as("__tie")))
        .as("__winner"))
    scored.join(winners, Seq("cluster_id"))
      .select(col("node"), col("cluster_id"),
        (col("node") === col("__winner")).as("keep"))
  }

  /** Size-adaptive closure: the edge list is materialized once
    * (executing the caller's whole edge pipeline exactly once, same as
    * the iterative form's symmetrize step) and counted; at or below
    * `collectThreshold` edges the closure runs as a driver union-find
    * — one collect, zero iterative rounds — else it falls back to
    * [[connectedComponents]] on the already-materialized frame.
    *
    * Rationale: each propagation round is 2+ Spark jobs, pure fixed
    * overhead when the duplicate graph is thousands of edges (the
    * common case for an incremental append's TOUCHED subgraph). The
    * default threshold (2²⁰ edges ≈ 16 MB of longs) is far below
    * driver heap risk; a degenerate batch beyond it gets the
    * distributed path automatically. Same output contract, proven
    * equal on both sides of the threshold in ScalaTest.
    */
  def connectedComponentsAuto(edges: DataFrame, collectThreshold: Long = 1L << 20,
                              maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .localCheckpoint(false)
    // The count materializes the lazy checkpoint in one full job; the
    // small-path collect then reads cached blocks (a limit-based
    // single-action probe was tried and is worse: CollectLimit's
    // partition-scaling runs several partial jobs and the checkpoint
    // back-fills what they skipped).
    if (e.count() > collectThreshold) connectedComponents(e, maxIter)
    else {
      val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // Union toward the smaller root: the final root IS the
        // component minimum, matching min-label propagation exactly.
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val spark = edges.sparkSession
      import spark.implicits._
      parent.keysIterator.map(n => (n, find(n))).toSeq.sorted
        .toDF("node", "cluster_id")
    }
  }

  /** Star-contraction connected components — the alternating
    * large-star/small-star algorithm of Kiveris et al. 2014 ("Connected
    * Components in MapReduce and Beyond"). Round count is
    * O(log² n) REGARDLESS of component diameter, where min-label
    * propagation pays O(diameter) rounds: the upgrade path when
    * components can be long chains (transitive near-dup runs, link
    * graphs), at the cost of two shuffle-aggs per round instead of
    * one join+agg. Same output contract as [[connectedComponents]]:
    * (node, cluster_id = min reachable id), one row per node.
    *
    * Round mechanics (edges kept canonical big→small, deduped):
    *  - large-star: every node v strictly above a center u links to
    *    the min of u's closed neighborhood;
    *  - small-star: every neighbor of u (all below it, post-canon)
    *    plus u itself links to u's min neighbor.
    * The fixed point is one star per component centered at its min;
    * equivalence with label propagation is property-tested on random
    * graphs, and the long-chain speedup is asserted in ScalaTest.
    */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
    val allNodes = edges.select(col("id_a").cast("long").as("node"))
      .union(edges.select(col("id_b").cast("long").as("node"))).distinct()
      .localCheckpoint(true)
    var e = canon(edges.select(col("id_a").cast("long").as("u"),
        col("id_b").cast("long").as("v")))
      .localCheckpoint(true)
    var eCount = e.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // Lazily persisted, not checkpointed: the small-star phase reads
      // this twice in the SAME round's plan, so one materialization at
      // `next`'s checkpoint suffices — an eager mid-round checkpoint
      // would double the per-round action count for nothing.
      val afterLarge = canon(
          sym.join(minsL, "u").filter(col("v") > col("u"))
            .select(col("v").as("u"), col("m").as("v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val minsS = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = canon(
          afterLarge.join(minsS, "u").select(col("v").as("u"), col("m").as("v"))
            .union(minsS.select(col("u"), col("m").as("v"))))
        .localCheckpoint(true)
      val nextCount = next.count()
      afterLarge.unpersist(false)
      // Fixed point ⇔ identical edge set (counts equal + no new rows).
      converged = nextCount == eCount &&
        next.join(e, Seq("u", "v"), "left_anti").limit(1).count() == 0
      e = next
      eCount = nextCount
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // Converged edge set IS the star: leaf → component min. Mins (and
    // only mins) never appear on the leaf side — they label themselves.
    allNodes.join(e.select(col("u").as("node"), col("v").as("cluster_id")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("cluster_id"), col("node")).as("cluster_id"))
  }
}
