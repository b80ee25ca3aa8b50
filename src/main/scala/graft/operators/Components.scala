package graft.operators

import org.apache.spark.sql.DataFrame
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
  * localCheckpoint so the plan stays flat. (At extreme diameters the
  * large-star/small-star variant halves rounds; documented, not needed
  * for near-dup shapes.)
  */
object Components {

  /** Labels every node that appears in `edges` (`id_a`, `id_b`) with
    * `cluster_id` = the minimum node id reachable from it. Output:
    * (node, cluster_id), one row per distinct node.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // Symmetrize once: propagation must flow both directions.
    val sym = edges.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .union(edges.select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym.join(labels, sym("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      val updated = labels.join(neighborMin, labels("node") === neighborMin("src"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
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
}
