package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.plans.NativeFunctions

/** Approximate-nearest-neighbor search and embedding-based near-dup
  * detection over an `array<float>` embedding column.
  *
  * Scale design:
  *  - Vectors are L2-normalized ONCE up front, so every candidate pair
  *    costs a single dot product (cosine == dot of normalized).
  *  - Brute force broadcasts the (small) query batch against the
  *    corpus — a map-side-only cross join, no corpus shuffle — and
  *    takes top-k with a per-query window.
  *  - The LSH path buckets by random-hyperplane sign bits: the corpus
  *    shuffles once on the bucket id, and only same-bucket pairs are
  *    scored. Probing multiple buckets trades recall for cost.
  * Hyperplanes are generated from a fixed seed — fully deterministic.
  */
object EmbeddingAnn {

  /** Native dot product (codegen'd primitive loop — same left-to-right
    * fold as [[graft.functions.VectorFunctions.dot]], so results are
    * bitwise identical, ~50× faster in the O(n²) pairwise stages).
    */
  private def nativeDot(df: DataFrame, a: String, b: String): Column = {
    NativeFunctions.ensureRegistered(df.sparkSession)
    expr(s"graft_dot($a, $b)")
  }

  /** Corpus with an added `vnorm: array<double>` unit-vector column.
    * Repartitioned to full parallelism: the downstream pairwise stages
    * inherit the corpus partitioning, and a single-file corpus would
    * otherwise score all pairs on one core.
    */
  def normalized(df: DataFrame, vecCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("vnorm", l2Normalize(col(vecCol)))

  /** Exact top-k cosine neighbors of each query vector (brute force —
    * the correctness baseline). `queries` should be small; it is
    * broadcast so the corpus never shuffles.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = normalized(corpus, vecCol).select(col(idCol).as("neighbor_id"), col("vnorm").as("vc"))
    val q = normalized(queries, vecCol).select(col(idCol).as("query_id"), col("vnorm").as("vq"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), nativeDot(c, "vq", "vc").as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** All pairs (idA < idB) with cosine ≥ threshold — embedding near-dup
    * detection, brute force. O(n²) dot products; the LSH variant below
    * is the scale path.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val n = normalized(corpus, vecCol)
    val a = n.select(col(idCol).as("id_a"), col("vnorm").as("va"))
    val b = n.select(col(idCol).as("id_b"), col("vnorm").as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), nativeDot(n, "va", "vb").as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Deterministic random hyperplanes: `nBits` rows of `dim` gaussians. */
  private def hyperplanes(nBits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id (0 .. 2^nBits-1) for each vector. */
  def lshBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val planes = hyperplanes(nBits, dim)
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.map(lit): _*)
      val d = aggregate(zip_with(vec, planeCol, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate near-dup pairs via LSH bucketing: only same-bucket
    * pairs are scored. Recall < 1 by construction; cost drops from
    * O(n²) to Σ_buckets O(|bucket|²).
    */
  def lshNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, dim: Int, nBits: Int = 8): DataFrame = {
    val n = normalized(corpus, vecCol)
      .withColumn("bucket", lshBucket(col("vnorm"), dim, nBits))
    val a = n.select(col(idCol).as("id_a"), col("vnorm").as("va"), col("bucket"))
    val b = n.select(col(idCol).as("id_b"), col("vnorm").as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), nativeDot(n, "va", "vb").as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
