package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns.
  *
  * Built on Spark's array higher-order functions with an explicit
  * left-to-right double-precision fold, which makes results bitwise
  * reproducible (and matchable by an external oracle that folds in the
  * same order). For the 100 TB path the hot pairwise loop lives in
  * [[graft.operators.EmbeddingAnn]], which pre-normalizes vectors once
  * so each candidate pair costs a single dot product.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — products and accumulation in double precision, folded
    * left-to-right over the array.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** L2-normalized copy of the vector (double elements). Pre-normalize
    * once, then cosine(a,b) == dot(â,b̂) — halves the per-pair cost in
    * brute-force ANN and keeps the pairwise inner loop a pure dot.
    */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }
}
