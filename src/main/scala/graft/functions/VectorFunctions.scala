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

  /** Max-abs of the vector's elements (double) — the symmetric-
    * quantization range.
    */
  def maxAbs(a: Column): Column =
    array_max(transform(a, x => abs(x.cast("double"))))

  /** Symmetric int8-style floor quantization: qᵢ = floor(aᵢ·127/maxabs)
    * in [-128, 127], dequantize as qᵢ·maxabs/127. floor, not round —
    * floor is defined identically in every engine while round ties
    * (HALF_UP vs banker's) are not, so quantized codes are bit-portable.
    * Zero vectors quantize to all-zero codes. 4× smaller ANN postings
    * at a recall cost the caller measures — the standard memory lever
    * for billion-vector IVF lists.
    */
  def quantizeFloor(a: Column): Column = {
    val mx = maxAbs(a)
    when(mx === 0.0, transform(a, x => lit(0L)))
      .otherwise(transform(a, x => floor(x.cast("double") * lit(127.0) / mx).cast("long")))
  }

  /** Round-to-nearest int8 quantization — the IN-ENGINE variant for
    * quantized search (EmbeddingAnn.ivfTopKQuantized): rounding is
    * zero-mean where floor carries a −½LSB signed bias that distorts
    * candidate ordering when score gaps are small. Use [[quantizeFloor]]
    * when codes must be bit-portable across engines (rounding tie rules
    * differ); inside one engine, rounding strictly wins on recall.
    */
  def quantizeRound(a: Column): Column = {
    val mx = maxAbs(a)
    when(mx === 0.0, transform(a, x => lit(0L)))
      .otherwise(transform(a, x => round(x.cast("double") * lit(127.0) / mx).cast("long")))
  }
}
