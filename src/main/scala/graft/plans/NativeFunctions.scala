package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the pairwise similarity hot loops.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * walks boxed per-element lambdas in interpreted mode — fine for one
  * row, ruinous for O(n²) candidate scoring. This expression does the
  * same left-to-right double fold as a primitive-array loop, with
  * whole-stage codegen, so results stay bitwise identical to the HOF
  * form (and to an oracle folding in the same order).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All-permutation MinHash signature in a single pass: for shingle
  * hashes S and permutations h_i(x) = (a_i·x + b_i) mod P, emits
  * `array(min_i)` for i < k. The composable form (k× `array_min ∘
  * transform`) walks the shingle array k times through interpreted
  * lambdas; this loops S×k over primitive longs. Arithmetic is
  * identical, so signatures (and thus LSH bands) are unchanged.
  */
case class MinHashSignature(child: Expression, coefA: Array[Long], coefB: Array[Long], p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private val k = coefA.length
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    if (hs.isEmpty) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < k) {
        val v = (coefA(i) * h + coefB(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All centroid dot products in one native pass: for a unit vector v
  * and centroid matrix C (held inside the expression, NOT as literal
  * plan nodes — a 16×64 literal array bloats every optimizer pass),
  * returns array(v·C₀, …, v·Cₖ₋₁). Used by IVF cluster assignment and
  * query probing.
  */
case class CentroidScores(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_scores"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(v.length, cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v(i) * cv(i); i += 1 }
      out(c) = acc
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard |A∩B| / |A∪B| over two DISTINCT long-hash arrays in
  * ONE pass: an open-addressed probe set of the left array, probed by
  * the right. The composable form
  * (`size(array_intersect)/size(array_union)`) builds two hash
  * structures and materializes two result arrays PER PAIR — ruinous
  * inside an O(candidates) verify join. Inputs must be distinct
  * (shingleSets guarantees it), so |A∪B| = |A|+|B|−|A∩B| and one probe
  * pass suffices. Division semantics match the HOF form exactly
  * (0-element union → NaN, never produced on shingleSets' non-empty
  * arrays).
  */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    // Open-addressed linear-probe set of `a` (capacity = next pow2 ≥ 2|a|).
    // 0 marks empty; shingle hashes are pmod-ed into [0, 2^32) but a
    // genuine 0 hash is possible, so track it with a flag.
    var cap = 4
    while (cap < a.length * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    var i = 0
    while (i < a.length) {
      val v = a(i)
      if (v == 0L) hasZero = true
      else {
        var idx = (java.lang.Long.hashCode(v) & Int.MaxValue) & mask
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
        table(idx) = v
      }
      i += 1
    }
    var inter = 0
    i = 0
    while (i < b.length) {
      val v = b(i)
      if (v == 0L) { if (hasZero) inter += 1 }
      else {
        var idx = (java.lang.Long.hashCode(v) & Int.MaxValue) & mask
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
        if (table(idx) == v) inter += 1
      }
      i += 1
    }
    val union = a.length + b.length - inter
    inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NativeFunctions {
  /** Idempotently register the native functions in a session so they
    * are callable via `expr("graft_dot(a, b)")` and plain SQL.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaccard", exprs => JaccardSim(exprs(0), exprs(1)), "built-in")
  }
}
