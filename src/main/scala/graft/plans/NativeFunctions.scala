package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

/** Single-pass L2 normalization of a numeric vector:
  * out(i) = v(i) / ‖v‖ as doubles, with a zero vector passing through
  * unscaled (matching `when(norm === 0, cast).otherwise(cast / norm)`).
  *
  * Exists because the composable HOF form
  * `transform(a, x -> x / sqrt(aggregate(zip_with(a, a, _*_), ...)))`
  * re-evaluates the norm sub-expression for EVERY ELEMENT — O(dim²)
  * interpreted work per row. Invisible at 64 dims; at 1024 dims it
  * turned a sub-second 25k-vector scan into ~100 s. Values are
  * bit-identical to the HOF form (same left-to-right summation, same
  * cast-then-divide per element).
  */
case class L2Normalize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2norm"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${t.simpleString}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < n) { ss += out(i) * out(i); i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm != 0.0) { i = 0; while (i < n) { out(i) /= nrm; i += 1 } }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

/** Exact set-Jaccard |A∩B| / |A∪B| over two long arrays in ONE pass
  * each: open-addressed probe sets replace the composable form
  * (`size(array_intersect)/size(array_union)`), which builds two hash
  * structures and materializes two result arrays PER PAIR — ruinous
  * inside an O(candidates) verify join. Set semantics hold for ANY
  * input (duplicates collapse exactly like array_intersect/union):
  * distinct counts are taken while inserting, and the intersection
  * counts each distinct right element at most once. Division matches
  * the HOF form (0-element union → NaN). Inputs must be
  * `array<long>` — enforced at analysis time.
  */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
    def accepts(t: DataType) = t match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (accepts(left.dataType) && accepts(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ${ok.simpleString} arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Linear-probe insert; returns true when v was not yet present.
    * 0 marks an empty slot, so a genuine 0 value is tracked by the
    * caller via a flag.
    */
  private def insert(table: Array[Long], mask: Int, v: Long): Boolean = {
    var idx = (java.lang.Long.hashCode(v) & Int.MaxValue) & mask
    while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
    if (table(idx) == v) false else { table(idx) = v; true }
  }

  private def contains(table: Array[Long], mask: Int, v: Long): Boolean = {
    var idx = (java.lang.Long.hashCode(v) & Int.MaxValue) & mask
    while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
    table(idx) == v
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    def newTable(n: Int) = {
      var cap = 4
      while (cap < n * 2) cap <<= 1
      (new Array[Long](cap), cap - 1)
    }
    val (ta, maskA) = newTable(a.length)
    var uniqueA = 0
    var zeroA = false
    var i = 0
    while (i < a.length) {
      val v = a(i)
      if (v == 0L) { if (!zeroA) { zeroA = true; uniqueA += 1 } }
      else if (insert(ta, maskA, v)) uniqueA += 1
      i += 1
    }
    val (tb, maskB) = newTable(b.length)
    var uniqueB = 0
    var zeroB = false
    var inter = 0
    i = 0
    while (i < b.length) {
      val v = b(i)
      val first =
        if (v == 0L) { if (!zeroB) { zeroB = true; true } else false }
        else insert(tb, maskB, v)
      if (first) {
        uniqueB += 1
        if (if (v == 0L) zeroA else contains(ta, maskA, v)) inter += 1
      }
      i += 1
    }
    val union = uniqueA + uniqueB - inter
    inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash from a token-hash array in ONE pass: bit j of the
  * fingerprint is the sign of Σ_tokens(±1 by bit j of the hash). The
  * composable form ([[graft.operators.NearDup.simHashFromHashes]])
  * walks the array through 64 interpreted `aggregate` lambdas — 64
  * passes per document. This loops tokens × 64 over primitive longs
  * with identical arithmetic, so fingerprints are bit-identical.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val counts = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < 64) {
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-document benchmark-overlap counts in ONE pass: the benchmark's
  * (id, shingle-set) pairs live inside the expression as an inverted
  * index (shingle → bench ordinals). For each corpus document this
  * walks its shingle array once, accumulates per-benchmark counts, and
  * emits array<struct<bench_id, n_shared>> for benchmarks with
  * n_shared ≥ minShared. Replaces explode-corpus → shuffle-join →
  * re-aggregate (the corpus never leaves its row). Benchmark sets are
  * driver-bounded by definition (eval suites are KB–MB scale, the same
  * justification as IVF centroids).
  */
case class BenchmarkOverlap(child: Expression, bench: Array[(Long, Array[Long])],
                            minShared: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bench_id", LongType, nullable = false),
    StructField("n_shared", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_bench_overlap"

  @transient private lazy val index: java.util.HashMap[Long, Array[Int]] = {
    val m = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < bench.length) {
      bench(i)._2.foreach { s =>
        var buf = m.get(s)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[Int]; m.put(s, buf) }
        buf += i
      }
      i += 1
    }
    val out = new java.util.HashMap[Long, Array[Int]](m.size())
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val counts = new Array[Long](bench.length)
    var i = 0
    while (i < hs.length) {
      val hits = index.get(hs(i))
      if (hits != null) {
        var j = 0
        while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
      }
      i += 1
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < counts.length) {
      if (counts(i) >= minShared)
        rows += org.apache.spark.sql.catalyst.InternalRow(bench(i)._1, counts(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Number of a long-array column's elements present in a Bloom filter
  * — the SCALE path of benchmark decontamination. The exact inverted
  * index (BenchmarkOverlap) is right while the benchmark's shingle
  * set is KB–MB; a Bloom filter at ~20 bits/key holds a BILLION
  * benchmark shingles in ~2.5 GB — still a broadcastable task-local
  * probe where the exact index no longer fits, at the price of a
  * bounded false-hit rate and no per-benchmark-doc attribution
  * (membership is against the benchmark's shingle UNION).
  *
  * Hashing is Kirsch–Mitzenmacher double hashing: two independent
  * 64-bit mixes of the shingle hash (MurmurHash3's public fmix64
  * finalizer) combine as h1 + i·h2 for the k probe positions. The bit
  * array length is a power of two, so probe indexing is a mask, not a
  * modulo. No false NEGATIVES by construction — the filter can only
  * OVER-flag, the direction the decontamination gate bounds.
  */
case class BloomHitCount(child: Expression, bits: Array[Long], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bloom_hits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    var cnt = 0L
    var i = 0
    while (i < hs.length) {
      if (BloomHitCount.mightContain(bits, k, hs(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomHitCount {
  /** MurmurHash3's 64-bit finalizer — full-avalanche mixing, needed
    * because the input longs are themselves hashes confined to 2³²
    * (mod32 shingles) whose raw bits would probe only half the space.
    */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  def mightContain(bits: Array[Long], k: Int, key: Long): Boolean = {
    val mask = (bits.length.toLong << 6) - 1
    val h1 = fmix64(key)
    val h2 = fmix64(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2) & mask).toInt
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Insert one key into `bits` (length must be a power of two in
    * words): the shared primitive of the driver-side and distributed
    * builders. Bit sets commute, so insertion order never matters.
    */
  def insert(bits: Array[Long], k: Int, key: Long): Unit = {
    val mask = (bits.length.toLong << 6) - 1
    val h1 = fmix64(key)
    val h2 = fmix64(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2) & mask).toInt
      bits(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** The bit-array LENGTH (in 64-bit words) for `nKeys` keys at
    * `bitsPerKey` bits per key, rounded up to a power of two with a
    * 1024-bit floor — shared sizing so the driver and distributed
    * builders produce interchangeable filters.
    */
  private def sizeWords(nKeys: Long, bitsPerKey: Int): Int = {
    val wanted = math.max(1024L, nKeys * bitsPerKey)
    var m = 1024L
    while (m < wanted) m <<= 1
    (m >>> 6).toInt
  }

  /** Build the bit array for `keys` at `bitsPerKey` bits per key
    * (rounded up to a power of two, floor 1024 bits). Insertion is
    * order-independent — bit sets commute — so the caller needs no
    * deterministic key order.
    */
  def build(keys: Array[Long], bitsPerKey: Int, k: Int): Array[Long] = {
    require(bitsPerKey > 0 && k > 0, s"need positive sizing, got $bitsPerKey bits/key, k=$k")
    val bits = new Array[Long](sizeWords(keys.length.toLong, bitsPerKey))
    var j = 0
    while (j < keys.length) {
      insert(bits, k, keys(j))
      j += 1
    }
    bits
  }

  /** DISTRIBUTED Bloom build: the bit array for a key set that is too
    * large to collect. One count job sizes the array, then each
    * partition folds its keys into a local copy and the copies
    * OR-reduce back — the driver only ever holds bit arrays (nKeys ×
    * bitsPerKey / 8 bytes, ~2.5 GB for a billion shingles at 20
    * bits/key), never the raw keys plus their JVM object overhead. The
    * result is bit-identical to [[build]] over the same key set
    * (insertion commutes), so the probing expression cannot tell the
    * builders apart. `keys` must be a single LongType column.
    */
  def buildDistributed(keys: org.apache.spark.sql.DataFrame,
                       bitsPerKey: Int, k: Int): Array[Long] = {
    require(bitsPerKey > 0 && k > 0, s"need positive sizing, got $bitsPerKey bits/key, k=$k")
    require(keys.schema.fields.length == 1 &&
        keys.schema.fields.head.dataType == org.apache.spark.sql.types.LongType,
      s"buildDistributed wants one bigint column, got ${keys.schema.simpleString}")
    // Two passes (count → fold) over the same frame: persist so the
    // upstream distinct/shingling work runs once.
    val persisted = keys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nWords = sizeWords(persisted.count(), bitsPerKey)
      persisted.rdd.treeAggregate(new Array[Long](nWords))(
        seqOp = (bits, row) => { insert(bits, k, row.getLong(0)); bits },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
    } finally persisted.unpersist()
  }
}

/** Hashed word-n-gram shingles of a text column in ONE pass — with
  * `distinct = true` (the default) the native form of
  * `array_distinct(transform(TextFunctions.shingles(text, n),
  *   s => pmod(xxhash64(s), 2^32)))`; with `distinct = false` every
  * occurrence is kept in order (the shape n-gram REPETITION metrics
  * need, where multiplicity is the signal).
  *
  * That composable chain re-walks the token array through four
  * interpreted HOF layers (split → filter → transform/slice/concat_ws
  * → xxhash64 → array_distinct), allocating an intermediate string per
  * shingle per layer — it dominated the COLD run of every shingle
  * consumer (decon_overlap, dedup_minhash/allpairs/clusters) at ~4s
  * per corpus scan. This expression lowercases once, splits once,
  * UTF-8-encodes each token once, and hashes each n-gram from a reused
  * byte buffer.
  *
  * Bit-identical to the HOF form by construction:
  *  - lowercase = UTF8String.toLowerCase (what `lower()` calls for the
  *    default UTF8_BINARY collation);
  *  - tokens = java.util.regex split on "\\s+" (what `split()` calls),
  *    empties dropped (the `filter(length > 0)` step);
  *  - shingle bytes = tokens joined by ' ' (concat_ws of a slice);
  *  - hash = XXH64 over the shingle's UTF-8 bytes with seed 42
  *    (exactly `xxhash64(string)`), then pmod 2^32;
  *  - distinct keeps first-occurrence order (array_distinct).
  * Fewer than n tokens → empty array; null text → null (both match —
  * ShingleHashesSpec asserts full equality on the real corpus).
  *
  * `mod32 = false` skips the pmod and emits the raw 64-bit xxhash64 —
  * for consumers whose DOWNSTREAM math treats grams as identities
  * (repetition counts), where a same-document 32-bit collision
  * (~g²/2³³ per doc) would silently merge counts. The 32-bit default
  * exists only for bit-parity with the composable HOF chain above.
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true,
                         mod32: Boolean = true)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  private val Mod = 4294967296L

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.toString
    // Pattern.split with limit -1 mirrors Spark's split(); leading AND
    // trailing separators both yield empty tokens under limit -1
    // ("a b " -> [a, b, ""]) — all dropped, like the
    // filter(length > 0) step does.
    val raw = ws.split(lowered, -1)
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nTok += 1; i += 1 }
    if (nTok < n) return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    val tokBytes = new Array[Array[Byte]](nTok)
    i = 0; var j = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) {
        tokBytes(j) = raw(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        j += 1
      }
      i += 1
    }
    val seen = if (distinct) new java.util.LinkedHashSet[java.lang.Long]() else null
    val all = if (distinct) null else new Array[Long](nTok - n + 1)
    val buf = new Array[Byte](tokBytes.map(_.length).max * n + (n - 1))
    var s = 0
    while (s <= nTok - n) {
      var len = 0
      var k = 0
      while (k < n) {
        if (k > 0) { buf(len) = ' '; len += 1 }
        val tb = tokBytes(s + k)
        System.arraycopy(tb, 0, buf, len, tb.length)
        len += tb.length
        k += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      val v = if (mod32) { val r = h % Mod; if (r < 0) (r + Mod) % Mod else r } else h
      if (distinct) seen.add(v) else all(s) = v
      s += 1
    }
    if (!distinct)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(all)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Canonical text cleanup for corpus ingestion, one pass per value:
  * Unicode NFC normalization (é == e+combining-acute — without it the
  * same word hashes to different shingles/fingerprints depending on
  * which encoder produced the crawl), then strip C0/DEL control
  * characters (tab/LF/FF/CR excluded — they are whitespace in both
  * engines and fall to the collapse rule), then collapse every
  * whitespace run to a single space and trim. The rule set is deliberately small and engine-portable:
  * DuckDB mirrors it as
  * `trim(regexp_replace(regexp_replace(nfc_normalize(x), ctrl, ''),
  * '\s+', ' '))`, so normalized text md5-compares across engines.
  */
case class NfcClean(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_clean"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  // \x09 \x0A \x0C \x0D (tab, LF, FF, CR) are NOT stripped here —
  // they are whitespace in BOTH Java's and RE2/DuckDB's \s, so they
  // fall to the collapse rule; stripping CR would silently join words
  // across classic-Mac line endings ("a\rb" must become "a b", not
  // "ab"). \x0B (VT) IS stripped: Java counts it as \s but RE2 does
  // not, so leaving it to the whitespace rule would diverge between
  // the engine and the oracle.
  @transient private lazy val ctrl =
    java.util.regex.Pattern.compile("[\\x00-\\x08\\x0B\\x0E-\\x1F\\x7F]")
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val nfc =
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val stripped = ctrl.matcher(nfc).replaceAll("")
    org.apache.spark.unsafe.types.UTF8String.fromString(
      ws.matcher(stripped).replaceAll(" ").trim)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Kept-line filter for the per-document rebuild in
  * [[graft.operators.CorpusHygiene.dedupParagraphs]]: from an
  * `array<struct<pos:int, line:string>>` and an `array<int>` of kept
  * positions, returns the lines whose pos is kept, preserving the
  * paragraph array's order. One linear-probe set build over the kept
  * positions + one pass over the paragraphs — O(n_paras + n_kept) —
  * where the composable `filter(paras, p -> array_contains(keep,
  * p.pos))` form re-scans the keep array per paragraph:
  * O(n_paras × n_kept), quadratic on paragraph-heavy documents (a
  * 10k-paragraph doc would do ~10⁸ comparisons in one row's eval).
  */
case class KeepPosFilter(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_keep_pos"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(s: StructType, _), ArrayType(IntegerType, _))
        if s.length == 2 && s(0).dataType == IntegerType && s(1).dataType == StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<int,string>>, array<int>), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val paras = l.asInstanceOf[ArrayData]
    val keep = r.asInstanceOf[ArrayData].toIntArray()
    // Linear-probe set of kept positions; -1 marks an empty slot
    // (positions from posexplode are always >= 0).
    var cap = 4
    while (cap < keep.length * 2) cap <<= 1
    val table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    val mask = cap - 1
    var i = 0
    while (i < keep.length) {
      val v = keep(i)
      var idx = (Integer.hashCode(v) & Int.MaxValue) & mask
      while (table(idx) != -1 && table(idx) != v) idx = (idx + 1) & mask
      table(idx) = v
      i += 1
    }
    def kept(v: Int): Boolean = {
      var idx = (Integer.hashCode(v) & Int.MaxValue) & mask
      while (table(idx) != -1 && table(idx) != v) idx = (idx + 1) & mask
      table(idx) == v
    }
    val n = paras.numElements()
    // Sized by n, not min(keep, n): the function is registered
    // session-wide and callable from arbitrary SQL, where nothing
    // enforces that paragraph positions are unique — duplicate kept
    // positions may match more than keep.length paragraphs.
    val buf = new Array[Any](n)
    var out = 0
    i = 0
    while (i < n) {
      val s = paras.getStruct(i, 2)
      if (s != null && kept(s.getInt(0))) {
        buf(out) = if (s.isNullAt(1)) null else s.getUTF8String(1)
        out += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (out == buf.length) buf else java.util.Arrays.copyOf(
        buf.asInstanceOf[Array[AnyRef]], out))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Pass-through boolean gate that counts FALSE evaluations into a
  * Spark [[org.apache.spark.util.LongAccumulator]] — the observability
  * hook of [[graft.operators.BucketGuard]]: a filter on this gate
  * drops exactly the rows a plain filter on `child` would, but the
  * dropped-row count surfaces on the driver (and in the UI) after the
  * action completes, so a hot-bucket cap can report how much candidate
  * mass it discarded instead of discarding silently.
  *
  * Marked nondeterministic so the optimizer never pushes, collapses,
  * or re-evaluates the side effect. Counts are task-accurate, not
  * exactly-once: a retried/speculated task or a self-joined subtree
  * evaluating the gate twice double-counts — fine for a metric, which
  * is all this is (the FILTERING itself stays exact either way).
  */
case class DropCounted(child: Expression, acc: org.apache.spark.util.LongAccumulator)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = BooleanType
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_bucket_gate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case BooleanType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires boolean, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val keep = v.asInstanceOf[Boolean]
    if (!keep) acc.add(1L)
    keep
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** BPE encoding of a text column in one native pass: tokenize exactly
  * like `TextFunctions.tokens` (UTF8String lowercase, `\s+` split,
  * empties dropped), split each word into code points, then apply the
  * trained merge list IN RANK ORDER — each merge replaces adjacent
  * (left, right) symbol pairs left-to-right greedily (a run of
  * overlapping occurrences merges at even offsets). Rank-order
  * application is equivalent to the textbook lowest-rank-first loop:
  * a merge's output symbol can only appear in HIGHER-rank merges
  * (training learns a symbol before any merge that uses it), so
  * earlier merges never become applicable again. Output is the
  * document's full subtoken stream in order.
  *
  * Words repeat heavily across a corpus (Heaps' law), so encodings are
  * memoized per executor up to a fixed cap — beyond it the encode
  * still runs, it just stops caching (bounded memory, no eviction
  * churn on adversarial vocabularies).
  */
case class BpeEncode(child: Expression, mergeL: Array[String], mergeR: Array[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  require(mergeL.length == mergeR.length,
    s"merge halves disagree: ${mergeL.length} vs ${mergeR.length}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[org.apache.spark.unsafe.types.UTF8String]]()
  private val CacheCap = 1 << 16

  private def encodeWord(w: String): Array[org.apache.spark.unsafe.types.UTF8String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    // Code-point split (not UTF-16 chars): a supplementary-plane
    // character must be one symbol, matching character-based engines.
    var syms = new Array[String](w.codePointCount(0, w.length))
    var i = 0; var j = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms(j) = new String(Character.toChars(cp)); j += 1
      i += Character.charCount(cp)
    }
    var m = 0
    while (m < mergeL.length && syms.length > 1) {
      val l = mergeL(m); val r = mergeR(m)
      var changed = false
      var k = 0
      while (!changed && k < syms.length - 1) {
        changed = syms(k) == l && syms(k + 1) == r; k += 1
      }
      if (changed) {
        val out = new Array[String](syms.length)
        var o = 0; var p = 0
        while (p < syms.length) {
          if (p + 1 < syms.length && syms(p) == l && syms(p + 1) == r) {
            out(o) = l + r; o += 1; p += 2
          } else { out(o) = syms(p); o += 1; p += 1 }
        }
        syms = java.util.Arrays.copyOf(out, o)
      }
      m += 1
    }
    val enc = syms.map(org.apache.spark.unsafe.types.UTF8String.fromString)
    if (cache.size < CacheCap) cache.put(w, enc)
    enc
  }

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.toString
    val raw = ws.split(lowered, -1)
    val out = new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) out ++= encodeWord(raw(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NativeFunctions {
  /** Idempotently register the native functions in a session so they
    * are callable via `expr("graft_dot(a, b)")` and plain SQL.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    // All of these builders are STATELESS (no captured data, unlike
    // graft_bench_overlap / graft_centroid_scores, which are
    // re-registered per call by their owners), so a second
    // registration would be byte-identical: skip it instead of
    // re-replacing, which logs a replacement WARN per operator call.
    // The absent-check is PER FUNCTION, not a single sentinel — a
    // sentinel guard would silently skip any function added to this
    // list later in sessions that already registered the earlier set
    // (long-lived sessions, suites sharing a SparkSession).
    def reg(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!spark.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          name, builder, "built-in")
    reg("graft_dot", exprs => DotProduct(exprs(0), exprs(1)))
    reg("graft_l2norm", exprs => L2Normalize(exprs.head))
    reg("graft_jaccard", exprs => JaccardSim(exprs(0), exprs(1)))
    reg("graft_simhash", exprs => SimHash64(exprs.head))
    reg("graft_keep_pos", exprs => KeepPosFilter(exprs(0), exprs(1)))
    reg("graft_nfc_clean", exprs => NfcClean(exprs.head))
    reg("graft_shingle_hashes",
      exprs => {
        // The shingle width (and optional distinct flag) parameterize the
        // expression itself, so they must be literals — a clean analysis
        // error here beats an NPE from eval(null) on a non-foldable arg.
        def foldableOrFail(e: Expression, what: String): Any = {
          if (!e.foldable) throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              s"graft_shingle_hashes requires a literal $what, got non-foldable: ${e.sql}"))
          e.eval(null)
        }
        if (exprs.length < 2 || exprs.length > 4)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              s"graft_shingle_hashes expects (text, n[, distinct[, mod32]]), got ${exprs.length} args"))
        // A literal NULL would unbox to false silently and any other
        // type would throw a raw ClassCastException — both fail here
        // with the same analysis error as a non-foldable arg.
        def boolFlag(e: Expression, what: String): Boolean =
          foldableOrFail(e, what) match {
            case b: java.lang.Boolean => b.booleanValue()
            case other => throw new org.apache.spark.sql.AnalysisException(
              errorClass = "INTERNAL_ERROR",
              messageParameters = Map("message" ->
                (s"graft_shingle_hashes $what must be a boolean literal, got " +
                  (if (other == null) "NULL" else s"${other.getClass.getSimpleName}($other)"))))
          }
        val n = foldableOrFail(exprs(1), "shingle width n") match {
          case num: Number => num.intValue()
          case other => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INTERNAL_ERROR",
            messageParameters = Map("message" ->
              (s"graft_shingle_hashes shingle width n must be an integer literal, got " +
                (if (other == null) "NULL" else s"${other.getClass.getSimpleName}($other)"))))
        }
        val dist = if (exprs.length < 3) true else boolFlag(exprs(2), "distinct flag")
        val m32 = if (exprs.length < 4) true else boolFlag(exprs(3), "mod32 flag")
        ShingleHashes(exprs(0), n, dist, m32)
      })
  }
}
