package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: map each document onto contiguous token offsets
  * in a fixed concatenation order, then chunk the global token stream
  * into training sequences of `seqLen` tokens (the GPT-style
  * concat-and-chunk recipe). The output tells a tokenizer/writer stage
  * exactly where every document lands — first/last sequence id and
  * whether it straddles a sequence boundary — without materializing a
  * single token.
  *
  * The concatenation order is `md5(salt || id)` — the same
  * engine-portable deterministic permutation the sampling operators
  * use, so packing is reproducible across engines, re-runs, and
  * partition layouts (a seeded shuffle would not be).
  *
  * Scale shape: a global running sum in hash order. A bare
  * `ORDER BY` window would drag the corpus through ONE partition, so
  * the prefix sum is two-level instead: documents are bucketed by the
  * first byte of their order hash (256 range buckets that agree with
  * the global order, because the bucket is a prefix of the order key),
  * the running sum is windowed WITHIN each bucket, and the 256 bucket
  * totals — a driver-scale frame — are window-summed into bucket base
  * offsets and broadcast-joined back. No driver loop, no single-task
  * sort, one shuffle of (id, n_tokens) pairs; the text never moves.
  */
object Packing {

  /** Per-document packing map: (id, n_tokens, begin_off, seq_first,
    * seq_last, spans_boundary). Offsets are 0-based token positions in
    * the concatenated stream; sequence k covers [k·seqLen, (k+1)·seqLen).
    * Empty documents (0 tokens) occupy no span: seq_first = seq_last =
    * the sequence their offset falls in, spans_boundary = false.
    *
    * `perDocOverhead` is the separator budget a real packer spends per
    * document (an EOS token, a BOS/EOS pair): it joins the document's
    * span, so `n_tokens` is the PACKED length — content plus
    * separators — and every offset downstream accounts for them.
    * Default 0 keeps the raw-concatenation contract.
    *
    * `tokenCounter` swaps the whitespace token count for a real
    * tokenizer's — pass
    * `size(TextFunctions.bpeEncode(spark, col(textCol), merges))` to
    * pack on trained-BPE lengths; the packing math is independent of
    * where the counts come from.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Long, salt: String = "graft",
                    perDocOverhead: Long = 0L,
                    tokenCounter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(perDocOverhead >= 0, s"perDocOverhead must be >= 0, got $perDocOverhead")
    val ord = Sampling.hashBucket32(col(idCol), salt)
    val counted = tokenCounter.getOrElse(
      graft.functions.TextFunctions.tokenCount(col(textCol)))
    val base = df.select(col(idCol),
      (counted.cast("long") + perDocOverhead).as("n_tokens"),
      ord.as("__ord"))
    // Integer `div` (not `/` + floor): `/` on longs is DOUBLE division,
    // and at 100 T-token offsets a correctly-rounded double quotient
    // can still land on the wrong side of an integer boundary.
    bucketedRunningSum(base, Nil, "__ord", "n_tokens", "__end_off")
      .select(col(idCol), col("n_tokens"),
        (col("__end_off") - col("n_tokens")).as("begin_off"), col("__end_off"))
      .select(col(idCol), col("n_tokens"), col("begin_off"),
        expr(s"begin_off div $seqLen").as("seq_first"),
        expr(s"CASE WHEN n_tokens > 0 THEN (__end_off - 1) div $seqLen" +
          s" ELSE begin_off div $seqLen END").as("seq_last"))
      .withColumn("spans_boundary", col("seq_last") =!= col("seq_first"))
  }

  /** Two-level bucketed running sum — the shared scale recipe of
    * [[packSequences]] and [[Sampling.tokenBudgetSample]]. Adds
    * `cumCol` = running sum of `valueCol` in `ordCol` order within
    * each `partitionCols` group (empty = one global order) WITHOUT a
    * single-task global window: rows sub-bucket by the first byte of
    * `ordCol` (the bucket is a PREFIX of the order key, so bucket
    * ranges agree with the order), the running sum windows within
    * (group, bucket), and bucket base offsets come from a map-side-
    * combinable groupBy — identical long sums, a few hundred partial
    * rows per mapper — plus a ≤256-rows-per-group window, broadcast
    * back. `ordCol` must be a string whose lexicographic order is the
    * intended order and whose first two chars distribute uniformly
    * (an md5 hex string). The input projection is traversed twice
    * (window + totals) — pure map work, deliberately not persisted.
    */
  private[operators] def bucketedRunningSum(df: DataFrame, partitionCols: Seq[String],
                                            ordCol: String, valueCol: String,
                                            cumCol: String): DataFrame = {
    val base = df.withColumn("__b", substring(col(ordCol), 1, 2))
    val groupB = (partitionCols :+ "__b").map(col)
    val wB = Window.partitionBy(groupB: _*).orderBy(col(ordCol))
    val withCum = base.withColumn("__cum_b", sum(col(valueCol)).over(wB))
    val wT = (if (partitionCols.isEmpty) Window.orderBy(col("__b"))
              else Window.partitionBy(partitionCols.map(col): _*).orderBy(col("__b")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(groupB: _*).agg(sum(col(valueCol)).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wT), lit(0L)))
      .select((partitionCols :+ "__b" :+ "__off").map(col): _*)
    withCum.join(broadcast(offsets), partitionCols :+ "__b")
      .withColumn(cumCol, col("__off") + col("__cum_b"))
      .drop("__b", "__cum_b", "__off")
  }

  /** Split documents into fixed-token chunks with `overlap` carried
    * tokens between consecutive chunks (stride = maxTokens − overlap)
    * — the doc→sample step when documents exceed the model's sequence
    * length, and the chunking step of retrieval indexing. Chunk k of a
    * doc starts at token k·stride; starts run while they are inside
    * the document, so the final chunk may be shorter than maxTokens
    * (and, when a tail is shorter than the overlap, consists only of
    * carried tokens — the standard overflowing-tokens convention).
    * Empty documents yield no chunks.
    *
    * Scale shape: pure map work — tokenize once per document,
    * `sequence` + `explode` for the chunk index, `slice` for the
    * window; NO shuffle, no state, embarrassingly parallel at any
    * corpus size. Output: (id, chunk_id, chunk_start, n_chunk_tokens,
    * chunk_text).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    df.select(col(idCol), graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        // `div`, not `/`: same integer-division rationale as the
        // sequence offsets above.
        explode(sequence(lit(0L), expr(s"(__n - 1) div $stride"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        least(lit(maxTokens).cast("long"),
          col("__n") - col("chunk_id") * stride).as("n_chunk_tokens"),
        array_join(
          slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
            lit(maxTokens)),
          " ").as("chunk_text"))
  }

  /** Length-bucketed BATCH assignment — the dynamic-batching prep for
    * variable-length training/inference: documents bucket by token
    * count against `boundaries` (bucket i = count < boundaries(i),
    * last bucket = the rest), and within each bucket batches of
    * `batchSize` form in deterministic md5 order. Batching similar
    * lengths together bounds padding waste to the bucket width; the
    * md5 order keeps batch membership reproducible across engines and
    * layouts (a seeded shuffle would not be).
    *
    * Scale shape: the within-bucket rank is the same two-level
    * 256-sub-bucket prefix sum as [[packSequences]] — a handful of
    * length buckets would otherwise each funnel through ONE window
    * task. Output: (id, n_tokens, len_bucket, batch_id).
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
                          boundaries: Seq[Int], batchSize: Int,
                          salt: String = "graft"): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(boundaries.nonEmpty && boundaries == boundaries.sorted.distinct,
      s"boundaries must be strictly increasing, got $boundaries")
    val nTok = graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
    val bucket = boundaries.zipWithIndex.foldRight(lit(boundaries.length)) {
      case ((b, i), acc) => when(col("n_tokens") < b, lit(i)).otherwise(acc)
    }
    val base = df
      .select(col(idCol), nTok.as("n_tokens"),
        Sampling.hashBucket32(col(idCol), salt).as("__ord"))
      .withColumn("len_bucket", bucket)
      .withColumn("__one", lit(1L))
    bucketedRunningSum(base, Seq("len_bucket"), "__ord", "__one", "__rank")
      .select(col(idCol), col("n_tokens"), col("len_bucket"),
        // `div`, not `/`: integer batch ids, same rationale as the
        // sequence offsets above.
        expr(s"(__rank - 1) div $batchSize").as("batch_id"))
  }
}
