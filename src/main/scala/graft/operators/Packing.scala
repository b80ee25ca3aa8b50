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
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Long, salt: String = "graft"): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val ord = Sampling.hashBucket32(col(idCol), salt)
    val base = df.select(col(idCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      ord.as("__ord"), substring(ord, 1, 2).as("__b"))
    val wB = Window.partitionBy(col("__b")).orderBy(col("__ord"))
    val withCum = base.withColumn("__cum_b", sum(col("n_tokens")).over(wB))
    // 256 bucket totals; the exclusive running sum over them is each
    // bucket's base offset in the global stream. Totals come from a
    // map-side-combinable groupBy over the BASE projection, not
    // max(running sum) over the windowed frame: identical long sums,
    // but the aggregate shuffles ~256 partial rows per mapper where
    // the window route would re-shuffle and re-sort the whole corpus
    // a second time. Tiny frame — the single-partition window here is
    // over ≤256 rows, then broadcast.
    val wT = Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__b")).agg(sum(col("n_tokens")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wT), lit(0L)))
      .select(col("__b"), col("__off"))
    // Integer `div` (not `/` + floor): `/` on longs is DOUBLE division,
    // and at 100 T-token offsets a correctly-rounded double quotient
    // can still land on the wrong side of an integer boundary.
    withCum.join(broadcast(offsets), "__b")
      .select(col(idCol), col("n_tokens"),
        (col("__off") + col("__cum_b") - col("n_tokens")).as("begin_off"),
        (col("__off") + col("__cum_b")).as("__end_off"))
      .select(col(idCol), col("n_tokens"), col("begin_off"),
        expr(s"begin_off div $seqLen").as("seq_first"),
        expr(s"CASE WHEN n_tokens > 0 THEN (__end_off - 1) div $seqLen" +
          s" ELSE begin_off div $seqLen END").as("seq_last"))
      .withColumn("spans_boundary", col("seq_last") =!= col("seq_first"))
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
}
