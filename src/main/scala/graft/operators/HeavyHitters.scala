package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over a token stream with BOUNDED memory — the
  * frequent-term primitive of corpus auditing (stopword discovery,
  * boilerplate tokens, tokenizer-vocabulary seeding) at scales where
  * "group by token" is the problem: a 100 T-token corpus has a
  * multi-billion-row distinct vocabulary, and the full groupBy
  * shuffles ALL of it to answer a question about its tiny head.
  *
  * Two-pass candidate + verify (the classic distributed reduction of
  * SpaceSaving, Metwally et al. 2005, "Efficient computation of
  * frequent and top-k elements in data streams"):
  *
  *  1. Every partition streams its tokens through a k-counter
  *     SpaceSaving summary and emits its ≤ k survivors. The guarantee
  *     is deterministic, not probabilistic: an item with global
  *     frequency > N/k has frequency > N_p/k in at least one
  *     partition (otherwise summing the per-partition bounds caps it
  *     at N/k), and SpaceSaving(k) always retains every item above a
  *     1/k share of its own stream. Candidates are therefore a
  *     SUPERSET of the true heavy hitters, and ≤ k·#partitions rows —
  *     broadcastable by construction.
  *  2. Exact occurrence counts for the candidate set only (broadcast
  *     semi-join + groupBy over the matched subset — the shuffle
  *     carries ≤ k·#partitions distinct keys), thresholded against
  *     the true total as `n_occ · k > N` (integer arithmetic, no
  *     division).
  *
  * The result is EXACTLY the true heavy-hitter set with exact counts
  * — no approximation survives the verify pass — while the
  * full-vocabulary shuffle never runs. TWO linear passes total: the
  * summary pass emits each partition's token count alongside its
  * survivors (so the grand total rides for free), the verify pass
  * counts candidates; all whole-stage-codegen except the
  * per-partition summary itself (partition-local mutable state has no
  * Expression form — the same justification as the multimodal
  * decoders).
  */
object HeavyHitters {

  /** Stream `it` through a k-counter SpaceSaving summary; returns the
    * surviving keys. Eviction scans the k counters for the minimum —
    * O(k) per overflowing insert, the right trade at the k ≤ a few
    * thousand this operator targets (an indexed min-heap is the
    * production upgrade for large k; the guarantee is unchanged).
    */
  private[operators] def spaceSaving(it: Iterator[String], k: Int): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None =>
          if (m.size < k) m.update(t, 1L)
          else {
            // Replace the minimum counter, inheriting its count — the
            // overestimate that makes SpaceSaving's retention bound
            // hold (a true heavy item can lose its counter only to an
            // item charged at least its own count).
            val (mt, mc) = m.minBy(_._2)
            m.remove(mt)
            m.update(t, mc + 1)
          }
      }
    }
    m.keysIterator
  }

  /** The tokens of `tokenCol` (one row per occurrence) whose global
    * frequency strictly exceeds N/k, with exact counts. Output:
    * (token, n_occ, n_total).
    */
  def exactHeavyHitters(df: DataFrame, tokenCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // NULL is not a token: excluded from candidates AND from N (an
    // equi-join key cannot be null, so a null "heavy hitter" could
    // never be verified — half-counting it would silently skew every
    // real token's threshold instead).
    val toks = df.select(col(tokenCol).cast("string").as("t"))
      .filter(col("t").isNotNull)
      .as[String](Encoders.STRING)
    // One pass emits survivors AND the partition's token count (the
    // grand total rides for free — no separate counting scan). The
    // tiny summary (≤ (k+1)·#partitions rows) is lazily checkpointed
    // so its two consumers don't each re-scan the token stream.
    val summary = toks.mapPartitions { it =>
        var n = 0L
        val counted = it.map { t => n += 1; t }
        val keys = spaceSaving(counted, k).toArray // drains `counted`; n is final
        keys.iterator.map(t => (0, t, 0L)) ++ Iterator((1, "", n))
      }(Encoders.product[(Int, String, Long)])
      .toDF("kind", "t", "cnt")
      .localCheckpoint(false)
    val cands = summary.filter(col("kind") === 0).select(col("t")).distinct()
    val nFrame = summary.filter(col("kind") === 1)
      .groupBy().agg(sum(col("cnt")).as("__n"))
    toks.toDF("t")
      .join(broadcast(cands), Seq("t"), "left_semi")
      .groupBy(col("t")).agg(count(lit(1)).as("n_occ"))
      .crossJoin(broadcast(nFrame))
      .filter(col("n_occ") * k > col("__n"))
      .select(col("t").as("token"), col("n_occ"), col("__n").as("n_total"))
  }
}
