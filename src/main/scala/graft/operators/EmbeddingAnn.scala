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
    * otherwise score all pairs on one core. Idempotent — a frame that
    * already carries `vnorm` passes through untouched, so callers can
    * normalize (and persist) once and share the result across
    * training and search instead of paying the pass twice.
    */
  def normalized(df: DataFrame, vecCol: String): DataFrame =
    if (df.columns.contains("vnorm")) df
    else {
      // Native single-pass normalization (plans.L2Normalize) —
      // bit-identical to VectorFunctions.l2Normalize, which
      // re-evaluates its norm sub-expression per element (O(dim²)
      // per row; ~100× slower at 1024 dims). Equality is asserted in
      // ScaleOpsSpec.
      NativeFunctions.ensureRegistered(df.sparkSession)
      Skew.spread(df).withColumn("vnorm", call_function("graft_l2norm", col(vecCol)))
    }

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

  /** HARD-NEGATIVE mining for embedding-model training: for each query,
    * the top-k most-similar corpus vectors whose label DIFFERS from
    * the query's — the negatives closest to the decision boundary,
    * the contrastive-training sampling recipe. The label filter runs
    * BEFORE ranking so all k slots hold negatives (filtering after
    * rank would under-fill queries whose neighborhoods are
    * same-label). Exact form on a broadcast query batch — the
    * oracle-able shape; at corpus scale the same compose runs the
    * label anti-filter over [[ivfTopK]]'s probed candidates instead.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = normalized(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col(labelCol).as("__lc"), col("vnorm").as("vc"))
    val q = normalized(queries, vecCol)
      .select(col(idCol).as("query_id"), col(labelCol).as("__lq"), col("vnorm").as("vq"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("__lc") =!= col("__lq"))
      .select(col("query_id"), col("neighbor_id"), nativeDot(c, "vq", "vc").as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-quality report: k-NN majority-vote label agreement. Each
    * query is assigned the majority label of its top-k cosine
    * neighbors (ties broken toward the smaller label) and scored
    * against its own label; output is per-label (label, n_queries,
    * n_correct). High agreement means the embedding space clusters by
    * label — the report a pipeline checks before trusting
    * embedding-based dedup or retrieval. Runs on any top-k source:
    * pass [[bruteForceTopK]] output for the oracle-exact form (as the
    * gate does, query side capped) or [[ivfTopK]] output for the
    * approximate scale path — the voting compose is identical.
    */
  def knnLabelEval(topk: DataFrame, corpus: DataFrame, idCol: String,
                   labelCol: String): DataFrame = {
    val lab = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("n_label"))
    val qlab = corpus.select(col(idCol).as("query_id"), col(labelCol).as("q_label"))
    val votes = topk.join(lab, "neighbor_id")
      .groupBy(col("query_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("n_label").asc)
    val pred = votes.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("query_id"), col("n_label").as("pred_label"))
    pred.join(qlab, "query_id")
      .groupBy(col("q_label"))
      .agg(count(lit(1)).as("n_queries"),
        count(when(col("pred_label") === col("q_label"), 1)).as("n_correct"))
      .select(col("q_label").as("label"), col("n_queries"), col("n_correct"))
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

  /** Deterministic random hyperplanes: `nBits` rows of `dim` gaussians.
    * `private[graft]` so the `ann_lsh` oracle can render the same
    * constants into its DuckDB SQL — the planes are seeded data, not a
    * hash function, so the oracle reproduces the buckets exactly.
    */
  private[graft] def hyperplanes(nBits: Int, dim: Int, seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id (0 .. 2^nBits-1) for each vector. */
  def lshBucket(vec: Column, dim: Int, nBits: Int, seed: Int = 42): Column = {
    val planes = hyperplanes(nBits, dim, seed)
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      val d = aggregate(zip_with(vec, planeCol, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate near-dup pairs via LSH bucketing: only same-bucket
    * pairs are scored. `nTables` independent hash tables are OR-ed
    * (a pair is scored if it collides in ANY table), trading compute
    * for recall: miss probability per table p becomes p^nTables.
    * Cost drops from O(n²) to nTables · Σ_buckets O(|bucket|²).
    */
  def lshNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, dim: Int, nBits: Int = 8,
                      nTables: Int = 1,
                      maxBucket: Int = BucketGuard.DefaultMaxBucket,
                      dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val n = normalized(corpus, vecCol)
    val buckets = array((0 until nTables).map { t =>
      lshBucket(col("vnorm"), dim, nBits, seed = 42 + t) + lit(t.toLong << 32)
    }: _*)
    val banded = n.select(col(idCol), col("vnorm"), explode(buckets).as("bucket"))
    // A dense embedding cluster landing in one sign-LSH bucket is the
    // degenerate case; cap its population (see BucketGuard — result is
    // lazy, so dropped-mass logging is the caller's counter to read).
    // The window's once-per-join-side evaluation is measured CHEAPER
    // here than a persist barrier: the bucketed frame is nTables
    // rows/doc (1–2), unlike the 16-band MinHash frame.
    val capped = BucketGuard.capBuckets(banded, Seq("bucket"), idCol,
      maxBucket, dropCounter)
    val a = capped.select(col(idCol).as("id_a"), col("vnorm").as("va"), col("bucket"))
    val b = capped.select(col(idCol).as("id_b"), col("vnorm").as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), nativeDot(n, "va", "vb").as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  // -------------------------------------------------------------------
  // IVF (inverted-file) ANN: cluster the corpus once, then restrict
  // each query to its `nprobe` nearest clusters. The coarse quantizer
  // is a deterministic k-means (fixed seed, fixed iterations) trained
  // on the corpus; centroids are tiny (nlist × dim doubles) and live
  // on the driver / in the closure — the corpus itself only shuffles
  // once, on its assigned cluster id.
  // -------------------------------------------------------------------

  /** Deterministic k-means over the (normalized) corpus. Returns
    * nlist centroids. Init = first nlist vectors by id order; a fixed
    * number of Lloyd iterations; ties broken by lowest centroid index.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int, iters: Int = 5,
                     trainSample: Int = 25000): Array[Array[Double]] = {
    // Train on a bounded sample (standard IVF practice): the quantizer
    // needs representative geometry, not the whole corpus, and the
    // driver must never hold more than trainSample × dim doubles —
    // trainSample × dim × 8 B on the heap (25k × 1024-dim ≈ 200 MB;
    // size trainSample against driver memory before raising it). The
    // default follows the usual k-means budget of tens-to-hundreds of
    // points per centroid, not a fraction of the corpus. The Lloyd
    // accumulation is parallelized over FIXED-SIZE index chunks with
    // partials combined in chunk order — deterministic regardless of
    // thread count or scheduling (unlike a shared accumulator or a
    // hardware-sized split), so the centroids are the same bits on
    // every machine; cost is iters × trainSample × nlist × dim flops
    // (5 × 25k × 16 × 64 ≈ 10⁸ here) spread over driver cores.
    // Plain limit, NOT orderBy().limit(): a global-sort TakeOrdered
    // ships partitions × trainSample rows to the merge at scale,
    // whereas limit stops the scan after trainSample rows. WHICH rows
    // limit takes depends on the partition layout, so centroids are
    // deterministic for a fixed layout (same files, same parallelism)
    // but not across layouts — acceptable for a coarse quantizer whose
    // recall is asserted, not its exact centroids. The driver-side sort
    // (string form: works for any id type) fixes the k-means INIT order
    // within whatever sample was taken.
    val data = normalized(corpus, vecCol)
      .select(col(idCol).cast("string").as("__id"), col("vnorm"))
      .limit(trainSample)
      .collect()
      .sortBy(r => Option(r.getString(0)).getOrElse(""))
      .map(_.getSeq[Double](1).toArray)
    require(data.length >= nlist, s"corpus smaller than nlist=$nlist")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val ChunkRows = 1024
    var centroids: Array[Array[Double]] = data.take(nlist).map(_.clone())
    for (_ <- 0 until iters) {
      val cs = centroids // stable reference for the concurrent readers
      val partials = Await.result(
        Future.sequence((0 until data.length by ChunkRows).map { s0 =>
          Future {
            val sums = Array.fill(cs.length)(new Array[Double](cs.head.length))
            val counts = new Array[Long](cs.length)
            var idx = s0
            val end = math.min(s0 + ChunkRows, data.length)
            while (idx < end) {
              val v = data(idx)
              var best = 0; var bestD = Double.NegativeInfinity
              for (c <- cs.indices) {
                var d = 0.0; var i = 0
                while (i < v.length) { d += v(i) * cs(c)(i); i += 1 }
                if (d > bestD) { bestD = d; best = c }
              }
              counts(best) += 1
              var i = 0
              while (i < v.length) { sums(best)(i) += v(i); i += 1 }
              idx += 1
            }
            (sums, counts)
          }
        }), Duration.Inf)
      val sums = Array.fill(centroids.length)(new Array[Double](centroids.head.length))
      val counts = new Array[Long](centroids.length)
      partials.foreach { case (ps, pc) =>
        for (c <- centroids.indices) {
          counts(c) += pc(c)
          var i = 0
          while (i < sums(c).length) { sums(c)(i) += ps(c)(i); i += 1 }
        }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val m = sums(c).map(_ / counts(c))
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm == 0) centroids(c) else m.map(_ / norm)
        }
      }.toArray
    }
    centroids
  }

  /** All centroid dots as one native array expression (registered
    * per-session; the centroid matrix lives inside the expression,
    * not as literal plan nodes).
    */
  private def centroidScoresNative(df: DataFrame, vecCol: String,
                                   centroids: Array[Array[Double]]): Column = {
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_centroid_scores",
      exprs => graft.plans.CentroidScores(exprs.head, centroids), "built-in")
    expr(s"graft_centroid_scores($vecCol)")
  }

  /** Corpus with a `cluster` column: argmax centroid dot per vector
    * (native score array materialized once, argmax over the attribute).
    */
  def withCluster(df: DataFrame, vecCol: String,
                  centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("__scores", centroidScoresNative(df, vecCol, centroids))
      .withColumn("cluster",
        (array_position(col("__scores"), array_max(col("__scores"))) - 1).cast("int"))
      .drop("__scores")

  /** The IVF INDEX rows for a corpus batch — (neighbor_id, vc, cluster),
    * i.e. each vector normalized and assigned to its nearest centroid.
    * This is the warehouse-table form of the index: build once, append
    * per ingest batch (assignment is a pure per-vector function of the
    * FIXED centroids, so an index assembled across appends is
    * row-identical to one built in a single pass), probe with
    * [[ivfTopKFromPostings]]. Partition the table by `cluster` so a
    * probe touches nprobe/nlist of the files. Centroid drift under a
    * shifting corpus is the caller's retrain policy — the standard
    * IVF operational trade, not something an append can fix.
    */
  def ivfPostings(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: Array[Array[Double]]): DataFrame = {
    // Two-layer projection: the native 16-score array is materialized
    // once per row, then argmax / probe-sort read the attribute.
    val cn = normalized(corpus, vecCol)
    cn.withColumn("__scores", centroidScoresNative(cn, "vnorm", centroids))
      .withColumn("cluster",
        (array_position(col("__scores"), array_max(col("__scores"))) - 1).cast("int"))
      .select(col(idCol).as("neighbor_id"), col("vnorm").as("vc"), col("cluster"))
  }

  /** Probe an IVF postings frame (typically the warehouse index table
    * [[ivfPostings]] maintains): each query scores only the postings
    * of its `nprobe` closest clusters.
    */
  def ivfTopKFromPostings(postings: DataFrame, queries: DataFrame, idCol: String,
                          vecCol: String, k: Int, centroids: Array[Array[Double]],
                          nprobe: Int): DataFrame = {
    val qn = normalized(queries, vecCol)
    val probeList = {
      val withIdx = transform(col("__scores"),
        (s, i) => struct(s.as("score"), i.as("idx")))
      slice(reverse(array_sort(withIdx)), 1, nprobe)
    }
    val q = qn
      .withColumn("__scores", centroidScoresNative(qn, "vnorm", centroids))
      .select(col(idCol).as("query_id"), col("vnorm").as("vq"),
        explode(probeList).as("probe"))
      .select(col("query_id"), col("vq"), col("probe.idx").cast("int").as("cluster"))
    val scored = postings.join(broadcast(q), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        nativeDot(postings, "vq", "vc").as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF top-k: corpus partitioned by nearest centroid; each query
    * probes its `nprobe` closest clusters and scores only those
    * postings. Wall-clock scales with nprobe/nlist of the corpus
    * instead of all of it.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, centroids: Array[Array[Double]], nprobe: Int): DataFrame =
    ivfTopKFromPostings(ivfPostings(corpus, idCol, vecCol, centroids),
      queries, idCol, vecCol, k, centroids, nprobe)

  /** IVF-SQ8: IVF search over int8-QUANTIZED postings with float
    * rescoring — the standard 4× memory lever for billion-vector
    * posting lists. The postings carry ONLY (id, int8 codes, scale,
    * cluster); candidate scoring is an integer dot de-quantized by the
    * two scales, the approximate top `k·rescoreFactor` then join BACK
    * to the float corpus for exact rescoring (at scale that is the
    * point: floats live once in the base table, never in the
    * postings). Approximate by construction — recall vs the exact
    * baseline is what the gate pins.
    */
  def ivfTopKQuantized(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, k: Int, centroids: Array[Array[Double]],
                       nprobe: Int, rescoreFactor: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions
    val cn = normalized(corpus, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = cn
      .withColumn("__scores", centroidScoresNative(cn, "vnorm", centroids))
      .withColumn("cluster",
        (array_position(col("__scores"), array_max(col("__scores"))) - 1).cast("int"))
      .select(col(idCol).as("neighbor_id"),
        VectorFunctions.quantizeRound(col("vnorm")).as("qc"),
        (VectorFunctions.maxAbs(col("vnorm")) / 127.0).as("sc"),
        col("cluster"))
    val qn = normalized(queries, vecCol)
    val probeList = {
      val withIdx = transform(col("__scores"),
        (s, i) => struct(s.as("score"), i.as("idx")))
      slice(reverse(array_sort(withIdx)), 1, nprobe)
    }
    val q = qn
      .withColumn("__scores", centroidScoresNative(qn, "vnorm", centroids))
      .select(col(idCol).as("query_id"),
        VectorFunctions.quantizeRound(col("vnorm")).as("qq"),
        (VectorFunctions.maxAbs(col("vnorm")) / 127.0).as("sq"),
        explode(probeList).as("probe"))
      .select(col("query_id"), col("qq"), col("sq"),
        col("probe.idx").cast("int").as("cluster"))
    // Integer dot on the bounded candidate set, de-quantized by the
    // two per-vector scales — approximates the cosine of the
    // normalized vectors.
    val approx = postings.join(broadcast(q), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (aggregate(zip_with(col("qq"), col("qc"), (a, b) => a * b), lit(0L),
          (acc, x) => acc + x).cast("double") * col("sq") * col("sc")).as("approx"))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val shortlist = approx.withColumn("__r", row_number().over(wa))
      .filter(col("__r") <= k * rescoreFactor)
      .select(col("query_id"), col("neighbor_id"))
    // Exact float rescore: join back to the base corpus (the floats'
    // only home) for the shortlisted pairs.
    val rescored = shortlist
      .join(cn.select(col(idCol).as("neighbor_id"), col("vnorm").as("vc")), "neighbor_id")
      .join(broadcast(qn.select(col(idCol).as("query_id"), col("vnorm").as("vq"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        nativeDot(cn, "vq", "vc").as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    // The top-k result is tiny next to the cached normalized corpus:
    // materialize it eagerly and release the cache, so repeated calls
    // in a long-lived session don't accumulate pinned blocks.
    Caching.materializeAndRelease(
      rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k), cn)
  }

  // -------------------------------------------------------------------
  // SemDeDup: semantic deduplication via cluster-then-pairwise.
  // Reference behavior: embedding-cosine near-dup over a document
  // corpus (the reference's embedding dedup is the brute-force pair
  // scan); the clustered form is the published scale path
  // (SemDeDup, Abbas et al. 2023, arXiv:2303.09540).
  // -------------------------------------------------------------------

  /** Semantic dedup decision per vector. The corpus is partitioned by
    * its nearest k-means centroid (the same deterministic coarse
    * quantizer IVF uses) and ONLY within-cluster pairs are scored —
    * pairwise cost falls from O(n²) to Σ O(|cluster|²), and
    * [[BucketGuard]] caps degenerate clusters so one dense region
    * cannot re-create the all-pairs blowup. Pairs at/above `threshold`
    * are closed into groups (connected components over the pair graph)
    * and each group keeps its minimum id — the same keeper election
    * every other dedup family here uses, instead of the paper's
    * keep-farthest-from-centroid, so the decision is a deterministic
    * pure function of the pair set. Cross-cluster near-dups are missed
    * BY DESIGN (the paper's recall/cost trade); raise nlist for
    * smaller, cheaper clusters or lower it for higher recall.
    *
    * Output: one row per corpus vector — (idCol, cluster, sem_group,
    * keep); `sem_group` is the component's minimum id (the vector's
    * own id when it has no near-dup), `keep` marks the group keeper.
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               centroids: Array[Array[Double]], threshold: Double,
               maxBucket: Int = BucketGuard.DefaultMaxBucket,
               dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val n = normalized(corpus, vecCol)
    val clustered = withCluster(n, "vnorm", centroids)
      .select(col(idCol), col("vnorm"), col("cluster"))
    val capped = BucketGuard.capBuckets(clustered, Seq("cluster"), idCol,
      maxBucket, dropCounter)
    val a = capped.select(col("cluster"), col(idCol).as("id_a"), col("vnorm").as("va"))
    val b = capped.select(col("cluster"), col(idCol).as("id_b"), col("vnorm").as("vb"))
    // Same-cluster candidate self-join: shuffles (id, vnorm) on the
    // cluster id once; the dot is the codegen'd native primitive loop.
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), nativeDot(n, "va", "vb").as("cosine"))
      .filter(col("cosine") >= threshold)
    val comp = Components.connectedComponentsAuto(pairs)
    clustered.select(col(idCol), col("cluster"))
      .join(comp.select(col("node").as(idCol), col("cluster_id").as("sem_group")),
        Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("sem_group"), col(idCol).cast("long")).as("sem_group"))
      .withColumn("keep", col("sem_group") === col(idCol).cast("long"))
  }
}
