package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators a training-data pipeline runs before any
  * model sees the data: benchmark decontamination (n-gram overlap
  * against an eval set) and cross-document boilerplate detection.
  * Both are beyond the reference's surface (it has no corpus concept)
  * but belong to the same quality family as its null/dup checks.
  */
object CorpusHygiene {

  /** Decontamination: (doc, bench, n_shared) for every corpus doc
    * sharing at least `minShared` distinct n-gram shingles with a
    * benchmark doc (self-pairs excluded, so the benchmark may be a
    * subset of the corpus). Scale shape: shingles hash to longs once
    * (NearDup.shingleSets); the benchmark's shingle sets — KB–MB by
    * definition for an eval suite — collect to the driver and ride
    * inside a native expression (plans.BenchmarkOverlap) as an
    * inverted index, so each corpus document is scored in ONE pass of
    * its own row. The corpus never explodes, never shuffles: the only
    * distributed work is the linear shingling scan.
    */
  /** Benchmark shingle budget for the in-expression inverted index:
    * beyond this many total benchmark shingles the exact/fuzzy decon
    * paths switch from collect-to-driver to the distributed posting
    * join. ~4M longs ≈ 32 MB of raw keys (index overhead a small
    * multiple of that) — comfortably inside a task, far below any
    * driver limit.
    */
  val DefaultMaxDriverShingles: Long = 4L << 20

  /** Shared candidate machinery of the exact and fuzzy decon rules,
    * with TWO physical strategies behind one output contract —
    * (doc_id, bench_id, n_shared, n_corpus), self-pairs removed, only
    * pairs with n_shared >= minShared:
    *
    *  - benchmark total shingles <= `maxDriverShingles`: collect the
    *    benchmark's shingle sets and ride them inside the native
    *    inverted-index expression (plans.BenchmarkOverlap) — each
    *    corpus document scored in ONE pass of its own row, the corpus
    *    never explodes or shuffles;
    *  - larger benchmarks: a distributed (shingle → bench_id) posting
    *    join — both sides explode to postings, join on the shingle
    *    hash, count distinct shared shingles per (doc, bench) pair.
    *    Both sides' shingle arrays are distinct per document, so the
    *    join emits exactly one row per shared shingle and a plain
    *    count IS the distinct-intersection size. This path shuffles
    *    the corpus' postings (16 bytes/shingle) — the price of a
    *    benchmark beyond task memory, and the scale ceiling is then
    *    the cluster, not the driver.
    *
    * Returns the candidate frame and the per-benchmark shingle-set
    * sizes as a (bench_id, n_bench) frame (tiny: one row per
    * benchmark document).
    */
  private def benchOverlapCandidates(corpus: DataFrame, benchmark: DataFrame,
                                     idCol: String, textCol: String,
                                     n: Int, minShared: Long,
                                     maxDriverShingles: Long = DefaultMaxDriverShingles)
      : (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // Persisted like every other shingle consumer (NearDup.*): the
    // linear shingling scan dominates and repeated hygiene passes over
    // the same corpus reuse it.
    val corpusShingled = NearDup.shingleSets(corpus, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchShingled = NearDup.shingleSets(benchmark, idCol, textCol, n)
      .select(col(idCol).cast("long").as("bench_id"), col("shingles"))
    val totalShingles = benchShingled
      .agg(sum(size(col("shingles")).cast("long"))).head(1)
      .headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .getOrElse(0L)
    if (totalShingles <= maxDriverShingles) {
      val bench: Array[(Long, Array[Long])] = benchShingled
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bench_overlap",
        exprs => graft.plans.BenchmarkOverlap(exprs.head, bench, minShared), "built-in")
      val cands = corpusShingled
        .select(col(idCol).as("doc_id"),
          size(col("shingles")).cast("long").as("n_corpus"),
          explode(call_function("graft_bench_overlap", col("shingles"))).as("m"))
        .select(col("doc_id"), col("m.bench_id").as("bench_id"),
          col("m.n_shared").as("n_shared"), col("n_corpus"))
        .filter(col("doc_id") =!= col("bench_id"))
      (cands, bench.map { case (id, sh) => (id, sh.length.toLong) }
        .toSeq.toDF("bench_id", "n_bench"))
    } else {
      val benchPersisted = benchShingled
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val benchPost = benchPersisted
        .select(col("bench_id"), explode(col("shingles")).as("__s"))
      val corpusPost = corpusShingled
        .select(col(idCol).as("doc_id"),
          size(col("shingles")).cast("long").as("n_corpus"),
          explode(col("shingles")).as("__s"))
      // No broadcast hint: the benchmark chose this path by being too
      // big for a task — AQE decides from measured sizes.
      val cands = corpusPost.join(benchPost, Seq("__s"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"), max(col("n_corpus")).as("n_corpus"))
        .filter(col("n_shared") >= minShared)
        .filter(col("doc_id") =!= col("bench_id"))
      (cands, benchPersisted
        .select(col("bench_id"), size(col("shingles")).cast("long").as("n_bench")))
    }
  }

  def contaminationPairs(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 3, minShared: Long = 5,
                         maxDriverShingles: Long = DefaultMaxDriverShingles): DataFrame =
    benchOverlapCandidates(corpus, benchmark, idCol, textCol, n, minShared,
      maxDriverShingles)._1
      .select(col("doc_id"), col("bench_id"), col("n_shared"))

  /** FUZZY decontamination (Jaccard-thresholded) — the Llama/GPT-style
    * complement to [[contaminationPairs]]' raw shared-count rule: a
    * corpus document is contaminated when its n-gram Jaccard with any
    * benchmark document reaches `threshold`, so a near-verbatim eval
    * copy with light edits is caught without hand-tuning an absolute
    * overlap count against document length.
    *
    * Same 100 TB shape as the exact path, because the ONLY extra
    * inputs Jaccard needs are the two set sizes: the benchmark rides
    * inside the native inverted-index expression (bounded by
    * definition), the corpus-side size comes from the SAME shingling
    * pass (`size(shingles)`), and the benchmark sizes broadcast as a
    * #benchmark-row frame. The corpus never shuffles; `minShared`
    * pre-filters inside the expression before any row is emitted.
    * Output: (doc_id, bench_id, jaccard) at/above threshold.
    */
  def fuzzyContaminationPairs(corpus: DataFrame, benchmark: DataFrame,
                              idCol: String, textCol: String,
                              n: Int = 3, threshold: Double = 0.5,
                              minShared: Long = 1L,
                              maxDriverShingles: Long = DefaultMaxDriverShingles)
      : DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val (cands, sizes) =
      benchOverlapCandidates(corpus, benchmark, idCol, textCol, n, minShared,
        maxDriverShingles)
    // One row per benchmark DOCUMENT (not per shingle) — small on
    // either physical path, so the size join broadcasts.
    cands.join(broadcast(sizes), Seq("bench_id"))
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("n_corpus") + col("n_bench") - col("n_shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("bench_id"), col("jaccard"))
  }

  /** Decontamination as a FILTER: the corpus minus every document
    * [[contaminationPairs]] flags — the compose a pipeline actually
    * ships (detect feeds remove). Same scale shape: the benchmark
    * rides inside the native expression, the corpus pass is linear,
    * and the flagged-id set (small by construction) anti-joins back.
    */
  def removeContaminated(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 5, minShared: Long = 2,
                         maxDriverShingles: Long = DefaultMaxDriverShingles): DataFrame = {
    val bad = contaminationPairs(corpus, benchmark, idCol, textCol, n, minShared,
        maxDriverShingles)
      .select(col("doc_id").as(idCol)).distinct()
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Benchmark decontamination at the scale where the EXACT inverted
    * index no longer fits: the benchmark's distinct shingle hashes
    * collapse into a Bloom filter (~`bitsPerKey` bits per shingle —
    * a billion-shingle eval suite at 20 bits/key is ~2.5 GB, still a
    * task-local probe), and a corpus document is flagged when at
    * least `minShared` of its shingles hit the filter. Membership is
    * against the benchmark's shingle UNION (no per-benchmark-doc
    * attribution — the filter decision doesn't need it), and the
    * filter can only OVER-flag: no contaminated document ever
    * survives that the exact rule would have caught
    * ([[bloomDeconStats]] gates both directions). Same scale shape as
    * [[removeContaminated]]: the corpus pass is one linear shingling
    * scan, nothing explodes or shuffles but the flagged-id anti-join.
    */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 5, minShared: Long = 2,
                         bitsPerKey: Int = 20, numHashes: Int = 6): DataFrame = {
    val bad = bloomScores(corpus, benchmark, idCol, textCol, n, bitsPerKey, numHashes,
        withExact = false)
      .filter(col("bloom_n") >= minShared).select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** The honesty gate for [[bloomDecontaminate]], one row: corpus size
    * (docs long enough to shingle), the exact union-rule flag count,
    * `n_missed` = exact-flagged docs the Bloom path would MISS (zero
    * by the no-false-negative construction — a nonzero value is a
    * bug, not noise), and `fp_ok` = the Bloom's EXTRA flags stay
    * within `maxExtraFraction` of the corpus. Exact and Bloom scores
    * ride the SAME shingle scan — one linear pass, a driver-row out.
    */
  def bloomDeconStats(corpus: DataFrame, benchmark: DataFrame,
                      idCol: String, textCol: String,
                      n: Int = 5, minShared: Long = 2,
                      bitsPerKey: Int = 20, numHashes: Int = 6,
                      maxExtraFraction: Double = 0.01): DataFrame =
    bloomScores(corpus, benchmark, idCol, textCol, n, bitsPerKey, numHashes,
        withExact = true)
      .agg(
        count(lit(1)).as("n_corpus"),
        count(when(col("exact_n") >= minShared, 1)).as("n_exact"),
        count(when(col("exact_n") >= minShared && col("bloom_n") < minShared, 1))
          .as("n_missed"),
        (count(when(col("bloom_n") >= minShared && col("exact_n") < minShared, 1)) <=
          ceil(lit(maxExtraFraction) * count(lit(1)))).as("fp_ok"))

  /** Shared scoring pass: per corpus doc, `bloom_n` (shingles hitting
    * the Bloom filter) and — `withExact` only — `exact_n` (shingles
    * exactly in the benchmark union, via the same inverted-index
    * expression the exact path uses, with one pseudo-entry holding the
    * union).
    *
    * The BIT ARRAY is built distributively (per-partition fold +
    * OR-reduce, [[graft.plans.BloomHitCount.buildDistributed]]): the
    * driver holds only the bits, never the raw shingle set — the whole
    * point of the Bloom path is benchmarks that outgrow driver memory,
    * so the build must not collect what the filter exists to avoid.
    * `withExact = true` (the [[bloomDeconStats]] honesty gate only)
    * DOES collect the distinct shingles for exact attribution — that
    * gate is a bounded diagnostic run on benchmarks small enough to
    * check exactly, not a production path.
    */
  private def bloomScores(corpus: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String,
                          n: Int, bitsPerKey: Int, numHashes: Int,
                          withExact: Boolean,
                          maxDriverShingles: Long = DefaultMaxDriverShingles)
      : DataFrame = {
    val spark = corpus.sparkSession
    val benchShingled = NearDup.shingleSets(benchmark, idCol, textCol, n)
    val distinctShingles = benchShingled
      .select(explode(col("shingles")).as("s")).distinct()
    // Two-tier build, same routing rule as the exact decon paths: a
    // benchmark inside the driver budget collects once and builds
    // locally (one job); past the budget the bit array is built
    // DISTRIBUTIVELY (per-partition fold + OR-reduce) so the driver
    // only ever holds the bits — the point of the Bloom path is
    // benchmarks that outgrow memory, and the build must not collect
    // what the filter exists to avoid. Both builders are bit-identical
    // over the same key set (insertion commutes).
    val totalShingles = benchShingled
      .agg(sum(size(col("shingles")).cast("long"))).head(1)
      .headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .getOrElse(0L)
    val smallKeys: Option[Array[Long]] =
      if (totalShingles <= maxDriverShingles)
        Some(distinctShingles.collect().map(_.getLong(0)))
      else None
    val bits = smallKeys match {
      case Some(keys) => graft.plans.BloomHitCount.build(keys, bitsPerKey, numHashes)
      case None =>
        graft.plans.BloomHitCount.buildDistributed(distinctShingles, bitsPerKey, numHashes)
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_hits",
      exprs => graft.plans.BloomHitCount(exprs.head, bits, numHashes), "built-in")
    val scored = NearDup.shingleSets(corpus, idCol, textCol, n)
    if (!withExact)
      scored.select(col(idCol),
        call_function("graft_bloom_hits", col("shingles")).as("bloom_n"))
    else {
      // Exact attribution needs the raw keys on the driver — the
      // bloomDeconStats honesty gate is a bounded diagnostic run on
      // benchmarks small enough to check exactly, never a scale path.
      val keys: Array[Long] =
        smallKeys.getOrElse(distinctShingles.collect().map(_.getLong(0)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bench_overlap",
        exprs => graft.plans.BenchmarkOverlap(exprs.head, Array((0L, keys)), 1L), "built-in")
      scored.select(col(idCol),
        call_function("graft_bloom_hits", col("shingles")).as("bloom_n"),
        coalesce(
          try_element_at(call_function("graft_bench_overlap", col("shingles")), lit(1))
            .getField("n_shared"),
          lit(0L)).as("exact_n"))
    }
  }

  /** The hygiene FUNNEL a pretraining corpus goes through before
    * tokenization, as one retention report: exact dedup → near-dup
    * cluster dedup → C4-style length filter → language filter, each
    * stage applied to the previous stage's survivors, counts per
    * stage. This is the headline number a data-curation run reports
    * ("500k docs in, 310k after dedup, 170k after quality, 120k en").
    * The length band is an integer predicate (no float-boundary
    * sensitivity between engines); the full Gopher rule set stays
    * available separately via QualitySignals.gopherSignals.
    *
    * All five counts are lazy single-row aggregates unioned into one
    * DataFrame — the driver triggers ONE job; no stage materializes a
    * doc list beyond the id sets the joins need.
    */
  def hygieneFunnel(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, threshold: Double = 0.5,
                    minTokens: Int = 20, maxTokens: Int = 100000,
                    lang: String = "en",
                    cacheKey: Option[String] = None): DataFrame = {
    val (keep1, d0, d1, d2, d3, d4) =
      funnelStages(docs, idCol, textCol, n, threshold, minTokens, maxTokens, lang,
        persistIds = true, cacheKey)
    def stage(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
    val report = stage("s0_total", d0)
      .unionAll(stage("s1_exact_dedup", d1))
      .unionAll(stage("s2_near_dedup", d2))
      .unionAll(stage("s3_length", d3))
      .unionAll(stage(s"s4_lang_$lang", d4))
    // Five rows out: materialize the report, release the keeper-id
    // cache so it doesn't outlive the call.
    Caching.materializeAndRelease(report, keep1.toSeq: _*)
  }

  /** The corpus that SURVIVES [[hygieneFunnel]] — (id, text) after all
    * four stages, i.e. the DataFrame the next pipeline stage
    * (tokenization, mixing) actually consumes. The funnel report and
    * the survivors share one stage pipeline, so they never disagree.
    */
  def hygieneSurvivors(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.5,
                       minTokens: Int = 20, maxTokens: Int = 100000,
                       lang: String = "en",
                       cacheKey: Option[String] = None): DataFrame =
    // Survivors are consumed once (no stage-count re-traversal), so the
    // keeper-id set is NOT persisted here: recomputing the fingerprint
    // aggregate a couple of times beats pinning cache the caller can't
    // release (the result is corpus-sized — no cheap eager point).
    funnelStages(docs, idCol, textCol, n, threshold, minTokens, maxTokens, lang,
      persistIds = false, cacheKey)._6

  /** The exact-dedup keeper-id set and near-dup drop-id set, memoized
    * per (session, cacheKey) behind lazy localCheckpoints: the funnel
    * REPORT and the funnel SURVIVORS run back-to-back in every real
    * curation job (and in the bench suite), and the near-dup pass —
    * shingle → signature → banding → closure — is by far the dominant
    * cost of both. Id sets only, never text; checkpointed frames are
    * never unpersisted (a truncated-lineage block is unrecoverable
    * once dropped), which is safe precisely because they are id-sized.
    */
  private val stageSetMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), (DataFrame, DataFrame)]()

  /** Shared stage pipeline for [[hygieneFunnel]] / [[hygieneSurvivors]].
    * Returns (keeper-id frame if persisted, d0..d4); the caller owns
    * the keeper cache's release. With `cacheKey` set, the keeper/drop
    * id sets come from [[stageSetMemo]] instead (and nothing is
    * persisted through the CacheManager, so there is nothing to
    * release).
    */
  private def funnelStages(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, threshold: Double, minTokens: Int,
                           maxTokens: Int, lang: String, persistIds: Boolean,
                           cacheKey: Option[String] = None)
      : (Option[DataFrame], DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    import graft.functions.TextFunctions
    // No spread here: the compute-heavy pass (shingling) spreads its
    // OWN input inside NearDup.shingleSets; spreading d0 would also
    // shuffle the survivors' text, which otherwise flows scan→filters
    // without ever moving.
    val d0 = docs.select(col(idCol), col(textCol))
    // The keeper-ID SETS may persist, never the text: the funnel's
    // stage counts re-traverse d1/d2, and without the cache each would
    // re-run the fingerprint aggregation; ids are tiny at any corpus
    // size. (The near-dup drop set needs no persist —
    // connectedComponents returns localCheckpoint-flattened labels,
    // already materialized.)
    def buildSets(checkpoint: Boolean): (DataFrame, DataFrame) = {
      val keep1Base = d0.groupBy(TextFunctions.fingerprint(col(textCol)).as("__fp"))
        .agg(min(col(idCol)).as(idCol)).select(col(idCol))
      val keep1 =
        if (checkpoint) keep1Base.localCheckpoint(false)
        else if (persistIds)
          keep1Base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else keep1Base
      val d1 = d0.join(keep1, Seq(idCol), "left_semi")
      val pairs = NearDup.minHashNearDups(d1, idCol, textCol, n, threshold)
      val drop2 = Components.keepDecision(Components.connectedComponents(pairs))
        .filter(!col("keep")).select(col("node").as(idCol))
      (keep1, drop2)
    }
    val (keep1, drop2) = cacheKey match {
      case Some(k) =>
        // The sets depend on the dedup parameters too — fold them into
        // the memo key so a caller reusing a cacheKey with different
        // (n, threshold) is a different entry, not a silent hit.
        stageSetMemo.computeIfAbsent(
          (docs.sparkSession, s"$k#n=$n#t=$threshold"), _ => buildSets(true))
      case None => buildSets(false)
    }
    val d1 = d0.join(keep1, Seq(idCol), "left_semi")
    val d2 = d1.join(drop2, Seq(idCol), "left_anti")
    val d3 = d2.filter(
      TextFunctions.tokenCount(col(textCol)).between(minTokens, maxTokens))
    val d4 = d3.filter(TextFunctions.langId(col(textCol)) === lang)
    (if (persistIds && cacheKey.isEmpty) Some(keep1) else None, d0, d1, d2, d3, d4)
  }

  /** Cross-document boilerplate: sentence-level segments appearing in
    * at least `minDocs` DISTINCT documents (headers, disclaimers,
    * navigation chrome — the C4-style repeated-line filter target).
    * One explode + distinct + count; the shuffle carries (segment, id).
    */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                       minDocs: Long = 3, sep: String = "\\. "): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), sep)).as("line"))
      .select(col(idCol), trim(col("line")).as("line"))
      .filter(length(col("line")) > 0)
      .distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** C4-style line-level dedup: drop every segment that appears in
    * ≥ `minDocs` distinct docs (the [[boilerplateLines]] rule) and
    * emit, per document, the line counts before/after AND the cleaned
    * text — kept segments rejoined in original order, so the operator
    * is a usable pipeline stage, not just a report. Documents whose
    * every line was boilerplate survive with n_kept = 0 and empty
    * clean_text.
    *
    * Scale shape: the result is corpus-sized, so it returns LAZY —
    * there is no cheap eager point behind which a cache could be
    * released, and localCheckpoint-ing the whole cleaned corpus would
    * duplicate it into non-replicated executor storage and truncate
    * its lineage (an executor loss would then fail downstream reads
    * unrecoverably). For the same reason the exploded-lines frame is
    * NOT persisted: re-running the linear split/explode scan for each
    * of its three consumers is pure map-side work and beats pinning a
    * frame larger than the corpus itself — the same reuse-vs-pin call
    * [[hygieneSurvivors]] makes. The boilerplate anti-join carries no
    * hint: "lines repeated in ≥ minDocs documents" is NOT bounded at
    * corpus scale (a web crawl has billions of them), so AQE picks
    * broadcast vs shuffle from the measured size.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        minDocs: Long = 3, sep: String = "\\. "): DataFrame = {
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), sep)).as(Seq("pos", "line")))
      .select(col(idCol), col("pos"), trim(col("line")).as("line"))
      .filter(length(col("line")) > 0)
    val boiler = lines.select(col(idCol), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("line"))
    val kept = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")),
          ". ").as("clean_text"))
    lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The dataset-CARD numbers — the one-row summary a curation run
    * publishes with a corpus: document count, total token mass,
    * vocabulary size, exact-duplicate surplus (docs beyond their
    * fingerprint's first occurrence), and the English share by the
    * engine's own language router. Three partial-aggregable
    * single-row aggregates cross-joined — one action, no driver
    * arithmetic; the distinct counts live in SEPARATE aggregates
    * because a mixed distinct/plain agg Expands every input row per
    * distinct group (the q45 lesson).
    */
  def corpusCard(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
      count(when(TextFunctions.langId(col(textCol)) === "en", 1)).as("n_en"))
    val fp = docs.agg(
      countDistinct(TextFunctions.fingerprint(col(textCol))).as("__nfp"))
    val vocab = docs.select(explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .agg(countDistinct(col("__w")).as("n_vocab"))
    base.crossJoin(fp).crossJoin(vocab)
      .select(col("n_docs"), col("n_tokens"), col("n_vocab"),
        (col("n_docs") - col("__nfp")).as("n_dup_docs"), col("n_en"))
  }

  /** Duplicate-PASSAGE detection (the Lee et al. 2021 "Deduplicating
    * Training Data" target, re-expressed relationally): every W-token
    * window (stride 1) of every document is hashed; a window whose
    * 64-bit hash occurs at least twice ANYWHERE in the corpus —
    * another document or a repeat inside the same one — marks a
    * duplicated passage. Output per document: `n_windows` (total
    * stride-1 windows), `n_dup` (windows that are duplicated
    * somewhere), `dup_ratio` = n_dup/n_windows — the per-doc
    * duplicate-coverage number the substring-dedup decision filters
    * on. Documents shorter than W tokens survive with zeros.
    *
    * Scale shape: windows are hashed NATIVELY in one pass per
    * document (plans.ShingleHashes, distinct=false, raw 64-bit — a
    * 32-bit space would collide at ~corpus-token scale and inflate
    * dup counts); the exploded stream is (id, hash) pairs — 16 bytes
    * per corpus token, never text. Two shuffles of that stream: a
    * map-side-combinable count per hash (duplicated hashes only
    * survive the ≥2 filter), then a semi-join of the re-exploded
    * stream against that set, with AQE picking broadcast when the
    * duplicated-hash set is small. The explode scan runs twice — pure
    * map work, deliberately NOT persisted: a corpus-token-sized cache
    * would exceed the corpus itself (same call as
    * [[removeBoilerplate]]). Window equality is hash equality: two
    * distinct W-grams colliding in 2⁶⁴ would merge — below any
    * realistic corpus' pair count (the [[dedupParagraphs]] argument).
    */
  def duplicatePassages(docs: DataFrame, idCol: String, textCol: String,
                        window: Int = 50): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    graft.plans.NativeFunctions.ensureRegistered(docs.sparkSession)
    import graft.functions.TextFunctions
    val whs = docs.select(col(idCol),
      explode(call_function("graft_shingle_hashes",
        col(textCol), lit(window), lit(false), lit(false))).as("__h"))
    val dup = whs.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("__h"))
    val perDoc = whs.join(dup, Seq("__h"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dup"))
    docs.select(col(idCol),
        greatest(TextFunctions.tokenCount(col(textCol)) - (window - 1), lit(0))
          .cast("long").as("n_windows"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(col("n_windows") > 0,
          coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_windows"))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }

  /** Substring-dedup as a FILTER: the corpus minus every document
    * whose duplicate-passage coverage exceeds `maxDupRatio` — the
    * document-level decision rule a pipeline actually ships when it
    * cannot rewrite text (the passage-surgery variant of Lee et al.
    * needs positions; the drop rule needs only [[duplicatePassages]]'
    * counts). Same scale shape; the flagged-id set anti-joins back.
    */
  def removeDuplicatePassageDocs(docs: DataFrame, idCol: String, textCol: String,
                                 window: Int = 50,
                                 maxDupRatio: Double = 0.5): DataFrame = {
    val bad = duplicatePassages(docs, idCol, textCol, window)
      .filter(col("dup_ratio") > maxDupRatio).select(col(idCol))
    docs.join(bad, Seq(idCol), "left_anti")
  }

  /** Corpus-wide paragraph-level EXACT dedup (the Dolma recipe):
    * every occurrence of a paragraph after its first is dropped,
    * whatever its frequency — where [[removeBoilerplate]] only targets
    * segments repeated across ≥ minDocs documents, this kills the
    * second copy of anything. "First" is deterministic and
    * layout-independent: occurrences are ordered by
    * (md5(salt || doc id), position), the same engine-portable
    * permutation the sampling operators use.
    *
    * Output per document: paragraph counts before/after and the
    * cleaned text (kept paragraphs rejoined in original order), so the
    * operator is a pipeline stage, not just a report. Documents whose
    * every paragraph lost survive with n_kept = 0 and empty text.
    *
    * Scale shape: winner election groups on the paragraph's 64-bit
    * xxhash64 — the shuffle carries (hash, order-key) pairs, never
    * text (two distinct paragraphs colliding in 2⁶⁴ would merge; at
    * ~2⁻⁶⁴·pairs that is below any realistic corpus). The keep-set
    * then collapses to per-document kept-position arrays (ids +
    * ints), and the single text shuffle is the per-document rebuild
    * groupBy, whose kept-position membership test is a native
    * linear-probe set (plans.KeepPosFilter) — O(paras + kept) per
    * document, where an `array_contains` filter would be quadratic.
    * Corpus-sized result → returned LAZY, exploded frame NOT
    * persisted: same rationale as [[removeBoilerplate]] (no cheap
    * eager release point; a second linear explode scan beats pinning
    * a corpus-sized cache).
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
                      sep: String = "\\. ", salt: String = "graft"): DataFrame = {
    graft.plans.NativeFunctions.ensureRegistered(docs.sparkSession)
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), sep)).as(Seq("pos", "line")))
      .select(col(idCol), col("pos"), trim(col("line")).as("line"))
      .filter(length(col("line")) > 0)
    // Total order over occurrences: md5 hash of the doc id (unique per
    // doc), then the 0-based position zero-padded so the string order
    // is the numeric order.
    val ordKey = concat(Sampling.hashBucket32(col(idCol), salt),
      lpad(col("pos").cast("string"), 10, "0"))
    val winners = lines
      .select(col(idCol), col("pos"), xxhash64(col("line")).as("__h"), ordKey.as("__ord"))
      .groupBy(col("__h"))
      .agg(min_by(struct(col(idCol).as("id"), col("pos").as("pos")), col("__ord")).as("w"))
      .select(col("w.id").as(idCol), col("w.pos").as("pos"))
    val keepPos = winners.groupBy(col(idCol))
      .agg(collect_list(col("pos")).as("__keep"))
    val out = lines
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_paras"),
        array_sort(collect_list(struct(col("pos"), col("line")))).as("__paras"))
      .join(keepPos, Seq(idCol), "left")
      .select(col(idCol), col("n_paras"),
        coalesce(size(col("__keep")), lit(0)).cast("long").as("n_kept"),
        array_join(
          call_function("graft_keep_pos", col("__paras"),
            coalesce(col("__keep"), array().cast("array<int>"))),
          ". ").as("clean_text"))
    out
  }
}
