package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Near-duplicate detection for document corpora: MinHash+LSH, SimHash,
  * and brute-force n-gram Jaccard.
  *
  * Scale design (the 100 TB story):
  *  - MinHash signatures are computed per-row with array higher-order
  *    functions — no shuffle, no UDF, linear scan.
  *  - Candidate generation shuffles only (band_hash, doc_id) pairs —
  *    ~16 small rows per document, never the text — and self-joins on
  *    the band key, so equal-band groups meet in the same partition.
  *  - Exact Jaccard verification joins the (much smaller) candidate
  *    pair set back to the shingle sets; cost is O(candidates), not
  *    O(n²).
  * Brute-force Jaccard is kept as the oracle-checkable baseline with a
  * sampled query side; it is exactly the plan LSH avoids.
  *
  * All hash mixing is deterministic: fixed-seed permutation
  * coefficients, Spark's xxhash64 for shingle/band hashing.
  */
object NearDup {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  // MinHash universe: shingle hashes in [0, 2^32); permutations
  // h_i(x) = (a_i*x + b_i) mod P with P prime > 2^32 and a_i < 2^30,
  // so a*x < 2^62 never overflows a signed long.
  private val P = 4294967311L
  private val (coefA, coefB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumHashes)(1L + rnd.nextInt((1 << 30) - 1).toLong)
    val b = Array.fill(NumHashes)(rnd.nextInt(1 << 30).toLong)
    (a, b)
  }

  /** doc_id + distinct word-n-gram shingle set, represented as xxhash64
    * values in [0, 2^32). All downstream set operations (Jaccard
    * intersect/union, MinHash permutations) run on primitive long
    * arrays — string shingles are hashed exactly once here and never
    * shuffled or compared again. Collision probability for an ~100-
    * shingle doc is ~100²/2³² ≈ 2e-6 per pair — far below the float
    * tolerance of any downstream consumer.
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
                  keep: Seq[String] = Nil): DataFrame = {
    // Per-row shingling/hashing is compute-heavy; a small corpus read
    // from one parquet file would otherwise sit in a single partition
    // and use one core. Skew.spread is a no-op when the scan is
    // already well-split, so scale pays nothing.
    graft.plans.NativeFunctions.ensureRegistered(docs.sparkSession)
    // Native single-pass shingle+hash (plans.ShingleHashes) — bit-
    // identical to the four-layer HOF chain it replaces (kept below as
    // the reference form, equality-asserted in ShingleHashesSpec), and
    // the difference between a ~4s and a sub-second COLD corpus scan.
    Skew.spread(docs)
      .select(col(idCol) +: keep.map(col) :+
        call_function("graft_shingle_hashes", col(textCol), lit(n)).as("shingles"): _*)
      .filter(size(col("shingles")) > 0)
  }

  /** The composable-HOF form of [[shingleSets]]'s projection — the
    * reference implementation the native expression must match.
    */
  def shingleHashesHof(text: Column, n: Int): Column =
    array_distinct(transform(TextFunctions.shingles(text, n),
      s => pmod(xxhash64(s), lit(4294967296L))))

  /** 64-element MinHash signature per document: one native pass over
    * the pre-hashed shingle array (all permutations per element),
    * arithmetic identical to the composable 64× array_min∘transform
    * form it replaces.
    */
  def signatures(shingled: DataFrame, idCol: String, keep: Seq[String] = Nil): DataFrame = {
    shingled.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => graft.plans.MinHashSignature(exprs.head, coefA, coefB, P), "built-in")
    shingled.select(col(idCol) +: keep.map(col) :+ col("shingles") :+
      expr("graft_minhash(shingles)").as("sig"): _*)
  }

  /** (id, band, bh) band keys for a signed frame — one row per
    * (document, band). The band hash is a pure function of the
    * document's signature, so a pair collides on a band key
    * independently of which frame (or batch) each side sits in —
    * the property [[IncrementalDedup]] relies on to probe new docs
    * against a persisted signature table and land on exactly the
    * candidates a full-corpus run would generate.
    */
  def bandKeys(signed: DataFrame, idCol: String, keep: Seq[String] = Nil): DataFrame = {
    val bandStructs = array((0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => element_at(col("sig"), b * RowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }: _*)
    signed
      .select(col(idCol) +: keep.map(col) :+ explode(bandStructs).as("bb"): _*)
      .select(col(idCol) +: keep.map(col) :+ col("bb.band").as("band") :+ col("bb.bh").as("bh"): _*)
  }

  /** LSH candidate pairs (idA < idB), deduplicated across bands.
    * Per-band bucket populations are capped at `maxBucket` (see
    * [[BucketGuard]]) so one degenerate band value — the 100 TB
    * failure mode — costs O(maxBucket²), not O(|bucket|²).
    */
  def candidatePairs(signed: DataFrame, idCol: String,
                     maxBucket: Int = BucketGuard.DefaultMaxBucket,
                     dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val banded = bandKeys(signed, idCol)
    // Persisted: the guard's row_number window would otherwise run
    // ONCE PER SELF-JOIN SIDE (only the exchange below it is reused —
    // measured 2× on dedup_minhash at sf0.1). The capped frame is
    // (id, band, bh) triples, 16 rows/doc; the candidate result is
    // pair-density-bounded (see Caching's eligibility argument), so
    // it materializes eagerly here and the cache releases before
    // return — no CacheManager entry survives the call.
    val capped = BucketGuard.capBuckets(banded, Seq("band", "bh"), idCol,
        maxBucket, dropCounter)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = capped.select(col(idCol).as("id_a"), col("band"), col("bh"))
    val b = capped.select(col(idCol).as("id_b"), col("band"), col("bh"))
    val cands = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    Caching.materializeAndRelease(cands, capped)
  }

  /** Exact Jaccard between two shingle-set columns (set semantics,
    * composable HOF form — kept as the reference implementation and
    * for ad-hoc use on arbitrary Columns).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Native single-pass Jaccard (plans.JaccardSim): one probe-set pass
    * per pair instead of array_intersect + array_union each building
    * hash structures and materializing arrays. Values are identical to
    * [[jaccard]] for any array<long> inputs.
    */
  private def nativeJaccard(spark: org.apache.spark.sql.SparkSession,
                            a: Column, b: Column): Column = {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    call_function("graft_jaccard", a, b)
  }

  /** Full MinHash+LSH near-dup pipeline: pairs with exact Jaccard ≥
    * `threshold` among LSH candidates. With 16×4 banding, a pair at
    * j=0.8 is caught with probability 1-(1-0.8⁴)^16 ≈ 0.9997, so for
    * thresholds ≥ ~0.8 this equals the exact O(n²) answer w.h.p.
    */
  def minHashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, threshold: Double = 0.5,
                      maxBucket: Int = BucketGuard.DefaultMaxBucket,
                      dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    // The shingle sets feed three plan subtrees (signatures + both
    // sides of the verify join); without persistence the shingling and
    // hashing rerun three times. ~(id, array<long>) per doc — a few MB
    // per million docs per executor, spilled to disk if larger.
    val sh = shingleSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // This pipeline materializes eagerly below, so the guard's dropped
    // mass is known on return — count it (caller's counter or our own)
    // and say when the cap engaged instead of losing recall silently.
    val drop = dropCounter.getOrElse(
      docs.sparkSession.sparkContext.longAccumulator("graft.minhash.droppedBandedRows"))
    val cands = candidatePairs(signatures(sh, idCol), idCol, maxBucket, Some(drop))
    val shA = sh.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    val pairs = cands.join(shA, "id_a").join(shB, "id_b")
      .select(col("id_a"), col("id_b"), nativeJaccard(sh.sparkSession, col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // Small pair frame out, shingle cache released — same lifecycle
    // discipline as allPairsCore.
    val out = Caching.materializeAndRelease(pairs, sh)
    if (drop.value > 0)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"hot-bucket guard dropped ~${drop.value} banded rows " +
          s"(cap=$maxBucket/bucket); recall is reduced on the degenerate buckets")
    out
  }

  /** EXACT near-dup pairs via prefix filtering (AllPairs/PPJoin
    * family): with shingle hashes globally sorted, two sets with
    * Jaccard ≥ τ must share at least one element among their first
    * |A| − ⌈τ·|A|⌉ + 1 elements. Candidates come from an inverted
    * index on those prefix elements (shuffle carries (prefix_hash, id)
    * pairs only); each candidate pays one exact Jaccard check.
    *
    * Same output as the O(n²) scan, zero probabilistic misses —
    * the deterministic alternative to MinHash when exactness is
    * contractual. Degrades when many docs share prefix elements
    * (near-uniform corpora); MinHash LSH is the fallback there.
    */
  /** @param freqOrder order each set by ascending GLOBAL document
    *   frequency before taking prefixes (the canonical AllPairs
    *   ordering) instead of by shingle hash. Any consistent total
    *   order keeps the prefix theorem EXACT — the choice is purely
    *   performance: frequency order keeps posting lists short on
    *   skewed vocabularies (the 100 TB default concern) but costs an
    *   extra explode+count+join pass; hash order is frequency-agnostic
    *   but free. Measured on this corpus (5k docs, flat vocabulary):
    *   hash 3.3s vs freq 5.5s at sf0.1 — hence the default; flip it
    *   when a frequency skew check says otherwise.
    */
  def allPairsNearDups(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.5,
                       freqOrder: Boolean = false): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    allPairsCore(sh, idCol, threshold,
      if (freqOrder) Some(shingleFreq(sh, idCol)) else None)
  }

  /** [[allPairsNearDups]] with the prefix ordering chosen by a
    * frequency-skew pre-check instead of a caller guess: the document
    * frequencies are counted once (one map-side-combinable aggregate
    * over the same explode the prefix index performs anyway), and if
    * the hottest shingle's posting list is more than `skewFactor` times
    * the mean, the corpus is skewed enough that hash-ordered prefixes
    * would hit that posting list's quadratic candidate blowup — so the
    * already-paid-for frequency frame is reused to order prefixes
    * rare-first. On flat vocabularies (max ≈ mean) the check picks hash
    * order and skips the ordering join entirely. Either choice is
    * exact; the stat collect is one row.
    */
  def allPairsNearDupsAuto(docs: DataFrame, idCol: String, textCol: String,
                           n: Int = 3, threshold: Double = 0.5,
                           skewFactor: Double = 8.0): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = shingleFreq(sh, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stat = freq.agg(max(col("f")).as("mx"), avg(col("f")).as("av")).head()
    // Empty corpus → max(f) is NULL; treat as flat (hash order). When
    // the flat branch discards the frequency frame, release its cache.
    val skewed = !stat.isNullAt(0) &&
      stat.getLong(0).toDouble > skewFactor * stat.getDouble(1)
    if (!skewed) freq.unpersist(false)
    allPairsCore(sh, idCol, threshold, if (skewed) Some(freq) else None)
  }

  /** Global shingle document frequencies over a shingle-set frame. */
  private def shingleFreq(sh: DataFrame, idCol: String): DataFrame =
    sh.select(col(idCol), explode(col("shingles")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("f"))

  private def allPairsCore(sh: DataFrame, idCol: String, threshold: Double,
                           freq: Option[DataFrame]): DataFrame = {
    val orderedSets = freq match {
      case Some(f) =>
        sh.select(col(idCol), explode(col("shingles")).as("s"))
          .join(f, "s")
          .groupBy(col(idCol))
          .agg(array_sort(collect_list(struct(col("f"), col("s")))).as("__ord"))
          .select(col(idCol),
            transform(col("__ord"), x => x.getField("s")).as("ord_shingles"),
            size(col("__ord")).as("sz"))
      case None =>
        sh.select(col(idCol), array_sort(col("shingles")).as("ord_shingles"),
          size(col("shingles")).as("sz"))
    }
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz")).cast("int") + 1)
    // Persisted: the candidate self-join reads this subtree twice, and
    // without a cache the whole frequency/ordering pipeline above runs
    // twice with it.
    val prefixes = orderedSets.select(col(idCol), col("sz"),
      explode(slice(col("ord_shingles"), lit(1), prefixLen)).as("pfx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Lossless length filter: j(A,B) <= min/max of the set sizes, so
    // size-incompatible pairs drop before the exact verify.
    val cands = prefixes.select(col(idCol).as("id_a"), col("sz").as("__na"), col("pfx"))
      .join(prefixes.select(col(idCol).as("id_b"), col("sz").as("__nb"), col("pfx")), Seq("pfx"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("__na"), col("__nb")).cast("double")
        / greatest(col("__na"), col("__nb")).cast("double") >= threshold)
      .select("id_a", "id_b").distinct()
    val shA = sh.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    val pairs = cands.join(shA, "id_a").join(shB, "id_b")
      .select(col("id_a"), col("id_b"), nativeJaccard(sh.sparkSession, col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // The surviving pair frame is tiny next to the cached shingle /
    // prefix frames: materialize it and release every pin this call
    // made — sh (persisted by the public wrappers), prefixes, and the
    // frequency frame when the skewed branch ordered prefixes by it.
    Caching.materializeAndRelease(pairs, (Seq(sh, prefixes) ++ freq.toSeq): _*)
  }

  /** Brute-force n-gram Jaccard with a sampled query side — the
    * oracle-checkable baseline. `querySide` filters which docs act as
    * the left side; the join is a cartesian product, so keep the query
    * side small (this is precisely the cost LSH removes).
    */
  def bruteForceJaccard(docs: DataFrame, idCol: String, textCol: String,
                        querySide: Column, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = sh.filter(querySide)
      .select(col(idCol).as("id_a"), col("shingles").as("sh_a"), size(col("shingles")).as("__na"))
    val c = sh.select(col(idCol).as("id_b"), col("shingles").as("sh_b"), size(col("shingles")).as("__nb"))
    val pairs = q.crossJoin(c)
      .filter(col("id_a") < col("id_b"))
      // Size bound: j(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs with
      // incompatible set sizes can be dropped before the (expensive)
      // intersection — a lossless prune for the given threshold.
      .filter(least(col("__na"), col("__nb")).cast("double")
        / greatest(col("__na"), col("__nb")).cast("double") >= threshold)
      .select(col("id_a"), col("id_b"), nativeJaccard(sh.sparkSession, col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // Small pair frame out, shingle cache released — same lifecycle
    // discipline as allPairsCore.
    Caching.materializeAndRelease(pairs, sh)
  }

  /** SimHash fingerprint from a pre-materialized token-hash array: bit
    * j of the fingerprint is the sign of Σ_tokens (±1 by bit j of the
    * token hash). The caller must materialize the hash array in its own
    * projection — referencing a hash *expression* here would re-hash
    * every token 64 times.
    */
  def simHashFromHashes(hashes: Column): Column = {
    val bitCols = (0 until 64).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** 64-bit SimHash over whitespace tokens (convenience single-column
    * form; prefer the two-step materialized path in bulk pipelines).
    */
  def simHash(text: Column): Column =
    simHashFromHashes(transform(TextFunctions.tokens(text), t => xxhash64(t)))

  /** Engine-portable 60-bit token hash: the first 15 hex digits of
    * md5, read as an integer — reproducible in any engine with md5
    * (DuckDB: `('0x' || substr(md5(t),1,15))::BIGINT`). Bits 60–63 are
    * always zero, so a SimHash over these hashes has its top 4
    * fingerprint bits pinned to 0 — harmless (Hamming distances only
    * lose 4 never-informative bits) and mirrored exactly by an oracle
    * that computes bits 0–59.
    */
  def portableTokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` (< 16).
    * Pigeonhole banding: split the 64-bit fingerprint into 4 16-bit
    * chunks; a pair within Hamming ≤ 3 must agree on ≥ 1 chunk, so the
    * join key is (chunk_idx, chunk_value) and only candidates pay the
    * exact bit_count(xor) check.
    *
    * `tokenHash` maps a token Column to its 64-bit hash — default
    * xxhash64 (fastest; engine-specific values). Pass
    * [[portableTokenHash]] to get fingerprints an external engine can
    * reproduce from md5 (the `dedup_simhash` oracle recomputes the
    * whole pipeline in DuckDB that way).
    */
  def simHashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3,
                      maxBucket: Int = BucketGuard.DefaultMaxBucket,
                      dropCounter: Option[org.apache.spark.util.LongAccumulator] = None,
                      tokenHash: Column => Column = xxhash64(_))
      : DataFrame = {
    require(maxHamming < 4, "4-chunk pigeonhole supports maxHamming <= 3")
    // Native single-pass fingerprint (plans.SimHash64) — bit-identical
    // to simHashFromHashes, which walks the hash array through 64
    // interpreted aggregate lambdas. coalesce keeps null-text rows at
    // fingerprint 0 exactly as the HOF form does.
    graft.plans.NativeFunctions.ensureRegistered(docs.sparkSession)
    val fp = Skew.spread(docs)
      .select(col(idCol),
        coalesce(transform(TextFunctions.tokens(col(textCol)), t => tokenHash(t)),
          array().cast("array<bigint>")).as("__th"))
      .select(col(idCol), call_function("graft_simhash", col("__th")).as("simhash"))
    fingerprintNearDups(fp, idCol, "simhash", maxHamming, maxBucket, dropCounter)
  }

  /** Pigeonhole near-dup pairs over ANY 64-bit fingerprint frame —
    * the banding + verify half of the SimHash path, fingerprint
    * computation left to the caller (text SimHash above; image dHash
    * in [[Multimodal.imageNearDups]]). 4×16-bit chunks: any pair
    * within Hamming 3 agrees on at least one chunk, so recall is
    * guaranteed, and the verify is an exact `bit_count` on the two
    * 8-byte fingerprints — the join never carries payloads.
    */
  def fingerprintNearDups(fps: DataFrame, idCol: String, fpCol: String,
                          maxHamming: Int = 3,
                          maxBucket: Int = BucketGuard.DefaultMaxBucket,
                          dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(maxHamming < 4, "4-chunk pigeonhole supports maxHamming <= 3")
    val chunks = array((0 until 4).map { c =>
      struct(lit(c).as("chunk"), shiftright(col(fpCol), 16 * c).bitwiseAND(0xFFFFL).as("cv"))
    }: _*)
    val banded = fps.select(col(idCol), col(fpCol), explode(chunks).as("ch"))
      .select(col(idCol), col(fpCol), col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))
    // A 16-bit chunk value shared by millions of short docs is the
    // degenerate bucket here; cap it (result is LAZY — callers that
    // need the dropped mass logged pass their own counter and read it
    // after their action). The guard's window evaluates once per
    // self-join side here — measured CHEAPER than persisting: the
    // chunk-banded frame is only 4 rows/doc, so the duplicate
    // in-partition sort costs less than a cache write+read barrier
    // (contrast candidatePairs, whose 16-band frame is persisted).
    val capped = BucketGuard.capBuckets(banded, Seq("chunk", "cv"), idCol,
      maxBucket, dropCounter)
    val a = capped.select(col(idCol).as("id_a"), col(fpCol).as("sh_a"), col("chunk"), col("cv"))
    val b = capped.select(col(idCol).as("id_b"), col(fpCol).as("sh_b"), col("chunk"), col("cv"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
