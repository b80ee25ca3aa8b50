package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus construction and data mixing.
  *
  * `sample()`/TABLESAMPLE are seeded per-partition, so their output
  * changes with the file layout — useless when a sample must be
  * reproducible across engines, re-runs, and cluster sizes. The hash
  * sampler here buckets each row by the first byte of
  * `md5(salt || key)`: pure map work (no shuffle, no state), stable
  * under repartitioning, consistent across any engine with md5, and
  * rows can be re-drawn with a different salt. Bucket granularity is
  * 1/256 — rate resolution for corpus mixing, where weights are
  * coarse by nature.
  */
object Sampling {

  /** Two-hex-char bucket ('00'..'ff') of md5(salt || key) — uniform
    * over 256 values, deterministic, engine-portable.
    */
  def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 2)

  /** Keep a row iff its bucket falls below `rate` (rounded down to a
    * multiple of 1/256).
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < lit(cutHex(rate)))

  /** Stratified corpus mixing: an independent hash-sample rate per
    * stratum (e.g. per source, the up/down-weighting step of a
    * training-data mixture). Strata absent from `rates` are dropped.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       rates: Map[String, Double], salt: String = "graft"): DataFrame = {
    val cut = rates.foldLeft(lit(null).cast("string")) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, lit(cutHex(rate))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < cut)
  }

  /** `floor(rate*256)` as a 2-digit lowercase hex literal — the string
    * bound the hex bucket compares against lexicographically. rate=1.0
    * maps to "g", which sorts after every hex pair, keeping all rows.
    */
  def cutHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val n = math.floor(rate * 256).toInt
    if (n >= 256) "g" else f"$n%02x"
  }

  /** Token-BUDGET mixture sampling: training mixtures are specified in
    * tokens per source, not keep-rates — "50M tokens of src0, 20M of
    * src1". Documents are admitted per stratum in deterministic
    * md5-hash order (an engine-portable random permutation) while the
    * running token total stays within that stratum's budget; strata
    * without a budget drop entirely. Deterministic, layout-independent,
    * re-drawable with a different salt — the same properties as
    * [[stratifiedSample]], but budgeted by token mass instead of row
    * fraction. Output keeps `n_tokens` and the running `cum_tokens`
    * so the mixture report is free.
    *
    * Scale shape: a training mixture has ~5–20 strata, so a window
    * partitioned by the stratum alone would drag EVERY document of a
    * source through one task for the running sum — a many-TB
    * single-core sort at corpus scale. The prefix sum is therefore
    * two-level (the same recipe as [[Packing.packSequences]]):
    * documents are sub-bucketed by the first byte of their order hash
    * (256 range buckets per stratum that agree with the per-stratum
    * order, because the bucket is a prefix of the order key), the
    * running sum is windowed WITHIN (stratum, bucket), and the
    * strata×256 bucket totals — a driver-scale frame — are window-
    * summed into bucket base offsets and broadcast-joined back. One
    * shuffle of (key, stratum, n_tokens) triples; the text never
    * moves and no task ever sees more than ~1/256 of a stratum. The
    * admission boundary cuts mid-document never: the last admitted doc
    * is the one that keeps cum ≤ budget.
    */
  /** Temperature-scaled mixture (the UniMax/multilingual-sampling
    * recipe shape): per-stratum budgets are DERIVED from the corpus
    * instead of hand-specified — stratum s with nₛ total tokens gets
    *
    *   budgetₛ = ⌊ totalBudget · nₛ^α / Σₜ nₜ^α ⌋
    *
    * α = 1 reproduces the natural distribution; α → 0 flattens toward
    * uniform (upweighting tail strata); the usual mixing range is
    * 0.3–0.7. The per-stratum token totals are ONE partial-aggregable
    * aggregate collected to the driver — a #strata-row frame (a
    * training mixture has ~5–20 strata), the same bounded-scalar
    * pattern as the IVF centroids. Admission then runs through
    * [[tokenBudgetSample]] unchanged (deterministic md5 order,
    * two-level prefix sum).
    */
  def temperatureMixture(df: DataFrame, strataCol: String, keyCol: String,
                         textCol: String, totalBudget: Long, alpha: Double,
                         salt: String = "graft"): DataFrame = {
    val totals = df.groupBy(col(strataCol))
      .agg(sum(graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")).as("nt"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
      .sortBy(_._1) // collect order is layout-dependent; the weight SUM must not be
    val wsum = totals.map { case (_, n) => math.pow(n, alpha) }.sum
    val budgets = totals.map { case (s, n) =>
      s -> math.floor(totalBudget * math.pow(n, alpha) / wsum).toLong
    }.toMap
    tokenBudgetSample(df, strataCol, keyCol, textCol, budgets, salt)
  }

  def tokenBudgetSample(df: DataFrame, strataCol: String, keyCol: String,
                        textCol: String, budgets: Map[String, Long],
                        salt: String = "graft"): DataFrame = {
    val budget = budgets.foldLeft(lit(null).cast("long")) { case (acc, (stratum, b)) =>
      when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val base = df.select(col(keyCol), col(strataCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      hashBucket32(col(keyCol), salt).as("__ord"))
    Packing.bucketedRunningSum(base, Seq(strataCol), "__ord", "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col(keyCol), col(strataCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Recipe mixing WITH document-level upsampling — the mixture
    * construction when a target token share EXCEEDS what a stratum
    * holds (the Llama-style recipe, where a small high-quality source
    * is repeated across epochs while web crawl is downsampled).
    *
    * Per stratum s with total tokens T_s and target `targets(s)`:
    * every document is emitted once per FULL epoch (epoch ids
    * 0 .. targets(s)/T_s − 1), and the remaining targets(s) mod T_s
    * tokens come from the deterministic md5-order prefix (the same
    * admission rule as [[tokenBudgetSample]]) at epoch = #full-epochs.
    * A stratum at or below its target therefore degenerates to plain
    * token-budget downsampling (zero full epochs); strata absent from
    * `targets` are excluded. Output: (key, stratum, n_tokens, epoch) —
    * one row per (document, epoch) of the mixed corpus.
    *
    * Scale shape: the per-stratum totals are ONE partial-aggregable
    * aggregate collected as a #strata-row frame (a recipe has ~5–20
    * strata — the bounded-scalar pattern of [[temperatureMixture]]);
    * full epochs are pure map work (`explode(sequence)` — the output
    * multiplicity IS the semantic); the fractional prefix is the
    * two-level 256-bucket prefix sum. No stratum-wide window, no
    * corpus-sized driver state, text never shuffles (callers join the
    * emitted keys back to the corpus by key).
    */
  def epochMixture(df: DataFrame, strataCol: String, keyCol: String,
                   textCol: String, targets: Map[String, Long],
                   salt: String = "graft"): DataFrame = {
    require(targets.nonEmpty, "at least one stratum target required")
    require(targets.values.forall(_ >= 0), s"targets must be >= 0: $targets")
    // Lazy checkpoint: the totals action below materializes these
    // small rows (key, stratum, count, hash — never text) ONCE; the
    // three lazy consumers (full epochs + the running sum's window and
    // offsets branches) then read the cached blocks instead of each
    // re-tokenizing the corpus. Reference-tracked, no CacheManager pin.
    val base = df.select(col(keyCol), col(strataCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      hashBucket32(col(keyCol), salt).as("__ord"))
      .localCheckpoint(false)
    val totals = base.groupBy(col(strataCol))
      .agg(sum(col("n_tokens")).as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // Driver arithmetic on #strata scalars; a POSITIVE target over an
    // empty or zero-token stratum is meaningless — fail loudly, not
    // div-zero. A target of 0 is the recipe's way of saying "exclude":
    // it emits nothing regardless of corpus content, so a zero-target
    // stratum absent from this corpus slice must pass, not throw.
    val active = targets.filter(_._2 > 0)
    active.keys.foreach { s =>
      require(totals.getOrElse(s, 0L) > 0L,
        s"stratum '$s' has no tokens in the corpus but has a positive target")
    }
    val plan = active.toSeq.sortBy(_._1).map { case (s, tgt) =>
      (s, tgt / totals(s), tgt % totals(s))
    }
    def lookup(f: ((String, Long, Long)) => Long): Column =
      plan.foldLeft(lit(null).cast("long")) { case (acc, p) =>
        when(col(strataCol) === p._1, lit(f(p))).otherwise(acc)
      }
    val nFull = lookup(_._2)
    val frac = lookup(_._3)
    val inRecipe = base.filter(nFull.isNotNull)
    val fullEpochs = inRecipe.filter(nFull > 0)
      .select(col(keyCol), col(strataCol), col("n_tokens"),
        explode(sequence(lit(0L), nFull - 1)).as("epoch"))
    val fractional = Packing.bucketedRunningSum(
        inRecipe.filter(frac > 0), Seq(strataCol), "__ord", "n_tokens", "__cum")
      .filter(col("__cum") <= frac)
      .select(col(keyCol), col(strataCol), col("n_tokens"), nFull.as("epoch"))
    fullEpochs.unionByName(fractional)
  }

  /** Full md5 hex of (salt || key) — the deterministic per-stratum
    * permutation order for [[tokenBudgetSample]]; unique per key, so
    * the window order is total and engine-portable.
    */
  def hashBucket32(key: Column, salt: String): Column =
    md5(concat(lit(salt), key.cast("string")).cast("binary"))

  /** Deterministic train/val/test (or any named) split assignment:
    * each row gets the label of the hash-range its 256-bucket hash
    * falls into, with ranges stacked in the caller's declaration
    * order. Fractions are rounded down to multiples of 1/256 (same
    * granularity as [[hashSample]]); rows past the last range get
    * NULL — declare fractions summing to 1.0 for a total split. Pure
    * map work, layout-independent, re-drawable with a different salt,
    * and stable under corpus growth: a key keeps its split when rows
    * are added or removed, the property that keeps eval sets from
    * leaking into training as a corpus is re-crawled.
    */
  /** Per-stratum document CAP (the RefinedWeb-style per-domain cap):
    * keep at most `cap` documents per stratum, chosen as the first
    * `cap` in deterministic md5-hash order — the anti-head-domain rule
    * of web-corpus curation, where a handful of domains would
    * otherwise dominate the mixture. Deterministic, layout-independent
    * and stable under corpus growth in the keep-direction: a kept doc
    * can only be displaced by new docs hashing earlier, never by
    * re-partitioning. Output keeps every input column plus the
    * 1-based `stratum_rank` the cap cut on.
    *
    * Scale shape: a stratum has unbounded population (the whole point
    * — a head domain holds billions of pages), so `row_number` over a
    * stratum-partitioned window would drag every doc of the biggest
    * domain through ONE task. The rank is therefore the same
    * two-level 256-bucket prefix sum as [[tokenBudgetSample]] (running
    * sum of 1s in hash order); the ranked frame carries only
    * (key, stratum) pairs, and survivors join back to the full row by
    * key — text shuffles once, on the join, never through the window.
    */
  def capPerStratum(df: DataFrame, strataCol: String, keyCol: String,
                    cap: Long, salt: String = "graft"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val base = df.select(col(keyCol), col(strataCol))
      .withColumn("__one", lit(1L))
      .withColumn("__ord", hashBucket32(col(keyCol), salt))
    val kept = Packing.bucketedRunningSum(base, Seq(strataCol), "__ord", "__one", "stratum_rank")
      .filter(col("stratum_rank") <= cap)
      .select(col(keyCol), col("stratum_rank"))
    df.join(kept, Seq(keyCol))
  }

  /** Deterministic global shuffle for training output — the last step
    * of every pretraining data pipeline: each row gets a reproducible
    * pseudo-random position (shard from its 256-bucket hash, position
    * within shard by full-md5 order), so the same corpus + salt yields
    * an identical epoch order on ANY cluster size or layout, and a new
    * salt is a fresh epoch permutation. Writers emit one file group
    * per shard ordered by pos.
    *
    * Scale shape: positions come from the two-level bucketed prefix
    * sum ([[Packing.bucketedRunningSum]]) — per-(shard, hash-bucket)
    * windows, never one task per shard — and the ranked frame carries
    * only (key, shard, pos); full rows join back by key, so text
    * shuffles once. `shards` bounds output layout, not parallelism.
    */
  /** Deterministic shard id in [0, shards): the key's 256-bucket hash
    * scaled onto `shards` equal hex ranges — pure map work, layout-
    * independent, engine-portable (shared by [[shuffleDeterministic]]
    * and the sharded JSONL export sink).
    */
  def shardOf(key: Column, shards: Int, salt: String = "graft"): Column = {
    require(shards >= 1 && shards <= 256, s"shards must be in [1,256]: $shards")
    (conv(substring(hashBucket32(key, salt), 1, 2), 16, 10).cast("long")
      * shards / 256).cast("int")
  }

  def shuffleDeterministic(df: DataFrame, keyCol: String, shards: Int = 8,
                           salt: String = "graft"): DataFrame = {
    require(shards >= 1 && shards <= 256, s"shards must be in [1,256]: $shards")
    val base = df.select(col(keyCol))
      .withColumn("__ord", hashBucket32(col(keyCol), salt))
      .withColumn("shard", shardOf(col(keyCol), shards, salt))
      .withColumn("__one", lit(1L))
    val ranked = Packing.bucketedRunningSum(base, Seq("shard"), "__ord", "__one", "pos")
      .select(col(keyCol), col("shard"), col("pos"))
    df.join(ranked, Seq(keyCol))
  }

  /** Dedup-SAFE split assignment: every member of a near-dup cluster
    * is hashed by its cluster's canonical id instead of its own, so
    * near-duplicates can never straddle the train/eval boundary — the
    * leakage a per-document hash split cannot prevent (a re-crawled
    * near-copy of an eval doc hashing into train IS the contamination
    * decon exists to catch; splitting by cluster closes the hole at
    * assignment time). Singletons keep their own id, preserving
    * [[assignSplits]]' growth-stability: adding documents never moves
    * an existing singleton's split, and joining a cluster moves a doc
    * only onto its duplicates' side.
    *
    * Scale shape: the pair list is the guarded MinHash banding, the
    * closure is the size-adaptive auto path, and the final assignment
    * is pure map work over (id, group_key) — the corpus text rides
    * only the shingling pass.
    */
  def assignSplitsDedupSafe(df: DataFrame, idCol: String, textCol: String,
                            splits: Seq[(String, Double)],
                            n: Int = 3, threshold: Double = 0.5,
                            salt: String = "graft",
                            splitCol: String = "split"): DataFrame = {
    // The cluster closure runs on long node ids; a string id would
    // cast to NULL and silently produce an all-NULL split column —
    // fail loudly instead (plain assignSplits keeps string support).
    val idType = df.schema(idCol).dataType
    require(idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType,
      s"$idCol must be an integral id column for the cluster closure, got $idType")
    val comps = Components.connectedComponentsAuto(
      NearDup.minHashNearDups(df, idCol, textCol, n, threshold))
    val keyed = df.select(col(idCol))
      .join(comps.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol).cast("long")).as("group_key"))
    assignSplits(keyed, "group_key", splits, salt, splitCol)
      .select(col(idCol), col("group_key"), col(splitCol))
  }

  def assignSplits(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Double)], salt: String = "graft",
                   splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions exceed 1.0: $splits")
    val bucket = hashBucket(col(keyCol), salt)
    // Cumulative upper bounds in declaration order; each label claims
    // [prevCut, cut) in the 256-bucket hex space. Clamped at 1.0:
    // fractions that sum to 1.0 in decimal can land a hair above it
    // in binary (0.33+0.56+0.11 = 1.0000000000000002), and cutHex
    // rejects rates above 1.
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(math.min(_, 1.0))
    val label = splits.map(_._1).zip(cuts.map(cutHex))
      .foldRight(lit(null).cast("string")) { case ((name, cut), acc) =>
        when(bucket < lit(cut), lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, label)
  }
}
