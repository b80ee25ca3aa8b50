package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental cross-run deduplication — the operator a daily-append
  * corpus actually runs (reference analogue: the re-run → append →
  * dedup-on-read loop, `First experiment/Qwen3-235B-A22B-2507.py:147-176`,
  * which re-reads and re-dedups the WHOLE store every run).
  *
  * Instead of re-pairing the whole corpus per append, the engine keeps
  * a persisted signature STATE table — one row per seen document:
  *
  *   doc_id long, fp string, sig array<long>?, shingles array<long>?,
  *   cluster_id long
  *
  * where `fp` is a 128-bit fingerprint of the SORTED shingle-hash set
  * (equal fp ⟺ equal shingle set ⟺ Jaccard exactly 1 — unlike a raw
  * text hash, this makes the exact fast path agree with the Jaccard
  * semantics the near-dup stage uses), `sig`/`shingles` are stored only
  * for the first occurrence of each distinct set (an exact duplicate is
  * probe-equivalent to its representative, so storing its features
  * would only duplicate state), and `cluster_id` is the min doc id of
  * the document's duplicate component so far.
  *
  * Per append, new docs pay:
  *  1. an exact anti-join on `fp` (within-batch groups collapse first;
  *     most recrawl duplicates die here without ever being shingled
  *     into signatures);
  *  2. an LSH band probe of the surviving FRESH content against the
  *     state's band keys — band hashes are pure functions of each
  *     side's signature ([[NearDup.bandKeys]]), so a cross-batch pair
  *     collides on a band iff a full-corpus run would collide on it:
  *     incremental discovery finds exactly the pairs full-corpus LSH
  *     finds, just spread across appends;
  *  3. exact-Jaccard verification of candidates only, then a connected-
  *     components closure over the TOUCHED subgraph (new ids + the old
  *     cluster ids they hit — old endpoints are contracted to their
  *     cluster representative first, so closed old clusters never
  *     re-enter the iteration) with cluster merges written back as a
  *     tiny remap join.
  *
  * Scale notes (100 TB): each append shuffles (fp, id) and
  * (band, bh, id) for the state — linear scans, never text; a
  * production deployment buckets the state table by `fp` and keeps a
  * banded companion table bucketed by `(band, bh)` so both probe joins
  * are shuffle-free on the state side. The components iteration runs on
  * the touched subgraph only — proportional to this append's duplicate
  * density, not corpus size. Hot band buckets are capped by
  * [[BucketGuard]] exactly as in the full-corpus path.
  *
  * Replaying a corpus through [[appendBatch]] in any batch order yields
  * the same clusters as one full-corpus `dedup_clusters` run — the
  * `dedup_incremental` CORRECTNESS row proves it against the same
  * recursive-CTE oracle.
  */
object IncrementalDedup {

  val StateSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("fp", StringType, nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("shingles", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("cluster_id", LongType, nullable = false)))

  /** State for a corpus with nothing seen yet — a LocalRelation, so
    * [[appendBatch]]'s bootstrap check sees emptiness in the PLAN
    * (zero jobs) instead of running an isEmpty scan.
    */
  def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), StateSchema)

  /** Plan-level emptiness: true only when the frame is a provably
    * empty LocalRelation. A partitioned-but-empty table reads as
    * "maybe non-empty" — the state-side subtrees it keeps alive are
    * semantic no-ops, so this is purely the cheap side of a
    * performance branch; never worth a job to sharpen.
    */
  private def provablyEmpty(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.isEmpty
      case _ => false
    }

  /** Fingerprint of a shingle-hash set column: two independently-
    * salted xxhash64 values over the sorted array, rendered as one
    * string — order-insensitive and effectively 128-bit (collision
    * needs both 64-bit hashes to collide, ~2⁻¹²⁸ — no birthday concern
    * at corpus scale, unlike a single 64-bit hash). Codegen'd native
    * hashing; the md5(to_json(...)) form this replaces materialized a
    * JSON string per document and tripled the feature-pass cost. The
    * fp never leaves the state table, so engine portability is not
    * required of it.
    */
  private def setFingerprint(sorted: org.apache.spark.sql.Column) =
    concat_ws("-", xxhash64(sorted), xxhash64(lit(0x9e3779b9L), sorted))

  /** Dedup `batch` (idCol, textCol, ...) against `state` and within
    * itself; returns the updated state (old rows with merged clusters
    * remapped + one row per batch doc that has ≥ 1 shingle). The result
    * is LAZY — state is corpus-sized, so the caller materializes it by
    * writing it to the next state-table version. Batch doc ids must be
    * disjoint from ids already in the state.
    */
  def appendBatch(state: DataFrame, batch: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, threshold: Double = 0.5,
                  maxBucket: Int = BucketGuard.DefaultMaxBucket,
                  dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    // Batch-sized frames read by several plan subtrees below (and
    // eagerly, by the components rounds): localCheckpoint — lineage
    // cut, blocks freed by the ContextCleaner, no CacheManager pin to
    // leak through the lazily-returned state. LAZY (eager = false)
    // throughout: each eager checkpoint is a full driver-sequenced job
    // of pure fixed overhead per append, and the first real action
    // (the components edge count) materializes the whole chain in one
    // job anyway — `LocalRDDCheckpointData` back-fills any partitions
    // that first action skipped.
    val bFeat = NearDup.shingleSets(batch, idCol, textCol, n)
      .withColumn("__sorted", array_sort(col("shingles")))
      .withColumn("fp", setFingerprint(col("__sorted")))
      .drop("__sorted")
      .localCheckpoint(false)

    // Within-batch exact groups: one representative (min id) per
    // distinct shingle set; members edge to their representative. ONE
    // window over fp carrying (fp, id) ONLY — representative shingles
    // are fetched afterwards by an id semi-join against the
    // checkpointed features (AQE broadcasts the id list when small; at
    // scale both forms shuffle, but this one never shuffles arrays
    // through an aggregate). The window replaces a groupBy + join-back
    // pair: same fp shuffle, one less exchange on the AQE critical
    // path — per-append latency is exchange-DEPTH-bound at batch
    // scale, not data-bound.
    val bfW = bFeat.select(col(idCol), col("fp"))
      .withColumn("__rep", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
    val withinEdges = bfW.filter(col(idCol) =!= col("__rep"))
      .select(col(idCol).as("id_a"), col("__rep").as("id_b"))
    val repIds = bfW.filter(col(idCol) === col("__rep"))
      .select(col("fp"), col(idCol))

    // Bootstrap check, zero jobs: the FIRST append of a corpus (and
    // any replay from scratch) starts from [[emptyState]]'s
    // LocalRelation — skipping the state-side subtrees below (fp
    // lookup, band scan, shingle union, remap join) halves that
    // append's stage count without ever scanning the state.
    val stateEmpty = provablyEmpty(state)

    // Exact vs state: shuffle carries (fp, id, cluster) only. The
    // matched occurrence's CLUSTER id rides along, so the exact edge
    // lands pre-contracted — same-fp docs always share a cluster (each
    // arrived with an edge to the fp's representative).
    val repsTagged =
      if (stateEmpty)
        repIds.withColumn("__old", lit(null).cast("long"))
          .withColumn("__oldc", lit(null).cast("long"))
      else {
        val stateFp = state.groupBy(col("fp")).agg(min(col("doc_id")).as("__old"),
          min_by(col("cluster_id"), col("doc_id")).as("__oldc"))
        repIds.join(stateFp, Seq("fp"), "left")
      }
    val exactOldEdges = repsTagged.filter(col("__old").isNotNull)
      .select(col(idCol).as("id_a"), col("__oldc").as("id_b"))

    // FRESH content (never-seen sets) is all that needs signatures.
    val freshIds = repsTagged.filter(col("__old").isNull).select(col(idCol))
    val freshSigs = NearDup.signatures(
        bFeat.join(freshIds, Seq(idCol), "left_semi").select(col(idCol), col("shingles")),
        idCol)
      .localCheckpoint(false)

    // LSH probe: fresh new docs vs (state ∪ fresh) band keys in ONE
    // join — new-old pairs oriented (new, old), new-new pairs id_a <
    // id_b, so nothing is emitted twice. Old rows carry their cluster
    // id through the band keys, so near-dup edges land PRE-CONTRACTED
    // (old endpoint already replaced by its cluster representative) —
    // no separate corpus-sized contraction join afterwards.
    val newBanded = NearDup.bandKeys(freshSigs, idCol)
      .withColumn("__bc", lit(null).cast("long")).withColumn("__new", lit(true))
    val allBanded =
      if (stateEmpty) newBanded
      else newBanded.unionByName(NearDup.bandKeys(
          state.filter(col("sig").isNotNull)
            .select(col("doc_id").as(idCol), col("sig"), col("cluster_id").as("__bc")),
          idCol, keep = Seq("__bc"))
        .withColumn("__new", lit(false)))
    // Checkpointed like bFeat/freshSigs: the candidate join reads the
    // capped frame on both sides, and without materialization the
    // guard's window (and the whole state band scan under it) would
    // evaluate once per side.
    val capped = BucketGuard.capBuckets(allBanded,
      Seq("band", "bh"), idCol, maxBucket, dropCounter).localCheckpoint(false)
    val aSide = capped.filter(col("__new"))
      .select(col(idCol).as("id_a"), col("band"), col("bh"))
    val bSide = capped
      .select(col(idCol).as("id_b"), col("band"), col("bh"),
        col("__new").as("__new_b"), col("__bc"))
    // No distinct over the candidate pairs: a pair colliding in k ≤ 16
    // bands is verified k times (cheap sorted-array intersects) and
    // may emit duplicate edges — both the union-find and min-label
    // propagation are duplicate-tolerant, and skipping the dedup drops
    // a whole shuffle level from the AQE critical path.
    val cands = aSide.join(bSide, Seq("band", "bh"))
      .filter((!col("__new_b") && col("id_a") =!= col("id_b")) ||
        (col("__new_b") && col("id_a") < col("id_b")))
      .select(col("id_a"), col("id_b"), col("__bc"))

    // Exact-Jaccard verify over candidates only (native single-pass
    // expression; registered by shingleSets above).
    val shA = freshSigs.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val shBNew = freshSigs.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    val shB =
      if (stateEmpty) shBNew
      else shBNew.unionByName(state.filter(col("shingles").isNotNull)
        .select(col("doc_id").as("id_b"), col("shingles").as("sh_b")))
    val nearEdges = cands.join(shA, "id_a").join(shB, "id_b")
      .filter(call_function("graft_jaccard", col("sh_a"), col("sh_b")) >= threshold)
      .select(col("id_a"), coalesce(col("__bc"), col("id_b")).as("id_b"))

    // Closure over the touched subgraph — all edges already carry
    // cluster representatives on their old endpoints, so the graph
    // only involves this batch's ids + touched old cluster ids.
    val contracted = withinEdges.unionByName(exactOldEdges).unionByName(nearEdges)
    val labels = Components.connectedComponentsAuto(contracted)

    // New rows: every batch doc with ≥ 1 shingle; features only where
    // the content is fresh (left join against freshSigs), cluster from
    // the closure where the doc touched an edge, else itself.
    val lbl = labels.select(col("node").as(idCol), col("cluster_id").as("__lbl"))
    val newRows = bFeat.select(col(idCol), col("fp"))
      .join(freshSigs.select(col(idCol), col("sig"), col("shingles")), Seq(idCol), "left")
      .join(lbl, Seq(idCol), "left")
      .select(col(idCol).cast("long").as("doc_id"), col("fp"), col("sig"), col("shingles"),
        coalesce(col("__lbl"), col(idCol).cast("long")).as("cluster_id"))

    if (stateEmpty) newRows
    else {
      // Cluster merges: an old cluster id relabeled below itself pulls
      // its whole cluster along (tiny remap frame — broadcast join).
      val remap = labels.filter(col("cluster_id") =!= col("node"))
        .select(col("node").as("__oc"), col("cluster_id").as("__nc"))
      val updatedOld = state.join(remap, state("cluster_id") === col("__oc"), "left")
        .select(col("doc_id"), col("fp"), col("sig"), col("shingles"),
          coalesce(col("__nc"), col("cluster_id")).as("cluster_id"))
      updatedOld.unionByName(newRows)
    }
  }

  /** Dedup decision over a state: one row per doc in a duplicate
    * cluster (size ≥ 2), `keep` = it is the cluster's canonical (min
    * id) member — the same output contract as
    * [[Components.keepDecision]] on a full-corpus run.
    */
  def keepDecision(state: DataFrame): DataFrame = {
    // groupBy + join-back beats a cluster_id window here (measured
    // ~0.8 s at sf0.1): partial aggregation shrinks the sizes shuffle
    // to #clusters rows and AQE broadcasts it back, so the state never
    // shuffles — a window would shuffle AND sort the full state.
    val sizes = state.groupBy(col("cluster_id")).agg(count(lit(1)).as("__sz"))
    state.join(sizes.filter(col("__sz") >= 2), Seq("cluster_id"))
      .select(col("doc_id").as("node"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("keep"))
  }
}
