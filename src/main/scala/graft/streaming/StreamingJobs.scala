package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming extensions (SURVEY §2.10: the reference is
  * batch-only, but its E1 pipeline is shaped exactly like a streaming
  * job — hourly JSON → dedup → partitioned sink). These wrap that shape
  * with real watermarks and windowed state.
  */
object StreamingJobs {

  /** File-source stream of the events table with ts normalized to a
    * real timestamp. The file stream source requires a directory (a
    * plain-file path is staged behind a symlink dir) and an explicit
    * schema — which is taken from a BATCH read of the same files, so
    * the physical timestamp encoding on disk drives the stream schema
    * instead of an assumption: forcing INT64 over a TIMESTAMP_MICROS
    * column would silently reinterpret the unit (every instant shrinks
    * 1000× toward 1970). The batch twin also runs the one-row unit
    * probe that streaming frames can't ([[graft.sources.Timestamps]]).
    */
  def eventsStream(spark: SparkSession, path: String): DataFrame = {
    val p = java.nio.file.Paths.get(path)
    val dir =
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("graft-stream")
        java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p.toAbsolutePath)
        d.toString
      } else path
    val batch = spark.read.parquet(dir)
    val enc = graft.sources.Timestamps.encodingOf(batch, "ts", dir)
    graft.sources.Timestamps.applyEncoding(
      spark.readStream.schema(batch.schema).parquet(dir), "ts", enc)
  }

  /** Streaming JSONL ingest — the shape a live crawl feed actually
    * arrives in (files landing in a directory). Parsing and
    * corrupt-line quarantine are [[graft.sources.Jsonl.parseLines]],
    * the SAME expression the batch reader uses, so streaming and
    * batch ingestion cannot disagree on which lines are broken. Good
    * rows and quarantine are both filters of this one stream — fork
    * them in a foreachBatch sink.
    */
  def jsonlStream(spark: SparkSession, dir: String,
                  schema: StructType): DataFrame =
    graft.sources.Jsonl.parseLines(spark.readStream.text(dir), schema)

  /** Streaming documents source — parquet files landing in a
    * directory (a single file is symlinked into a temp dir, like
    * [[eventsStream]]). The quality-gate stream below consumes it.
    */
  def documentsStream(spark: SparkSession, path: String): DataFrame = {
    val p = java.nio.file.Paths.get(path)
    val dir =
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("graft-stream")
        java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p.toAbsolutePath)
        d.toString
      } else path
    spark.readStream.schema(DocumentsRawSchema).parquet(dir)
  }

  private val DocumentsRawSchema = StructType(Seq(
    StructField("doc_id", org.apache.spark.sql.types.LongType),
    StructField("text", org.apache.spark.sql.types.StringType),
    StructField("lang", org.apache.spark.sql.types.StringType),
    StructField("source", org.apache.spark.sql.types.StringType),
    StructField("n_chars", org.apache.spark.sql.types.LongType)))

  /** Streaming QUALITY gate — the filter a live ingestion feed runs
    * before anything lands in the corpus: Gopher rule signals through
    * the SAME column expressions the batch operator uses
    * (QualitySignals.gopherSignals), so streaming and batch can never
    * disagree on a document's signals. `keep` is the pass predicate
    * over those signal columns — pipelines tune the thresholds per
    * corpus (default: the composite `gopher_pass`). Pure map work —
    * no state, no watermark, scales with the file feed.
    */
  def qualityGateStream(stream: DataFrame,
                        keep: org.apache.spark.sql.Column = col("gopher_pass"))
      : DataFrame =
    graft.functions.QualitySignals.gopherSignals(stream, "doc_id", "text")
      .filter(keep)
      .select(col("doc_id"), col("n_tokens"), col("stop_hits"))

  /** Tumbling-window aggregate: rows per window per event_type with
    * avg value. Watermark bounds state; partial aggregation happens
    * map-side exactly as in batch.
    */
  def hourlyAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_rows"), avg(col("value")).as("avg_value"))
      .select(col("w.start").as("hour_ts"), col("n_rows"), col("avg_value"))

  /** Streaming dedup (the E1 story as a stream): keep the first row per
    * key, with per-key state evicted once the watermark passes it —
    * `dropDuplicates(keys)` alone never evicts (the watermark only
    * bounds state when the event-time column is part of the key set),
    * so state would grow without bound on a real stream.
    */
  def dedupStream(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(keys)

  /** Streaming MinHash-LSH near-duplicate detector — the operator a
    * live ingestion feed runs to catch re-crawls and mirror copies
    * BEFORE they land in the corpus, where the batch pipeline
    * ([[graft.operators.NearDup]] → [[graft.operators.IncrementalDedup]])
    * only catches them per append. Shingling, signatures, and band
    * keys are the SAME batch expressions (shingleSets → signatures →
    * bandKeys), so a pair collides on a band in the stream iff the
    * batch pipeline would generate it as a candidate; the state store
    * shards by (band, bh) exactly as the batch self-join shuffles.
    *
    * Per bucket, state holds up to `maxBucket` (id, signature) pairs —
    * 64 longs per doc, the same hot-bucket cap philosophy as
    * [[graft.operators.BucketGuard]]: a degenerate band value costs
    * O(maxBucket) comparisons per arrival and bounded state, never
    * O(stream). Verification is SIGNATURE AGREEMENT (fraction of equal
    * MinHash components, an unbiased Jaccard estimator) instead of the
    * batch path's exact-Jaccard — storing shingle sets in stream state
    * would make state text-sized; the estimator needs only what the
    * bucket already holds. Exact duplicates agree on every component
    * (estimate 1.0), so planted-clone recovery is exact, not
    * probabilistic — the `streaming_neardup_planted` gate relies on
    * this. Emitted pairs: (id_a < id_b, est_sim), possibly once per
    * colliding band — consumers dedup, as the batch closure does.
    *
    * STATE IS BOUNDED IN BOTH DIMENSIONS. `maxBucket` caps entries per
    * bucket; the dedup horizon `horizonSec` caps the bucket COUNT: an
    * entry is evicted once the event-time watermark passes its
    * timestamp plus the horizon (it can no longer partner any on-time
    * arrival), and a bucket whose every entry is stale is REMOVED from
    * the state store by an `EventTimeTimeout` — so an unbounded stream
    * holds at most the buckets touched within one horizon of the
    * watermark, not one bucket per distinct band value ever seen.
    * Without this, bucket count grows linearly with distinct content —
    * the classic streaming scale-killer. Detection contract: a pair of
    * copies whose event times differ by at most `horizonSec` is found
    * (given an on-time arrival under the same-length watermark delay);
    * copies farther apart than the horizon are the
    * [[graft.operators.IncrementalDedup]] batch state table's job.
    * Eviction is belt-and-braces: arrivals prune stale partners
    * in-place before comparing (correctness never waits on a timeout
    * firing), and the timeout reclaims buckets no arrival revisits.
    */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
                    tsCol: String, horizonSec: Long,
                    n: Int = 3, simFloor: Double = 0.9,
                    maxBucket: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonMs = horizonSec * 1000L
    val banded = graft.operators.NearDup.bandKeys(
        graft.operators.NearDup.signatures(
          graft.operators.NearDup.shingleSets(
            // A null event time is undateable: the watermark does NOT
            // drop such rows, they reach the stateful operator and the
            // .getTime below would NPE the whole query off one dirty
            // row. Dropping is the dedup-horizon contract (an undated
            // doc can't be placed inside or outside the horizon);
            // ingest-side quarantine accounts for them.
            docs.filter(col(tsCol).isNotNull)
              .withWatermark(tsCol, s"$horizonSec seconds"),
            idCol, textCol, n, keep = Seq(tsCol)),
          idCol, keep = Seq(tsCol)),
        idCol, keep = Seq("sig", tsCol))
      .select(col("band"), col("bh"), col(idCol).cast("long").as("id"), col("sig"),
        col(tsCol).as("__ts"))
      .as[(Int, Long, Long, Array[Long], java.sql.Timestamp)]
    banded.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[List[(Long, Array[Long], Long)], (Long, Long, Double)](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state) =>
          if (state.hasTimedOut) {
            // Timeout fires only after the watermark passes
            // max(entry ts) + horizon — every entry is stale.
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            // Stale partners (watermark past ts+horizon) can no longer
            // match an on-time arrival — drop before comparing.
            var seen = state.getOption.getOrElse(Nil)
              .filter(_._3 + horizonMs > wm)
            val out = List.newBuilder[(Long, Long, Double)]
            // Deterministic within-batch order (group iterators are not
            // ordered): smaller ids probe first, so within-batch pairs
            // always emit as (earlier id, later id) with the earlier doc
            // already in state — mirroring arrival order across batches.
            rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sig, ts) =>
              if (!seen.exists(_._1 == id)) {
                seen.foreach { case (oid, osig, _) =>
                  var m = 0
                  var i = 0
                  while (i < sig.length) { if (sig(i) == osig(i)) m += 1; i += 1 }
                  val est = m.toDouble / sig.length
                  if (est >= simFloor)
                    out += ((math.min(id, oid), math.max(id, oid), est))
                }
                if (seen.size < maxBucket) seen = (id, sig, ts.getTime) :: seen
              }
            }
            state.update(seen)
            // Re-arm to the freshest entry's expiry (must sit beyond the
            // current watermark — stale keys would otherwise throw).
            state.setTimeoutTimestamp(
              math.max(seen.iterator.map(_._3).max + horizonMs, wm + 1))
            out.result().iterator
          }
      }
      .toDF("id_a", "id_b", "est_sim")
  }

  /** Streaming INCREMENTAL dedup — each micro-batch of documents is
    * deduplicated against ALL history through the persistent
    * [[graft.operators.IncrementalDedup]] state table (warehouse-backed,
    * version-rotated per batch exactly like the daily batch job). This
    * is the complement of [[nearDupStream]]: the TTL'd band state
    * catches re-crawls *within* the dedup horizon with per-arrival
    * latency; this operator catches them across ANY gap — a mirror
    * copy arriving months after the original still collides with the
    * original's fingerprint/band rows in the state table — at
    * per-micro-batch latency. Together they are the production shape:
    * fast in-horizon suppression + durable full-history closure.
    *
    * Crash/replay safe: ids already present in the state are filtered
    * from the incoming batch first (one keyed anti-join), so a
    * replayed micro-batch (Structured Streaming re-fires the last
    * batch after recovery) is a no-op instead of violating
    * appendBatch's disjoint-ids contract. The rotation cursor is
    * DURABLE (`<stateBase>_cursor`, one row, written after each state
    * commit): a fresh invocation with the same `stateBase` — a new
    * process, a daily restart, the "months later" re-crawl — RESUMES
    * against the existing state instead of silently discarding the
    * whole dedup history under an empty in-memory cursor.
    *
    * All reads/writes run on the BATCH frame's session (foreachBatch
    * hands a frame bound to the streaming engine's cloned session —
    * mixing it with outer-session frames is undefined). Returns the
    * name of the state version table holding the final state; read
    * dedup decisions via `IncrementalDedup.keepDecision(table)`.
    */
  def incrementalDedupStream(docs: DataFrame, idCol: String, textCol: String,
                             stateBase: String, n: Int = 3,
                             threshold: Double = 0.5,
                             statePartitions: Option[Int] = None): String = {
    val outer = docs.sparkSession
    val versions = Seq(s"${stateBase}_v0", s"${stateBase}_v1")
    val cursorTbl = s"${stateBase}_cursor"
    // Rotation cursor: which version table holds the CURRENT state
    // (-1 = nothing written yet), bootstrapped from the durable marker
    // so prior invocations' state is resumed, never discarded.
    val current = new java.util.concurrent.atomic.AtomicInteger(
      bootstrapCursor(outer, versions, cursorTbl))
    val prev = outer.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(p =>
      outer.conf.set("spark.sql.shuffle.partitions", p.toString))
    try withEphemeralCheckpoint { ckpt =>
      val q = docs.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          incrementalDedupCommit(batch, idCol, textCol, versions, current,
            n, threshold, cursorTable = Some(cursorTbl))
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally outer.conf.set("spark.sql.shuffle.partitions", prev)
    require(current.get >= 0, "stream produced no micro-batches — no state written")
    versions(current.get)
  }

  /** Durable cursor bootstrap for [[incrementalDedupStream]]: the
    * version the marker table names (when it and the state table it
    * points at both exist), else −1. A marker pointing at a missing
    * state table — a half-finished manual cleanup — fails loudly
    * rather than resuming against nothing.
    */
  def bootstrapCursor(spark: SparkSession, versions: Seq[String],
                      cursorTable: String): Int = {
    val tables = new graft.sources.TableManager(spark)
    if (!tables.exists(cursorTable)) -1
    else {
      // head(1).headOption, not head(): the cursor overwrite is
      // delete+write (non-atomic), so a crash inside it can leave the
      // table EMPTY — that case must land in the same loud require
      // below, not surface as an opaque NoSuchElementException.
      val v = spark.table(cursorTable).head(1).headOption.map(_.getInt(0))
      require(v.exists(i => i >= 0 && i < versions.length && tables.exists(versions(i))),
        s"$cursorTable names state version ${v.getOrElse("<empty>")} but " +
          s"${v.flatMap(versions.lift).getOrElse("no state table")} is " +
          "missing — drop the cursor table too if the state was cleaned up")
      v.get
    }
  }

  /** The per-micro-batch commit of [[incrementalDedupStream]] — exposed
    * so a crash replay (same batch re-fired) is directly testable. The
    * anti-join replay guard makes a re-fired batch a state no-op.
    * `cursorTable` (when set) records the committed version AFTER the
    * state write: a crash between the two writes leaves the cursor on
    * the previous version, and the re-fired batch re-absorbs through
    * the replay guard — resume is always against a fully-written state.
    */
  def incrementalDedupCommit(batch: DataFrame, idCol: String, textCol: String,
                             versions: Seq[String],
                             current: java.util.concurrent.atomic.AtomicInteger,
                             n: Int = 3, threshold: Double = 0.5,
                             cursorTable: Option[String] = None): Unit = {
    val s = batch.sparkSession
    val tables = new graft.sources.TableManager(s)
    val cur =
      if (current.get < 0) graft.operators.IncrementalDedup.emptyState(s)
      else s.table(versions(current.get))
    // Replay guard: drop ids the state has already absorbed.
    val fresh =
      if (current.get < 0) batch
      else batch.join(cur.select(col("doc_id").cast("long").as(idCol)),
        Seq(idCol), "left_anti")
    val next = graft.operators.IncrementalDedup.appendBatch(
      cur, fresh, idCol, textCol, n, threshold)
    val target = (current.get + 1).max(0) % 2
    tables.overwrite(next, versions(target))
    current.set(target) // only after the write succeeded
    cursorTable.foreach { ct =>
      import s.implicits._
      tables.overwrite(Seq(target).toDF("version"), ct)
    }
  }

  /** Streaming benchmark decontamination — the live-feed twin of
    * [[graft.operators.CorpusHygiene.removeContaminated]]: every
    * arriving document's `n`-gram shingles are tested against the
    * STATIC benchmark's broadcast inverted index (the same
    * `graft_bench_overlap` native expression the batch operator
    * registers, over the same benchmark array — stream and batch
    * cannot disagree on what is contaminated), and documents sharing
    * ≥ `minShared` shingles with any benchmark doc other than
    * themselves are dropped. Pure map work — no state, no watermark;
    * the benchmark rides inside the expression exactly as in batch,
    * so the stream never joins or shuffles. Documents too short to
    * shingle pass (they cannot be contaminated), matching the batch
    * anti-join's keep-behavior.
    */
  def deconStream(stream: DataFrame, benchmark: DataFrame,
                  idCol: String, textCol: String,
                  n: Int = 5, minShared: Long = 2,
                  maxDriverShingles: Long =
                    graft.operators.CorpusHygiene.DefaultMaxDriverShingles,
                  bitsPerKey: Int = 20, numHashes: Int = 6): DataFrame = {
    val spark = stream.sparkSession
    graft.plans.NativeFunctions.ensureRegistered(spark)
    val benchShingled =
      graft.operators.NearDup.shingleSets(benchmark, idCol, textCol, n)
    // Same driver budget as the batch paths (CorpusHygiene's
    // maxDriverShingles): a benchmark past task memory must not be
    // collected wholesale. The batch fallback is a posting JOIN, which
    // a stateless stream can't do per-row — the streaming fallback is
    // the Bloom expression over the benchmark's shingle UNION, built
    // distributively so the driver holds only the bit array. Trade-off
    // vs the exact path, documented: union membership has no
    // per-benchmark-doc attribution, so (a) a streamed document that is
    // ITSELF a benchmark entry is dropped (the exact path's self-pair
    // exclusion needs ids), and (b) Bloom false positives can over-drop
    // at the filter's designed rate — both in the safe direction for
    // decontamination (never under-drop).
    val totalShingles = benchShingled
      .agg(sum(size(col("shingles")).cast("long"))).head(1)
      .headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .getOrElse(0L)
    if (totalShingles <= maxDriverShingles) {
      val bench: Array[(Long, Array[Long])] = benchShingled
        .select(col(idCol).cast("long"), col("shingles"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bench_overlap",
        exprs => graft.plans.BenchmarkOverlap(exprs.head, bench, minShared), "built-in")
      stream
        .withColumn("__hits", call_function("graft_bench_overlap",
          call_function("graft_shingle_hashes", col(textCol), lit(n))))
        .filter(!exists(col("__hits"),
          h => h.getField("bench_id") =!= col(idCol).cast("long")))
        .drop("__hits")
    } else {
      val bits = graft.plans.BloomHitCount.buildDistributed(
        benchShingled.select(explode(col("shingles")).as("s")).distinct(),
        bitsPerKey, numHashes)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bloom_hits",
        exprs => graft.plans.BloomHitCount(exprs.head, bits, numHashes), "built-in")
      stream.filter(call_function("graft_bloom_hits",
        call_function("graft_shingle_hashes", col(textCol), lit(n))) < minShared)
    }
  }

  /** Streaming token-budget admission — the live-feed twin of
    * [[graft.operators.Sampling.tokenBudgetSample]]: per-stratum token
    * budgets consumed as documents ARRIVE, with the running total held
    * in keyed state so the budget survives micro-batch boundaries (a
    * mixture being filled from a crawl feed must stop at its cap no
    * matter how the feed is chunked). Semantics match the batch
    * operator exactly, generalized to streams: every document's tokens
    * advance the stratum's running total in deterministic order
    * (md5-of-key within each batch — the batch operator's permutation),
    * and a document is admitted iff the total at its position is
    * within budget. The total is monotone, so admission is a prefix
    * per stratum — a one-batch stream reproduces the batch operator
    * row-for-row, and any batch split is replayable as one stacked
    * (batch, md5) window (the `streaming_token_budget` oracle does
    * exactly that in SQL).
    *
    * Scale shape: state is ONE long per stratum; the shuffle carries
    * (key, stratum, n_tokens, ord) — never text. Strata without a
    * budget entry pass nothing and hold no state.
    */
  def tokenBudgetStream(docs: DataFrame, strataCol: String, keyCol: String,
                        textCol: String, budgets: Map[String, Long],
                        salt: String = "graft"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(keyCol).cast("long").as("k"),
        col(strataCol).cast("string").as("s"),
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n"),
        graft.operators.Sampling.hashBucket32(col(keyCol), salt).as("o"))
      .as[(Long, String, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        case (stratum, rows, state) =>
          budgets.get(stratum) match {
            case None => Iterator.empty
            case Some(b) =>
              var total = state.getOption.getOrElse(0L)
              val out = List.newBuilder[(Long, String, Long, Long)]
              rows.toSeq.sortBy(_._4).foreach { case (k, _, n, _) =>
                total += n
                if (total <= b) out += ((k, stratum, n, total))
              }
              state.update(total)
              out.result().iterator
          }
      }
      .toDF(keyCol, strataCol, "n_tokens", "cum_tokens")
  }

  /** Per-user running aggregate state. */
  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful processing via mapGroupsWithState (SURVEY §2.10
    * extension): a running (count, sum) per user, emitted on every
    * update. The state store shards by the group key, so this scales
    * like any keyed aggregation; after one batch the state equals the
    * batch groupBy — which makes it testable synchronously.
    */
  def statefulUserTotals(stream: DataFrame): org.apache.spark.sql.Dataset[UserAgg] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserAgg](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          UserAgg(uid, n, s)
      }
  }

  /** [[statefulUserTotals]] with an idle-eviction bound: a user whose
    * event-time watermark passes their last event plus `idleSec` has
    * their state REMOVED (their final totals were already emitted on
    * every update — nothing is lost, and a returning user simply
    * starts a fresh running total). The plain variant's state is
    * user-cardinality-bounded — fine when the key space is finite like
    * any keyed aggregation — but an open-ended key domain (session
    * ids, request ids) needs this TTL form. Input must carry a
    * watermarked `ts` TIMESTAMP column.
    */
  def statefulUserTotalsTTL(stream: DataFrame, idleSec: Long)
      : org.apache.spark.sql.Dataset[UserAgg] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // Same null-event-time guard as nearDupStream: the TTL arithmetic
    // calls .getTime and a null ts would crash the query.
    stream.select(col("user_id"), col("value"), col("ts"))
      .filter(col("ts").isNotNull)
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserAgg](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (n, s) = state.getOption.getOrElse((0L, 0.0))
            var maxTs = Long.MinValue
            rows.foreach { r =>
              n += 1; s += r._2
              if (r._3.getTime > maxTs) maxTs = r._3.getTime
            }
            state.update((n, s))
            state.setTimeoutTimestamp(math.max(
              maxTs + idleSec * 1000, state.getCurrentWatermarkMs() + 1))
            Iterator.single(UserAgg(uid, n, s))
          }
      }
  }

  /** Stream-static join: every micro-batch joins the (small) static
    * dimension — broadcast, no streaming state, the standard
    * enrichment step between source and aggregation.
    */
  def withStaticDim(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** STREAM-STREAM inner join with an event-time range bound: each
    * left event pairs with right events of the same user inside
    * [left.ts, left.ts + withinSec]. Both sides carry watermarks AND
    * the join carries the time-range condition — together they let
    * Spark's join state manager evict buffered rows once the watermark
    * passes the range; drop either and state grows without bound.
    * Output: (user_id, a_id, b_id, a_ts, b_ts), append mode.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       withinSec: Long): DataFrame = {
    val a = left.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "2 hours")
    val b = right.select(col("user_id").as("__b_user"),
        col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "2 hours")
    a.join(b,
        col("user_id") === col("__b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinSec SECONDS"))
      .select(col("user_id"), col("a_id"), col("b_id"), col("a_ts"), col("b_ts"))
  }

  /** A closed session emitted by [[sessionizeStream]] (epoch seconds). */
  case class SessionOut(user_id: Long, n_events: Long, start_sec: Double, end_sec: Double)

  /** Streaming sessionization via flatMapGroupsWithState — the
    * streaming form of [[graft.operators.Sessions]]: per-user state
    * holds the one open session; an event farther than `gapSec` past
    * the open session's end closes and EMITS it. The final session of
    * each user stays open in state (a real deployment closes it with
    * an event-time timeout; batch-synchronous tests compare emitted ==
    * all-but-open).
    */
  def sessionizeStream(stream: DataFrame, gapSec: Long)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.selectExpr("user_id", "CAST(ts AS DOUBLE) AS sec").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Double, Long), SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          // Rows within a group arrive unordered; sort this batch.
          // Cross-batch late events (t at or before the open session's
          // end) merge into the open session — end NEVER moves
          // backwards, so gap detection and durations stay monotonic
          // (without a watermark this is the bounded-correct choice; a
          // late event can't reopen an already-closed session).
          val times = rows.map(_._2).toArray.sorted
          val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
          var (start, end, n) = state.getOption
            .getOrElse((times.head, times.head, 0L))
          times.foreach { t =>
            if (n > 0 && t - end > gapSec) {
              closed += SessionOut(uid, n, start, end)
              start = t; end = t; n = 1L
            } else if (n == 0) {
              start = t; end = t; n = 1L
            } else {
              if (t < start) start = t
              if (t > end) end = t
              n += 1
            }
          }
          state.update((start, end, n))
          closed.iterator
      }
  }

  /** Watermark-closed sessionization: like [[sessionizeStream]], but a
    * session also closes when the EVENT-TIME WATERMARK passes its end
    * plus the gap — so the final session of an idle user eventually
    * emits instead of dangling in state forever. Input must carry a
    * `ts` TIMESTAMP column with `withWatermark` already applied (the
    * watermark both bounds state and drives the timeout clock).
    */
  def sessionizeStreamEventTime(stream: DataFrame, gapSec: Long)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Double, Long), SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            val (s, e, n) = state.get
            state.remove()
            Iterator.single(SessionOut(uid, n, s, e))
          } else {
            val times = rows.map(_._2.getTime / 1000.0).toArray.sorted
            val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
            var (start, end, n) = state.getOption
              .getOrElse((times.head, times.head, 0L))
            times.foreach { t =>
              if (n > 0 && t - end > gapSec) {
                closed += SessionOut(uid, n, start, end)
                start = t; end = t; n = 1L
              } else if (n == 0) {
                start = t; end = t; n = 1L
              } else {
                if (t < start) start = t
                if (t > end) end = t
                n += 1
              }
            }
            state.update((start, end, n))
            // Fire once the watermark passes end+gap. The timeout must
            // sit beyond the current watermark (stale keys would
            // otherwise throw), hence the max.
            state.setTimeoutTimestamp(math.max(
              (end * 1000).toLong + gapSec * 1000,
              state.getCurrentWatermarkMs() + 1))
            closed.iterator
          }
      }
  }

  /** Checkpoint directory for an EPHEMERAL, synchronous run (the
    * memory-sink verify harness, tests): RAM-backed when /dev/shm is
    * available, else the JVM temp dir. A micro-batch commit fsyncs the
    * offset log, the commit log, and one delta file per state store
    * instance — pure fixed latency that dwarfs the actual work on a
    * small stream, and durability of a throwaway checkpoint protects
    * nothing. Production jobs pass their own durable location; this is
    * only for run-to-completion-and-discard execution.
    */
  private def ephemeralCheckpointDir(): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, "graft-ckpt").toString
  }

  /** Run `body` with a fresh ephemeral checkpoint dir, deleting the
    * dir afterwards — /dev/shm is RAM-backed, so a long-lived harness
    * process that leaked one dir per streaming run would slowly eat
    * memory that looks like "disk". Deletion happens in finally: a
    * failed query's throwaway checkpoint is exactly as worthless as a
    * finished one's.
    */
  private def withEphemeralCheckpoint[T](body: String => T): T = {
    val dir = ephemeralCheckpointDir()
    try body(dir)
    finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val p = Path.of(dir)
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    }
  }

  /** The per-micro-batch commit [[runToTable]] applies — exposed so a
    * replay (same batch id fired twice, which Structured Streaming DOES
    * do when a crash lands between the sink write and the commit-log
    * write) is directly testable without engineering a mid-query crash.
    *
    * Idempotent mode stamps the batch id into a `__graft_batch_id`
    * partition and DYNAMICALLY OVERWRITES exactly that partition
    * ([[graft.sources.TableManager.overwritePartitions]]): a replayed
    * batch replaces its own earlier (possibly partial) output instead
    * of appending a duplicate — true exactly-once table contents, not
    * a marker-file race. Downstream readers drop/ignore the stamp
    * column; `compact` can fold the per-batch layout later. Non-
    * idempotent mode is the raw append (at-least-once) for consumers
    * that dedup downstream and want the table unstamped.
    */
  def commitBatch(tables: graft.sources.TableManager, batch: DataFrame,
                  table: String, batchId: Long, idempotent: Boolean,
                  filesPerBatch: Int = 1): Unit =
    if (idempotent)
      // filesPerBatch salts the batch-id partition so a LARGE
      // micro-batch writes with that many parallel tasks instead of
      // funneling through one (the batch id is a single partition
      // value — see TableManager.alignWrite).
      tables.overwritePartitions(
        batch.withColumn("__graft_batch_id", lit(batchId)),
        table, Seq("__graft_batch_id"), filesPerBatch)
    else tables.append(batch, table)

  /** foreachBatch sink: write each micro-batch to a managed table via
    * TableManager — the streaming→catalog bridge. Batch writes go
    * through [[commitBatch]]; `idempotent = true` (default) makes a
    * batch replay after a crash overwrite its own partition instead of
    * double-appending.
    */
  /** Scope the RocksDB state-store provider (and conf restore) around
    * `body`. RocksDB keeps streaming state OFF-HEAP on local disk with
    * changelog/snapshot files in the checkpoint — the provider any
    * large-state production job runs, where the default HDFS-backed
    * store holds every key in executor heap. Provider choice is
    * per-QUERY-START and persisted in the checkpoint's operator
    * metadata; restarts keep whatever the checkpoint was built with.
    */
  def withStateStore[T](spark: SparkSession, rocksdb: Boolean)(body: => T): T =
    if (!rocksdb) body
    else {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

  def runToTable(spark: SparkSession, df: DataFrame, table: String,
                 statePartitions: Option[Int] = None,
                 idempotent: Boolean = true,
                 transform: DataFrame => DataFrame = identity,
                 checkpoint: Option[String] = None,
                 rocksdb: Boolean = false): Unit = {
    val tables = new graft.sources.TableManager(spark)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    // A caller-provided DURABLE checkpoint (restart/resume semantics)
    // bypasses the ephemeral-dir lifecycle; ephemeral stays the
    // default for run-to-completion-and-discard gates.
    def run(ckpt: String): Unit = withStateStore(spark, rocksdb) {
      val q = df.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // `transform` runs as BATCH code inside foreachBatch — the
          // hook for composes streaming queries can't express natively
          // (per-group top-k windows, broadcast probes); the idempotent
          // batch-partition commit below is unchanged.
          commitBatch(tables, transform(batch), table, batchId, idempotent)
        }
        .option("checkpointLocation", ckpt)
        .start()
      // Stop in finally: if processAllAvailable throws, the query must
      // be terminated BEFORE withEphemeralCheckpoint's finally deletes
      // the checkpoint dir out from under it (a still-registered query
      // against a vanished checkpoint leaks in spark.streams and spews
      // secondary errors).
      try q.processAllAvailable()
      finally q.stop()
    }
    try checkpoint match {
      case Some(ckpt) => run(ckpt)
      case None => withEphemeralCheckpoint(run)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Refuse a (table, app, checkpoint) configuration the idempotence
    * protocol would silently turn into DATA LOSS: with no stable
    * checkpoint, Structured Streaming restarts batch ids at 0, and if
    * `app` has already committed batches to this table, every replayed
    * id at or below the newest committed one is skipped as a "replay"
    * — new data silently discarded. The txn protocol is only safe with
    * a stable checkpoint and an app id unique to the logical stream
    * (the same contract as Delta's `txnAppId`/`txnVersion`); this
    * guard makes the unsafe reuse loud at stream start instead.
    */
  private def requireSafeTxnConfig(spark: SparkSession, dir: String,
                                   app: String,
                                   checkpoint: Option[String]): Unit = {
    require(app.trim.nonEmpty, "app id must be non-empty")
    if (checkpoint.isEmpty) {
      val vt = new graft.sources.VersionedTable(spark, dir)
      if (vt.latestVersion >= 0) vt.lastTxnBatch(app).foreach(last =>
        throw new IllegalArgumentException(
          s"app id '$app' already committed batches (newest id $last) to " +
            s"$dir, but this run has no stable checkpoint: batch ids " +
            "restart at 0 and the idempotence protocol would silently " +
            "skip every one of them as a replay. Pass the stream's " +
            "original checkpointLocation to resume exactly-once, or use " +
            "a fresh app id unique to this logical stream."))
    }
  }

  /** foreachBatch sink into a [[graft.sources.VersionedTable]] — the
    * streaming→ACID-table bridge: every micro-batch commits through
    * the transaction log tagged (app, batchId), so a crash between the
    * table write and the checkpoint commit heals as an idempotent SKIP
    * on replay (Delta's txnAppId/txnVersion protocol) instead of the
    * partition-overwrite dance [[runToTable]] needs on a plain parquet
    * table — and concurrent batch writers can append to the same table
    * through the same optimistic-concurrency log while the stream
    * runs. The APP-ID CONTRACT on [[runMergeToVersionedTable]] applies
    * here identically ([[requireSafeTxnConfig]]).
    */
  def runToVersionedTable(spark: SparkSession, df: DataFrame, dir: String,
                          app: String,
                          statePartitions: Option[Int] = None,
                          checkpoint: Option[String] = None): Unit = {
    requireSafeTxnConfig(spark, dir, app, checkpoint)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    def run(ckpt: String): Unit = {
      val q = df.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // the batch frame is bound to the streaming engine's cloned
          // session — commit through THAT session's VersionedTable
          new graft.sources.VersionedTable(batch.sparkSession, dir)
            .appendStreamBatch(batch, app, batchId)
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    try checkpoint match {
      case Some(ckpt) => run(ckpt)
      case None => withEphemeralCheckpoint(run)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** foreachBatch CDC-APPLY sink into a
    * [[graft.sources.VersionedTable]] — the streaming upsert a
    * change-feed consumer runs (Delta's foreachBatch-merge idiom):
    * every micro-batch MERGEs on `keys` (UPDATE SET * / INSERT *)
    * through the transaction log tagged (app, batchId), so a crash
    * between the merge commit and the checkpoint heals as an
    * idempotent SKIP on replay — a batch is never double-applied.
    * `evolveSchema` lets the feed grow columns mid-stream (the widening
    * rides the merge commit, old rows read null);
    * `useDeletionVectors` opts each batch into merge-on-read under the
    * table's fraction policy. Batches must not carry duplicate keys
    * (the merge multi-match guard fails loudly — dedupe upstream,
    * e.g. last-change-per-key within the batch).
    *
    * APP-ID CONTRACT (same as Delta's `txnAppId`): `app` must be
    * UNIQUE PER LOGICAL STREAM and stable across that stream's
    * restarts, and exactly-once holds only with a STABLE `checkpoint`
    * — the txn protocol skips any batch id at or below the app's
    * newest committed one, so a reused app id with a fresh checkpoint
    * (batch ids restart at 0) would silently discard genuinely new
    * data as "replays". [[requireSafeTxnConfig]] refuses exactly that
    * configuration up front.
    */
  def runMergeToVersionedTable(spark: SparkSession, df: DataFrame,
                               dir: String, keys: Seq[String],
                               app: String,
                               evolveSchema: Boolean = false,
                               useDeletionVectors: Boolean = false,
                               statePartitions: Option[Int] = None,
                               checkpoint: Option[String] = None): Unit = {
    import graft.sources.{MergeAction, MergeClause}
    requireSafeTxnConfig(spark, dir, app, checkpoint)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    def run(ckpt: String): Unit = {
      val q = df.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          new graft.sources.VersionedTable(batch.sparkSession, dir)
            .mergeClauses(batch, keys,
              matched = Seq(MergeClause(None, MergeAction.Update(None))),
              notMatched = Seq(MergeClause(None, MergeAction.Insert(None))),
              evolveSchema = evolveSchema,
              useDeletionVectors = useDeletionVectors,
              txn = Some((app, batchId)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    try checkpoint match {
      case Some(ckpt) => run(ckpt)
      case None => withEphemeralCheckpoint(run)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the materialized result (synchronous test/verify harness).
    *
    * `statePartitions` scopes `spark.sql.shuffle.partitions` to this
    * query (restored after): every stateful streaming operator
    * instantiates one state store PER shuffle partition per internal
    * store (a stream-stream join keeps four), and each store commits a
    * delta file every batch — so partition count, not data volume, is
    * the fixed cost of a small keyed stream. Size it to key
    * cardinality/throughput; the batch default (sized for scan
    * parallelism) is far too high for state.
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  mode: String = "complete",
                  statePartitions: Option[Int] = None,
                  rocksdb: Boolean = false): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try withEphemeralCheckpoint { ckpt =>
      withStateStore(spark, rocksdb) {
        val q: StreamingQuery = df.writeStream
          .outputMode(mode).format("memory").queryName(name)
          .option("checkpointLocation", ckpt)
          .start()
        // Stop in finally — see runToTable: the query must terminate
        // before the ephemeral checkpoint dir is deleted.
        try q.processAllAvailable()
        finally q.stop()
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }
}
