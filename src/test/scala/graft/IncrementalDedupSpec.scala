package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, IncrementalDedup, NearDup}
import graft.sources.TableManager

/** Incremental cross-run dedup: replaying a corpus as appends must land
  * on exactly the clusters a single full-corpus run produces — pair
  * discovery is deterministic per-document (band hashes are functions
  * of each side's signature), so the equality is exact, not
  * approximate. Also pins the state-table contract: features stored
  * once per distinct shingle set, exact duplicates carried with null
  * features, old clusters remapped on merge, parquet round-trip safe.
  */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  // Word pools for constructing documents with controlled Jaccard.
  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")
  private val W = words("alpha", 40)
  private val V = words("beta", 40)

  private def doc(id: Long, ws: Seq[String]): (Long, String) = (id, ws.mkString(" "))

  // Cluster 1: exact triplet (ids 1, 4, 7 across three batches).
  // Cluster 2: near pair (2, 5): 20 words, one word changed => j ~ 0.71.
  // Merge case: A=(10,11) exact, C=(12,13) exact, j(A,C)=18/58=0.31 < 0.5;
  // bridge B=14 with j(B,A)=38/58=0.655 and j(B,C)=36/60=0.6, both >= 0.5,
  // arriving last => clusters 10 and 12 must merge into 10.
  private val tA = W
  private val tC = W.take(20) ++ V.drop(20)
  private val tB = W ++ V.drop(20)
  private val t20 = words("gamma", 20)
  private val t20near = t20.init :+ "changed"

  private val batch1 = Seq(
    doc(1, words("solo", 25) ++ Seq("one")), doc(2, t20), doc(10, tA), doc(11, tA),
    doc(3, words("other", 22)))
  private val batch2 = Seq(
    doc(4, batch1.head._2.split(" ").toSeq), // exact dup of 1 (cross-batch exact)
    doc(5, t20near), doc(12, tC), doc(13, tC))
  private val batch3 = Seq(
    doc(7, batch1.head._2.split(" ").toSeq), // another exact dup of 1
    doc(14, tB), // bridge: merges clusters 10 and 12
    doc(6, words("lonely", 30)))

  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def replay(threshold: Double): org.apache.spark.sql.DataFrame = {
    var state = IncrementalDedup.emptyState(spark)
    for (b <- Seq(batch1, batch2, batch3))
      state = IncrementalDedup.appendBatch(state, df(b), "doc_id", "text",
        n = 3, threshold = threshold)
    state
  }

  test("incremental replay equals full-corpus clusters") {
    val state = replay(0.5)
    val got = IncrementalDedup.keepDecision(state)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq

    val full = df(batch1 ++ batch2 ++ batch3)
    val pairs = NearDup.minHashNearDups(full, "doc_id", "text", n = 3, threshold = 0.5)
    val want = Components.keepDecision(Components.connectedComponents(pairs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq

    assert(got === want)
    assert(got.nonEmpty)
  }

  test("exact duplicates carry null features; fresh content stores them once") {
    val state = replay(0.5)
    val rows = state.collect().map(r =>
      r.getLong(0) -> (r.isNullAt(2), r.getLong(4))).toMap
    // 4 and 7 are exact duplicates of 1: no stored signature, cluster 1.
    assert(rows(4) === ((true, 1L)) && rows(7) === ((true, 1L)))
    assert(rows(1)._1 === false && rows(1)._2 === 1L)
    // 11 exact-dups 10 within one batch: null features, cluster 10.
    assert(rows(11)._1 === true)
    // Near-dup 5 is distinct content: features stored even though deduped.
    assert(rows(5)._1 === false && rows(5)._2 === 2L)
    // One state row per batch doc (all have >= 3 tokens).
    assert(state.count() === (batch1 ++ batch2 ++ batch3).size)
  }

  test("a late bridge doc merges two existing clusters and remaps old rows") {
    val state = replay(0.5)
    val cl = state.collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // Bridge 14 connects {10,11} and {12,13}: all five land on cluster 10,
    // including the REMAPPED old rows 12 and 13.
    for (id <- Seq(10L, 11L, 12L, 13L, 14L)) assert(cl(id) === 10L, s"doc $id")
    val keep = IncrementalDedup.keepDecision(state)
      .filter(col("cluster_id") === 10).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep === Map(10L -> true, 11L -> false, 12L -> false, 13L -> false, 14L -> false))
  }

  test("state survives a parquet table round-trip between appends") {
    var state = IncrementalDedup.appendBatch(
      IncrementalDedup.emptyState(spark), df(batch1), "doc_id", "text", 3, 0.5)
    new TableManager(spark).overwrite(state, "incr_state_spec")
    state = IncrementalDedup.appendBatch(
      spark.table("incr_state_spec"), df(batch2 ++ batch3), "doc_id", "text", 3, 0.5)
    val got = IncrementalDedup.keepDecision(state)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    val want = IncrementalDedup.keepDecision(replay(0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    assert(got === want)
  }
}
