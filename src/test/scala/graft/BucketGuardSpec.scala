package graft

import org.apache.spark.sql.functions._

import graft.operators.{BucketGuard, EmbeddingAnn, NearDup}

/** Hot-bucket guard: a planted degenerate bucket (thousands of
  * near-identical rows sharing one band/chunk/bucket value) must cost
  * O(cap²) candidates, not O(|bucket|²) — the last 100 TB guard rail
  * on the banded self-joins. Each test plants the blowup its operator
  * is most exposed to and pins the EXACT surviving pair count: with
  * every planted row identical, all bands keep the same cap-sized
  * id subsample (the order is xxhash64(id), band-independent), so the
  * result is exactly C(cap, 2) verified pairs.
  */
class BucketGuardSpec extends SparkSuite {
  import spark.implicits._

  private val Cap = 64
  private val Planted = 10000
  private def expectPairs: Long = Cap.toLong * (Cap - 1) / 2

  test("capBuckets keeps at most cap rows per bucket, deterministically") {
    val banded = spark.range(1000).select(
      (col("id") % 4).as("bucket"), col("id"))
    val acc = spark.sparkContext.longAccumulator("test.capBuckets")
    val capped = BucketGuard.capBuckets(banded.toDF(), Seq("bucket"), "id", 10, Some(acc))
    val sizes = capped.groupBy("bucket").count().collect().map(_.getLong(1))
    assert(sizes.length === 4 && sizes.forall(_ === 10))
    assert(acc.value === 1000 - 40)
    // Deterministic subsample: a second run keeps the identical id set.
    val first = capped.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val again = BucketGuard.capBuckets(banded.toDF(), Seq("bucket"), "id", 10, None)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(first === again)
    // An under-cap frame passes through complete.
    assert(BucketGuard.capBuckets(banded.toDF(), Seq("bucket"), "id", 400, None)
      .count() === 1000)
  }

  test("MinHash banding survives 10k identical docs without quadratic candidates") {
    val docs = spark.range(Planted).select(col("id").as("doc_id"),
      lit("all work and no play makes jack a dull boy again and again").as("text"))
    val acc = spark.sparkContext.longAccumulator("test.minhash.dropped")
    val pairs = NearDup.minHashNearDups(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxBucket = Cap, dropCounter = Some(acc))
    assert(pairs.count() === expectPairs,
      s"guarded candidate set must be exactly C($Cap,2)")
    assert(acc.value > 0, "the guard must have engaged on the planted bucket")
  }

  test("SimHash chunk banding survives 10k identical docs") {
    val docs = spark.range(Planted).select(col("id").as("doc_id"),
      lit("the very same short document body").as("text"))
    val acc = spark.sparkContext.longAccumulator("test.simhash.dropped")
    val pairs = NearDup.simHashNearDups(docs, "doc_id", "text",
      maxHamming = 3, maxBucket = Cap, dropCounter = Some(acc))
    assert(pairs.count() === expectPairs)
    assert(acc.value > 0)
  }

  test("embedding LSH survives 10k identical vectors in one bucket") {
    val vec = array((0 until 8).map(i => lit(0.25f * (i + 1))): _*)
    val corpus = spark.range(Planted).select(col("id").as("vec_id"), vec.as("embedding"))
    val acc = spark.sparkContext.longAccumulator("test.lsh.dropped")
    val pairs = EmbeddingAnn.lshNearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.9, dim = 8, nBits = 6, nTables = 2,
      maxBucket = Cap, dropCounter = Some(acc))
    assert(pairs.count() === expectPairs)
    assert(acc.value > 0)
  }
}
