package graft

import org.apache.spark.sql.functions._
import graft.operators.EmbeddingAnn

class AnnIvfSpec extends SparkSuite {

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("IVF centroids are deterministic and unit-norm") {
    val c1 = EmbeddingAnn.trainCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    val c2 = EmbeddingAnn.trainCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    c1.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("IVF top-k recall vs exact brute force is high at nprobe=4/16") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = EmbeddingAnn.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val centroids = EmbeddingAnn.trainCentroids(emb, "vec_id", "embedding", nlist = 16)
    val ivf = EmbeddingAnn.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, centroids, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low (exact=${exact.size}, hit=${(exact & ivf).size})")
    // every IVF result must also be a genuine neighbor of its query
    assert(ivf.forall { case (q, n) => q != n })
  }

  test("postings assembled across appends probe identically to the single-pass index") {
    val queries = emb.filter(col("vec_id") < 20)
    val centroids = EmbeddingAnn.trainCentroids(emb, "vec_id", "embedding", nlist = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val single = rows(EmbeddingAnn.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, centroids, nprobe = 4))
    // Index assembled from two disjoint batches (union order reversed
    // relative to id order — append order must not matter).
    val batched = EmbeddingAnn.ivfPostings(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", centroids)
      .unionByName(EmbeddingAnn.ivfPostings(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", centroids))
    val incremental = rows(EmbeddingAnn.ivfTopKFromPostings(batched, queries,
      "vec_id", "embedding", k = 5, centroids, nprobe = 4))
    assert(incremental === single)
  }

  test("IVF-SQ8 matches the float-posting IVF after exact rescore") {
    val queries = emb.filter(col("vec_id") < 20)
    val centroids = EmbeddingAnn.trainCentroids(emb, "vec_id", "embedding", nlist = 16)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = pairs(EmbeddingAnn.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, centroids, nprobe = 4))
    val sq8 = pairs(EmbeddingAnn.ivfTopKQuantized(emb, queries, "vec_id", "embedding",
      k = 5, centroids, nprobe = 4))
    // The int8 shortlist + exact rescore recovers the float path's
    // top-k exactly on this corpus: quantized postings cost zero
    // recall; probe coverage is the only limiter.
    assert(sq8 === ivf, s"SQ8 diverged: only-in-ivf=${(ivf -- sq8).size}, only-in-sq8=${(sq8 -- ivf).size}")
  }

  test("ANN gates release every pinned cache block before returning") {
    // Each gate persists one shared normalized corpus; Caching
    // .materializeAndRelease must drop it on return, so a long-lived
    // session running all gates back-to-back holds zero CacheManager
    // entries between them (no reliance on Bench's clearCache()).
    spark.catalog.clearCache()
    for (name <- Seq("ann_ivf", "ann_recall", "ann_ivf_sq8", "ann_lsh_recall")) {
      val out = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      assert(out.collect().nonEmpty, name)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left pinned cache entries behind")
    }
  }

  test("semDedup keeps exactly one of a planted identical group and all singletons") {
    import spark.implicits._
    // 3 orthogonal base directions, a planted group of 4 identical
    // vectors on the first, and 2 lone vectors on the others: the
    // identical group must collapse to its min id; vectors with no
    // near-dup must keep themselves as their own group.
    def unit(dim: Int, axis: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)
    val rows = Seq(
      (10L, unit(8, 0)), (11L, unit(8, 0)), (12L, unit(8, 0)), (13L, unit(8, 0)),
      (20L, unit(8, 1)), (30L, unit(8, 2)))
    val df = rows.toDF("vec_id", "embedding")
    val centroids = EmbeddingAnn.trainCentroids(df, "vec_id", "embedding", nlist = 3, iters = 2)
    val out = EmbeddingAnn.semDedup(df, "vec_id", "embedding", centroids, threshold = 0.9)
      .select("vec_id", "sem_group", "keep").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(10L) === ((10L, true)))
    assert(out(11L) === ((10L, false)))
    assert(out(12L) === ((10L, false)))
    assert(out(13L) === ((10L, false)))
    assert(out(20L) === ((20L, true)))
    assert(out(30L) === ((30L, true)))
  }

  test("semDedup scores no cross-cluster pair and caps hot clusters") {
    import spark.implicits._
    // A planted hot cluster (60 near-identical vectors) under a tiny
    // cap: the decision frame still covers EVERY vector (capped rows
    // only leave the pair stage), and the guard's drop counter engages.
    val dim = 8
    val rows = (0L until 60L).map { i =>
      (i, Array.tabulate(dim)(d => if (d == 0) 1.0f else (i * (d + 1) % 7).toFloat * 1e-4f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val centroids = EmbeddingAnn.trainCentroids(df, "vec_id", "embedding", nlist = 2, iters = 2)
    val acc = spark.sparkContext.longAccumulator("semdedup-drops")
    val out = EmbeddingAnn.semDedup(df, "vec_id", "embedding", centroids,
      threshold = 0.999, maxBucket = 10, dropCounter = Some(acc))
    assert(out.count() === 60L)
    assert(acc.value > 0, "hot-cluster cap never engaged")
  }

  test("multi-table LSH finds at least the single-table pairs") {
    val one = EmbeddingAnn.lshNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.3, dim = 64, nBits = 6, nTables = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = EmbeddingAnn.lshNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.3, dim = 64, nBits = 6, nTables = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one.subsetOf(two))
    assert(two.size >= one.size)
  }
}
