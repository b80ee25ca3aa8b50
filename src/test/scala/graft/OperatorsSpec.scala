package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.{QualitySignals, TextFunctions}

class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("nullCountVector counts per-column nulls in one pass") {
    val df = Seq((Some(1.0), None: Option[Double]), (None, Some(2.0)), (Some(3.0), Some(4.0)))
      .toDF("a", "b")
    val r = Quality.nullCountVector(df, Seq("a", "b")).collect()(0)
    assert(r.getLong(0) === 1 && r.getLong(1) === 1)
  }

  test("keepFirst is deterministic and idempotent") {
    val df = Seq((1, "a", 10.0), (1, "b", 5.0), (1, "a", 1.0), (2, "c", 7.0))
      .toDF("k", "s", "v")
    val once = Dedup.keepFirst(df, Seq("k"), Seq(col("v"), col("s")))
    val rows = once.orderBy("k").collect()
    assert(rows.length === 2)
    assert(rows(0).getDouble(2) === 1.0) // min v for k=1
    val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("v"), col("s")))
    assert(twice.collect().toSet === once.collect().toSet)
  }

  test("keepFirstAgg matches windowed keepFirst on unique order column") {
    val df = Seq((1, 10.0, "x"), (1, 5.0, "y"), (2, 7.0, "z")).toDF("k", "ord", "payload")
    val viaWindow = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"))).orderBy("k").collect()
    val viaAgg = Dedup.keepFirstAgg(df, Seq("k"), "ord").orderBy("k").collect()
    assert(viaWindow.map(r => (r.getInt(0), r.getDouble(1))).toSeq ===
      viaAgg.map(r => (r.getInt(0), r.getDouble(1))).toSeq)
  }

  test("minhash LSH finds planted near-duplicates with exact jaccard verify") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tomorrow")
    val other = "completely different content about spark catalyst optimizer internals here"
    val df = Seq((0L, base), (1L, nearDup), (2L, other)).toDF("doc_id", "text")
    val pairs = NearDup.minHashNearDups(df, "doc_id", "text", n = 3, threshold = 0.5).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getLong(0) === 0L && pairs(0).getLong(1) === 1L)
    assert(pairs(0).getDouble(2) > 0.6)
  }

  test("simhash: identical docs at hamming 0; near-dups within 3") {
    val r = NearDup.simHashNearDups(
      Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"),
          (1L, "alpha beta gamma delta epsilon zeta eta theta"),
          (2L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text"),
      "doc_id", "text", maxHamming = 3).collect()
    val m = r.map(row => (row.getLong(0), row.getLong(1)) -> row.getAs[Number]("hamming").longValue()).toMap
    assert(m((0L, 1L)) === 0L)
  }

  test("ANN brute-force: self-similar vectors rank first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),   // near 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.98f, 0.2f)))   // near 2
      .toDF("vec_id", "embedding")
    val top1 = EmbeddingAnn.bruteForceTopK(vecs, vecs.filter($"vec_id" < 2), "vec_id", "embedding", k = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    assert(top1(0L) === 1L && top1(1L) === 0L)
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog for a walk in the park"),
      (2L, "der hund und die katze ist nicht mit von zu haus"),
      (3L, "el perro y la casa de que un con para en madrid"),
      (4L, "xyzzy qwerty asdf")).toDF("id", "text")
    val r = df.select($"id", TextFunctions.langId($"text").as("lang"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "en" && r(2L) === "de" && r(3L) === "es" && r(4L) === "und")
  }

  test("quality score rewards prose over symbol soup") {
    val prose = "the quick brown fox is happy that the sun rises for a new day with light"
    val soup = ";;; ??? !!! ### $$$ %%% ^^^ &&&"
    val df = Seq((1L, prose), (2L, soup)).toDF("id", "text")
    val r = df.select($"id", TextFunctions.qualityScore($"text").as("q"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L))
    assert(r(1L) > 0.5 && r(2L) <= 0.5)
  }

  test("shingles produce n-grams; fewer than n tokens → empty") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val r = df.select($"id", TextFunctions.shingles($"text", 3).as("sh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1)).toMap
    assert(r(1L) === Seq("a b c", "b c d"))
    assert(r(2L) === Seq())
  }

  test("asOf join: latest right row at-or-before each left row; null when none") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 30L, "r30")).toDF("k", "rt", "rv")
    val r = Joins.asOf(left, right, keys = Seq("k"), leftTs = "t", rightTs = "rt",
        rightCols = Seq("rv"))
      .orderBy("k", "t").collect()
    // t=10 matches rt=10 (<= semantics), t=20 matches rt=15, k=2 has no right → null
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getString(3))).toSeq ===
      Seq((1L, 10L, "r10"), (1L, 20L, "r15"), (2L, 5L, null)))
  }

  test("asOf join: forward direction matches earliest right at-or-after") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 40L, "c")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 30L, "r30")).toDF("k", "rt", "rv")
    val r = Joins.asOf(left, right, keys = Seq("k"), leftTs = "t", rightTs = "rt",
        rightCols = Seq("rv"), direction = "forward")
      .orderBy("k", "t").collect()
    // t=10 matches rt=10 (>= is inclusive), t=20 matches rt=30, t=40 has nothing after
    assert(r.map(x => (x.getLong(1), x.getString(3))).toSeq ===
      Seq((10L, "r10"), (20L, "r30"), (40L, null)))
  }

  test("asOf join: tolerance nulls matches farther than the bound, keeps the row") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "t", "lv")
    val right = Seq((1L, 95L, "r95"), (1L, 100L, "r100")).toDF("k", "rt", "rv")
    // Backward both match rt=100; |dt| is 0 and 100 → tolerance 50 nulls the second.
    val r = Joins.asOf(left, right, keys = Seq("k"), leftTs = "t", rightTs = "rt",
        rightCols = Seq("rv"), toleranceSec = Some(50L))
      .orderBy("t").collect()
    assert(r.map(x => (x.getLong(1), x.getString(3))).toSeq ===
      Seq((100L, "r100"), (200L, null)))
  }

  test("asOf join: tieBreak resolves equal-ts right rows per direction") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, 1L, "first"), (1L, 10L, 2L, "second"))
      .toDF("k", "rt", "seq", "rv")
    val back = Joins.asOf(left, right, keys = Seq("k"), leftTs = "t", rightTs = "rt",
      rightCols = Seq("rv"), tieBreak = Seq("seq")).collect()
    assert(back.head.getString(3) === "second") // backward: last in tieBreak order
    val fwd = Joins.asOf(left, right, keys = Seq("k"), leftTs = "t", rightTs = "rt",
      rightCols = Seq("rv"), tieBreak = Seq("seq"), direction = "forward").collect()
    assert(fwd.head.getString(3) === "first")   // forward: first in tieBreak order
  }

  test("sessionize splits on inactivity gaps; stats aggregate per session") {
    // user 1: t=0,100 in one session, t=5000 starts a new one (gap > 1800)
    val df = Seq((1L, 0L, 1L), (1L, 100L, 2L), (1L, 5000L, 3L), (2L, 50L, 4L))
      .toDF("user_id", "ts", "event_id")
    val r = Sessions.sessionize(df, "user_id", "ts", gapSec = 1800, tieBreak = Seq("event_id"))
      .orderBy("user_id", "ts").collect()
    assert(r.map(_.getLong(3)).toSeq === Seq(1L, 1L, 2L, 1L))
    val stats = Sessions.sessionStats(df, "user_id", "ts", 1800, Seq("event_id"))
      .orderBy("user_id", "session_num").collect()
    assert(stats.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(5))).toSeq ===
      Seq((1L, 1L, 2L, 100.0), (1L, 2L, 1L, 0.0), (2L, 1L, 1L, 0.0)))
  }

  test("connectedComponents labels chains with the component minimum") {
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val r = Components.keepDecision(Components.connectedComponents(edges))
      .orderBy("node").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq ===
      Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
        (10L, 10L, true), (11L, 10L, false)))
  }

  test("keepBest elects the highest score, min id on ties, and min id under constant score") {
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val attrs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 4L))
      .toDF("doc_id", "n_chars")
    val comps = Components.connectedComponents(edges)
    val r = Components.keepBest(comps, attrs, "doc_id", col("n_chars"))
      .orderBy("node").collect()
    // Cluster {1,2,3}: 2 and 3 tie at 9 → 2 keeps (min id among max
    // score), the cluster-min 1 does NOT. Cluster {10,11}: tie → 10.
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq ===
      Seq((1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
        (10L, 10L, true), (11L, 10L, false)))
    // Constant score degenerates to keepDecision's min-id election.
    val const = Components.keepBest(comps, attrs, "doc_id", lit(0))
      .orderBy("node").collect().map(x => (x.getLong(0), x.getBoolean(2)))
    val minId = Components.keepDecision(comps)
      .orderBy("node").collect().map(x => (x.getLong(0), x.getBoolean(2)))
    assert(const.toSeq === minId.toSeq)
  }

  test("epochMixture unrolls full epochs and admits a deterministic fractional prefix") {
    val docs = Seq(
      (1L, "a", "w x"), (2L, "a", "p q r"),        // stratum a: 5 tokens
      (3L, "b", "h i j k"), (4L, "b", "m n"),      // stratum b: 6 tokens
      (5L, "c", "z z z")).toDF("doc_id", "source", "text") // not in recipe
    // a: target 12 = 2 full epochs + frac 2; b: target 4 < 6 = downsample.
    val r = Sampling.epochMixture(docs, "source", "doc_id", "text",
      targets = Map("a" -> 12L, "b" -> 4L))
    val rows = r.collect().map(x =>
      (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(!rows.exists(_._2 == "c"), "stratum outside the recipe must be excluded")
    // Full epochs: every 'a' doc appears at epochs 0 and 1.
    for (e <- 0L to 1L)
      assert(rows.filter(x => x._2 == "a" && x._4 == e).map(_._1).sorted.toSeq ===
        Seq(1L, 2L))
    // Fractional epoch 2 carries at most frac=2 tokens: exactly one of
    // the docs (2 or 3 tokens each; the 3-token doc only if it hashes
    // first AND fits — it doesn't, so whichever doc is admitted the
    // token sum is <= 2, i.e. only doc 1 can be admitted).
    val fracA = rows.filter(x => x._2 == "a" && x._4 == 2L)
    assert(fracA.map(_._3).sum <= 2L)
    // 'b' never reaches a full epoch; its prefix carries <= 4 tokens.
    assert(rows.filter(_._2 == "b").forall(_._4 == 0L))
    assert(rows.filter(_._2 == "b").map(_._3).sum <= 4L)
    // Layout independence: same rows on a repartitioned input.
    val r2 = Sampling.epochMixture(docs.repartition(7), "source", "doc_id", "text",
      targets = Map("a" -> 12L, "b" -> 4L))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(rows.sorted.toSeq === r2.sorted.toSeq)
  }

  test("epochMixture rejects a target over a stratum with no tokens") {
    val docs = Seq((1L, "a", "w x")).toDF("doc_id", "source", "text")
    val e = intercept[IllegalArgumentException] {
      Sampling.epochMixture(docs, "source", "doc_id", "text",
        targets = Map("ghost" -> 10L))
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("epochMixture treats a zero target as exclusion, even over an absent stratum") {
    val docs = Seq((1L, "a", "w x"), (2L, "b", "p q")).toDF("doc_id", "source", "text")
    // 'ghost' has no corpus rows but its target is 0 ("exclude") — the
    // recipe must apply, not throw; 'b' target 0 emits nothing.
    val r = Sampling.epochMixture(docs, "source", "doc_id", "text",
      targets = Map("a" -> 2L, "b" -> 0L, "ghost" -> 0L))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.forall(_._2 == "a"), s"only stratum a may emit: ${r.toSeq}")
    assert(r.nonEmpty)
  }

  test("trainBpe learns the hand-computed merge sequence with deterministic tie-breaks") {
    // Corpus: "low" x3, "lower" x2, "lowest" x1 (as one doc each to
    // weight by occurrence). Pair counts round 1: (l,o)=6, (o,w)=6,
    // (w,e)=3, (e,r)=2, (e,s)=1, (s,t)=1 → tie 6/6 breaks to (l,o).
    // Round 2: (lo,w)=6 wins. Round 3: (low,e)=3. Round 4: (e,r)=2
    // vs (lowe,r)... after merge 3 'lower'=[lowe,r], 'lowest'=
    // [lowe,s,t] → (lowe,r)=2, (lowe,s)=1, (s,t)=1 → (lowe,r).
    val docs = (Seq.fill(3)("low") ++ Seq.fill(2)("lower") ++ Seq("lowest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = TextFunctions.trainBpe(docs, "text", numMerges = 4)
    assert(merges === Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
    // Early stop: more merges than pairs exist terminates cleanly.
    val all = TextFunctions.trainBpe(docs, "text", numMerges = 100)
    assert(all.length < 100)
    // After exhausting merges every word is one symbol.
    val enc = docs.select(
      TextFunctions.bpeEncode(spark, col("text"), all).as("e")).collect()
    assert(enc.forall(_.getSeq[String](0).length === 1))
  }

  test("trainBpe's maxVocab cap binds deterministically on the frequency-top slice") {
    // 3 distinct words; cap 2 keeps the two most frequent (ties by
    // word asc). "zz" (freq 1) is cut, so no merge can involve 'z'.
    val docs = (Seq.fill(5)("abab") ++ Seq.fill(3)("cdcd") ++ Seq("zz"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = TextFunctions.trainBpe(docs, "text", numMerges = 10, maxVocab = 2)
    assert(merges.nonEmpty)
    assert(!merges.exists { case (l, r) => l.contains("z") || r.contains("z") },
      s"capped-out word leaked into training: $merges")
    // Encoding still handles the capped-out word (char-split + any
    // applicable merges): the cap bounds TRAINING memory, not encode.
    val enc = docs.filter(col("text") === "zz")
      .select(TextFunctions.bpeEncode(spark, col("text"), merges)).head.getSeq[String](0)
    assert(enc === Seq("z", "z"))
    // Same corpus, cap large enough: identical result to uncapped.
    val a = TextFunctions.trainBpe(docs, "text", numMerges = 10, maxVocab = 3)
    val b = TextFunctions.trainBpe(docs, "text", numMerges = 10)
    assert(a === b)
  }

  test("bpeEncode applies merges greedily left-to-right; overlaps merge at even offsets") {
    val d = Seq((1L, "aaaa"), (2L, "aaa"), (3L, "Abab zz"), (4L, "")).toDF("id", "text")
    val enc = TextFunctions.bpeEncode(spark, col("text"),
      Seq(("a", "a"), ("a", "b")))
    val r = d.select(col("id"), enc.as("e")).collect()
      .map(x => x.getLong(0) -> x.getSeq[String](1).toList).toMap
    assert(r(1L) === List("aa", "aa"))
    assert(r(2L) === List("aa", "a")) // leftmost wins the overlap
    assert(r(3L) === List("ab", "ab", "z", "z")) // lowercased; (a,b) applies
    assert(r(4L) === Nil)
    // Concatenation invariant: subtokens rebuild the tokenized text.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = TextFunctions.trainBpe(docs, "text", numMerges = 10)
    val bad = docs.select(
        concat_ws("", TextFunctions.bpeEncode(spark, col("text"), merges)).as("re"),
        concat_ws("", TextFunctions.tokens(col("text"))).as("orig"))
      .filter(col("re") =!= col("orig")).count()
    assert(bad === 0L)
  }

  test("packSequences packs identically on any token counter with equal counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = TextFunctions.trainBpe(docs, "text", numMerges = 5)
    val bpeLen = size(TextFunctions.bpeEncode(spark, col("text"), merges))
    val packed = Packing.packSequences(docs, "doc_id", "text", seqLen = 128,
      tokenCounter = Some(bpeLen))
    // Offsets are contiguous under the BPE lengths: total span == sum.
    val tot = packed.agg(sum(col("n_tokens")), max(col("n_tokens") + col("begin_off")))
      .head
    assert(tot.getLong(0) === tot.getLong(1))
    // And the per-doc length really is the BPE length, not whitespace.
    val both = docs.select(col("doc_id"), bpeLen.cast("long").as("bl"))
      .join(packed.select(col("doc_id"), col("n_tokens")), "doc_id")
      .filter(col("bl") =!= col("n_tokens")).count()
    assert(both === 0L)
  }

  test("topTerms: corpus-wide terms score zero, rare frequent terms rank first") {
    val d = Seq((1L, "apple apple banana the"), (2L, "the banana cherry"), (3L, "the dog"))
      .toDF("doc_id", "text")
    val r = TextFunctions.topTerms(d, "doc_id", "text", k = 2)
    val d1 = r.filter(col("doc_id") === 1).orderBy(col("tfidf").desc).collect()
    assert(d1.head.getString(1) === "apple") // tf=2, df=1 → top
    // 'the' is in every doc → idf = ln(1) = 0 → never beats a rare term
    val theRows = r.filter(col("term") === "the").collect()
    assert(theRows.forall(_.getDouble(4) === 0.0))
  }

  test("boilerplateLines surfaces segments repeated across documents") {
    val docs = Seq(
      (1L, "Subscribe to our newsletter. unique alpha text"),
      (2L, "Subscribe to our newsletter. unique beta text"),
      (3L, "Subscribe to our newsletter. unique gamma text"),
      (4L, "totally different content")).toDF("doc_id", "text")
    val r = CorpusHygiene.boilerplateLines(docs, "doc_id", "text", minDocs = 3).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ===
      Seq(("Subscribe to our newsletter", 3L)))
  }

  test("contaminationPairs flags docs overlapping the benchmark, not self") {
    val corpus = Seq(
      (1L, "a b c d e f g"), (2L, "x y z w q r s"), (10L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 10L)
    val r = CorpusHygiene.contaminationPairs(corpus, bench, "doc_id", "text",
      n = 3, minShared = 3).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ===
      Seq((1L, 10L, 5L))) // 5 shared trigram shingles; doc 2 and self excluded
  }

  test("decon posting-join fallback agrees with the expression path and switches at the budget") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = corpus.filter(col("doc_id") % 10 === 0)
    def run(budget: Long) = CorpusHygiene.fuzzyContaminationPairs(
      corpus, bench, "doc_id", "text", n = 3, threshold = 0.3,
      maxDriverShingles = budget)
    val viaExpr = run(Long.MaxValue)
    val viaJoin = run(0L)
    // The physical strategy really differs: only the driver path plans
    // the inverted-index expression.
    assert(viaExpr.queryExecution.analyzed.toString.contains("graft_bench_overlap"))
    assert(!viaJoin.queryExecution.analyzed.toString.contains("graft_bench_overlap"))
    // Identical output, bitwise: both paths compute jaccard from the
    // same three integers.
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val a = rows(viaExpr); val b = rows(viaJoin)
    assert(a === b)
    assert(a.nonEmpty, "fixture must produce at least one fuzzy pair")
    // The switch sits exactly at the benchmark's total shingle count:
    // budget == total stays on the expression path, one less crosses.
    val total = NearDup.shingleSets(bench, "doc_id", "text", 3)
      .agg(sum(size(col("shingles")))).head.getLong(0)
    assert(run(total).queryExecution.analyzed.toString.contains("graft_bench_overlap"))
    assert(!run(total - 1).queryExecution.analyzed.toString.contains("graft_bench_overlap"))
  }

  test("assignSplitsDedupSafe keeps near-dup clusters on one split side") {
    // Two exact near-dup pairs + singletons; pair members MUST agree
    // on split, singletons must keep their plain assignSplits label.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven"),
      (5L, "totally unrelated content lives here"),
      (6L, "another singleton document text body")).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.5, "val" -> 0.5)
    val r = Sampling.assignSplitsDedupSafe(docs, "doc_id", "text", splits)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val byId = r.map(x => x._1 -> x._3).toMap
    assert(byId(1L) === byId(2L))
    assert(byId(3L) === byId(4L))
    // Cluster members hash by the cluster minimum: doc 2 carries doc
    // 1's group key, so its split equals what doc 1 gets alone.
    val plain = Sampling.assignSplits(docs, "doc_id", splits)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(byId(1L) === plain(1L))
    assert(byId(5L) === plain(5L))
    assert(byId(6L) === plain(6L))
    // group_key is the cluster min for members, own id for singletons.
    val keys = r.map(x => x._1 -> x._2).toMap
    assert(keys(1L) === 1L && keys(2L) === 1L && keys(4L) === 3L && keys(5L) === 5L)
  }

  test("fuzzyContaminationPairs thresholds on Jaccard, not raw count") {
    // Doc 1 = exact copy of bench 10 (j = 1.0); doc 2 = edited copy
    // (4 of its 6 trigrams shared, j = 4/7 ≈ 0.57); doc 3 = long doc
    // with the SAME 4 shared shingles diluted by a disjoint tail
    // (j = 4/19 ≈ 0.21) — the raw count can't tell 2 from 3, Jaccard
    // can.
    val corpus = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f x y"),
      (3L, "a b c d e f p q r s t u v w m n o j k l"),
      (10L, "a b c d e f g")).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 10L)
    val r = CorpusHygiene.fuzzyContaminationPairs(corpus, bench, "doc_id", "text",
      n = 3, threshold = 0.5).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).sortBy(_._1)
    assert(r.map(x => (x._1, x._2)).toSeq === Seq((1L, 10L), (2L, 10L)))
    assert(r(0)._3 === 1.0)
    assert(math.abs(r(1)._3 - 4.0 / 7.0) < 1e-12)
    // Doc 3 clears a dropped bar only: flagged at 0.2, not at 0.5.
    val loose = CorpusHygiene.fuzzyContaminationPairs(corpus, bench, "doc_id", "text",
      n = 3, threshold = 0.2).collect().map(_.getLong(0)).sorted
    assert(loose.toSeq === Seq(1L, 2L, 3L))
  }

  test("exactByHash groups identical content under one hash") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val r = Dedup.exactByHash(df, "text", "doc_id").orderBy("doc_id").collect()
    assert(r.length === 2)
    assert(r(0).getAs[Long]("doc_id") === 1L && r(0).getAs[Long]("group_size") === 2L)
  }

  test("tokenBudgetSample admits docs in hash order until the stratum budget") {
    val df = Seq(
      (1L, "a", "one two three"),          // 3 tokens
      (2L, "a", "one two three four"),     // 4
      (3L, "a", "one two"),                // 2
      (4L, "b", "one two three four five") // 5, no budget for b
    ).toDF("doc_id", "source", "text")
    val r = Sampling.tokenBudgetSample(df, "source", "doc_id", "text",
      budgets = Map("a" -> 6L))
    val rows = r.orderBy("cum_tokens").collect()
    // Budget 6 admits a prefix of the hash-ordered 'a' docs; stratum
    // 'b' drops entirely. Each admitted row keeps cum <= 6.
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("source") == "a"))
    assert(rows.forall(_.getAs[Long]("cum_tokens") <= 6L))
    // Running totals are consistent: each cum = previous cum + n_tokens.
    rows.foldLeft(0L) { (prev, row) =>
      val cum = row.getAs[Long]("cum_tokens")
      assert(cum === prev + row.getAs[Long]("n_tokens"))
      cum
    }
    // Determinism: a second run returns the identical admitted set.
    val again = Sampling.tokenBudgetSample(df, "source", "doc_id", "text",
      budgets = Map("a" -> 6L)).orderBy("cum_tokens").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ===
      again.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("capPerStratum truncates oversized strata, keeps small ones whole") {
    val rows = (1L to 40L).map(i => (i, "big", s"doc $i")) ++
      (41L to 43L).map(i => (i, "small", s"doc $i"))
    val df = rows.toDF("doc_id", "source", "text")
    val r = Sampling.capPerStratum(df, "source", "doc_id", cap = 10)
    val bySrc = r.groupBy("source").count().collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("count")).toMap
    assert(bySrc === Map("big" -> 10L, "small" -> 3L))
    // Rank is 1-based, dense, capped; every input column survives.
    val big = r.filter(col("source") === "big")
      .orderBy("stratum_rank").collect()
    assert(big.map(_.getAs[Long]("stratum_rank")).toSeq === (1L to 10L))
    assert(big.forall(_.getAs[String]("text").startsWith("doc ")))
    // Keep-direction stability: capping a SUPERSET never reorders the
    // survivors' relative hash order — docs kept from the subset that
    // survive the superset cap keep their relative ranks.
    val sup = Sampling.capPerStratum(
      df.unionAll(Seq((100L, "big", "late")).toDF("doc_id", "source", "text")),
      "source", "doc_id", cap = 10)
    val supIds = sup.filter(col("source") === "big")
      .orderBy("stratum_rank").collect().map(_.getAs[Long]("doc_id")).toSeq
    val subIds = big.map(_.getAs[Long]("doc_id")).toSeq
    assert(supIds.filter(subIds.contains) === subIds.filter(supIds.contains))
  }

  test("funnel counts strict-after first-touch conversions per step") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full conversion
      (2L, 10L, "click"), (2L, 20L, "view"),                        // click precedes view: stops at s0
      (3L, 10L, "view"), (3L, 10L, "click"),                        // same ts: not strictly after
      (4L, 5L, "purchase"), (4L, 10L, "view"), (4L, 20L, "click")   // stale purchase doesn't count
    ).toDF("user_id", "ts", "event_type")
    val r = graft.operators.Sessions.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("s0_view" -> 4L, "s1_click" -> 2L, "s2_purchase" -> 1L))
  }

  test("retention cohorts users by first-event week and counts active cells once") {
    val ev = Seq(
      // u1: cohort Mon 2024-01-01, active again in week of Jan 8
      (1L, "2024-01-03 10:00:00"), (1L, "2024-01-04 11:00:00"), (1L, "2024-01-10 09:00:00"),
      // u2: same cohort, active in cohort week only
      (2L, "2024-01-01 00:00:00"),
      // u3: cohort Mon 2024-01-08
      (3L, "2024-01-08 23:59:59")
    ).toDF("user_id", "ts_s").select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val r = graft.operators.Sessions.retention(ev, "user_id", "ts")
      .collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) -> x.getLong(2)).toMap
    // Two events of u1 inside one week collapse to one active cell.
    assert(r === Map(
      ("2024-01-01", 0) -> 2L,   // u1 + u2
      ("2024-01-01", 1) -> 1L,   // u1 returns
      ("2024-01-08", 0) -> 1L))  // u3's own cohort
  }

  test("vocab: global+doc frequencies, deterministic top-k boundary, TakeOrdered plan") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "THE dog")
    ).toDF("doc_id", "text")
    val v = graft.functions.TextFunctions.vocab(docs, "doc_id", "text", k = 2)
    // top-k order: count desc, token asc — "cat" beats "dog"/"sat"/"ran" ties
    val rows = v.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("the", 3L, 3L), ("cat", 2L, 2L)))
    // ORDER BY + LIMIT must plan as a per-partition top-k heap, not a
    // global sort (the 100 TB difference).
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("zscoreOutliers: flags per-group outliers; constant and single-row groups yield none") {
    val df = (Seq.fill(9)(("a", 0.0)) ++ Seq(("a", 10.0)) ++ // z = 9/sqrt(10) ≈ 2.85
      Seq.fill(5)(("b", 7.0)) ++                             // σ = 0
      Seq(("c", 99.0)))                                      // single row: σ null
      .toDF("grp", "v")
    val out = Quality.zscoreOutliers(df, "grp", "v", threshold = 2.0).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("grp") === "a")
    assert(math.abs(out.head.getAs[Double]("zscore") - 9.0 / math.sqrt(10.0)) < 1e-12)
  }

  test("gapPercentiles: exact interpolated p50/p90 over per-user same-type gaps") {
    val ev = Seq(
      (1L, 0L, "a"), (1L, 1000000L, "a"), (1L, 3000000L, "a"), (1L, 6000000L, "a"),
      (2L, 0L, "b") // single event: no gap, type b absent from output
    ).toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))
    val r = graft.operators.Sessions.gapPercentiles(ev, "user_id", "ts", "event_type")
      .collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("event_type") === "a")
    assert(row.getAs[Long]("n_gaps") === 3L)
    assert(row.getAs[Double]("p50_gap_us") === 2000000.0)
    // p90 over sorted gaps [1e6, 2e6, 3e6]: index 0.9*(3-1)=1.8 → 2.8e6
    assert(math.abs(row.getAs[Double]("p90_gap_us") - 2800000.0) < 1e-6)
  }

  test("SparkEntry.entry returns rows (the driver's smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("transitionMatrix: per-user ordered bigram counts with outgoing shares") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),  // a→b, b→a
      (2L, 1L, "a"), (2L, 2L, "b"),                 // a→b
      (3L, 1L, "c")                                 // single event: no transition
    ).toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))
    val r = graft.operators.Sessions.transitionMatrix(ev, "user_id", "ts", "event_type")
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getDouble(3))).toMap
    assert(r === Map(
      ("a", "b") -> (2L, 1.0),  // a's only outgoing edge
      ("b", "a") -> (1L, 1.0))) // b's only outgoing edge
    // users never chain into each other: no b→a from user1→user2 seam
    assert(!r.contains(("a", "a")) && !r.contains(("c", "a")))
  }

  test("rollingActiveUsers: trailing-window distinct counts, observed days only") {
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-01"), // same user+day collapses
      (2L, "2024-01-03"),
      (1L, "2024-01-10")                      // outside user 2's window
    ).toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val r = graft.operators.Sessions.rollingActiveUsers(ev, "user_id", "ts", windowDays = 7)
      .collect().map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    // Jan 3 sees user 1 (active Jan 1, within 7 days) + user 2; Jan 10
    // sees only user 1 (Jan 3 + 6 = Jan 9 < Jan 10). Jan 2, 4..9 are
    // not observed activity days → absent.
    assert(r === Map("2024-01-01" -> 1L, "2024-01-03" -> 2L, "2024-01-10" -> 1L))
  }

  test("histogram: fixed-width bins with half-open edges, negatives floor down") {
    val df = Seq(("a", 0.0), ("a", 49.99), ("a", 50.0), ("a", 125.0), ("b", -0.01))
      .toDF("grp", "v")
    val r = graft.operators.Sketches.histogram(df, "v", binWidth = 50.0, groupCols = Seq("grp"))
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)) -> x.getLong(3)).toMap
    assert(r === Map(
      ("a", 0L, 0.0) -> 2L,      // 0.0 and 49.99
      ("a", 1L, 50.0) -> 1L,     // 50.0 belongs to [50, 100)
      ("a", 2L, 100.0) -> 1L,
      ("b", -1L, -50.0) -> 1L))  // floor, not truncate-toward-zero
  }

  test("assignSplits: total split, sane proportions, stable under corpus growth") {
    val df = spark.range(2000).toDF("id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val s1 = Sampling.assignSplits(df, "id", splits)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fractions sum to 1.0 → every row labeled, proportions ~ fractions
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1600L && counts("val") > 40L && counts("test") > 40L)
    // A row's split never depends on what else is in the corpus: the
    // same keys re-labeled inside a halved corpus keep their splits.
    val sub = Sampling.assignSplits(df.filter(col("id") < 1000), "id", splits)
    val m1 = s1.filter(col("id") < 1000).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m2 = sub.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m1 === m2)
    // Partial fractions leave the remainder unlabeled (null), not
    // silently swallowed by the last range.
    val part = Sampling.assignSplits(df, "id", Seq("sample" -> 0.1))
    assert(part.filter(col("split").isNull).count() > 1500L)
  }

  test("chunkDocuments: overlap carries tokens, tail shortens, empty docs drop") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "   ")).toDF("doc_id", "text")
    val r = graft.operators.Packing.chunkDocuments(df, "doc_id", "text",
      maxTokens = 4, overlap = 1).orderBy("doc_id", "chunk_id").collect()
    // doc1: stride 3 → starts 0,3,6,9 → token counts 4,4,4,1
    val d1 = r.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getLong(3)).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(d1.map(_.getLong(2)).toSeq === Seq(0L, 3L, 6L, 9L))
    assert(d1(0).getString(4) === "t1 t2 t3 t4")
    assert(d1(1).getString(4) === "t4 t5 t6 t7") // t4 carried by the overlap
    assert(d1(3).getString(4) === "t10")          // short tail
    // doc2 fits in one chunk; doc3 (whitespace only) yields none
    assert(r.filter(_.getLong(0) == 2L).map(_.getString(4)).toSeq === Seq("only three tokens"))
    assert(!r.exists(_.getLong(0) == 3L))
  }

  test("removeContaminated drops exactly the flagged docs, keeps the benchmark") {
    val corpus = Seq(
      (1L, "a b c d e f g"), (2L, "x y z w q r s"), (10L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 10L)
    val kept = CorpusHygiene.removeContaminated(corpus, bench, "doc_id", "text",
      n = 3, minShared = 3).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(2L, 10L)) // doc 1 contaminated; 10 is the benchmark itself
  }

  test("removeBoilerplate drops repeated lines, rebuilds text in order") {
    val docs = Seq(
      (1L, "Shared header. body one. tail one"),
      (2L, "Shared header. body two. tail two"),
      (3L, "Shared header. body three. tail three"),
      (4L, "Shared header. Shared header. Shared header")).toDF("doc_id", "text")
    val r = CorpusHygiene.removeBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(r.length === 4)
    assert(r(0).getAs[Long]("n_lines") === 3L && r(0).getAs[Long]("n_kept") === 2L)
    // Kept segments rejoined in original order with the '. ' separator.
    assert(r(0).getAs[String]("clean_text") === "body one. tail one")
    // A document that was pure boilerplate survives, empty.
    assert(r(3).getAs[Long]("n_kept") === 0L)
    assert(r(3).getAs[String]("clean_text") === "")
  }

  test("lengthBucketBatches: full batches of batchSize, buckets respect boundaries") {
    val rows = (1L to 20L).map(i => (i, Seq.fill(if (i <= 12) 3 else 10)("w").mkString(" ")))
    val df = rows.toDF("doc_id", "text")
    val r = Packing.lengthBucketBatches(df, "doc_id", "text",
      boundaries = Seq(5), batchSize = 5).collect()
    val byDoc = r.map(x => x.getAs[Long]("doc_id") ->
      (x.getAs[Int]("len_bucket"), x.getAs[Long]("batch_id"))).toMap
    // Short docs (3 tokens) in bucket 0, long (10 tokens) in bucket 1.
    (1L to 12L).foreach(i => assert(byDoc(i)._1 === 0))
    (13L to 20L).foreach(i => assert(byDoc(i)._1 === 1))
    // Batches never mix buckets and never exceed batchSize; 12 docs at
    // size 5 → batches of 5, 5, 2.
    val sizes = r.groupBy(x => (x.getAs[Int]("len_bucket"), x.getAs[Long]("batch_id")))
      .view.mapValues(_.length).toMap
    assert(sizes.values.forall(_ <= 5))
    assert(sizes.filter(_._1._1 == 0).values.toSeq.sorted === Seq(2, 5, 5))
    assert(sizes.filter(_._1._1 == 1).values.toSeq.sorted === Seq(3, 5))
  }

  test("corpusCard: hand-computed dataset-card numbers") {
    val df = Seq(
      (1L, "the cat and the dog"),     // en (stopwords the/and)
      (2L, "the cat and the dog"),     // exact dup of 1
      (3L, "la de que y en un")).toDF("doc_id", "text")
    val r = CorpusHygiene.corpusCard(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_tokens") === 16L)
    // Distinct words: the,cat,and,dog,la,de,que,y,en,un = 10.
    assert(r.getAs[Long]("n_vocab") === 10L)
    assert(r.getAs[Long]("n_dup_docs") === 1L)
    assert(r.getAs[Long]("n_en") === 2L)
  }

  test("bpePairStats: hand-computed weighted pair counts over the vocabulary") {
    // Corpus: "ab ab ba c" — vocab {ab:2, ba:1, c:1}; 'c' too short.
    // Pairs: (a,b) weight 2 from "ab", (b,a) weight 1 from "ba".
    val df = Seq((1L, "ab ab ba"), (2L, "c")).toDF("doc_id", "text")
    val r = TextFunctions.bpePairStats(df, "text")
      .orderBy(desc("freq")).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq === Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("hardNegatives: k closest DIFFERENT-label vectors, never the query's own label") {
    // Two labels, vectors on a line: label-0 at low coords, label-1 at
    // high coords; every query must pull only cross-label neighbors.
    val rows = (0 until 12).map { i =>
      (i.toLong, Array.fill(4)(0.1f * (i + 1)), i % 2)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = graft.operators.EmbeddingAnn.hardNegatives(
      df, df.filter(col("vec_id") < 3), "vec_id", "embedding", "label", k = 4)
      .collect()
    val lab = rows.map(r => r._1 -> r._3).toMap
    assert(out.length === 3 * 4)
    out.foreach { r =>
      assert(lab(r.getAs[Long]("query_id")) !== lab(r.getAs[Long]("neighbor_id")))
    }
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3, 4))
    }
  }

  test("BloomHitCount: no false negatives, false-positive rate near theory") {
    import graft.plans.BloomHitCount
    val keys = Array.tabulate(5000)(i => (i.toLong * 2654435761L) % 4294967296L)
    val bits = BloomHitCount.build(keys, bitsPerKey = 20, k = 6)
    // Every inserted key MUST hit — a Bloom filter cannot miss.
    assert(keys.forall(BloomHitCount.mightContain(bits, 6, _)))
    // Non-keys: 20 bits/key with k=6 gives FPR ~ 5e-4; allow 10x slack
    // on 20k probes (expected ~10 false hits, bound at 100).
    val nonKeys = Array.tabulate(20000)(i => 4294967296L + i.toLong)
    val falseHits = nonKeys.count(BloomHitCount.mightContain(bits, 6, _))
    assert(falseHits < 100, s"FPR too high: $falseHits/20000")
  }

  test("BloomHitCount: distributed build is bit-identical to the driver build") {
    import graft.plans.BloomHitCount
    val keys = Array.tabulate(3000)(i => (i.toLong * 2654435761L) % 4294967296L)
    val driverBits = BloomHitCount.build(keys, bitsPerKey = 20, k = 6)
    // 7 partitions: the per-partition fold + OR-reduce must commute to
    // the same array regardless of how keys scatter.
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(keys.toSeq.map(org.apache.spark.sql.Row(_)), 7),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.LongType))))
    val distBits = BloomHitCount.buildDistributed(df, bitsPerKey = 20, k = 6)
    assert(java.util.Arrays.equals(driverBits, distBits))
    // Loud on the wrong shape.
    intercept[IllegalArgumentException] {
      BloomHitCount.buildDistributed(df.selectExpr("CAST(s AS INT) AS s", "s AS t"), 20, 6)
    }
  }

  test("bloomDecontaminate flags everything the exact rule flags") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // contains bench 4-gram run
      (2L, "one two three four five six seven eight"),
      (3L, "totally unrelated words here nothing shared at all")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five")).toDF("doc_id", "text")
    val keptBloom = CorpusHygiene.bloomDecontaminate(corpus, bench, "doc_id", "text",
      n = 3, minShared = 2).select("doc_id").collect().map(_.getLong(0)).toSet
    val keptExact = CorpusHygiene.removeContaminated(corpus, bench, "doc_id", "text",
      n = 3, minShared = 2).select("doc_id").collect().map(_.getLong(0)).toSet
    // Bloom can only over-flag: its survivor set is a subset of exact's.
    assert(keptBloom.subsetOf(keptExact))
    assert(keptExact === Set(3L))
    val stats = CorpusHygiene.bloomDeconStats(corpus, bench, "doc_id", "text",
      n = 3, minShared = 2).collect().head
    assert(stats.getAs[Long]("n_corpus") === 3L)
    assert(stats.getAs[Long]("n_exact") === 2L)
    assert(stats.getAs[Long]("n_missed") === 0L)
    assert(stats.getAs[Boolean]("fp_ok"))
  }

  test("duplicatePassages counts cross-doc and within-doc repeated windows") {
    // W=3. Docs 1 and 2 share the 5-token passage "one two three four
    // five" (3 windows each); doc 3 repeats its own 3-token window;
    // doc 4 is unique; doc 5 is shorter than the window.
    val docs = Seq(
      (1L, "alpha beta one two three four five"),
      (2L, "gamma delta one two three four five"),
      (3L, "x y z x y z"),
      (4L, "p q r s t u v"),
      (5L, "a b")).toDF("doc_id", "text")
    val r = CorpusHygiene.duplicatePassages(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("n_windows")).toSeq === Seq(5L, 5L, 4L, 5L, 0L))
    // Docs 1/2: the 3 windows inside the shared passage are duplicated;
    // the 2 windows straddling the unique prefix are not.
    assert(r(0).getAs[Long]("n_dup") === 3L)
    assert(r(1).getAs[Long]("n_dup") === 3L)
    // Doc 3: "x y z" occurs twice WITHIN the doc -> both occurrences
    // count ("y z x" and "z x y" occur once each).
    assert(r(2).getAs[Long]("n_dup") === 2L)
    assert(r(3).getAs[Long]("n_dup") === 0L)
    assert(r(4).getAs[Long]("n_dup") === 0L && r(4).getAs[Double]("dup_ratio") === 0.0)
    assert(r(0).getAs[Double]("dup_ratio") === 0.6)
    // The drop rule removes only coverage STRICTLY above the bound:
    // docs 1/2 (0.6) drop; doc 3 sits exactly at 0.5 and survives.
    val kept = CorpusHygiene.removeDuplicatePassageDocs(docs, "doc_id", "text",
      window = 3, maxDupRatio = 0.5).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(3L, 4L, 5L))
  }

  test("piiRedact: dotted quad inside an email is consumed by <EMAIL>, not counted as IPv4") {
    val df = Seq(
      (1L, "reach bob@10.2.3.4.example.com from 192.168.0.1 please"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val r = QualitySignals.piiRedact(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_emails") === 1L)
    // The quad in the email domain vanished with the address — only the
    // standalone IP is counted, and counts equal actual replacements.
    assert(r(0).getAs[Long]("n_ipv4") === 1L)
    assert(r(0).getAs[String]("redacted") === "reach <EMAIL> from <IP> please")
    assert(r(1).getAs[Long]("n_emails") === 0L && r(1).getAs[Long]("n_ipv4") === 0L)
  }

  test("bigramLmScore: hand-computed Laplace probabilities; in-domain beats noise") {
    // Reference "a b a b": vocab {a, b} (V=2), unigrams a:2 b:2,
    // bigrams "a b":2 "b a":1.
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),   // P(b|a) = (2+1)/(2+2) = 0.75
      (2L, "c c"),   // unseen: (0+1)/(0+2) = 0.5
      (3L, "a")      // no bigram → absent from the result
    ).toDF("doc_id", "text")
    val r = QualitySignals.bigramLmScore(ref, docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(math.abs(r(0).getAs[Double]("avg_logprob") - math.log(0.75)) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("ppl") - 1 / 0.75) < 1e-12)
    assert(r(1).getAs[Long]("n_bigrams") === 1L)
    assert(math.abs(r(1).getAs[Double]("avg_logprob") - math.log(0.5)) < 1e-12)
    // The in-domain doc is more probable (lower perplexity) than noise.
    assert(r(0).getAs[Double]("ppl") < r(1).getAs[Double]("ppl"))
  }

  test("temperatureMixture: alpha=1 is the natural distribution; alpha=0 flattens") {
    import graft.operators.Sampling
    // sA: 4 docs x 25 tokens = 100; sB: 4 docs x 100 tokens = 400.
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = ((1L to 4L).map(i => (i, "sA", words(25))) ++
      (11L to 14L).map(i => (i, "sB", words(100)))).toDF("doc_id", "source", "text")
    // alpha=1, budget = total tokens: budgets equal the natural totals
    // and every document is admitted.
    assert(Sampling.temperatureMixture(docs, "source", "doc_id", "text",
      totalBudget = 500L, alpha = 1.0).count() === 8)
    // alpha=0: uniform budgets (250 each) — sA fully admitted, sB
    // capped at 2 docs (200 of 250; a third would reach 300).
    val flat = Sampling.temperatureMixture(docs, "source", "doc_id", "text",
        totalBudget = 500L, alpha = 0.0)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat === Map("sA" -> 4L, "sB" -> 2L))
  }

  test("perplexityBuckets cuts the distribution into ordered thirds; approx path agrees") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val r = QualitySignals.perplexityBuckets(ref, docs, "doc_id", "text")
    val rows = r.collect().map(x =>
      (x.getLong(0), x.getAs[Double]("ppl"), x.getString(4)))
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // Buckets are ordered by perplexity and near-equal in size.
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    val n = rows.length
    byBucket.values.foreach(b =>
      assert(math.abs(b.size - n / 3.0) <= 2, s"tercile sizes skewed: ${b.size} of $n"))
    // The sketch path (the 100 TB form) assigns the same label off the
    // cut boundaries; disagreement is confined to sketch tolerance.
    val approx = QualitySignals.perplexityBuckets(ref, docs, "doc_id", "text",
        exact = false)
      .collect().map(x => x.getLong(0) -> x.getString(4)).toMap
    val exact = rows.map(x => x._1 -> x._3).toMap
    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree >= n - 2, s"approx path diverged on ${n - agree} docs")
  }

  test("importanceScore: target-like docs rank above general-like docs") {
    val target = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val general = Seq((100L, "c d c d")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "x y")).toDF("doc_id", "text")
    val r = QualitySignals.importanceScore(target, general, docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val ratio = r.map(x => x.getLong(0) -> x.getAs[Double]("log_ratio")).toMap
    assert(ratio(1L) > 0)          // in-domain bigram: more probable under target
    assert(ratio(2L) < 0)          // general bigram: more probable under general
    assert(math.abs(ratio(3L)) < 1e-12) // unseen everywhere: ratio exactly 0
    // The fused single-explode form must equal two independent
    // bigramLmScore passes joined on the id — same rows, same ratios.
    val twoCall = QualitySignals.bigramLmScore(target, docs, "doc_id", "text")
      .select(col("doc_id"), col("avg_logprob").as("lp_t"))
      .join(QualitySignals.bigramLmScore(general, docs, "doc_id", "text")
        .select(col("doc_id"), col("avg_logprob").as("lp_g")), Seq("doc_id"))
      .orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> (x.getDouble(1) - x.getDouble(2))).toMap
    ratio.foreach { case (id, lr) => assert(math.abs(lr - twoCall(id)) < 1e-12) }
  }

  test("repetitionSignals: hashed-gram metrics equal the string-gram form") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),
      (2L, "all words here are different ones"),
      (3L, "one")).toDF("doc_id", "text")
    val r = QualitySignals.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: four identical "spam spam" grams → top frac 1.0, dup frac 3/4.
    assert(r.length === 2) // doc 3 has no 2-grams
    assert(r(0).getAs[Long]("n_2grams") === 4L)
    assert(r(0).getAs[Double]("top_2gram_frac") === 1.0)
    assert(r(0).getAs[Double]("dup_2gram_frac") === 0.75)
    // doc 2: five distinct grams, no repeats.
    assert(r(1).getAs[Long]("n_2grams") === 5L)
    assert(r(1).getAs[Double]("dup_2gram_frac") === 0.0)
  }

  test("bm25Search matches an independent scorer; ranks and ties deterministic") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry cherry"),
      (4L, "durian"),
      (5L, "apple cherry")).toDF("doc_id", "text")
    val terms = Seq("apple", "cherry")
    val got = TextFunctions.bm25Search(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r =>
        (r.getLong(0), r.getAs[Long]("n_terms"), r.getAs[Double]("score")))

    // Independent plain-loop BM25 over the same corpus.
    val corpus = Map(1L -> "apple banana apple", 2L -> "banana cherry",
      3L -> "cherry cherry cherry cherry", 4L -> "durian", 5L -> "apple cherry")
      .map { case (id, s) => id -> s.split("\\s+").toSeq }
    val n = corpus.size
    val avgdl = corpus.values.map(_.length).sum.toDouble / n
    val dfq = terms.map(t => t -> corpus.values.count(_.contains(t))).toMap
    def weight(toks: Seq[String], t: String): Option[Double] = {
      val tf = toks.count(_ == t)
      if (tf == 0) None
      else {
        val idf = math.log(1.0 + (n - dfq(t) + 0.5) / (dfq(t) + 0.5))
        Some(idf * (tf * (1.2 + 1.0)) /
          (tf + 1.2 * ((1.0 - 0.75) + 0.75 * toks.length / avgdl)))
      }
    }
    val expected = corpus.toSeq.flatMap { case (id, toks) =>
      val ws = terms.flatMap(weight(toks, _))
      if (ws.isEmpty) None
      else Some((id, ws.length.toLong, ws.foldLeft(0.0)(_ + _)))
    }.sortBy { case (id, _, s) => (-s, id) }

    assert(got.map(_._1).toSeq === expected.map(_._1)) // exact ranking
    got.zip(expected).foreach { case ((_, nt, s), (_, ent, es)) =>
      assert(nt === ent)
      assert(math.abs(s - es) < 1e-12, s"score $s != $es")
    }
    // doc 4 matches nothing and must be absent; doc 5 matched both terms
    assert(!got.exists(_._1 == 4L))
    assert(got.find(_._1 == 5L).get._2 === 2L)
    // k truncates after the deterministic (score desc, id asc) order
    val top2 = TextFunctions.bm25Search(docs, "doc_id", "text", terms, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top2 === expected.take(2).map(_._1))
    intercept[IllegalArgumentException] {
      TextFunctions.bm25Search(docs, "doc_id", "text", Seq("a", "a"), k = 1)
    }
  }
}
