package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for a training-data pipeline: tokenization,
  * language-ID, quality scoring, fingerprinting, shingling.
  *
  * Everything here is built from codegen'd `functions._` or array
  * higher-order functions — no Scala UDFs — so the expressions stay
  * inside Catalyst, are column-prunable, and never serialize rows out
  * of Tungsten format. All functions are deterministic (no RNG, no
  * clock) so results are reproducible across retries and cluster sizes.
  */
object TextFunctions {

  // Under-split-source mitigation before tokenize-heavy passes; a
  // no-op when the scan is already well-split (see Skew.spread).
  private def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.operators.Skew.spread(df)

  /** Canonical ingestion-time cleanup (native expression
    * plans.NfcClean): Unicode NFC normalization, C0/DEL control-char
    * strip, whitespace-run collapse + trim. Run this BEFORE hashing /
    * shingling / fingerprinting — without NFC the same word arrives
    * as different codepoint sequences from different crawls and every
    * exact-match operator silently misses the duplicate.
    */
  def normalizeText(spark: org.apache.spark.sql.SparkSession, text: Column): Column = {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    call_function("graft_nfc_clean", text)
  }

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: alpha runs, digit runs, and single
    * non-alphanumeric marks counted separately (a cheap, deterministic
    * stand-in for a real BPE vocab — the plumbing a tokenizer-aware
    * pipeline needs, without shipping a vocab file).
    */
  def subTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  // Stopword marker sets per language. Tiny fixed tables — the n-gram
  // heuristic of fastText-style lang-ID reduced to its deterministic core.
  val EnStop = Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "with")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu")
  val EsStop = Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para")
  val FrStop = Seq("le", "la", "les", "de", "et", "un", "est", "pour", "dans", "que")

  private def hitCount(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** Language-ID: argmax of per-language stopword hits; ties break in
    * (en, de, es, fr) order; zero hits everywhere → "und".
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = hitCount(t, EnStop); val de = hitCount(t, DeStop)
    val es = hitCount(t, EsStop); val fr = hitCount(t, FrStop)
    val best = greatest(en, de, es, fr)
    when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(de === best, lit("de"))
      .when(es === best, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Stopword ratio (English set) — a quality signal: natural prose has
    * a stable ~0.3–0.5; keyword soup and boilerplate sit near 0.
    */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(hitCount(t, EnStop).cast("double") / size(t).cast("double"))
  }

  /** Punctuation-character ratio over non-space characters. */
  def punctRatio(text: Column): Column = {
    val noSpace = regexp_replace(text, "\\s", "")
    when(length(noSpace) === 0, lit(0.0))
      .otherwise(
        (length(noSpace) - length(regexp_replace(noSpace, "[.,!?;:'\"()\\[\\]{}-]", "")))
          .cast("double") / length(noSpace).cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double")
        / size(t).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards prose-like stopword
    * density, moderate token length, and low punctuation noise.
    * Deterministic linear blend — the shape of a Gopher/C4-style rule
    * filter, tuned for the synthetic corpus.
    */
  def qualityScore(text: Column): Column = {
    val sw = stopwordRatio(text)
    val mtl = meanTokenLen(text)
    val pr = punctRatio(text)
    val lenOk = when(tokenCount(text).between(5, 10000), lit(1.0)).otherwise(lit(0.0))
    val mtlOk = when(mtl.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    least(lit(1.0),
      sw * 2.0 * lit(0.4) + mtlOk * lit(0.3) + lenOk * lit(0.2) + (lit(1.0) - least(pr * 5.0, lit(1.0))) * lit(0.1))
  }

  /** Canonical content fingerprint: md5 of the whitespace-normalized,
    * lowercased text. Identical output in any ANSI engine with md5 —
    * the exact-dedup key at corpus scale.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " ").cast("binary"))

  /** Word n-gram shingles: ["a b c", "b c d", ...]. Input for MinHash /
    * Jaccard near-dup. Empty array when fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
  }

  // -------------------------------------------------------------------
  // Materialized bulk profiling. The single-column functions above each
  // re-tokenize their input; composing five of them in one projection
  // tokenizes five times (HOFs are interpreted — no common-subexpression
  // elimination). The bulk form tokenizes ONCE into a column and derives
  // every metric from it — the shape to use on a corpus scan.
  // -------------------------------------------------------------------

  private def hitCountIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Per-document text-quality profile: one pass, one tokenization.
    * Output: idCol, n_tokens, n_subtokens, mean_token_len,
    * stopword_ratio, punct_ratio, quality_score.
    */
  def profile(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val base = spread(df).select(
      col(idCol),
      col(textCol).as("__text"),
      tokens(col(textCol)).as("__tok"),
      regexp_replace(col(textCol), "\\s", "").as("__nospace"))
    val n = size(col("__tok"))
    val mtl = when(n === 0, lit(0.0))
      .otherwise(aggregate(col("__tok"), lit(0L), (acc, x) => acc + length(x)).cast("double") / n.cast("double"))
    val sw = when(n === 0, lit(0.0))
      .otherwise(hitCountIn(col("__tok"), EnStop).cast("double") / n.cast("double"))
    val pr = when(length(col("__nospace")) === 0, lit(0.0))
      .otherwise((length(col("__nospace")) -
        length(regexp_replace(col("__nospace"), "[.,!?;:'\"()\\[\\]{}-]", "")))
        .cast("double") / length(col("__nospace")).cast("double"))
    // Two-layer projection: the ratio expressions become attributes so
    // quality_score reuses them instead of duplicating their HOF trees
    // (CollapseProject keeps multi-referenced non-cheap aliases).
    val mid = base.select(
      col(idCol),
      n.as("n_tokens"),
      subTokenCount(col("__text")).as("n_subtokens"),
      mtl.as("mean_token_len"),
      sw.as("stopword_ratio"),
      pr.as("punct_ratio"))
    mid.select(
      col(idCol), col("n_tokens"), col("n_subtokens"), col("mean_token_len"),
      col("stopword_ratio"), col("punct_ratio"),
      least(lit(1.0),
        col("stopword_ratio") * 2.0 * lit(0.4)
          + when(col("mean_token_len").between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0)) * lit(0.3)
          + when(col("n_tokens").between(5, 10000), lit(1.0)).otherwise(lit(0.0)) * lit(0.2)
          + (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) * lit(0.1)).as("quality_score"))
  }

  /** TF-IDF top-k terms per document. tf = in-doc term count, idf =
    * ln(N/df) with N = total docs, df = docs containing the term.
    * Output: idCol, term, tf, df, tfidf — the k highest-tfidf terms
    * per doc (ties broken by term, ascending).
    *
    * Scale shape: one tokenize+explode pass; tf is a (doc, term)
    * partial-aggregable groupBy; df reuses tf's output (terms only —
    * the heavy doc×term frame aggregates down before the join); the
    * doc count joins in as a broadcast scalar, never a driver action.
    */
  def topTerms(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
               k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = spread(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("__n").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Corpus vocabulary: global token frequencies, deterministic top-k
    * (count desc, token asc) — the vocabulary-building pass a
    * tokenizer-training pipeline runs first. Output: token, n_occur,
    * n_docs (document frequency rides along for min-df style cuts).
    *
    * Scale shape: tokenize+explode once; the per-document distinct for
    * n_docs collapses (doc, token) pairs map-side BEFORE the token
    * shuffle, so the exchange carries per-partition vocabularies, not
    * the corpus token stream; top-k is ORDER BY+LIMIT →
    * TakeOrderedAndProject (per-partition heaps, never a global sort).
    */
  def vocab(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
            k: Int): org.apache.spark.sql.DataFrame = {
    val toks = spread(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
    toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__tf"))
      .groupBy(col("token"))
      .agg(sum(col("__tf")).as("n_occur"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occur").desc, col("token").asc)
      .limit(k)
  }

  /** Bulk language-ID: tokenize once, score all stopword sets from the
    * materialized array. Output: idCol, lang_pred.
    */
  def langIdBulk(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val base = spread(df)
      .select(col(idCol), tokens(col(textCol)).as("__tok"))
    val scored = base.select(col(idCol),
      hitCountIn(col("__tok"), EnStop).as("__en"),
      hitCountIn(col("__tok"), DeStop).as("__de"),
      hitCountIn(col("__tok"), EsStop).as("__es"),
      hitCountIn(col("__tok"), FrStop).as("__fr"))
    val best = greatest(col("__en"), col("__de"), col("__es"), col("__fr"))
    scored.select(col(idCol),
      when(best === 0, lit("und"))
        .when(col("__en") === best, lit("en"))
        .when(col("__de") === best, lit("de"))
        .when(col("__es") === best, lit("es"))
        .otherwise(lit("fr")).as("lang_pred"))
  }

  /** BPE merge-pair statistics — the inner loop of byte-pair-encoding
    * tokenizer training: the corpus-wide frequency of every adjacent
    * character pair, weighted by word frequency. The highest-frequency
    * pair is the next merge a BPE trainer would take; re-running after
    * applying merges yields the full training loop (driver-iterated,
    * one corpus-scale job per merge — in practice trainers batch this
    * over a frequency-pruned vocabulary).
    *
    * Scale shape — the classic BPE trick, relationally: pairs are
    * counted over the DISTINCT vocabulary weighted by word counts,
    * never over the raw token stream. The token explode partial-
    * aggregates to (word, freq) — sublinear in corpus size by Heaps'
    * law — and the pair explode then runs on vocabulary rows only;
    * the final (pair, freq) aggregate is map-side combinable. Words
    * shorter than 2 chars contribute no pairs.
    */
  def bpePairStats(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val vocab = spread(df)
      .select(explode(tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__wf"))
      .filter(length(col("__w")) >= 2)
    vocab
      .select(col("__wf"), explode(
        transform(sequence(lit(1), length(col("__w")) - 1),
          i => struct(col("__w").substr(i, lit(1)).as("l"),
            col("__w").substr(i + lit(1), lit(1)).as("r")))).as("__p"))
      .groupBy(col("__p.l").as("pair_left"), col("__p.r").as("pair_right"))
      .agg(sum(col("__wf")).as("freq"))
  }

  /** Full BPE merge training: iterate [[bpePairStats]]'s argmax
    * `numMerges` times over the weighted vocabulary, re-segmenting
    * after each pick. Each step counts every adjacent symbol position
    * (overlaps included), picks the heaviest pair with the
    * deterministic tie-break (frequency desc, then left asc, right asc
    * — engine-portable on the byte-comparable symbols this corpus
    * produces), and merges its occurrences left-to-right greedily in
    * every vocabulary word. Stops early when no pair remains.
    *
    * Scale shape — the bounded-driver pattern (same as the IVF
    * centroid train sample): the DISTRIBUTED part is the one
    * vocabulary aggregation (sublinear in corpus size by Heaps' law);
    * the driver then loops over at most `maxVocab` (word, freq) rows —
    * the top slice by frequency, which is also what production BPE
    * trainers prune to, since tail hapaxes contribute ~nothing to pair
    * mass. One corpus-scale job total, not one per merge;
    * [[bpePairStats]] remains the fully-distributed single-iteration
    * form for vocabularies that outgrow the driver.
    */
  def trainBpe(df: org.apache.spark.sql.DataFrame, textCol: String,
               numMerges: Int, maxVocab: Int = 1 << 16): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val vocab = spread(df)
      .select(explode(tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__wf"))
      .orderBy(col("__wf").desc, col("__w").asc).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val words: Array[(Array[String], Long)] = vocab.map { case (w, f) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // Explicit comparator, not map iteration order: (freq desc,
        // left asc, right asc) is total, so a HashMap's ordering can
        // never leak into the result.
        val best = counts.minBy { case ((l, r), f) => (-f, l, r) }._1
        merges += best
        val (l, r) = best
        var wi = 0
        while (wi < words.length) {
          val (syms, f) = words(wi)
          var hit = false
          var k = 0
          while (!hit && k < syms.length - 1) {
            hit = syms(k) == l && syms(k + 1) == r; k += 1
          }
          if (hit) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var p = 0
            while (p < syms.length) {
              if (p + 1 < syms.length && syms(p) == l && syms(p + 1) == r) {
                out += l + r; p += 2
              } else { out += syms(p); p += 1 }
            }
            words(wi) = (out.toArray, f)
          }
          wi += 1
        }
      }
    }
    merges.toSeq
  }

  /** Column form of BPE encoding with a trained merge list: the native
    * [[graft.plans.BpeEncode]] expression (registered per call — it
    * captures the merges) over `text`, yielding the document's ordered
    * subtoken array. `size(bpeEncode(...))` is the REAL token count
    * the whitespace [[tokenCount]] approximates — the drop-in for
    * token-budget sampling and sequence packing.
    */
  def bpeEncode(spark: org.apache.spark.sql.SparkSession, text: Column,
                merges: Seq[(String, String)]): Column = {
    val l = merges.map(_._1).toArray
    val r = merges.map(_._2).toArray
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_encode",
      exprs => graft.plans.BpeEncode(exprs.head, l, r), "built-in")
    call_function("graft_bpe_encode", text)
  }

  /** BM25 keyword search: top-k documents for a fixed term query under
    * Okapi BM25 (the retrieval primitive of corpus curation — seed-set
    * expansion, targeted subset pulls, dataset search). Per query term
    *
    *   idf(t)    = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *   w(d, t)   = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   score(d)  = Σ_t w(d, t)
    *
    * (the Robertson/Sparck-Jones idf in its always-positive form).
    * Output: idCol, n_terms (distinct query terms present), score —
    * top-k by (score desc, id asc).
    *
    * Scale shape: NO inverted index is materialized. Tokens are
    * filtered to the |Q| query terms MAP-SIDE before the explode, so
    * the only corpus-sized shuffle carries (id, term, tf) postings for
    * query terms alone — at 100 TB that is |Q| posting lists, not the
    * token stream. Corpus stats (N, avgdl) are a one-row aggregate and
    * df(t) a |Q|-row aggregate, both broadcast into the scoring
    * expression. The per-document score sums the |Q| per-term weights
    * in FIXED query order (one conditional aggregate per term, added
    * left-to-right) so the double addition is deterministic and
    * engine-portable — a float sum over an unordered explode would
    * hash-drift between engines. Top-k is ORDER BY+LIMIT →
    * TakeOrderedAndProject, per-partition heaps, never a global sort.
    */
  def bm25Search(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "query must have at least one term")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    // Tokenization lowercases, so a miscased query term would silently
    // match nothing — make it a loud error instead of a zero-hit.
    require(queryTerms.forall(t => t == t.toLowerCase),
      s"query terms must be lowercase (tokens are lowercased): " +
        queryTerms.filterNot(t => t == t.toLowerCase).mkString(", "))
    val qSet = array(queryTerms.map(lit): _*)
    // One tokenize pass feeds BOTH the doc-length stats and the
    // postings: dl rides the postings rows, the corpus aggregate runs
    // over the same projection. Two scans of the text column (stats +
    // postings), matching the reference-LM pattern in QualitySignals.
    val perDoc = spread(df).select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("__dl"),
      filter(tokens(col(textCol)), t => array_contains(qSet, t)).as("__hits"))
    val stats = perDoc.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val tf = perDoc
      .select(col(idCol), col("__dl"), explode(col("__hits")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val weighted = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("__w",
        col("__idf") * (col("__tf") * lit(k1 + 1.0))
          / (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
    // Pivot the ≤|Q| weight rows per doc into fixed term order, then
    // add left-to-right: deterministic float addition.
    val perTerm = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("__w"))).as(s"__s$i")
    }
    val wide = weighted.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), perTerm: _*)
    val score = queryTerms.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduceLeft(_ + _)
    wide.select(col(idCol), col("n_terms"), score.as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
