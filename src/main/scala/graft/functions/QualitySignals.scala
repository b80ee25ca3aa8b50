package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-quality signals of the kind a pretraining-data pipeline
  * gates on before any model sees the text: the rule families
  * published with Gopher (Rae et al. 2021, §A1.1) and C4 (Raffel et
  * al. 2020) — length/word-shape bounds, symbol ratios, stopword
  * presence, and n-gram repetition — plus PII redaction and a
  * language-ID accuracy report.
  *
  * Everything is pure Catalyst expressions (no UDFs): the per-document
  * signals are one-pass/one-tokenization map work; the repetition
  * metrics are the one genuinely distributed shape here (a corpus-wide
  * explode → two partial-aggregable groupBys), because "most frequent
  * 2-gram per document" is a grouped aggregate, not a scalar.
  */
object QualitySignals {

  /** Gopher-style per-document rule signals, one tokenization:
    * token count, mean word length, fraction of words containing an
    * alphabetic character, symbol-to-word ratio (# and ellipsis),
    * distinct required-stopword hits, and the composite pass flag
    * with the published thresholds (adapted: lower token bound 20).
    */
  def gopherSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = graft.operators.Skew.spread(df)
      .select(col(idCol), col(textCol).as("__text"),
        TextFunctions.tokens(col(textCol)).as("__tok"))
    val n = size(col("__tok"))
    val mwl = when(n === 0, lit(0.0))
      .otherwise(aggregate(col("__tok"), lit(0L), (acc, x) => acc + length(x)).cast("double")
        / n.cast("double"))
    val alphaFrac = when(n === 0, lit(0.0))
      .otherwise(size(filter(col("__tok"), t => regexp_like(t, lit("[a-z]")))).cast("double")
        / n.cast("double"))
    val symRatio = when(n === 0, lit(0.0))
      .otherwise(regexp_count(col("__text"), lit("#|\\.\\.\\.")).cast("double")
        / n.cast("double"))
    // Gopher's "contains >= 2 of a small must-have stopword list".
    val stopHits = size(array_intersect(array_distinct(col("__tok")),
      array(Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*)))
    val mid = base.select(
      col(idCol),
      n.cast("long").as("n_tokens"),
      mwl.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"),
      symRatio.as("symbol_word_ratio"),
      stopHits.cast("long").as("stop_hits"))
    mid.select(col(idCol), col("n_tokens"), col("mean_word_len"),
      col("alpha_word_frac"), col("symbol_word_ratio"), col("stop_hits"),
      (col("n_tokens").between(20L, 100000L) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("alpha_word_frac") >= 0.8 &&
        col("symbol_word_ratio") <= 0.1 &&
        col("stop_hits") >= 2L).as("gopher_pass"))
  }

  /** Word-2-gram repetition metrics per document (the Gopher
    * duplicate-n-gram family): total 2-gram occurrences, the most
    * frequent 2-gram's share, and the fraction of occurrences that
    * are repeats of an earlier one. Documents with fewer than two
    * tokens have no 2-grams and drop out.
    *
    * Scale shape: explode to (doc, gram) — the shuffle carries short
    * strings, never the document — then two groupBys, both
    * map-side-combinable. No window: max/sum/count over the
    * (doc, gram) counts is a plain second aggregate.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.plans.NativeFunctions.ensureRegistered(df.sparkSession)
    // Grams are hashed to longs IN the shingling expression (native
    // single pass, multiplicity kept): every metric below is a count,
    // so hashed grams give the same results as string grams while the
    // shuffle carries 8-byte longs instead of gram strings. Full
    // 64-bit hashes (mod32 = false): in the 32-bit space two distinct
    // grams inside one document collide with probability ~g²/2³³ and
    // would silently merge counts; at 64 bits the collision odds are
    // ~g²/2⁶⁵ — below any realistic document size.
    val grams = graft.operators.Skew.spread(df)
      .select(col(idCol),
        explode(call_function("graft_shingle_hashes",
          col(textCol), lit(2), lit(false), lit(false)))
          .as("gram"))
    grams.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_2grams"),
        max(col("cnt")).as("__top"),
        count(lit(1)).as("__distinct"))
      .select(col(idCol), col("n_2grams"),
        (col("__top").cast("double") / col("n_2grams").cast("double")).as("top_2gram_frac"),
        ((col("n_2grams") - col("__distinct")).cast("double")
          / col("n_2grams").cast("double")).as("dup_2gram_frac"))
  }

  /** Language-ID accuracy against a ground-truth label column: per
    * true language, document count, correct predictions, and accuracy.
    * Languages outside the classifier's set (e.g. zh here) score 0 —
    * the report is exactly how a corpus pipeline audits its router.
    */
  def langIdEval(df: DataFrame, idCol: String, textCol: String,
                 truthCol: String): DataFrame = {
    val pred = TextFunctions.langIdBulk(df, idCol, textCol)
    df.select(col(idCol), col(truthCol).as("lang"))
      .join(pred, idCol)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang") === col("lang_pred"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("lang"), col("n_docs"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_docs").cast("double")).as("accuracy"))
  }

  /** Email-address regex — alternation-free so Java (leftmost-first)
    * and RE2 (leftmost-longest) engines agree on every match.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 regex (same engine-agreement property).
    * Deliberately unanchored: digit-boundary guards need lookarounds,
    * which RE2-family engines lack — so anchoring would break the
    * Java/RE2 agreement this module promises. The documented tradeoff:
    * a >3-digit run like "1234.5.6.78901" gets a partial mid-token
    * match. Counts and redactions still agree with each other because
    * both passes see the same text (see [[piiRedact]]).
    */
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII scrub over a text column: counts and redacts email addresses
    * and IPv4 literals (emails first — an address can contain digits
    * but a dotted quad can't contain '@', so the order is lossless).
    * `n_ipv4` is counted on the email-redacted text — the exact input
    * the IPv4 replacement pass sees — so a dotted quad inside an email
    * domain (user@10.2.3.4) is consumed by `<EMAIL>` and neither
    * counted nor double-redacted; counts always equal replacements.
    * Emits counts plus the redacted text — pure map work, the shape
    * that runs inline in a corpus ingestion scan.
    */
  /** Bigram language-model quality scoring — the CCNet/Wenzek et al.
    * 2020 recipe shape: train a smoothed n-gram LM on an IN-DOMAIN
    * reference corpus, score every candidate document by per-token
    * log-probability, and gate/bucket on the resulting perplexity
    * (low = reference-like, high = noise). Here the LM is a bigram
    * model with Laplace smoothing:
    *
    *   P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁) + V)
    *
    * where V = reference vocabulary size; unseen history rows fall
    * back to the same formula with zero counts.
    *
    * Distribution: training is two partial-aggregable groupBys over
    * the exploded reference (bigram strings and unigrams — shuffle
    * carries (gram, partial count), never documents); scoring explodes
    * candidate bigrams WITH multiplicity and left-joins the two count
    * frames (AQE broadcasts a small LM; a corpus-scale LM shuffles on
    * the gram key — and a production deployment hashes the gram to a
    * 64-bit join key to keep those shuffle rows narrow), then one
    * per-document aggregate. Every step is exact and deterministic, so
    * the whole pipeline replays in DuckDB — the oracle recomputes
    * training AND scoring from scratch.
    *
    * Output per document with ≥ 1 bigram: `n_bigrams`,
    * `avg_logprob` (natural log), `ppl` = exp(−avg_logprob).
    */
  def bigramLmScore(reference: DataFrame, docs: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    val refToks = graft.operators.Skew.spread(reference)
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
    val uni = refToks.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    // One-row frame instead of a driver .count(): V joins into the
    // probability expression without an action, and the broadcast is
    // a single long.
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val bi = graft.operators.Skew.spread(reference)
      .select(explode(TextFunctions.shingles(col(textCol), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val scored = graft.operators.Skew.spread(docs)
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), 2)).as("bg"))
      .withColumn("__w1", substring_index(col("bg"), " ", 1))
      .join(bi, Seq("bg"), "left")
      .join(uni.withColumnRenamed("w", "__w1"), Seq("__w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((coalesce(col("cb"), lit(0L)) + 1).cast("double")
          / (coalesce(col("cu"), lit(0L)) + col("__v")).cast("double")).as("__lp"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__lp")).as("avg_logprob"))
      .withColumn("ppl", exp(-col("avg_logprob")))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * document under the reference bigram LM, cut the perplexity
    * distribution at its terciles, and label docs head / middle / tail
    * — the bucket assignment CCNet publishes (head ≈ most fluent
    * third), used to stratify or drop web text by LM fit.
    *
    * The cuts are ONE exact-percentile aggregate over the scored frame
    * (doc-count rows of four scalars, persisted once and released on
    * return) broadcast back as a 1-row frame — no driver action, no
    * second LM pass. Exact `percentile` holds a distinct-value map per
    * group; at full corpus scale switch `exact = false` for the
    * `approx_percentile` sketch (bounded memory, rank error ≤ 1e-4) —
    * the cut values shift within sketch tolerance, the semantics
    * don't. Label comparisons are hash-stable against a SQL replay:
    * a tercile cut either falls strictly between two adjacent order
    * statistics (no doc sits on it) or collapses onto a tied value
    * (interpolation returns that value exactly in any engine).
    */
  def perplexityBuckets(reference: DataFrame, docs: DataFrame,
                        idCol: String, textCol: String,
                        exact: Boolean = true): DataFrame = {
    val scored = bigramLmScore(reference, docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pct = if (exact) "percentile" else "approx_percentile"
    val cuts = scored.agg(
      expr(s"$pct(ppl, 0.3333333333333333)").as("__c1"),
      expr(s"$pct(ppl, 0.6666666666666666)").as("__c2"))
    val out = scored.crossJoin(broadcast(cuts))
      .select(col(idCol), col("n_bigrams"), col("avg_logprob"), col("ppl"),
        when(col("ppl") <= col("__c1"), lit("head"))
          .when(col("ppl") <= col("__c2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
    graft.operators.Caching.materializeAndRelease(out, scored)
  }

  /** DSIR-shaped importance scoring (Xie et al. 2023's recipe shape):
    * score every candidate under an IN-DOMAIN LM and a GENERAL-corpus
    * LM, and rank by the per-bigram log-ratio
    *
    *   log w(x) = avg_logprob_target(x) − avg_logprob_general(x)
    *
    * (per-bigram averaging length-normalizes the ratio). Documents
    * most like the target distribution RELATIVE to the general pool
    * rank highest — the importance-resampling criterion for selecting
    * pretraining data toward a domain. Both scores come from
    * [[bigramLmScore]]; the join is id-keyed. Selection is the
    * caller's orderBy(log_ratio desc, id).limit(n) —
    * TakeOrderedAndProject, no global sort.
    */
  def importanceScore(target: DataFrame, general: DataFrame, docs: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    // The candidate-side bigram explode is the expensive pass (full
    // corpus, where each LM's reference is a slice) — run it ONCE and
    // join BOTH LMs' count tables into it, folding the two per-bigram
    // log-probs into a single groupBy. Two calls to [[bigramLmScore]]
    // would explode the corpus twice and re-join on the id at the end;
    // per-bigram arithmetic is identical (equality vs the two-call
    // form asserted in OperatorsSpec).
    // ONE tokenization pass per reference slice: unigrams and bigrams
    // ride a single tagged explode into one partial-aggregable groupBy
    // (two separate explodes would parse/tokenize each reference
    // twice — measured as the dominant cost of this operator). The
    // count table is vocabulary-sized, so it persists cheaply and both
    // LM joins read the cache; the persists are released after the
    // scored frame materializes (see materializeAndRelease below).
    def lmCounts(reference: DataFrame) = {
      val toks = TextFunctions.tokens(col(textCol))
      val grams = graft.operators.Skew.spread(reference)
        .select(explode(concat(
          transform(toks, t => struct(lit("u").as("kind"), t.as("gram"))),
          transform(TextFunctions.shingles(col(textCol), 2),
            g => struct(lit("b").as("kind"), g.as("gram"))))).as("kg"))
        .groupBy(col("kg.kind").as("kind"), col("kg.gram").as("gram"))
        .agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val uni = grams.filter(col("kind") === "u")
        .select(col("gram").as("w"), col("c").as("cu"))
      val bi = grams.filter(col("kind") === "b")
        .select(col("gram").as("bg"), col("c").as("cb"))
      (uni, bi, uni.agg(count(lit(1)).as("__v")), grams)
    }
    val (uniT, biT, vocabT, gramsT) = lmCounts(target)
    val (uniG, biG, vocabG, gramsG) = lmCounts(general)
    def lp(cb: Column, cu: Column, v: Column): Column =
      log((coalesce(cb, lit(0L)) + 1).cast("double")
        / (coalesce(cu, lit(0L)) + v).cast("double"))
    val out = graft.operators.Skew.spread(docs)
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), 2)).as("bg"))
      .withColumn("__w1", substring_index(col("bg"), " ", 1))
      .join(biT.withColumnRenamed("cb", "cb_t"), Seq("bg"), "left")
      .join(biG.withColumnRenamed("cb", "cb_g"), Seq("bg"), "left")
      .join(uniT.select(col("w").as("__w1"), col("cu").as("cu_t")), Seq("__w1"), "left")
      .join(uniG.select(col("w").as("__w1"), col("cu").as("cu_g")), Seq("__w1"), "left")
      .crossJoin(broadcast(vocabT.select(col("__v").as("__vt"))))
      .crossJoin(broadcast(vocabG.select(col("__v").as("__vg"))))
      .select(col(idCol),
        lp(col("cb_t"), col("cu_t"), col("__vt")).as("__lpt"),
        lp(col("cb_g"), col("cu_g"), col("__vg")).as("__lpg"))
      .groupBy(col(idCol))
      .agg(avg(col("__lpt")).as("lp_target"), avg(col("__lpg")).as("lp_general"))
      .withColumn("log_ratio", col("lp_target") - col("lp_general"))
    // Doc-count rows of four scalars — small relative to the corpus,
    // so eager materialization (which frees the two pinned LM count
    // caches) is the right trade, same as perplexityBuckets.
    graft.operators.Caching.materializeAndRelease(out, gramsT, gramsG)
  }

  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val emailScrubbed = regexp_replace(t, EmailRe, "<EMAIL>")
    val redacted = regexp_replace(emailScrubbed, Ipv4Re, "<IP>")
    df.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(emailScrubbed, lit(Ipv4Re)).cast("long").as("n_ipv4"),
      redacted.as("redacted"))
  }
}
