package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — train and predict as one
  * declarative plan. The classic shallow text classifier of corpus
  * curation (domain routers, quality gates seeded from labeled
  * subsets; the closed-form cousin of the fastText-style classifiers
  * used by CCNet/GPT-3-style pipelines), chosen here BECAUSE training
  * is pure counting: every model parameter is an exact aggregate, so
  * an external engine can replay train AND predict bit-for-bit —
  * no SGD, no iteration order, no learning rate.
  *
  *   lp(w, c)  = ln((count(w, c) + 1) / (tokens(c) + V))   (Laplace)
  *   prior(c)  = ln(docs(c) / N)
  *   score(d,c)= prior(c) + Σ_{w ∈ d ∩ V} tf(d, w) · lp(w, c)
  *
  * Out-of-vocabulary tokens are DROPPED (standard vectorizer
  * semantics: the feature space is the training vocabulary), so a
  * document with no in-vocabulary tokens falls back to the prior-only
  * argmax.
  *
  * Scale shape: the model is two partial-aggregable count frames —
  * (label, token) counts and per-label doc/token totals (#classes
  * rows, broadcast). Scoring joins documents' (id, token, tf) rows to
  * the vocab×classes grid ON THE TOKEN — a fact-to-dimension join AQE
  * can broadcast while the model fits and shuffle-join past that; the
  * corpus-sized shuffles carry (id, token) and (id, label) pairs,
  * never text. The per-(doc, class) sum is one map-side-combinable
  * aggregate; the argmax is a #classes-row window per document keyed
  * on the id.
  *
  * Determinism: all counts are exact integers; the only floats are
  * the final per-class log-likelihood sums. The argmax orders by the
  * score ROUNDED to 6 decimals (then label) so the class choice
  * cannot flip on float-summation order across engines — the raw
  * score is deliberately not emitted.
  */
object NaiveBayes {

  /** Train on `train` (labels in `labelCol`), predict for every row of
    * `docs`. Output: idCol, pred (predicted label), n_scored (count of
    * in-vocabulary token positions that contributed to the score —
    * 0 marks the prior-only fallback).
    */
  def trainPredict(train: DataFrame, docs: DataFrame,
                   idCol: String, textCol: String, labelCol: String): DataFrame = {
    val toks = graft.operators.Skew.spread(train)
      .select(col(labelCol).as("__lbl"),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
    // (label, token) counts — THE model. Partial-aggregable; at 100 TB
    // this collapses to vocab×classes rows before any join.
    val cnt = toks.groupBy(col("__lbl"), col("__w")).agg(count(lit(1)).as("__cnt"))
    val classTok = cnt.groupBy(col("__lbl")).agg(sum(col("__cnt")).as("__tc"))
    val vocabSize = cnt.select(col("__w")).distinct().agg(count(lit(1)).as("__v"))
    // Priors from doc counts; total via a window over the #classes
    // frame (no driver action, no second scan).
    val classDocs = train.groupBy(col(labelCol).as("__lbl")).agg(count(lit(1)).as("__nd"))
    val priors = classDocs
      .withColumn("__prior",
        log(col("__nd").cast("double")
          / sum(col("__nd")).over(Window.partitionBy()).cast("double")))
      .join(classTok, "__lbl").crossJoin(broadcast(vocabSize))
    // Dense vocab×classes grid so unseen-in-class tokens still pay the
    // Laplace floor ln(1/(tc+V)) — a left join from the grid, not from
    // the counts.
    val grid = cnt.select(col("__w")).distinct()
      .crossJoin(broadcast(priors.select(col("__lbl"), col("__tc"), col("__v"))))
      .join(cnt, Seq("__w", "__lbl"), "left")
      .select(col("__w"), col("__lbl"),
        log((coalesce(col("__cnt"), lit(0L)) + 1).cast("double")
          / (col("__tc") + col("__v")).cast("double")).as("__lp"))
    val docTf = graft.operators.Skew.spread(docs)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__tf"))
    val ll = docTf.join(grid, "__w")
      .groupBy(col(idCol), col("__lbl"))
      .agg(sum(col("__tf") * col("__lp")).as("__ll"), sum(col("__tf")).as("__n"))
    // Every doc × every class, prior-only where no token matched.
    val scored = docs.select(col(idCol))
      .crossJoin(broadcast(priors.select(col("__lbl"), col("__prior"))))
      .join(ll, Seq(idCol, "__lbl"), "left")
      .select(col(idCol), col("__lbl"),
        (col("__prior") + coalesce(col("__ll"), lit(0.0))).as("__score"),
        coalesce(col("__n"), lit(0L)).as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(col("__score"), 6).desc, col("__lbl").asc)
    scored.withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
      .select(col(idCol), col("__lbl").as("pred"), col("__n").as("n_scored"))
  }
}
