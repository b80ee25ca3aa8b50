package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators a training-data pipeline runs before any
  * model sees the data: benchmark decontamination (n-gram overlap
  * against an eval set) and cross-document boilerplate detection.
  * Both are beyond the reference's surface (it has no corpus concept)
  * but belong to the same quality family as its null/dup checks.
  */
object CorpusHygiene {

  /** Decontamination: (doc, bench, n_shared) for every corpus doc
    * sharing at least `minShared` distinct n-gram shingles with a
    * benchmark doc (self-pairs excluded, so the benchmark may be a
    * subset of the corpus). Scale shape: shingles hash to longs once
    * (NearDup.shingleSets), the shuffle carries (shingle_hash, id)
    * pairs, and the benchmark side is tiny — Catalyst broadcasts it,
    * so the corpus never shuffles for the join; the groupBy aggregates
    * partial map-side.
    */
  def contaminationPairs(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 3, minShared: Long = 5): DataFrame = {
    val c = NearDup.shingleSets(corpus, idCol, textCol, n)
      .select(col(idCol).as("doc_id"), explode(col("shingles")).as("s"))
    val b = NearDup.shingleSets(benchmark, idCol, textCol, n)
      .select(col(idCol).as("bench_id"), explode(col("shingles")).as("s"))
    c.join(broadcast(b), "s")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Cross-document boilerplate: sentence-level segments appearing in
    * at least `minDocs` DISTINCT documents (headers, disclaimers,
    * navigation chrome — the C4-style repeated-line filter target).
    * One explode + distinct + count; the shuffle carries (segment, id).
    */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                       minDocs: Long = 3, sep: String = "\\. "): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), sep)).as("line"))
      .select(col(idCol), trim(col("line")).as("line"))
      .filter(length(col("line")) > 0)
      .distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
}
