package graft

import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** The native ShingleHashes expression must be BIT-IDENTICAL to the
  * composable HOF chain it replaces — every dedup/decontamination
  * oracle depends on the shingle sets being unchanged.
  */
class ShingleHashesSpec extends SparkSuite {
  import spark.implicits._

  private def nativeCol(n: Int) = {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    call_function("graft_shingle_hashes", col("text"), lit(n))
  }

  test("native == HOF on the real corpus, n=3 and n=5") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for (n <- Seq(3, 5)) {
      val diff = docs.select(
          nativeCol(n).as("nat"),
          NearDup.shingleHashesHof(col("text"), n).as("hof"))
        .filter(not(col("nat") <=> col("hof")))
        .count()
      assert(diff === 0, s"n=$n: native shingle hashes diverge from HOF form")
    }
  }

  test("edge cases: empty, whitespace, short, mixed-case, null") {
    val df = Seq(
      Some(""), Some("   "), Some("one two"), Some("one two three"),
      Some("ONE Two tHree FOUR"), Some("  leading and trailing  "),
      Some("tab\tand\nnewline separated words here"), None: Option[String]
    ).toDF("text")
    val diff = df.select(nativeCol(3).as("nat"),
        NearDup.shingleHashesHof(col("text"), 3).as("hof"))
      .filter(not(col("nat") <=> col("hof")))
      .count()
    assert(diff === 0)
    // Repeated shingles collapse, first-occurrence order preserved.
    val rep = Seq("a b c a b c a b c").toDF("text")
      .select(nativeCol(3).as("nat"), NearDup.shingleHashesHof(col("text"), 3).as("hof"))
      .collect()(0)
    assert(rep.getSeq[Long](0) === rep.getSeq[Long](1))
    assert(rep.getSeq[Long](0).length === 3) // "a b c", "b c a", "c a b"
  }
}
