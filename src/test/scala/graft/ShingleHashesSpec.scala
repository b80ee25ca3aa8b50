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

  test("distinct=false keeps every occurrence in order") {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    // "a b" occurs twice ("a b a b" → a-b, b-a, a-b); the non-distinct
    // form must keep the repeat exactly where the HOF transform chain
    // (no array_distinct) puts it.
    val row = Seq("a b a b").toDF("text")
      .select(
        call_function("graft_shingle_hashes", col("text"), lit(2), lit(false)).as("all"),
        transform(graft.functions.TextFunctions.shingles(col("text"), 2),
          s => pmod(xxhash64(s), lit(4294967296L))).as("hof"))
      .collect()(0)
    assert(row.getSeq[Long](0) === row.getSeq[Long](1))
    assert(row.getSeq[Long](0).length === 3)
    assert(row.getSeq[Long](0)(0) === row.getSeq[Long](0)(2)) // the repeat survives
  }

  test("non-literal n raises a clean analysis error, not an NPE") {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      Seq(("a b c", 2)).toDF("text", "n")
        .select(call_function("graft_shingle_hashes", col("text"), col("n")))
        .collect()
    }
    assert(e.getMessage.contains("literal"), s"unexpected error: ${e.getMessage}")
  }
}
