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

  test("null or non-boolean flag literals raise clean analysis errors") {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    // lit(null) would unbox to false silently; lit(1) would throw a raw
    // ClassCastException — both must fail analysis with the same shape
    // of error as a non-foldable arg.
    for (bad <- Seq(lit(null), lit(1))) {
      val e = intercept[Exception] {
        Seq("a b c").toDF("text")
          .select(call_function("graft_shingle_hashes", col("text"), lit(2), bad))
          .collect()
      }
      assert(e.getMessage.contains("boolean literal"), s"unexpected error: ${e.getMessage}")
    }
    val eN = intercept[Exception] {
      Seq("a b c").toDF("text")
        .select(call_function("graft_shingle_hashes", col("text"), lit("x")))
        .collect()
    }
    assert(eN.getMessage.contains("integer literal"), s"unexpected error: ${eN.getMessage}")
  }

  test("graft_keep_pos equals the array_contains filter form") {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    // Real corpus: rebuild each doc's kept lines with the native
    // linear-probe filter and the quadratic composable form — the
    // results must be identical (order preserved, empty keep → empty).
    val paras = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\. ")).as(Seq("pos", "line")))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("line")))).as("paras"),
        // keep every other position, plus an always-absent one
        array_append(collect_list(when(col("pos") % 2 === 0, col("pos"))), lit(1000000))
          .as("keep"))
    val diff = paras.select(
        call_function("graft_keep_pos", col("paras"), col("keep")).as("nat"),
        transform(
          filter(col("paras"), p => array_contains(col("keep"), p.getField("pos"))),
          p => p.getField("line")).as("hof"))
      .filter(not(col("nat") <=> col("hof")))
      .count()
    assert(diff === 0, "native keep-pos filter diverges from array_contains form")
    // Empty keep array → empty result, not null.
    val e = Seq((Seq((0, "a"), (1, "b")), Seq.empty[Int])).toDF("paras", "keep")
      .select(call_function("graft_keep_pos", col("paras"), col("keep")))
      .collect()(0).getSeq[String](0)
    assert(e.isEmpty)
    // Duplicate positions in the paragraph array: the function is
    // registered session-wide, so arbitrary SQL can feed it inputs
    // where positions repeat — more matches than keep.length must not
    // overflow the output buffer, and must equal the HOF form.
    val dup = Seq((Seq((1, "a"), (1, "b"), (2, "c")), Seq(1))).toDF("paras", "keep")
      .select(call_function("graft_keep_pos", col("paras"), col("keep")))
      .collect()(0).getSeq[String](0)
    assert(dup === Seq("a", "b"))
  }

  test("graft_nfc_clean: NFC-composes, strips controls, collapses whitespace") {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    val rows = Seq(
      ("cafe\u0301", "caf\u00e9"),               // decomposed → composed
      ("caf\u00e9", "caf\u00e9"),                // already NFC untouched
      ("ab\u0007\u0000c", "abc"),                // C0 controls stripped
      ("a\rb\fc", "a b c"),                      // CR/FF are whitespace, never joiners
      ("a\u000bb", "ab"),                         // VT stripped (RE2 \s excludes it)
      ("  a \t b\n\nc  ", "a b c"),             // runs collapse, ends trim
      ("", "")
    ).toDF("in", "want")
    val bad = rows.select(call_function("graft_nfc_clean", col("in")).as("got"), col("want"))
      .filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString(","))
    // null in → null out
    val n = Seq[Option[String]](None).toDF("in")
      .select(call_function("graft_nfc_clean", col("in"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("mod32=false emits the raw 64-bit xxhash64, multiplicity kept") {
    graft.plans.NativeFunctions.ensureRegistered(spark)
    val diff = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        call_function("graft_shingle_hashes", col("text"), lit(2), lit(false), lit(false))
          .as("nat"),
        transform(graft.functions.TextFunctions.shingles(col("text"), 2),
          s => xxhash64(s)).as("hof"))
      .filter(not(col("nat") <=> col("hof")))
      .count()
    assert(diff === 0, "64-bit shingle hashes diverge from un-modded xxhash64")
  }
}
