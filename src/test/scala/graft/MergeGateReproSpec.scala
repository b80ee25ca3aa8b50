package graft

/** Mirror of the `s_versioned_merge_clauses` gate body (catalog table,
  * subquery source, multi-line clause text) — the gate must behave
  * exactly like the spec-level surface.
  */
class MergeGateReproSpec extends SparkSuite {
  import spark.implicits._

  test("gate-shaped statement parses into the clauses the gate wrote") {
    val dir = java.nio.file.Files.createTempDirectory("vt_gate_repro").toString
    val vt = new graft.sources.VersionedTable(spark, dir)
    vt.append(Seq((1L, "F", 10.0)).toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
    val stmt =
      s"""MERGE INTO '$dir' t USING (
         |  SELECT * FROM graft_mcl_base WHERE o_orderkey % 6 = 0) s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND s.o_totalprice > 150000 THEN
         |  UPDATE SET o_totalprice = s.o_totalprice * 2, o_orderstatus = 'H'
         |WHEN MATCHED AND s.o_orderstatus = 'F' THEN DELETE
         |WHEN NOT MATCHED AND s.o_totalprice > 100000 THEN
         |  INSERT (o_orderkey, o_totalprice)
         |  VALUES (s.o_orderkey + 100000000, s.o_totalprice)
         |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 10 = 1 THEN
         |  UPDATE SET o_orderstatus = 'S'
         |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 10 = 2 THEN
         |  DELETE""".stripMargin
    val plan = spark.sessionState.sqlParser.parsePlan(stmt)
    val g = plan.asInstanceOf[graft.plans.GraftMergeClauses]
    info(s"target=${g.target} source=[${g.sourceSql}] keys=${g.keys}")
    info(s"aliases=${g.targetAlias}/${g.sourceAlias}")
    info(s"matched=${g.matched}")
    info(s"notMatched=${g.notMatched}")
    info(s"nmbs=${g.notMatchedBySource}")
    assert(g.matched.size === 2 && g.notMatched.size === 1 &&
      g.notMatchedBySource.size === 2)
  }

  test("gate-shaped multi-clause MERGE over a catalog table parses and runs") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val fn = SparkEntry.queries("s_versioned_merge_clauses")
    val out = fn(s, dir)
    assert(out.count() > 0)
    assert(out.select("merge_op").head.getString(0) === "merge-dv")
  }
}
