package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** The SQL frontend of the native as-of join: DuckDB-syntax
  * `ASOF [LEFT] JOIN` text parsed by the injected GraftSqlParser,
  * resolved by ResolveAsOfJoin, executed by AsOfJoinExec.
  */
class AsOfSqlSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  override def beforeAll(): Unit = {
    super.beforeAll()
    Seq((1L, ts(10), "L10"), (1L, ts(20), "L20"), (2L, ts(5), "L5"))
      .toDF("k", "t", "lv").createOrReplaceTempView("asof_l")
    Seq((1L, ts(5), "a"), (1L, ts(15), "b"), (1L, ts(20), "c"), (2L, ts(50), "z"))
      .toDF("k", "rt", "rv").createOrReplaceTempView("asof_r")
  }

  private def rows(sql: String): Set[(Long, String, Option[String])] =
    spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet

  test("ASOF LEFT JOIN backward: latest right at-or-before, null-extended") {
    assert(rows(
      """SELECT l.k, l.lv, r.rv FROM asof_l l
        |ASOF LEFT JOIN asof_r r ON l.k = r.k AND l.t >= r.rt""".stripMargin) ===
      Set((1L, "L10", Some("a")), (1L, "L20", Some("c")), (2L, "L5", None)))
    // Reversed inequality spelling resolves to the same join.
    assert(rows(
      """SELECT l.k, l.lv, r.rv FROM asof_l l
        |ASOF LEFT JOIN asof_r r ON l.k = r.k AND r.rt <= l.t""".stripMargin) ===
      Set((1L, "L10", Some("a")), (1L, "L20", Some("c")), (2L, "L5", None)))
  }

  test("ASOF JOIN (inner, DuckDB default): unmatched left rows drop") {
    assert(rows(
      """SELECT l.k, l.lv, r.rv FROM asof_l l
        |ASOF JOIN asof_r r ON l.k = r.k AND l.t >= r.rt""".stripMargin) ===
      Set((1L, "L10", Some("a")), (1L, "L20", Some("c"))))
  }

  test("ASOF LEFT JOIN forward: earliest right at-or-after") {
    assert(rows(
      """SELECT l.k, l.lv, r.rv FROM asof_l l
        |ASOF LEFT JOIN asof_r r ON l.k = r.k AND l.t <= r.rt""".stripMargin) ===
      Set((1L, "L10", Some("b")), (1L, "L20", Some("c")), (2L, "L5", Some("z"))))
  }

  test("SQL as-of plans the custom exec, not a built-in join") {
    val q = spark.sql(
      """SELECT l.k, l.lv, r.rv FROM asof_l l
        |ASOF LEFT JOIN asof_r r ON l.k = r.k AND l.t >= r.rt""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("self-join over one base frame (shared exprIds) resolves by alias") {
    // Both views project the SAME analyzed frame — the duplicate
    // attribute-id shape of the q60 gate; qualification must pick
    // sides correctly.
    val ev = Seq(
      (1L, ts(10), "click"), (2L, ts(30), "click"),
      (3L, ts(8), "signup"), (4L, ts(25), "signup"))
      .toDF("id", "ets", "kind")
    ev.filter($"kind" === "click").createOrReplaceTempView("asof_c")
    ev.filter($"kind" === "signup").createOrReplaceTempView("asof_s")
    val out = spark.sql(
      """SELECT c.id, s.id AS sid FROM asof_c c
        |ASOF LEFT JOIN asof_s s ON c.kind = s.kind AND c.ets >= s.ets""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    // kinds differ → no cross-kind key match; trivially null... use a
    // shared key instead:
    assert(out === Set((1L, None), (2L, None)))
    // non-column equality is rejected loudly at analysis, not mis-planned
    val e = intercept[Exception](spark.sql(
      """SELECT c.id, s.id AS sid FROM asof_c c
        |ASOF LEFT JOIN asof_s s ON c.ets >= s.ets AND substring(c.kind, 0, 0) = substring(s.kind, 0, 0)""".stripMargin))
    assert(e.getMessage.contains("ASOF JOIN"), e.getMessage)
  }

  test("self-join with a real shared key matches across the two views") {
    val ev = Seq(
      (10L, 1L, ts(10), "click"), (20L, 1L, ts(30), "click"), (30L, 2L, ts(9), "click"),
      (40L, 1L, ts(8), "signup"), (50L, 1L, ts(25), "signup"))
      .toDF("id", "uid", "ets", "kind")
    ev.filter($"kind" === "click").createOrReplaceTempView("asof_c2")
    ev.filter($"kind" === "signup").createOrReplaceTempView("asof_s2")
    val out = spark.sql(
      """SELECT c.id, s.id AS sid FROM asof_c2 c
        |ASOF LEFT JOIN asof_s2 s ON c.uid = s.uid AND c.ets >= s.ets""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
    assert(out === Set((10L, Some(40L)), (20L, Some(50L)), (30L, None)))
  }

  test("malformed as-of SQL fails loudly: strict bounds, missing keys, two asofs") {
    def err(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    assert(err(
      """SELECT l.k FROM asof_l l
        |ASOF JOIN asof_r r ON l.k = r.k AND l.t > r.rt""".stripMargin)
      .contains("inclusive"))
    assert(err(
      """SELECT l.k FROM asof_l l
        |ASOF JOIN asof_r r ON l.t >= r.rt""".stripMargin)
      .contains("equality key"))
    assert(err(
      """SELECT * FROM asof_l l ASOF JOIN asof_r r ON l.k = r.k AND l.t >= r.rt
        |WHERE EXISTS (SELECT 1 FROM asof_l x ASOF JOIN asof_r y ON x.k = y.k AND x.t >= y.rt)""".stripMargin)
      .contains("one ASOF JOIN"))
    assert(err(
      """SELECT l.k FROM asof_l l
        |ASOF JOIN asof_r r ON l.k = r.k AND l.t >= l.t""".stripMargin)
      .contains("left vs right"))
  }

  test("'ASOF JOIN' inside literals and comments is not syntax") {
    // a string literal mentioning ASOF JOIN must run as plain SQL
    val n = spark.sql(
      "SELECT count(*) AS n FROM asof_l WHERE lv != 'the ASOF JOIN keyword'")
      .head.getLong(0)
    assert(n === 3)
    // a comment mentioning it alongside a REAL asof join parses once
    val real = spark.sql(
      """-- this statement uses ASOF JOIN below
        |SELECT l.k, l.lv, r.rv /* ASOF JOIN in a comment too */
        |FROM asof_l l ASOF LEFT JOIN asof_r r
        |ON l.k = r.k AND l.t >= r.rt""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(real === Set((1L, "L10", Some("a")), (1L, "L20", Some("c")), (2L, "L5", None)))
    // doubled-quote escape inside a literal does not unbalance masking
    val n2 = spark.sql(
      "SELECT count(*) AS n FROM asof_l WHERE lv != 'it''s an ASOF JOIN'")
      .head.getLong(0)
    assert(n2 === 3)
    // BACKSLASH escape (Spark's default lexer honors it): the masker
    // must not close the literal at \' — 'ASOF JOIN' inside stays text
    val n3 = spark.sql(
      "SELECT count(*) AS n FROM asof_l WHERE lv != 'it\\'s an ASOF JOIN'")
      .head.getLong(0)
    assert(n3 === 3)
    // NESTED bracketed comments (Spark's lexer nests them): the inner
    // close must not end masking early
    val n4 = spark.sql(
      "SELECT /* outer /* ASOF JOIN */ still comment */ count(*) AS n FROM asof_l")
      .head.getLong(0)
    assert(n4 === 3)
  }

  test("ASOF JOIN inside an EXISTS subquery converts the subquery's join, not an outer one") {
    // The outer query also carries an inclusive-inequality join — the
    // relocation must descend into the subquery plan and convert THE
    // ASOF there; every k with any (t >= rt) match survives.
    val out = spark.sql(
      """SELECT a.k, a.lv, NULL AS rv FROM asof_l a
        |WHERE EXISTS (
        |  SELECT 1 FROM asof_l l ASOF JOIN asof_r r
        |  ON l.k = r.k AND l.t >= r.rt WHERE l.k = a.k)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // k=1 rows have as-of matches; k=2's only right row is in the future
    assert(out === Set((1L, "L10"), (1L, "L20")))
  }

  test("ordinary SQL still parses and runs through the delegating parser") {
    val n = spark.sql(
      "SELECT count(*) AS n FROM asof_l JOIN asof_r USING (k)").head.getLong(0)
    assert(n === 7) // 3 left rows match k=1 thrice or k=2 once: 3+3+1
  }
}
