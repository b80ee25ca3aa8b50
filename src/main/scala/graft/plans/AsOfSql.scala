package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType

/** SQL frontend for the native as-of join — the `injectParser` half of
  * the extension tier, so a pure-SQL user reaches [[AsOfJoinExec]] with
  * DuckDB's syntax (the dialect the oracle speaks, so one SQL string
  * drives both engines):
  *
  * {{{
  *   SELECT ... FROM clicks c
  *   ASOF [LEFT] JOIN signups s
  *   ON c.user_id = s.user_id AND c.ts >= s.signup_ts
  * }}}
  *
  * `>=` on (left, right) times is the backward join (latest right
  * at-or-before), `<=` the forward one; plain `ASOF JOIN` drops
  * unmatched left rows (DuckDB's inner default), `ASOF LEFT JOIN`
  * null-extends. The reference's own SQL entry point
  * (`First experiment/Claude Sonnet 4.py:229-233`) treats SQL text as
  * a first-class frontend; this closes the same surface for the
  * custom operator.
  *
  * Mechanics: the parser rewrites the single `ASOF [LEFT] JOIN` token
  * to a plain join, delegates to Spark's parser, then swaps the parsed
  * [[Join]] for an [[UnresolvedAsOfJoin]] marker; an analyzer rule
  * ([[ResolveAsOfJoin]]) resolves the condition against the children,
  * splits it into equi-keys plus exactly one inclusive time inequality,
  * and emits the same re-aliased [[AsOfJoin]] composition the Scala API
  * builds. Anything outside the supported shape fails loudly at parse
  * or resolution — never a silently-different join.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val AsOfRe = "(?i)\\bASOF\\s+(LEFT\\s+)?JOIN\\b".r

  // Versioned-table maintenance statements (see [[VersionedSql]]):
  // whole-statement anchored matches against the RAW text — the target
  // may itself be a quoted path literal, which the literal masker
  // would blank. Backticked, quoted, and dotted bare names all match;
  // anything else falls through to Spark's parser untouched.
  private val TargetPat = "(`[^`]+`(?:\\s*\\.\\s*`[^`]+`)*|'[^']*'|\"[^\"]*\"|[\\w.]+)"
  private val OptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + TargetPat +
      "(?:\\s+WHERE\\s+(`[^`]+`|\\w+)\\s+BETWEEN\\s+(-?[\\d.]+)\\s+AND\\s+(-?[\\d.]+))?" +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?" +
      "(?:\\s+INTO\\s+(\\d+)\\s+CHUNKS)?\\s*;?\\s*$").r
  // the DV-debt maintenance selector: scope by accumulated hidden
  // fraction (manifest metadata), not by data predicate
  private val OptimizeDvRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + TargetPat +
      "\\s+WHERE\\s+__dv_fraction\\s*>=\\s*([\\d.]+)" +
      "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?" +
      "(?:\\s+INTO\\s+(\\d+)\\s+CHUNKS)?\\s*;?\\s*$").r
  // the metadata-only sidecar merge: scope by STACKED SIDECAR COUNT
  // the way __dv_fraction scopes by hidden share — no data rewritten
  private val OptimizeDvSidecarsRe =
    ("(?is)^\\s*OPTIMIZE\\s+" + TargetPat +
      "\\s+WHERE\\s+__dv_sidecars\\s*>=\\s*(\\d+)\\s*;?\\s*$").r
  private val HistoryRe =
    ("(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+" + TargetPat + "\\s*;?\\s*$").r
  private val DetailRe =
    ("(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+" + TargetPat + "\\s*;?\\s*$").r
  private val AddConstraintRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + TargetPat +
      "\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$").r
  private val DropConstraintRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + TargetPat +
      "\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*$").r
  // Path-based schema evolution — the SQL-only user's route to the
  // metadata-only alters (the V2 catalog serves registered catalogs;
  // these serve quoted paths and bridge names). Column operands are
  // single identifiers by construction: a dotted (nested) path fails
  // the pattern and falls through to Spark, whose V2 analysis refuses
  // it with the documented top-level-only contract.
  private val AddColumnsRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + TargetPat +
      "\\s+ADD\\s+COLUMNS?\\s*\\((.+)\\)\\s*;?\\s*$").r
  private val RenameColumnRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + TargetPat +
      "\\s+RENAME\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+TO\\s+(`[^`]+`|\\w+)" +
      "\\s*;?\\s*$").r
  private val AlterColTypeRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + TargetPat +
      "\\s+ALTER\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+(?:SET\\s+DATA\\s+)?TYPE\\s+" +
      "(.+?)\\s*;?\\s*$").r
  private val DropColumnsRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + TargetPat +
      "\\s+DROP\\s+COLUMNS?\\s+\\(?\\s*([^();]+?)\\s*\\)?\\s*;?\\s*$").r
  private val ShallowCloneRe =
    ("(?is)^\\s*CREATE\\s+TABLE\\s+('[^']*'|\"[^\"]*\")\\s+SHALLOW\\s+CLONE\\s+" +
      TargetPat + "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*$").r

  private def stripTick(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`")
  private val VacuumRe =
    ("(?is)^\\s*VACUUM\\s+" + TargetPat +
      "\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*$").r
  private val RestoreRe =
    ("(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?" + TargetPat +
      "\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
  private val ConvertRe =
    ("(?is)^\\s*CONVERT\\s+TO\\s+GRAFTVT\\s+('[^']*'|\"[^\"]*\")\\s*;?\\s*$").r

  private def versionedTarget(target: String): Boolean = {
    val t = target.trim
    if (t.startsWith("'") || t.startsWith("\"")) true
    else {
      val parts = t.split('.').toSeq
        .map(_.trim.stripPrefix("`").stripSuffix("`"))
      // a graft-catalog identifier or a managed-bridge name both qualify;
      // time-travel SUBSTITUTION stays bridge-only (catalog time travel
      // resolves natively through loadTable)
      VersionedSql.catalogTableDir(SparkSession.active, parts).isDefined ||
        VersionedSql.timeTravelDir(SparkSession.active, parts).isDefined
    }
  }

  private def maintenanceCommand(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case OptimizeDvSidecarsRe(target, minSc) =>
        Some(GraftCoalesceDv(target, minSc.toInt))
      case OptimizeDvRe(target, frac, cols, chunks) =>
        val zorder = Option(cols).toSeq.flatMap(_.split(',').toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        Some(GraftOptimize(target, zorder, Option(chunks).map(_.toInt),
          dvFraction = Some(frac.toDouble)))
      case OptimizeRe(target, whereCol, whereLo, whereHi, cols, chunks) =>
        val zorder = Option(cols).toSeq.flatMap(_.split(',').toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        def num(s: String): Any =
          if (s.matches("-?\\d+")) s.toLong else s.toDouble
        val where = Option(whereCol).map(c =>
          (c.stripPrefix("`").stripSuffix("`"), num(whereLo), num(whereHi)))
        Some(GraftOptimize(target, zorder, Option(chunks).map(_.toInt), where))
      case HistoryRe(target) => Some(GraftDescribeHistory(target))
      case DetailRe(target) => Some(GraftDescribeDetail(target))
      // ALTER TABLE is real vanilla syntax — intercept ONLY when the
      // target provably addresses a versioned table (quoted path, or a
      // bridge name whose transaction log exists); anything else goes
      // to Spark's own parser untouched.
      case AddConstraintRe(target, name, expr) if versionedTarget(target) =>
        Some(GraftAddConstraint(target, name, expr.trim))
      case DropConstraintRe(target, name) if versionedTarget(target) =>
        Some(GraftDropConstraint(target, name))
      case AddColumnsRe(target, ddl) if versionedTarget(target) =>
        Some(GraftAddColumns(target, ddl.trim))
      case RenameColumnRe(target, from, to) if versionedTarget(target) =>
        Some(GraftRenameColumn(target, stripTick(from), stripTick(to)))
      case AlterColTypeRe(target, colName, ddl) if versionedTarget(target) =>
        Some(GraftAlterColumnType(target, stripTick(colName), ddl.trim))
      case DropColumnsRe(target, cols) if versionedTarget(target) =>
        Some(GraftDropColumns(target,
          cols.split(',').toSeq.map(c => stripTick(c)).filter(_.nonEmpty)))
      case ShallowCloneRe(dst, src, ver) if versionedTarget(src) =>
        Some(GraftShallowClone(dst.substring(1, dst.length - 1), src,
          Option(ver).map(_.toInt)))
      case VacuumRe(target, keep) => Some(GraftVacuum(target, keep.toInt))
      case RestoreRe(target, v) => Some(GraftRestore(target, v.toInt))
      case ConvertRe(path) =>
        Some(GraftConvert(path.substring(1, path.length - 1)))
      case _ => None
    }

  // ---- DML over versioned tables -----------------------------------
  // Spark's grammar parses UPDATE / DELETE FROM / MERGE INTO natively,
  // but no built-in rule can resolve them for these tables — so, like
  // ALTER TABLE above, they are intercepted ONLY when the target
  // provably addresses a versioned table. Clause keywords are located
  // on the MASKED text at paren depth 0 (a WHERE inside a string
  // literal or a scalar subquery never splits the statement) and the
  // ORIGINAL text is sliced at those offsets, so expression text keeps
  // its literals and reaches `expr(...)` verbatim.

  // The head patterns must NOT end in `\s+`: a quoted-path target is
  // blanked to spaces in the masked text, and a greedy trailing \s+
  // would swallow it, leaving an empty target slice.
  private val UpdateHeadRe = "(?is)^\\s*UPDATE\\b".r
  private val DeleteHeadRe = "(?is)^\\s*DELETE\\s+FROM\\b".r
  // Delta's schema-evolution opt-in spelling: the WITH SCHEMA
  // EVOLUTION modifier sits between MERGE and INTO.
  private val MergeHeadRe =
    "(?is)^\\s*MERGE\\s+(WITH\\s+SCHEMA\\s+EVOLUTION\\s+)?INTO\\b".r

  /** Offset of the first occurrence of word `kw` at paren depth 0 in
    * `masked`, at or after `from`; -1 when absent.
    */
  private def topLevelKeyword(masked: String, from: Int, kw: String): Int = {
    val up = masked.toUpperCase(java.util.Locale.ROOT)
    val k = kw.toUpperCase(java.util.Locale.ROOT)
    def wordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    var depth = 0
    var i = from
    while (i < up.length) {
      up.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith(k, i) &&
              (i == 0 || !wordChar(up.charAt(i - 1))) &&
              (i + k.length == up.length || !wordChar(up.charAt(i + k.length))))
            return i
      }
      i += 1
    }
    -1
  }

  /** Split `[start, end)` of the statement on depth-0 commas of the
    * masked text, returning trimmed RAW slices.
    */
  private def splitTopLevelCommas(masked: String, raw: String,
                                  start: Int, end: Int): Seq[String] = {
    val cuts = scala.collection.mutable.ArrayBuffer[Int](start - 1)
    var depth = 0
    var i = start
    while (i < end) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => cuts += i
        case _ => ()
      }
      i += 1
    }
    cuts += end
    cuts.toSeq.sliding(2).map(w => raw.substring(w(0) + 1, w(1)).trim).toSeq
  }

  private def stripStmtTail(s: String): String = {
    val t = s.trim
    (if (t.endsWith(";")) t.dropRight(1) else t).trim
  }

  private def targetShaped(t: String): Boolean = t.matches(TargetPat)

  /** Split one `col = expr` assignment at its first depth-0 '='. The
    * LHS is a plain (possibly backticked, possibly alias-qualified)
    * column name, so scanning the RAW slice is safe: an '=' inside an
    * RHS string literal can only appear AFTER the real one.
    */
  private def splitAssignment(stmt: String)(a: String): (String, String) = {
    var depth = 0
    var eq = -1
    var i = 0
    while (i < a.length && eq < 0) {
      a.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '=' if depth == 0 => eq = i
        case _ => ()
      }
      i += 1
    }
    require(eq > 0, s"$stmt: malformed SET assignment `$a`")
    // a MERGE SET target may be written alias-qualified (`t.col = ...`)
    // — the alias is redundant (only target columns are assignable)
    // and stripped
    (lastNamePart(a.substring(0, eq)), a.substring(eq + 1).trim)
  }

  /** The last dot-separated segment of a possibly-qualified,
    * possibly-backticked identifier — splitting only on dots OUTSIDE
    * backticks, so a column literally named `a.b` survives whether or
    * not it is alias-qualified.
    */
  private def lastNamePart(s0: String): String = {
    val s = s0.trim
    var last = 0
    var inTick = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '`' => inTick = !inTick
        case '.' if !inTick => last = i + 1
        case _ => ()
      }
      i += 1
    }
    s.substring(last).trim.stripPrefix("`").stripSuffix("`")
  }

  private def requireNoDupTargets(names: Seq[String], stmt: String): Unit = {
    val dup = names.groupBy(_.toLowerCase(java.util.Locale.ROOT))
      .collect { case (n, as) if as.size > 1 => n }
    require(dup.isEmpty,
      s"$stmt assigns column(s) ${dup.mkString(", ")} more than once — " +
        "standard SQL rejects duplicate SET targets")
  }

  /** `UPDATE t SET c = e [, ...] [WHERE cond]` over a versioned target
    * → [[GraftUpdate]]; anything else returns None for Spark's parser.
    */
  private def updateCommand(sql: String, masked: String): Option[LogicalPlan] = {
    val m = UpdateHeadRe.findFirstMatchIn(masked).getOrElse(return None)
    val setPos = topLevelKeyword(masked, m.end, "SET")
    if (setPos < 0) return None
    val target = sql.substring(m.end, setPos).trim
    if (!targetShaped(target) || !versionedTarget(target)) return None
    val setEnd = setPos + "SET".length
    val wherePos = topLevelKeyword(masked, setEnd, "WHERE")
    val assignEnd = if (wherePos < 0) sql.length else wherePos
    val assigns = splitTopLevelCommas(masked, sql, setEnd, assignEnd)
      .map(stripStmtTail).filter(_.nonEmpty).map(splitAssignment("UPDATE"))
    require(assigns.nonEmpty, "UPDATE needs at least one SET assignment")
    requireNoDupTargets(assigns.map(_._1), "UPDATE")
    val where =
      if (wherePos < 0) None
      else Some(stripStmtTail(sql.substring(wherePos + "WHERE".length)))
        .filter(_.nonEmpty)
    Some(GraftUpdate(target, assigns, where))
  }

  /** `DELETE FROM t [WHERE cond]` over a versioned target →
    * [[GraftDelete]].
    */
  private def deleteCommand(sql: String, masked: String): Option[LogicalPlan] = {
    val m = DeleteHeadRe.findFirstMatchIn(masked).getOrElse(return None)
    val wherePos = topLevelKeyword(masked, m.end, "WHERE")
    val target = stripStmtTail(
      sql.substring(m.end, if (wherePos < 0) sql.length else wherePos))
    if (!targetShaped(target) || !versionedTarget(target)) return None
    val where =
      if (wherePos < 0) None
      else Some(stripStmtTail(sql.substring(wherePos + "WHERE".length)))
        .filter(_.nonEmpty)
    Some(GraftDelete(target, where))
  }

  /** `MERGE INTO t [[AS] a] USING (<src name or subquery>) [[AS] s]
    * ON <same-name equi-keys> WHEN ...` over a versioned target. The
    * exact two-clause upsert (`WHEN MATCHED THEN UPDATE SET * WHEN NOT
    * MATCHED THEN INSERT *`) maps to [[GraftMerge]]'s specialized
    * path; every other clause combination parses through
    * [[parseMergeClauses]] into [[GraftMergeClauses]] (conditional
    * UPDATE/DELETE, column-list INSERT, NOT MATCHED BY SOURCE).
    * Unsupported forms fail loudly rather than silently upserting.
    */
  private def mergeCommand(sql: String, masked: String): Option[LogicalPlan] = {
    val m = MergeHeadRe.findFirstMatchIn(masked).getOrElse(return None)
    val evolve = m.group(1) != null
    val usingPos = topLevelKeyword(masked, m.end, "USING")
    if (usingPos < 0) return None
    // target: first token; optional [AS] alias (clause expressions
    // reference it; keys come from the ON clause's column NAMES)
    val targetToks = sql.substring(m.end, usingPos).trim.split("\\s+").toSeq
    val target = targetToks.headOption.getOrElse(return None)
    if (!targetShaped(target) || !versionedTarget(target)) return None
    def aliasOf(toks: Seq[String], where: String): Option[String] = toks match {
      case Seq() => None
      case Seq(a) if !a.equalsIgnoreCase("AS") =>
        Some(a.stripPrefix("`").stripSuffix("`"))
      case Seq(as, a) if as.equalsIgnoreCase("AS") =>
        Some(a.stripPrefix("`").stripSuffix("`"))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO (versioned): unexpected tokens after $where: " +
          other.mkString(" "))
    }
    val tgtAliasExp = aliasOf(targetToks.drop(1), "target")
    val onPos = topLevelKeyword(masked, usingPos + "USING".length, "ON")
    require(onPos > 0, "MERGE INTO (versioned): missing ON clause")
    val whenPos = topLevelKeyword(masked, onPos + "ON".length, "WHEN")
    require(whenPos > 0, "MERGE INTO (versioned): missing WHEN clauses")
    // source: `(subquery) [[AS] alias]` or `name [[AS] alias]` — the
    // matching close paren is found on the MASKED slice (parens inside
    // literals never count) and both slices share coordinates (same
    // substring bounds, untrimmed).
    val srcStart = usingPos + "USING".length
    val srcRaw = sql.substring(srcStart, onPos)
    val srcMasked = masked.substring(srcStart, onPos)
    val (sourceSql, srcAliasExp) =
      if (srcRaw.trim.startsWith("(")) {
        val lead = srcMasked.indexOf('(')
        var depth = 0
        var close = -1
        var i = lead
        while (i < srcMasked.length && close < 0) {
          srcMasked.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ => ()
          }
          i += 1
        }
        require(close > 0, "MERGE INTO (versioned): unbalanced USING (...)")
        (srcRaw.substring(lead, close + 1),
          aliasOf(srcRaw.substring(close + 1).trim.split("\\s+").toSeq
            .filter(_.nonEmpty), "USING source"))
      } else {
        val toks = srcRaw.trim.split("\\s+").toSeq
        (toks.head, aliasOf(toks.drop(1), "USING source"))
      }
    // ON: conjunction of same-name equality keys
    val condRaw = sql.substring(onPos + "ON".length, whenPos)
    val condMasked = masked.substring(onPos + "ON".length, whenPos)
    val conjuncts = {
      val cuts = scala.collection.mutable.ArrayBuffer[Int](-"AND".length)
      var i = 0
      while (i < condMasked.length) {
        val p = topLevelKeyword(condMasked, i, "AND")
        if (p < 0) i = condMasked.length
        else { cuts += p; i = p + 3 }
      }
      cuts += condMasked.length
      cuts.toSeq.sliding(2).map(w =>
        condRaw.substring(w(0) + "AND".length, w(1)).trim).toSeq
    }
    val EqKey =
      "(?s)^\\s*(?:(\\w+)\\s*\\.\\s*)?`?(\\w+)`?\\s*=\\s*(?:(\\w+)\\s*\\.\\s*)?`?(\\w+)`?\\s*$".r
    val keys = conjuncts.map {
      case EqKey(_, c1, _, c2) if c1.equalsIgnoreCase(c2) => c1
      case other => throw new IllegalArgumentException(
        s"MERGE INTO (versioned): ON term `$other` must be a same-name " +
          "equality key (t.k = s.k) — that is the contract the " +
          "stat-pruned merge implements")
    }
    val clauses = parseMergeClauses(sql, masked, whenPos)
    val matched = clauses.collect { case (0, c) => c }
    val notMatched = clauses.collect { case (1, c) => c }
    val nmbs = clauses.collect { case (2, c) => c }
    val legacyUpsert = nmbs.isEmpty &&
      matched == Seq(SqlMergeClause(None, SqlMergeAction.UpdateAll)) &&
      notMatched == Seq(SqlMergeClause(None, SqlMergeAction.InsertAll))
    // the specialized upsert path has no evolution — WITH SCHEMA
    // EVOLUTION routes even the exact two-clause form to the general
    // clause engine (the CDC-apply pattern this modifier exists for)
    if (legacyUpsert && !evolve) return Some(GraftMerge(target, sourceSql, keys))
    // aliases: explicit > name-derived; a DERIVED alias that collides
    // with a key or the other side falls back to an unreferencable
    // placeholder (the user never wrote it, so nothing references it —
    // an EXPLICIT collision reaches mergeClauses and fails loudly)
    def namePart(n: String): Option[String] = {
      val t = n.trim
      if (t.isEmpty || t.startsWith("'") || t.startsWith("\"") ||
          t.startsWith("(")) None
      else Some(t.split('.').last.stripPrefix("`").stripSuffix("`"))
    }
    val targetAlias = tgtAliasExp.getOrElse(
      namePart(target).filterNot(a => keys.exists(_.equalsIgnoreCase(a)) ||
        srcAliasExp.exists(_.equalsIgnoreCase(a))).getOrElse("__target"))
    val sourceAlias = srcAliasExp.getOrElse(
      namePart(sourceSql).filterNot(a =>
        keys.exists(_.equalsIgnoreCase(a)) ||
          a.equalsIgnoreCase(targetAlias)).getOrElse("__source"))
    Some(GraftMergeClauses(target, sourceSql, keys, targetAlias, sourceAlias,
      matched, notMatched, nmbs, evolveSchema = evolve))
  }

  private val NmbsHeadRe =
    "(?is)^\\s*WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE\\b".r
  private val NotMatchedHeadRe =
    "(?is)^\\s*WHEN\\s+NOT\\s+MATCHED(\\s+BY\\s+TARGET)?\\b".r
  private val MatchedHeadRe = "(?is)^\\s*WHEN\\s+MATCHED\\b".r
  private val AndLeadRe = "(?is)^\\s*AND\\b".r
  private val UpdateAllRe = "(?is)^UPDATE\\s+SET\\s+\\*\\s*$".r
  private val UpdateSetRe = "(?is)^UPDATE\\s+SET\\b".r
  private val DeleteActRe = "(?is)^DELETE\\s*$".r
  private val InsertAllRe = "(?is)^INSERT\\s+\\*\\s*$".r
  private val InsertColsRe = "(?is)^INSERT\\s*\\(".r

  /** Parse the WHEN-clause tail of a versioned MERGE from `whenPos`.
    * Returns (kind, clause) pairs in statement order; kind 0 =
    * MATCHED, 1 = NOT MATCHED [BY TARGET], 2 = NOT MATCHED BY SOURCE.
    * Clause boundaries are depth-0 WHEN keywords of the masked text —
    * a CASE WHEN inside a clause condition must therefore be
    * parenthesized (unparenthesized, its WHEN reads as a clause head
    * and the fragment fails loudly as an unrecognized clause).
    */
  private def parseMergeClauses(sql: String, masked: String, whenPos: Int)
      : Seq[(Int, SqlMergeClause)] = {
    val whens = {
      val buf = scala.collection.mutable.ArrayBuffer[Int](whenPos)
      var p = topLevelKeyword(masked, whenPos + "WHEN".length, "WHEN")
      while (p >= 0) {
        buf += p
        p = topLevelKeyword(masked, p + "WHEN".length, "WHEN")
      }
      buf.toSeq
    }
    (whens :+ sql.length).sliding(2).toSeq.map { case Seq(a, b) =>
      val raw = sql.substring(a, b)
      val mk = masked.substring(a, b)
      val (kind, headEnd) = NmbsHeadRe.findFirstMatchIn(mk)
        .map(h => (2, h.end))
        .orElse(NotMatchedHeadRe.findFirstMatchIn(mk).map(h => (1, h.end)))
        .orElse(MatchedHeadRe.findFirstMatchIn(mk).map(h => (0, h.end)))
        .getOrElse(throw new IllegalArgumentException(
          "MERGE INTO (versioned): unrecognized clause " +
            s"`${stripStmtTail(raw).take(60)}`"))
      val thenPos = topLevelKeyword(mk, headEnd, "THEN")
      require(thenPos > 0, "MERGE INTO (versioned): clause missing THEN: " +
        s"`${stripStmtTail(raw).take(60)}`")
      val cond: Option[String] = {
        val mkBetween = mk.substring(headEnd, thenPos)
        if (mkBetween.trim.isEmpty) None
        else {
          val am = AndLeadRe.findFirstMatchIn(mkBetween).getOrElse(
            throw new IllegalArgumentException(
              "MERGE INTO (versioned): expected `AND <condition>` before " +
                s"THEN, got `${raw.substring(headEnd, thenPos).trim.take(60)}`"))
          Some(raw.substring(headEnd + am.end, thenPos).trim)
            .filter(_.nonEmpty)
        }
      }
      (kind, SqlMergeClause(cond,
        parseMergeAction(kind, raw.substring(thenPos + "THEN".length),
          mk.substring(thenPos + "THEN".length))))
    }
  }

  /** One clause action after THEN. `raw0`/`mk0` share coordinates; the
    * trim window is computed on the MASKED text (a trailing comment is
    * spaces there) and sliced from both.
    */
  private def parseMergeAction(kind: Int, raw0: String, mk0: String)
      : SqlMergeAction = {
    var s = 0
    var e = mk0.length
    // leading: masked whitespace only (a leading comment is all spaces
    // in the masked text, so the aligned raw slice starts past it too)
    while (s < e && mk0.charAt(s).isWhitespace) s += 1
    // trailing: strip ONLY chars that are junk in BOTH texts — masked
    // whitespace alone is ambiguous (a blanked string literal is
    // spaces there but CONTENT in the raw text, e.g. `SET c = 'H'`)
    var trimming = true
    while (trimming && e > s) {
      val cm = mk0.charAt(e - 1)
      val cr = raw0.charAt(e - 1)
      if ((cm.isWhitespace && cr.isWhitespace) || (cm == ';' && cr == ';'))
        e -= 1
      else trimming = false
    }
    val raw = raw0.substring(s, e)
    val mk = mk0.substring(s, e)
    def fail(expected: String): Nothing = throw new IllegalArgumentException(
      s"MERGE INTO (versioned): $expected, got `${raw.take(60)}`")
    // Tail-emptiness on the MASKED text alone is a hole: a blanked
    // string literal is spaces there but CONTENT in the raw text, so
    // `DELETE 'junk'` would parse as if the junk were absent. Every
    // "nothing may follow" check therefore also scans the RAW tail,
    // which may contain only whitespace, semicolons, and COMPLETE
    // comments (a trailing comment is legitimately spaces in mk).
    def rawTailBenign(from: Int): Boolean = {
      val sl = raw
      var i = from
      val n = sl.length
      var ok = true
      while (ok && i < n) {
        val c = sl.charAt(i)
        if (c.isWhitespace || c == ';') i += 1
        else if (c == '-' && i + 1 < n && sl.charAt(i + 1) == '-') {
          while (i < n && sl.charAt(i) != '\n') i += 1
        } else if (c == '/' && i + 1 < n && sl.charAt(i + 1) == '*') {
          val close = sl.indexOf("*/", i + 2)
          if (close < 0) ok = false else i = close + 2
        } else ok = false
      }
      ok
    }
    def requireRawTail(from: Int, what: String): Unit =
      require(rawTailBenign(from),
        s"MERGE INTO (versioned): unexpected text after $what: " +
          s"`${raw.substring(from).trim.take(60)}`")
    if (kind == 1) {
      // NOT MATCHED: INSERT only
      if (InsertAllRe.findFirstIn(mk).isDefined) {
        requireRawTail(mk.indexOf('*') + 1, "INSERT *")
        return SqlMergeAction.InsertAll
      }
      val im = InsertColsRe.findFirstMatchIn(mk).getOrElse(
        fail("WHEN NOT MATCHED supports INSERT * or " +
          "INSERT (cols) VALUES (exprs)"))
      val open = im.end - 1
      def closeOf(from: Int): Int = {
        var depth = 0
        var i = from
        while (i < mk.length) {
          mk.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) return i
            case _ => ()
          }
          i += 1
        }
        fail("unbalanced parentheses in INSERT")
      }
      val close = closeOf(open)
      val cols = splitTopLevelCommas(mk, raw, open + 1, close)
        .map(lastNamePart)
        .filter(_.nonEmpty)
      require(cols.nonEmpty, "MERGE INSERT needs at least one column")
      requireNoDupTargets(cols, "MERGE INSERT")
      val vm = "(?is)^\\s*VALUES\\s*\\(".r
        .findFirstMatchIn(mk.substring(close + 1))
        .getOrElse(fail("expected VALUES (...) after the INSERT column list"))
      val vopen = close + 1 + vm.end - 1
      val vclose = closeOf(vopen)
      require(mk.substring(vclose + 1).trim.isEmpty,
        "MERGE INTO (versioned): unexpected text after INSERT ... VALUES " +
          s"(...): `${raw.substring(vclose + 1).trim.take(60)}`")
      requireRawTail(vclose + 1, "INSERT ... VALUES (...)")
      val vals = splitTopLevelCommas(mk, raw, vopen + 1, vclose)
        .map(_.trim).filter(_.nonEmpty)
      require(cols.length == vals.length,
        s"MERGE INSERT lists ${cols.length} column(s) but " +
          s"${vals.length} value(s)")
      SqlMergeAction.InsertValues(cols, vals)
    } else {
      // MATCHED / NOT MATCHED BY SOURCE: UPDATE or DELETE
      if (DeleteActRe.findFirstIn(mk).isDefined) {
        requireRawTail("DELETE".length, "DELETE")
        return SqlMergeAction.Delete
      }
      if (UpdateAllRe.findFirstIn(mk).isDefined) {
        requireRawTail(mk.indexOf('*') + 1, "UPDATE SET *")
        return SqlMergeAction.UpdateAll
      }
      val um = UpdateSetRe.findFirstMatchIn(mk).getOrElse(
        fail((if (kind == 2) "WHEN NOT MATCHED BY SOURCE" else "WHEN MATCHED") +
          " supports UPDATE SET .../UPDATE SET */DELETE"))
      val assigns = splitTopLevelCommas(mk, raw, um.end, raw.length)
        .map(stripStmtTail).filter(_.nonEmpty)
        .map(splitAssignment("MERGE UPDATE"))
      require(assigns.nonEmpty, "MERGE UPDATE needs at least one SET assignment")
      requireNoDupTargets(assigns.map(_._1), "MERGE UPDATE")
      SqlMergeAction.UpdateSet(assigns)
    }
  }

  private def dmlCommand(sqlText: String): Option[LogicalPlan] = {
    val masked = maskLiteralsAndComments(sqlText)
    updateCommand(sqlText, masked)
      .orElse(deleteCommand(sqlText, masked))
      .orElse(mergeCommand(sqlText, masked))
  }

  /** Substitute `t VERSION AS OF v` / `t TIMESTAMP AS OF ts` over a
    * versioned table with the graftvt DataSourceV2 relation pinned to
    * that version, AT PARSE TIME — Spark's own resolution would reject
    * the time-travel clause for these tables (a temp view / missing
    * catalog entry), and an injected resolution rule would race that
    * rejection inside the same fixed-point batch. Identifiers that do
    * not map to a versioned directory pass through untouched.
    */
  private def substituteTimeTravel(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
    if (!plan.exists(_.isInstanceOf[RelationTimeTravel])) return plan
    val spark = SparkSession.active
    plan.transformUpWithSubqueries {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, v) =>
        VersionedSql.timeTravelDir(spark, u.multipartIdentifier) match {
          case None => tt
          case Some(dir) =>
            val reader = spark.read.format("graftvt")
            val pinned = (v, ts) match {
              case (Some(ver), None) => reader.option("versionAsOf", ver)
              case (None, Some(expr)) =>
                reader.option("timestampAsOf", VersionedSql.timestampBound(expr))
              case _ => throw new IllegalArgumentException(
                "specify VERSION AS OF or TIMESTAMP AS OF, not both")
            }
            pinned.load(dir).queryExecution.logical
        }
    }
  }

  /** `sqlText` with string literals ('…', "…", including '' escapes)
    * and comments (-- to EOL, bracketed) blanked out, same length —
    * so the ASOF regex can only match live syntax, never the words
    * "ASOF JOIN" inside a literal or a comment.
    */
  private def maskLiteralsAndComments(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    def blankUntil(stop: Int): Unit = {
      val s = math.min(stop, sql.length)
      while (i < s) { out(i) = ' '; i += 1 }
    }
    while (i < sql.length) {
      sql.charAt(i) match {
        case q @ ('\'' | '"') =>
          var j = i + 1
          var open = true
          while (open && j < sql.length) {
            sql.charAt(j) match {
              // Spark's default lexer honors backslash escapes
              // (escapedStringLiterals=false), so \' does NOT close the
              // literal — skipping the escaped char keeps the masker in
              // sync with the parser it fronts.
              case '\\' => j += 2
              case c if c == q =>
                if (j + 1 < sql.length && sql.charAt(j + 1) == q) j += 2 // '' escape
                else { open = false; j += 1 }
              case _ => j += 1
            }
          }
          blankUntil(j)
        case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
          var j = i
          while (j < sql.length && sql.charAt(j) != '\n') j += 1
          blankUntil(j)
        case '/' if i + 1 < sql.length && sql.charAt(i + 1) == '*' =>
          // bracketed comments NEST in Spark's lexer — track depth
          var depth = 1
          var j = i + 2
          while (depth > 0 && j < sql.length) {
            if (j + 1 < sql.length &&
                sql.charAt(j) == '/' && sql.charAt(j + 1) == '*') {
              depth += 1; j += 2
            } else if (j + 1 < sql.length &&
                sql.charAt(j) == '*' && sql.charAt(j + 1) == '/') {
              depth -= 1; j += 2
            } else j += 1
          }
          blankUntil(if (depth > 0) sql.length else j)
        case _ => i += 1
      }
    }
    new String(out)
  }

  private def rewrite(sqlText: String,
                      parse: String => LogicalPlan): LogicalPlan = {
    // match offsets against the MASKED text; splice on the original
    val ms = AsOfRe.findAllMatchIn(maskLiteralsAndComments(sqlText)).toList
    if (ms.isEmpty) return parse(sqlText)
    if (ms.length > 1) throw new IllegalArgumentException(
      "only one ASOF JOIN per statement is supported; split the query")
    val m = ms.head
    val leftOuter = m.group(1) != null
    val plain = if (leftOuter) "LEFT JOIN" else "JOIN"
    val plan = parse(
      sqlText.substring(0, m.start) + plain + sqlText.substring(m.end))
    // Relocate the asof site in the parsed tree: the join of the
    // rewritten type whose condition carries an inclusive inequality.
    // Ambiguity (another such join in the same statement) fails loudly
    // rather than guessing.
    val wantType = if (leftOuter) LeftOuter else Inner
    def hasIneq(e: Expression): Boolean = e.exists {
      case _: GreaterThanOrEqual | _: LessThanOrEqual => true
      case _ => false
    }
    // transformUpWithSubqueries: an ASOF JOIN written inside an
    // EXISTS/IN subquery lives in a SubqueryExpression's plan, which a
    // plain transformUp never visits — missing it would convert some
    // OTHER inclusive-inequality join in the outer query instead.
    var replaced = 0
    val out = plan.transformUpWithSubqueries {
      case Join(l, r, t, Some(cond), _) if t == wantType && hasIneq(cond) =>
        replaced += 1
        UnresolvedAsOfJoin(l, r, cond, leftOuter)
    }
    if (replaced != 1) throw new IllegalArgumentException(
      s"could not uniquely locate the ASOF JOIN (found $replaced candidate " +
        "joins with an inclusive time inequality); keep the ASOF JOIN the " +
        "only non-equi join in the statement")
    out
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    maintenanceCommand(sqlText).orElse(dmlCommand(sqlText)).getOrElse(
      substituteTimeTravel(rewrite(sqlText, delegate.parsePlan)))
  override def parseQuery(sqlText: String): LogicalPlan =
    substituteTimeTravel(rewrite(sqlText, delegate.parseQuery))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Parser-produced marker: an as-of join whose condition is still
  * unresolved SQL. Permanently `resolved = false` — either
  * [[ResolveAsOfJoin]] converts it once the children resolve, or
  * analysis fails loudly; parents cannot resolve against it early
  * (ResolveReferences skips operators with unresolved children), which
  * is exactly what makes the late right-side re-aliasing safe.
  */
case class UnresolvedAsOfJoin(left: LogicalPlan, right: LogicalPlan,
                              condition: Expression, leftOuter: Boolean)
    extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule converting [[UnresolvedAsOfJoin]] into the resolved
  * [[AsOfJoin]] composition (fresh-aliased right side + an
  * exprId-restoring projection — the same hygiene
  * [[AsOfJoinPlan.asOfNative]] applies), plus an `IS NOT NULL` filter
  * on the matched right time for the inner (non-LEFT) form.
  */
object ResolveAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ASOF JOIN: $msg")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u @ UnresolvedAsOfJoin(l, r0, cond, leftOuter) if u.childrenResolved =>
      // Self-join hygiene: if the two sides still share attribute ids
      // (DeduplicateRelations rewrites nodes it knows, not this one),
      // re-alias the right side with fresh ids, KEEPING qualifiers so
      // `s.ts`-style references still resolve against it.
      val r =
        if (l.outputSet.intersect(r0.outputSet).isEmpty) r0
        else Project(r0.output.map(a =>
          Alias(a, a.name)(qualifier = a.qualifier)), r0)
      val resolver = conf.resolver
      val resolvedCond = cond.transformUp {
        case ua: UnresolvedAttribute =>
          (l.resolve(ua.nameParts, resolver), r.resolve(ua.nameParts, resolver)) match {
            case (Some(a: Attribute), None) => a
            case (None, Some(a: Attribute)) => a
            case (Some(_), Some(_)) => fail(
              s"column `${ua.name}` is ambiguous — qualify it with a side alias")
            case (None, None) => fail(s"cannot resolve column `${ua.name}`")
            case _ => fail(s"`${ua.name}` must be a plain column reference")
          }
      }
      val lSet = l.outputSet
      val rSet = AttributeSet(r.output)
      def sideOf(a: Attribute): Char =
        if (lSet.contains(a)) 'l'
        else if (rSet.contains(a)) 'r'
        else fail(s"column `${a.name}` belongs to neither join side")
      var keys = Vector.empty[(Attribute, Attribute)]
      var time: Option[(Attribute, Attribute, String)] = None
      splitConjunctivePredicates(resolvedCond).foreach {
        case EqualTo(a: Attribute, b: Attribute) =>
          (sideOf(a), sideOf(b)) match {
            case ('l', 'r') => keys :+= ((a, b))
            case ('r', 'l') => keys :+= ((b, a))
            case _ => fail(s"equality `${a.name} = ${b.name}` must compare " +
              "a left column to a right column")
          }
        case cmp @ (_: GreaterThanOrEqual | _: LessThanOrEqual) =>
          if (time.nonEmpty) fail("exactly one time inequality is allowed")
          val (a, b, geq) = cmp match {
            case GreaterThanOrEqual(x: Attribute, y: Attribute) => (x, y, true)
            case LessThanOrEqual(x: Attribute, y: Attribute) => (x, y, false)
            case _ => fail("the time inequality must compare two plain columns")
          }
          time = Some((sideOf(a), sideOf(b)) match {
            // l >= r → latest right at-or-before (backward);
            // l <= r → earliest right at-or-after (forward).
            case ('l', 'r') => (a, b, if (geq) "backward" else "forward")
            case ('r', 'l') => (b, a, if (geq) "forward" else "backward")
            case _ => fail("the time inequality must compare left vs right")
          })
        case (_: GreaterThan | _: LessThan) =>
          fail("strict bounds are unsupported — as-of bounds are " +
            "inclusive (>= / <=) only")
        case other: BinaryComparison =>
          fail(s"unsupported comparison `${other.sql}` — only plain-column " +
            "equality keys and one inclusive time inequality are supported")
        case other => fail(s"unsupported condition term `${other.sql}`")
      }
      val (lTime, rTime, direction) =
        time.getOrElse(fail("condition needs a time inequality " +
          "(l.ts >= r.ts for backward, l.ts <= r.ts for forward)"))
      if (keys.isEmpty) fail("at least one equality key is required " +
        "(keyless global as-of is not supported)")
      // Same composition as asOfNative: fresh right ids under the node,
      // an exprId-restoring projection above it, so parent operators
      // keep resolving against the ORIGINAL right attributes.
      val rAliases = r.output.map(a => Alias(a, a.name)())
      val rProj = Project(rAliases, r)
      val fresh = AttributeMap(r.output.zip(rAliases.map(_.toAttribute)))
      val node = AsOfJoin(l, rProj,
        keys.map(_._1), keys.map(k => fresh(k._2)),
        lTime, fresh(rTime), direction, None)
      // Reference the node's OUTPUT attributes (right side marked
      // nullable), not the pre-join aliases: a non-nullable reference
      // over the null-extended side would read stored nulls as zeros.
      val freshNullable = node.output.drop(l.output.length)
      val restore: Seq[NamedExpression] = l.output ++
        r.output.zip(freshNullable).map { case (orig, f) =>
          Alias(f, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
        }
      val restored = Project(restore, node)
      // DuckDB's plain ASOF JOIN is inner: left rows without a match
      // drop. Matched ⇔ the joined right time is non-null (null right
      // times never match by the operator's contract).
      if (leftOuter) restored else Filter(IsNotNull(rTime), restored)
  }
}
