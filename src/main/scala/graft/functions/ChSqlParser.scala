package graft.functions

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** ClickHouse parameterized-aggregate syntax shim (SURVEY §2.2; reference
  * users ship CH SQL text): CH spells `quantile(0.9)(x)` — parameters in a
  * FIRST argument list, inputs in a SECOND — which Spark's grammar cannot
  * form. This injected parser (`SparkSessionExtensions.injectParser`)
  * rewrites that call shape into the two-argument spellings ChDialect
  * registers, then delegates to Spark's own parser:
  *
  *   quantile(0.9)(x)        → quantile(x, 0.9)
  *   quantileExact(0.5)(x)   → quantileExact(x, 0.5)
  *   quantileTDigest(0.9)(x) → quantileTDigest(x, 0.9)
  *   quantiles(0.1,0.9)(x)   → percentile(x, array(0.1,0.9))
  *   uniqCombined(12)(x)     → uniqCombined(x)   (precision hint dropped —
  *                             Spark's HLL++ tunes via relativeSD, not 2^p)
  *
  * The rewrite is purely textual but quote/comment-aware: content inside
  * '…', "…", `…`, -- line comments and &#47;* block comments is never
  * touched, so a string literal containing "quantile(0.5)(x)" survives
  * verbatim. `name(a)(b)` is not valid Spark SQL for any other reading, so
  * the rewrite can never change the meaning of a working Spark query.
  */
class ChSqlParser(delegate: ParserInterface) extends ParserInterface {
  private def rw(sqlText: String): String = ChSqlRewrite(sqlText)

  override def parsePlan(sqlText: String): LogicalPlan = delegate.parsePlan(rw(sqlText))
  // parsePlanWithParameters is a DEFAULT method: without this override the
  // wrapper would inherit the interface default and silently drop the
  // bound-parameter context (A15 named params would arrive unbound)
  override def parsePlanWithParameters(
      sqlText: String,
      parameters: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(rw(sqlText), parameters)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(rw(sqlText))
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(rw(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

object ChSqlRewrite {
  /** name(P)(A) → name(A, P) */
  private val swapParam = Set("quantile", "quantileexact", "quantiletdigest", "uniqupto")

  /** CH queries routinely end `... FORMAT JSONEachRow;` — the output
    * format is a CLIENT concern in CH (a DataFrame here), and Spark's
    * grammar rejects the clause. Strip a trailing `FORMAT <ident>` and/or
    * `;`. No valid Spark query can end this way (an alias named `format`
    * cannot be followed by a bare identifier), so this only rescues
    * queries that would otherwise fail to parse. */
  private val trailingFormat =
    "(?is)\\s+FORMAT\\s+[A-Za-z][A-Za-z0-9_]*\\s*;?\\s*$".r
  private val trailingSemi = "(?s)\\s*;\\s*$".r

  /** CH EXPLAIN operations (reference `explain.rs`) → the nearest Spark
    * EXPLAIN mode: AST/SYNTAX → EXTENDED (parsed + rewritten plans),
    * PLAN/PIPELINE → FORMATTED (logical/physical), ESTIMATE → COST. */
  private val chExplain =
    "(?is)^(\\s*EXPLAIN\\s+)(AST|SYNTAX|PLAN|PIPELINE|ESTIMATE)\\b".r

  private def mapExplain(sql: String): String =
    chExplain.replaceAllIn(sql, m => {
      val mode = m.group(2).toUpperCase match {
        case "AST" | "SYNTAX" => "EXTENDED"
        case "PLAN" | "PIPELINE" => "FORMATTED"
        case "ESTIMATE" => "COST"
      }
      java.util.regex.Matcher.quoteReplacement(m.group(1) + mode)
    })

  /** CH `FROM t [LEFT] ARRAY JOIN expr AS alias` → Spark
    * `LATERAL VIEW explode[_outer](expr) ch_aj AS alias`. Single-array,
    * aliased form only: CH's multi-array ARRAY JOIN zips arrays
    * positionally (chained LATERAL VIEWs would cross-product — wrong),
    * and the bare-column form shadows the source column (ambiguous in
    * Spark); both are left untouched and fail loudly at parse. */
  private def rewriteArrayJoin(sql: String): String = {
    val stops = Set("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
      "SETTINGS", "FORMAT", "UNION", "INTERSECT", "EXCEPT", "WINDOW", "QUALIFY")
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') i = skipQuoted(sql, i)
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') i = skipLine(sql, i)
      else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') i = skipBlock(sql, i)
      else if (Character.isJavaIdentifierStart(c)) {
        val start = i
        while (i < n && Character.isJavaIdentifierPart(sql.charAt(i))) i += 1
        val w1 = sql.substring(start, i)
        if (w1.equalsIgnoreCase("ARRAY") || w1.equalsIgnoreCase("LEFT")) {
          // try to read "[LEFT] ARRAY JOIN"
          var p = skipWs(sql, i)
          var left = false
          var arrayAt = start
          var ok = w1.equalsIgnoreCase("ARRAY")
          if (w1.equalsIgnoreCase("LEFT")) {
            val (word, after) = readWord(sql, p)
            if (word.equalsIgnoreCase("ARRAY")) { left = true; ok = true; p = skipWs(sql, after) }
          } else arrayAt = start
          if (ok) {
            val (join, afterJoin) = readWord(sql, if (w1.equalsIgnoreCase("ARRAY")) p else p)
            if (join.equalsIgnoreCase("JOIN")) {
              // capture expr .. [AS alias] until a depth-0 stop keyword,
              // comma (multi-array: bail), or end
              var q = skipWs(sql, afterJoin)
              val exprStart = q
              var depth = 0
              var exprEnd = -1
              var bail = false
              while (q < n && exprEnd < 0 && !bail) {
                val ch = sql.charAt(q)
                if (ch == '\'' || ch == '"' || ch == '`') q = skipQuoted(sql, q)
                else if (ch == '(') { depth += 1; q += 1 }
                else if (ch == ')') {
                  if (depth == 0) exprEnd = q else { depth -= 1; q += 1 }
                } else if (ch == ',' && depth == 0) bail = true
                else if (Character.isJavaIdentifierStart(ch) && depth == 0) {
                  val ws = q
                  while (q < n && Character.isJavaIdentifierPart(sql.charAt(q))) q += 1
                  if (stops.contains(sql.substring(ws, q).toUpperCase)) exprEnd = ws
                } else q += 1
              }
              if (!bail) {
                if (exprEnd < 0) exprEnd = n
                val segment = sql.substring(exprStart, exprEnd).trim
                // split the trailing "AS alias"
                val m = java.util.regex.Pattern
                  .compile("(?is)^(.*\\S)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)\\s*$")
                  .matcher(segment)
                if (m.matches()) {
                  val fn = if (left) "explode_outer" else "explode"
                  val repl = s"LATERAL VIEW $fn(${m.group(1)}) ch_aj_ AS ${m.group(2)} "
                  return rewriteArrayJoin(
                    sql.substring(0, if (left) start else arrayAt) + repl + sql.substring(exprEnd))
                }
              }
            }
          }
        }
      } else i += 1
    }
    sql
  }

  private def readWord(s: String, start: Int): (String, Int) = {
    var i = start
    if (i < s.length && Character.isJavaIdentifierStart(s.charAt(i))) {
      while (i < s.length && Character.isJavaIdentifierPart(s.charAt(i))) i += 1
      (s.substring(start, i), i)
    } else ("", start)
  }

  def apply(sql: String): String = {
    var cur = rewriteArrayJoin(mapExplain(trailingSemi.replaceFirstIn(
      trailingFormat.replaceFirstIn(sql, ""), "")))
    var changed = true
    var guard = 0
    while (changed && guard < 1000) {
      val next = rewriteOnce(cur)
      changed = next ne cur
      cur = next
      guard += 1
    }
    cur
  }

  /** Rewrites the FIRST parameterized call found, or returns `sql` (eq). */
  private def rewriteOnce(sql: String): String = {
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') i = skipQuoted(sql, i)
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') i = skipLine(sql, i)
      else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') i = skipBlock(sql, i)
      else if (Character.isJavaIdentifierStart(c)) {
        val start = i
        while (i < n && Character.isJavaIdentifierPart(sql.charAt(i))) i += 1
        val lower = sql.substring(start, i).toLowerCase
        if (swapParam.contains(lower) || lower == "quantiles" || lower == "uniqcombined") {
          val j = skipWs(sql, i)
          if (j < n && sql.charAt(j) == '(') {
            val e1 = matchParen(sql, j)
            val k = if (e1 > 0) skipWs(sql, e1) else n
            if (e1 > 0 && k < n && sql.charAt(k) == '(') {
              val e2 = matchParen(sql, k)
              if (e2 > 0) {
                val name = sql.substring(start, i)
                val params = sql.substring(j + 1, e1 - 1)
                val args = sql.substring(k + 1, e2 - 1)
                val repl =
                  if (lower == "quantiles") s"percentile($args, array($params))"
                  else if (lower == "uniqcombined") s"$name($args)"
                  else s"$name($args, $params)"
                return sql.substring(0, start) + repl + sql.substring(e2)
              }
            }
          }
        }
      } else i += 1
    }
    sql
  }

  /** Index just past the closing quote; '' / "" / \-escapes stay inside. */
  private def skipQuoted(s: String, start: Int): Int = {
    val q = s.charAt(start)
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && q != '`') i += 2
      else if (c == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2 // doubled quote
        else return i + 1
      } else i += 1
    }
    i
  }

  private def skipLine(s: String, start: Int): Int = {
    var i = start
    while (i < s.length && s.charAt(i) != '\n') i += 1
    i
  }

  private def skipBlock(s: String, start: Int): Int = {
    var i = start + 2
    while (i + 1 < s.length && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
    math.min(i + 2, s.length)
  }

  private def skipWs(s: String, start: Int): Int = {
    var i = start
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    i
  }

  /** `s(open) == '('`; returns index just past the matching ')' or -1.
    * Quote/comment-aware so parens inside literals don't count. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') i = skipQuoted(s, i)
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') i = skipLine(s, i)
      else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') i = skipBlock(s, i)
      else {
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return i + 1 }
        i += 1
      }
    }
    -1
  }
}
