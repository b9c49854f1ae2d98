package graft.connector

import org.apache.spark.sql.sources._

/** ClickHouse-SQL text generation for the connector: identifier/literal
  * escaping (reference: `clickhouse-arrow/src/http/escape.rs`) and the
  * pushdown translation of Spark `Filter`s into WHERE clauses
  * (the DSv2 counterpart of the reference's server-side pushdown — the
  * server plans WHERE/SELECT/LIMIT itself, SURVEY.md §4.1).
  */
object CHSql {

  /** Backtick-quoted identifier, backticks and backslashes escaped. */
  def ident(name: String): String =
    "`" + name.replace("\\", "\\\\").replace("`", "\\`") + "`"

  /** Table reference: `db`.`table` or `table`. */
  def tableRef(table: String, database: Option[String]): String =
    database.map(d => s"${ident(d)}.").getOrElse("") + ident(table)

  /** Single-quoted string literal, backslash + quote escaped. */
  def stringLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  def lit(v: Any): String = v match {
    case null => "NULL"
    case s: String => stringLit(s)
    case s: org.apache.spark.unsafe.types.UTF8String => stringLit(s.toString)
    case b: Boolean => if (b) "1" else "0"
    case d: java.sql.Date => s"toDate(${stringLit(d.toString)})"
    case d: java.time.LocalDate => s"toDate(${stringLit(d.toString)})"
    case t: java.sql.Timestamp =>
      s"toDateTime64(${stringLit(t.toInstant.toString.stripSuffix("Z"))}, 6)"
    case t: java.time.Instant =>
      s"toDateTime64(${stringLit(t.toString.stripSuffix("Z"))}, 6)"
    case b: Array[Byte] => "unhex(" + stringLit(b.map("%02x".format(_)).mkString) + ")"
    case n: java.math.BigDecimal => n.toPlainString
    case n: BigDecimal => n.underlying.toPlainString
    case other => other.toString // numeric types
  }

  /** LIKE-pattern escape for startsWith/endsWith/contains pushdown. */
  private def likeLit(fragment: String, prefix: String, suffix: String): String =
    stringLit(prefix + fragment.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_") + suffix)

  /** Compile one Spark filter to a CH WHERE fragment; None = not
    * pushable (stays a Spark-side residual only). */
  def compileFilter(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => Some(s"${ident(a)} = ${lit(v)}")
    case EqualNullSafe(a, null) => Some(s"${ident(a)} IS NULL")
    case EqualNullSafe(a, v) => Some(s"${ident(a)} IS NOT NULL AND ${ident(a)} = ${lit(v)}")
    case GreaterThan(a, v) => Some(s"${ident(a)} > ${lit(v)}")
    case GreaterThanOrEqual(a, v) => Some(s"${ident(a)} >= ${lit(v)}")
    case LessThan(a, v) => Some(s"${ident(a)} < ${lit(v)}")
    case LessThanOrEqual(a, v) => Some(s"${ident(a)} <= ${lit(v)}")
    case In(a, vs) if vs.nonEmpty => Some(s"${ident(a)} IN (${vs.map(lit).mkString(", ")})")
    case IsNull(a) => Some(s"${ident(a)} IS NULL")
    case IsNotNull(a) => Some(s"${ident(a)} IS NOT NULL")
    case StringStartsWith(a, v) => Some(s"${ident(a)} LIKE ${likeLit(v, "", "%")}")
    case StringEndsWith(a, v) => Some(s"${ident(a)} LIKE ${likeLit(v, "%", "")}")
    case StringContains(a, v) => Some(s"${ident(a)} LIKE ${likeLit(v, "%", "%")}")
    case And(l, r) =>
      for (cl <- compileFilter(l); cr <- compileFilter(r)) yield s"($cl AND $cr)"
    case Or(l, r) =>
      for (cl <- compileFilter(l); cr <- compileFilter(r)) yield s"($cl OR $cr)"
    case Not(c) => compileFilter(c).map(cc => s"(NOT $cc)")
    case _ => None
  }

  /** Build the pushed-down SELECT for one scan partition. */
  def select(
      table: String,
      database: Option[String],
      columns: Seq[String],
      whereFragments: Seq[String],
      limit: Option[Int]): String = {
    val cols = if (columns.isEmpty) "1" else columns.map(ident).mkString(", ")
    val where =
      if (whereFragments.isEmpty) "" else whereFragments.mkString(" WHERE (", ") AND (", ")")
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    s"SELECT $cols FROM ${tableRef(table, database)}$where$lim"
  }
}
