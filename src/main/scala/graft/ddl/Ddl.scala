package graft.ddl

import graft.types.CHType
import org.apache.spark.sql.types.StructType

/** DDL generation (SURVEY.md §2.1 A13; reference:
  * `clickhouse-arrow/src/schema.rs:89-293` `CreateOptions`, `:488`
  * `create_table_statement_from_arrow`, `:548-600`
  * `create_table_statement`, `:405,437` database DDL).
  *
  * Produces ClickHouse `CREATE TABLE` / `CREATE DATABASE` SQL from either a
  * Spark `StructType` (via the CHType mapping) or explicit CH columns —
  * engine, ORDER BY, PARTITION BY, PRIMARY KEY, SAMPLE BY, TTL, per-column
  * defaults and type overrides, table settings.
  */
final case class CreateOptions(
    engine: String = "MergeTree()",
    orderBy: Seq[String] = Nil,
    partitionBy: Option[String] = None,
    primaryKeys: Seq[String] = Nil,
    sampleBy: Option[String] = None,
    ttl: Option[String] = None,
    settings: Seq[(String, String)] = Nil,
    defaults: Map[String, String] = Map.empty,
    /** per-column CH type overrides, e.g. force a String column to Enum8 —
      * the reference's `SchemaConversions` (arrow/types.rs:10, 81-116) */
    schemaConversions: Map[String, CHType] = Map.empty,
    ifNotExists: Boolean = true,
    /** Spark→CH mapping knobs — the reference's remaining ArrowOptions
      * (`use_date32_for_date`/`strict_schema`/
      * `nullable_array_default_empty`, client/options.rs:284-290). The
      * reference flips DDL to strict by default (`into_strict_ddl`)
      * unless `disable_strict_schema_ddl`; here DDL stays relaxed unless
      * opted in — a documented deviation, because Spark schemas are
      * nullable-by-default and reference-strict DDL would reject nearly
      * every real DataFrame. */
    mapping: CHType.MappingOptions = CHType.MappingOptions.default)

object Ddl {

  /** Escape a ClickHouse identifier with backticks (reference escapes
    * identifiers for the HTTP path in `src/http/escape.rs`). */
  def ident(name: String): String = "`" + name.replace("`", "\\`") + "`"

  def createDatabase(db: String, ifNotExists: Boolean = true): String =
    s"CREATE DATABASE ${if (ifNotExists) "IF NOT EXISTS " else ""}${ident(db)}"

  def dropDatabase(db: String, ifExists: Boolean = true): String =
    s"DROP DATABASE ${if (ifExists) "IF EXISTS " else ""}${ident(db)}"

  def dropTable(db: Option[String], table: String, ifExists: Boolean = true): String =
    s"DROP TABLE ${if (ifExists) "IF EXISTS " else ""}${qualified(db, table)}"

  private def qualified(db: Option[String], table: String): String =
    db.map(d => s"${ident(d)}.").getOrElse("") + ident(table)

  /** CREATE TABLE from explicit ClickHouse columns. */
  def createTable(
      db: Option[String],
      table: String,
      columns: Seq[(String, CHType)],
      opts: CreateOptions = CreateOptions()): String = {
    require(columns.nonEmpty, "cannot create a table with no columns")
    val cols = columns.map { case (name, t0) =>
      val t = opts.schemaConversions.getOrElse(name, t0)
      // strict_schema: reject invariant violations a relaxed run would
      // silently normalize away (Nullable(LowCardinality) et al.)
      if (opts.mapping.strictSchema && CHType.normalize(t) != t)
        throw new IllegalArgumentException(
          s"column $name: declared type ${CHType.format(t)} violates a " +
            s"ClickHouse invariant (normalizes to " +
            s"${CHType.format(CHType.normalize(t))}); strictSchema=true " +
            "refuses the silent correction")
      val default = opts.defaults.get(name).map(d => s" DEFAULT $d").getOrElse("")
      s"    ${ident(name)} ${CHType.format(CHType.normalize(t))}$default"
    }
    val sb = new StringBuilder
    sb ++= s"CREATE TABLE ${if (opts.ifNotExists) "IF NOT EXISTS " else ""}${qualified(db, table)}\n"
    sb ++= "(\n" + cols.mkString(",\n") + "\n)\n"
    sb ++= s"ENGINE = ${opts.engine}"
    // MergeTree family requires ORDER BY; `tuple()` is the documented
    // "no ordering" form the reference emits (schema.rs:548-600)
    if (opts.engine.contains("MergeTree")) {
      val order = if (opts.orderBy.nonEmpty) opts.orderBy.map(ident).mkString(", ") else "tuple()"
      sb ++= s"\nORDER BY (${order})"
    }
    opts.primaryKeys.headOption.foreach { _ =>
      sb ++= s"\nPRIMARY KEY (${opts.primaryKeys.map(ident).mkString(", ")})"
    }
    opts.partitionBy.foreach(p => sb ++= s"\nPARTITION BY $p")
    opts.sampleBy.foreach(p => sb ++= s"\nSAMPLE BY $p")
    opts.ttl.foreach(p => sb ++= s"\nTTL $p")
    if (opts.settings.nonEmpty) {
      sb ++= "\nSETTINGS " + opts.settings.map { case (k, v) => s"$k = $v" }.mkString(", ")
    }
    sb.toString
  }

  /** CREATE TABLE from a Spark schema (reference: from-arrow path,
    * schema.rs:488 + arrow_to_ch_type under strict DDL opts). */
  def createTableFromSpark(
      db: Option[String],
      table: String,
      schema: StructType,
      opts: CreateOptions = CreateOptions()): String = {
    val cols = schema.fields.map(f => f.name -> CHType.fromSparkField(f, opts.mapping)).toSeq
    createTable(db, table, cols, opts)
  }
}
