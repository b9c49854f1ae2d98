package graft.connector

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse-style `system.*` introspection tables (reference users query
  * `system.tables` / `system.columns` / `system.functions` /
  * `system.settings` / `system.one` constantly; the reference exposes the
  * same surface through `fetch_schemas` + raw SQL,
  * `clickhouse-arrow/src/client.rs:2263,2414`).
  *
  * A DSv2 `TableCatalog` whose tables are driver-local metadata snapshots:
  * each scan implements [[LocalScan]], so the rows are computed on the
  * driver from the ACTIVE session's catalog/conf state at execution time —
  * no executor work, no files, always current. Register as
  * `spark.sql.catalog.system = graft.connector.SystemCatalog` (done by
  * `Sessions.withGraftConfs`), then:
  *
  *   SELECT * FROM system.tables WHERE database = 'default'
  *   SELECT name, type FROM system.columns WHERE table = 'nation_v'
  *   SELECT count(*) FROM system.functions WHERE name LIKE 'array%'
  *   SELECT value FROM system.settings WHERE name = 'spark.sql.shuffle.partitions'
  *   SELECT dummy FROM system.one
  *
  * 100-TB note: these tables are metadata-sized by construction (catalog
  * entries, not data), so a driver-local scan is the CORRECT distribution
  * strategy — shipping executor tasks to enumerate a metastore would add
  * latency, not parallelism.
  */
class SystemCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    SystemCatalog.tableNames.map(Identifier.of(namespace, _)).toArray

  override def loadTable(ident: Identifier): Table =
    SystemCatalog.tableNames.find(_.equalsIgnoreCase(ident.name())) match {
      case Some(kind) => new SystemTable(kind)
      case None =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Seq(catalogName, ident.name()))
    }

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("system tables are read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("system tables are read-only")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("system tables are read-only")
}

object SystemCatalog {
  val tableNames: Seq[String] =
    // numbers_mt is CH's multithreaded spelling of the same unbounded
    // sequence (the reference test corpus queries it) — one table here
    Seq("tables", "columns", "functions", "settings", "one", "numbers", "numbers_mt")

  /** `system.numbers` is unbounded in CH (clients always LIMIT it); a
    * Spark batch scan must be finite, so an un-pushed read caps here. */
  val NumbersDefaultCap = 1 << 20

  def schemaOf(kind: String): StructType = kind match {
    case "tables" => StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("engine", StringType, nullable = false),
      StructField("is_temporary", BooleanType, nullable = false)))
    case "columns" => StructType(Seq(
      StructField("database", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("position", IntegerType, nullable = false),
      StructField("is_nullable", BooleanType, nullable = false)))
    case "functions" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("origin", StringType, nullable = false)))
    case "settings" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("value", StringType, nullable = false)))
    case "one" => StructType(Seq(
      StructField("dummy", ByteType, nullable = false)))
    case "numbers" | "numbers_mt" => StructType(Seq(
      StructField("number", LongType, nullable = false)))
  }

  private def s(v: String) = UTF8String.fromString(v)

  /** Snapshot the active session's metadata as InternalRows. */
  def rowsOf(kind: String): Array[InternalRow] = {
    val spark = SparkSession.active
    kind match {
      case "tables" =>
        spark.catalog.listDatabases().collect().flatMap { d =>
          spark.catalog.listTables(d.name).collect().map { t =>
            new GenericInternalRow(Array[Any](
              s(Option(t.database).getOrElse("")), s(t.name),
              s(Option(t.tableType).getOrElse("UNKNOWN")), t.isTemporary))
          }
        }
      case "columns" =>
        spark.catalog.listDatabases().collect().flatMap { d =>
          spark.catalog.listTables(d.name).collect().flatMap { t =>
            val qualified =
              if (t.isTemporary || t.database == null) t.name
              else s"${t.database}.${t.name}"
            spark.catalog.listColumns(qualified).collect().zipWithIndex.map {
              case (c, i) =>
                new GenericInternalRow(Array[Any](
                  s(Option(t.database).getOrElse("")), s(t.name), s(c.name),
                  s(c.dataType), i + 1, c.nullable))
            }
          }
        }
      case "functions" =>
        spark.catalog.listFunctions().collect().map { f =>
          val origin =
            if (Option(f.className).exists(_.contains("graft"))) "graft" else "builtin"
          new GenericInternalRow(Array[Any](s(f.name), s(origin)))
        }
      case "settings" =>
        spark.conf.getAll.toArray.sortBy(_._1).map { case (k, v) =>
          new GenericInternalRow(Array[Any](s(k), s(v)))
        }
      case "one" =>
        Array(new GenericInternalRow(Array[Any](0.toByte)))
    }
  }
}

/** One metadata table; every scan is a fresh driver-local snapshot.
  * `numbers` additionally accepts LIMIT pushdown (CH's `system.numbers`
  * is unbounded and always consumed under a LIMIT). */
class SystemTable(kind: String) extends Table with SupportsRead {
  override def name(): String = kind
  override def schema(): StructType = SystemCatalog.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with org.apache.spark.sql.connector.read.SupportsPushDownLimit {
      private var limit: Option[Int] = None
      override def pushLimit(n: Int): Boolean =
        if (kind.startsWith("numbers")) { limit = Some(n); true } else false
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = SystemCatalog.schemaOf(kind)
        override def rows(): Array[InternalRow] =
          if (kind.startsWith("numbers")) {
            val n = limit.getOrElse(SystemCatalog.NumbersDefaultCap)
            Array.tabulate(n)(i => new GenericInternalRow(Array[Any](i.toLong)))
          } else SystemCatalog.rowsOf(kind)
        override def description(): String = s"system.$kind (driver-local metadata snapshot)"
      }
    }
}
