package graft.ddl

import graft.types.CHType
import graft.types.CHType._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** String-exact DDL tests (mirrors the reference's unit level for
  * `create_table_statement`, schema.rs:548-600). */
class DdlSpec extends AnyFunSuite {

  test("create table with engine, order by, partition by, ttl, settings") {
    val sql = Ddl.createTable(
      Some("db"), "t",
      Seq("id" -> Int64, "name" -> Nullable(CHString), "ts" -> DateTime(None)),
      CreateOptions(
        engine = "MergeTree()",
        orderBy = Seq("id"),
        partitionBy = Some("toYYYYMM(ts)"),
        ttl = Some("ts + INTERVAL 30 DAY"),
        settings = Seq("index_granularity" -> "8192"),
        defaults = Map("name" -> "'unknown'")))
    assert(sql ===
      """CREATE TABLE IF NOT EXISTS `db`.`t`
        |(
        |    `id` Int64,
        |    `name` Nullable(String) DEFAULT 'unknown',
        |    `ts` DateTime
        |)
        |ENGINE = MergeTree()
        |ORDER BY (`id`)
        |PARTITION BY toYYYYMM(ts)
        |TTL ts + INTERVAL 30 DAY
        |SETTINGS index_granularity = 8192""".stripMargin)
  }

  test("MergeTree with no order by emits tuple()") {
    val sql = Ddl.createTable(None, "t", Seq("a" -> Int32))
    assert(sql.contains("ORDER BY (tuple())"))
  }

  test("schema conversions override column types (SchemaConversions equivalent)") {
    val sql = Ddl.createTable(
      None, "t",
      Seq("status" -> CHString),
      CreateOptions(schemaConversions = Map(
        "status" -> Enum8(Seq("ok" -> 0, "err" -> 1)))))
    assert(sql.contains("`status` Enum8('ok' = 0, 'err' = 1)"))
  }

  test("create table from a Spark schema") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("price", DoubleType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = false)))
    val sql = Ddl.createTableFromSpark(None, "t", schema,
      CreateOptions(orderBy = Seq("id"), ifNotExists = false))
    assert(sql ===
      """CREATE TABLE `t`
        |(
        |    `id` Int64,
        |    `price` Nullable(Float64),
        |    `tags` Array(String)
        |)
        |ENGINE = MergeTree()
        |ORDER BY (`id`)""".stripMargin)
  }

  test("nullable-lowcardinality transposition is applied in DDL") {
    val sql = Ddl.createTable(None, "t",
      Seq("c" -> Nullable(LowCardinality(CHString))))
    assert(sql.contains("`c` LowCardinality(Nullable(String))"))
  }

  test("database DDL and identifier escaping") {
    assert(Ddl.createDatabase("my db") === "CREATE DATABASE IF NOT EXISTS `my db`")
    assert(Ddl.dropTable(Some("d"), "t`x") === "DROP TABLE IF EXISTS `d`.`t\\`x`")
  }
}
