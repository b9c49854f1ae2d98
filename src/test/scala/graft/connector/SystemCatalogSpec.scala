package graft.connector

import graft.SparkSpec

/** `system.*` introspection tables resolve through the DSv2 catalog and
  * reflect live session state. */
class SystemCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("system.one returns the single dummy row") {
    val r = spark.sql("SELECT dummy FROM system.one").collect()
    assert(r.length === 1 && r.head.getByte(0) === 0.toByte)
  }

  test("system.tables sees a newly created temp view") {
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("sys_spec_view")
    val rows = spark.sql(
      "SELECT name, is_temporary FROM system.tables WHERE name = 'sys_spec_view'").collect()
    assert(rows.length === 1 && rows.head.getBoolean(1))
  }

  test("system.columns reports names, types and 1-based positions") {
    Seq((1, "x", 2.5)).toDF("id", "v", "w").createOrReplaceTempView("sys_cols_view")
    val rows = spark.sql(
      """SELECT name, type, position FROM system.columns
        |WHERE table = 'sys_cols_view' ORDER BY position""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("id", "v", "w"))
    assert(rows.map(_.getInt(2)).toSeq === Seq(1, 2, 3))
    assert(rows.head.getString(1).toLowerCase.contains("int"))
  }

  test("system.functions lists builtins and graft dialect registrations") {
    val names = spark.sql("SELECT name FROM system.functions")
      .collect().map(_.getString(0).toLowerCase).toSet
    assert(names.contains("countif"))   // dialect
    assert(names.contains("sum"))       // builtin
    val countIf = spark.sql(
      "SELECT origin FROM system.functions WHERE lower(name) = 'countif'").collect()
    assert(countIf.nonEmpty && countIf.head.getString(0) === "graft")
  }

  test("system.settings reflects the session conf") {
    val v = spark.sql(
      "SELECT value FROM system.settings WHERE name = 'spark.sql.shuffle.partitions'")
      .collect()
    assert(v.length === 1 && v.head.getString(0) === spark.conf.get("spark.sql.shuffle.partitions"))
  }

  test("system.numbers generates integers under a pushed LIMIT") {
    val rows = spark.sql("SELECT number FROM system.numbers LIMIT 5")
      .collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(0L, 1L, 2L, 3L, 4L))
    // composes like CH's row generator
    val s = spark.sql(
      "SELECT sum(number) AS s FROM (SELECT number FROM system.numbers LIMIT 101)")
      .head.getLong(0)
    assert(s === 5050L)
  }

  test("filters and aggregates compose over system tables") {
    val n = spark.sql(
      "SELECT count(*) FROM system.functions WHERE name LIKE 'array%'").head.getLong(0)
    assert(n > 10L) // builtin array_* plus the dialect array* family
  }
}
