package graft.connector

import graft.SparkSpec
import graft.ddl.{CreateOptions, Ddl}
import graft.types.CHType
import org.apache.spark.sql.types._

/** The reference's remaining ArrowOptions surfaced as write/DDL options
  * (`use_date32_for_date` / `strict_schema` /
  * `nullable_array_default_empty` / `disable_strict_schema_ddl`,
  * reference `clickhouse-arrow/src/client/options.rs:284-290`; mapping
  * site `arrow/types.rs:239` for Date32). Option-matrix round trips per
  * VERDICT r12 item 5.
  */
class ArrowOptionsSpec extends SparkSpec {
  import spark.implicits._

  private val dateSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("d", DateType, nullable = true)))

  test("useDate32ForDate: DateType declares Date32 instead of Date") {
    val relaxed = Ddl.createTableFromSpark(None, "t", dateSchema)
    assert(relaxed.contains("`d` Nullable(Date)"))
    val date32 = Ddl.createTableFromSpark(None, "t", dateSchema,
      CreateOptions(mapping = CHType.MappingOptions(useDate32ForDate = true)))
    assert(date32.contains("`d` Nullable(Date32)"))
  }

  test("nullableArrayDefaultEmpty: errors only under strictSchema, like the reference") {
    val arrSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("xs", ArrayType(IntegerType), nullable = true)))
    // default (reference default too): nullable array → plain Array,
    // nulls insert as []
    val relaxed = Ddl.createTableFromSpark(None, "t", arrSchema)
    assert(relaxed.contains("`xs` Array("))
    assert(!relaxed.contains("Nullable(Array"))
    // the reference gates the error on strict_schema AND
    // !nullable_array_default_empty (arrow/types.rs:271-277, 417-420):
    // with strict off the array option alone still maps relaxed
    val stillRelaxed = Ddl.createTableFromSpark(None, "t", arrSchema,
      CreateOptions(mapping = CHType.MappingOptions(nullableArrayDefaultEmpty = false)))
    assert(stillRelaxed.contains("`xs` Array("))
    val ex = intercept[IllegalArgumentException] {
      Ddl.createTableFromSpark(None, "t", arrSchema,
        CreateOptions(mapping = CHType.MappingOptions(
          strictSchema = true, nullableArrayDefaultEmpty = false)))
    }
    assert(ex.getMessage.contains("nullableArrayDefaultEmpty"))
  }

  test("strictSchema: invariant-violating declared types are refused") {
    // relaxed (default): Nullable(LowCardinality(String)) silently
    // normalizes to LowCardinality(Nullable(String)) — reference relaxed arm
    val violating = CHType.Nullable(CHType.LowCardinality(CHType.CHString))
    val relaxed = Ddl.createTable(None, "t", Seq("c" -> violating))
    assert(relaxed.contains("LowCardinality(Nullable(String))"))
    val ex = intercept[IllegalArgumentException] {
      Ddl.createTable(None, "t", Seq("c" -> violating),
        CreateOptions(mapping = CHType.MappingOptions(strictSchema = true)))
    }
    assert(ex.getMessage.contains("strictSchema"))
    // strict also refuses nullable composites from Spark schemas
    val mapSchema = StructType(Seq(
      StructField("m", MapType(StringType, LongType), nullable = true)))
    val ex2 = intercept[IllegalArgumentException] {
      Ddl.createTableFromSpark(None, "t", mapSchema,
        CreateOptions(mapping = CHType.MappingOptions(strictSchema = true)))
    }
    assert(ex2.getMessage.contains("strictSchema"))
  }

  test("options reach the overwrite-staging DDL through the write path") {
    val srv = new StubCHServer
    try {
      // seed so overwrite has a target; then overwrite with the option on
      Seq((1L, java.sql.Date.valueOf("2024-05-17")))
        .toDF("id", "d")
        .write.format("graft-ch").option("url", srv.url).option("table", "td")
        .mode("append").save()
      Seq((2L, java.sql.Date.valueOf("2025-01-01")))
        .toDF("id", "d")
        .write.format("graft-ch").option("url", srv.url).option("table", "td")
        .option("useDate32ForDate", "true")
        .mode("overwrite").save()
      val create = srv.queries.filter(_.toUpperCase.startsWith("CREATE TABLE"))
      assert(create.nonEmpty)
      assert(create.last.contains("Date32"),
        s"staging DDL must carry Date32: ${create.last}")
      // data still round-trips
      val back = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "td").load().collect()
      assert(back.map(_.getLong(0)).toSeq === Seq(2L))
    } finally srv.stop()
  }

  test("disableStrictSchemaDdl=false flips DDL to reference-strict mode") {
    val srv = new StubCHServer
    try {
      Seq((1L, Seq(1, 2))).toDF("id", "xs")
        .write.format("graft-ch").option("url", srv.url).option("table", "ts")
        .mode("append").save()
      // reference-strict DDL: nullable arrays refuse (into_strict_ddl
      // enforces nullable_array_default_empty = false)
      val ex = intercept[Exception] {
        Seq((2L, Seq(3))).toDF("id", "xs")
          .write.format("graft-ch").option("url", srv.url).option("table", "ts")
          .option("disableStrictSchemaDdl", "false")
          .mode("overwrite").save()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("nullableArrayDefaultEmpty")))
    } finally srv.stop()
  }
}
