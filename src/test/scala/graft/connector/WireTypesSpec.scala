package graft.connector

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Wire transport for the round-6 type tail: Enum8/16 (Dictionary(Int8,
  * Utf8) + name↔code metadata, reference `arrow/types.rs:471-474`),
  * Dynamic (dense union tagged ch.type=Dynamic; observable read form is
  * stringified values + type names, `tests/tests/new_types.rs:242-296`),
  * and BFloat16 / Time / Time64 scalars (`values.rs:105-111`).
  */
class WireTypesSpec extends SparkSpec {

  test("Enum8 scans as strings with the declared name↔code map preserved") {
    val srv = new StubCHServer
    try {
      srv.loadEnumTable("enums", Seq("red" -> 1, "green" -> 2, "blue" -> 5), 9)
      val df = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "enums").load()
      // dict decode → plain strings
      assert(df.schema("e").dataType === StringType)
      // the DECLARED codes (1,2,5 — not dict positions 0,1,2) ride the
      // ch.enumValues metadata through the scan
      assert(df.schema("e").metadata.getString(ArrowCodec.EnumValuesKey)
        === "red=1,green=2,blue=5")
      assert(df.schema("e").metadata.getString(ArrowCodec.CHTypeKey) === "Enum8")
      val vals = df.collect().map(_.getString(0)).toSeq
      assert(vals === Seq("red", "green", "blue", "red", "green", "blue",
        "red", "green", "blue"))
    } finally srv.stop()
  }

  test("Dynamic scans as struct(dynamic_type, value) — stringified, typed, null-safe") {
    val srv = new StubCHServer
    try {
      srv.loadDynamicTable("dyns", 6)
      val df = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "dyns").load()
      val vt = df.schema("dyn").dataType.asInstanceOf[StructType]
      assert(vt.fieldNames.toSeq === Seq("dynamic_type", "value"))
      assert(df.schema("dyn").metadata.getString(ArrowCodec.CHTypeKey) === "Dynamic")
      val rows = df.selectExpr("dyn.dynamic_type", "dyn.value").collect()
      // fixture cycles String("dyn<i>"), Int64(i*10), NULL
      assert(rows(0).getString(0) === "String" && rows(0).getString(1) === "dyn0")
      assert(rows(1).getString(0) === "Int64" && rows(1).getString(1) === "10")
      assert(rows(2).isNullAt(0) && rows(2).isNullAt(1)) // NULL dynamic
      assert(rows(3).getString(1) === "dyn3")
      assert(rows(4).getString(1) === "40")
    } finally srv.stop()
  }

  test("Dynamic round trip: scanned struct writes back as stringified values") {
    val srv = new StubCHServer
    try {
      srv.loadDynamicTable("dyns_rt", 6)
      val scanned = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "dyns_rt").load()
      scanned.write.format("graft-ch")
        .option("url", srv.url).option("table", "dyns_back")
        .mode("append").save()
      // the write-back column is the stringified value (the server
      // coerces strings into Dynamic; our stub stores them as Utf8)
      val back = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "dyns_back").load()
      assert(back.schema("dyn").dataType === StringType)
      val vals = back.collect().map(r => Option(r.getString(0))).toSeq
      assert(vals === Seq(Some("dyn0"), Some("10"), None, Some("dyn3"),
        Some("40"), None))
    } finally srv.stop()
  }

  test("BFloat16/Time/Time64 scan with exact widened values") {
    val srv = new StubCHServer
    try {
      srv.loadScalarWireTable("scalars", 8)
      val df = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "scalars").load()
      assert(df.schema("bf").dataType === FloatType)
      assert(df.schema("bf").metadata.getString(ArrowCodec.CHTypeKey) === "BFloat16")
      assert(df.schema("t").dataType === IntegerType)
      assert(df.schema("t64").dataType === LongType)
      assert(df.schema("t64").metadata.getString(ArrowCodec.CHTypeKey) === "Time64(6)")
      val rows = df.collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getFloat(0) === i * 0.5f) // exact in bf16 for small i
        assert(r.getInt(1) === i * 60)
        assert(r.getLong(2) === i * 60000000L)
      }
    } finally srv.stop()
  }

  test("BFloat16/Time/Time64 write → wire → scan round trip") {
    val srv = new StubCHServer
    try {
      val schema = StructType(Seq(
        StructField("bf", FloatType, nullable = true,
          new MetadataBuilder().putString(ArrowCodec.CHTypeKey, "BFloat16").build()),
        StructField("t", IntegerType, nullable = true,
          new MetadataBuilder().putString(ArrowCodec.CHTypeKey, "Time").build()),
        StructField("t64", LongType, nullable = true,
          new MetadataBuilder().putString(ArrowCodec.CHTypeKey, "Time64(6)").build())))
      val rows = Seq(
        Row(1.5f, 3600, 3600000000L),
        Row(-2.5f, 0, 0L),
        Row(null, null, null),
        Row(0.25f, 86399, 86399999999L))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      df.write.format("graft-ch")
        .option("url", srv.url).option("table", "scalars_rt")
        .mode("append").save()
      val back = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "scalars_rt").load().collect()
      assert(back(0).getFloat(0) === 1.5f && back(0).getInt(1) === 3600 &&
        back(0).getLong(2) === 3600000000L)
      assert(back(1).getFloat(0) === -2.5f)
      assert(back(2).isNullAt(0) && back(2).isNullAt(1) && back(2).isNullAt(2))
      assert(back(3).getFloat(0) === 0.25f && back(3).getInt(1) === 86399)
    } finally srv.stop()
  }
}
