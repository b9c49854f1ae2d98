package graft.connector

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.DenseUnionVector
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}

/** CH `Variant(...)` transport (reference `arrow/types.rs:483-499`,
  * e2e `tests/tests/new_types.rs:125` test_variant_basic): the wire form
  * is an Arrow DENSE UNION whose child names are the CH type names; the
  * scan materializes the §1.2 tagged struct (variant_type, v0..vN). */
class VariantTransportSpec extends SparkSpec {

  /** Hand-build a one-column dense-union stream: rows "a", 7, "b", null. */
  private def variantStreamBytes(): Array[Byte] = {
    val alloc = ArrowCodec.rootAllocator
      .newChildAllocator("variant-spec", 0, Long.MaxValue)
    val duv = DenseUnionVector.empty("v", alloc)
    val strId = duv.registerNewTypeId(Field.nullable("String", ArrowType.Utf8.INSTANCE))
    val intId = duv.registerNewTypeId(Field.nullable("Int64", new ArrowType.Int(64, true)))
    val strVec = duv.addVector(strId,
      new VarCharVector("String", alloc)).asInstanceOf[VarCharVector]
    val intVec = duv.addVector(intId,
      new BigIntVector("Int64", alloc)).asInstanceOf[BigIntVector]
    duv.allocateNew()
    strVec.allocateNew()
    intVec.allocateNew()
    // dense layout: per-branch values in branch order, rows carry
    // (typeId, offset-into-branch)
    strVec.setSafe(0, "a".getBytes("UTF-8"))
    strVec.setSafe(1, "b".getBytes("UTF-8"))
    strVec.setNull(2) // the null row rides the String branch with a null slot
    strVec.setValueCount(3)
    intVec.setSafe(0, 7L)
    intVec.setValueCount(1)
    def row(i: Int, tid: Byte, off: Int): Unit = {
      duv.setTypeId(i, tid)
      duv.getOffsetBuffer.setInt(i.toLong * 4, off)
    }
    row(0, strId, 0) // "a"
    row(1, intId, 0) // 7
    row(2, strId, 1) // "b"
    row(3, strId, 2) // null
    duv.setValueCount(4)

    val root = new VectorSchemaRoot(
      List(duv.getField).asJava,
      List(duv: org.apache.arrow.vector.FieldVector).asJava, 4)
    val out = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, out)
    writer.start(); writer.writeBatch(); writer.end()
    // Arrow resource rule: writer closes BEFORE the vectors it references
    writer.close()
    root.close()
    duv.close()
    alloc.close()
    out.toByteArray
  }

  test("Variant column (dense union) scans as the tagged struct") {
    val srv = new StubCHServer
    try {
      srv.loadRawArrow("variants", variantStreamBytes())
      val df = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "variants")
        .load()
      val schema = df.schema
      assert(schema.fieldNames.toSeq === Seq("v"))
      val vt = schema("v").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(vt.fieldNames.toSeq === Seq("variant_type", "v0", "v1"))

      val rows = df.selectExpr("v.variant_type", "v.v0", "v.v1").collect()
      assert(rows.length === 4)
      assert(rows(0).getString(0) === "String" && rows(0).getString(1) === "a" && rows(0).isNullAt(2))
      assert(rows(1).getString(0) === "Int64" && rows(1).isNullAt(1) && rows(1).getLong(2) === 7L)
      assert(rows(2).getString(0) === "String" && rows(2).getString(1) === "b")
      assert(rows(3).getString(0) === "String" && rows(3).isNullAt(1) && rows(3).isNullAt(2))
    } finally srv.stop()
  }

  test("Variant round-trips: tagged-struct write → union wire → scan") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val srv = new StubCHServer
    try {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StructType(Seq(
          StructField("variant_type", StringType, nullable = false),
          StructField("v0", StringType, nullable = true),
          StructField("v1", LongType, nullable = true))), nullable = true,
          new MetadataBuilder()
            .putString(ArrowCodec.VariantTypesKey, "String,Int64").build())))
      val rows = Seq(
        Row(1L, Row("String", "alpha", null)),
        Row(2L, Row("Int64", null, 42L)),
        Row(3L, Row("String", "beta", null)),
        Row(4L, Row("Int64", null, 7L)),
        // NULL top-level variant: must encode as tag 0 + null slot (the
        // same wire form CH uses for a NULL Variant value), not crash
        Row(5L, null))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      df.write.format("graft-ch")
        .option("url", srv.url).option("table", "var_rt")
        .mode("append").save()

      val back = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "var_rt")
        .load()
        .selectExpr("id", "v.variant_type", "v.v0", "v.v1")
        .orderBy("id").collect()
      assert(back.length === 5)
      assert(back(0).getString(1) === "String" && back(0).getString(2) === "alpha")
      assert(back(1).getString(1) === "Int64" && back(1).getLong(3) === 42L)
      assert(back(2).getString(2) === "beta")
      assert(back(3).getLong(3) === 7L)
      // the null variant decodes like the null row of the scan test:
      // branch-0 type name, every branch value null
      assert(back(4).getString(1) === "String" && back(4).isNullAt(2) && back(4).isNullAt(3))
    } finally srv.stop()
  }

  test("variant branch values filter and aggregate like ordinary columns") {
    val srv = new StubCHServer
    try {
      srv.loadRawArrow("variants", variantStreamBytes())
      val df = spark.read.format("graft-ch")
        .option("url", srv.url).option("table", "variants").load()
      val strings = df.where("v.variant_type = 'String' AND v.v0 IS NOT NULL")
        .selectExpr("v.v0").collect().map(_.getString(0)).sorted
      assert(strings.toSeq === Seq("a", "b"))
      val total = df.selectExpr("sum(v.v1) AS s").head.getLong(0)
      assert(total === 7L)
    } finally srv.stop()
  }
}
