package graft.connector

import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.arrow.vector.{FieldVector, IntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

class ArrowCodecSpec extends SparkSpec {

  test("A5: dictionary-encoded (LowCardinality wire form) columns decode to plain values") {
    val allocator = ArrowCodec.rootAllocator.newChildAllocator("dict-test", 0, Long.MaxValue)
    val dictVector = new VarCharVector("dict", allocator)
    dictVector.allocateNew()
    dictVector.setSafe(0, "low".getBytes)
    dictVector.setSafe(1, "high".getBytes)
    dictVector.setValueCount(2)
    val encoding = new DictionaryEncoding(1L, false, new ArrowType.Int(32, true))
    val dictionary = new Dictionary(dictVector, encoding)

    val indexField = new Field("lvl",
      new FieldType(true, new ArrowType.Int(32, true), encoding), java.util.List.of[Field]())
    val indices = indexField.createVector(allocator).asInstanceOf[IntVector]
    indices.allocateNew()
    Seq(0, 1, 0, 1, 1).zipWithIndex.foreach { case (v, i) => indices.setSafe(i, v) }
    indices.setValueCount(5)

    val root = new VectorSchemaRoot(
      List(indexField).asJava, List[FieldVector](indices).asJava, 5)
    val provider = new DictionaryProvider.MapDictionaryProvider(dictionary)
    val bos = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, provider, bos)
    writer.start(); writer.writeBatch(); writer.end(); writer.close()
    root.close(); dictVector.close()
    allocator.close()

    val (schema, rows) = ArrowCodec.decode(bos.toByteArray)
    // index type int32 resolves to the dictionary's VALUE type
    assert(schema === StructType(Seq(StructField("lvl", StringType, nullable = true))))
    assert(rows.map(_.getUTF8String(0).toString) === Seq("low", "high", "low", "high", "high"))
  }

  test("empty stream (schema only) decodes to zero rows") {
    val spark0 = spark // touch the session so codec allocators initialize consistently
    val schema = StructType(Seq(StructField("x", StringType)))
    val bytes = ArrowCodec.encode(schema, Iterator.empty)
    val (s, rows) = ArrowCodec.decode(bytes)
    assert(s === StructType(Seq(StructField("x", StringType, nullable = true))))
    assert(rows.isEmpty)
  }
}
