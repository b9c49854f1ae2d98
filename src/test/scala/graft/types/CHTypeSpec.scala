package graft.types

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Type-mapping layer tests (FIXTURES.md §2: property-based round-trips
  * mirroring the reference's wire-format unit level, SURVEY.md §5).
  * Plain ScalaCheck generators sampled deterministically (the
  * scalatest-scalacheck bridge isn't on the offline classpath). */
class CHTypeSpec extends AnyFunSuite {

  private def forAllSampled[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  import CHType._

  // ---- generators ----------------------------------------------------

  private val leafGen: Gen[CHType] = Gen.oneOf(
    Gen.oneOf(Int8, Int16, Int32, Int64, Int128, Int256,
      UInt8, UInt16, UInt32, UInt64, UInt128, UInt256,
      Float32, Float64, BFloat16, CHString, Uuid, Date, Date32,
      Time, Ipv4, Ipv6, Json),
    Gen.chooseNum(1, 64).map(FixedString(_)),
    for { p <- Gen.chooseNum(1, 76); s <- Gen.chooseNum(0, math.min(p, 38)) } yield Decimal(p, s),
    Gen.oneOf(Gen.const(DateTime(None)), Gen.const(DateTime(Some("UTC"))),
      Gen.const(DateTime(Some("America/New_York")))),
    for { p <- Gen.chooseNum(0, 9); tz <- Gen.option(Gen.const("UTC")) } yield DateTime64(p, tz),
    Gen.chooseNum(0, 9).map(Time64(_)),
    Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8)))
      .map(ns => Enum8(ns.distinct.zipWithIndex)))

  private def typeGen(depth: Int): Gen[CHType] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      4 -> leafGen,
      1 -> typeGen(depth - 1).map(t => if (isNullableCompatible(t)) Nullable(t) else Arr(t)),
      1 -> typeGen(depth - 1).map(Arr(_)),
      1 -> Gen.listOfN(2, typeGen(depth - 1)).map(ts => Tup(ts)),
      1 -> (for { k <- leafGen; v <- typeGen(depth - 1) } yield CHMap(k, v)),
      1 -> leafGen.map(t => LowCardinality(t)))

  // ---- format/parse round-trip ---------------------------------------

  test("format → parse round-trips every generated type") {
    forAllSampled(typeGen(3)) { t =>
      assert(parse(format(t)) === t, s"type string: ${format(t)}")
    }
  }

  test("parses real-world ClickHouse type strings") {
    val cases = Map(
      "Nullable(Array(LowCardinality(String)))" ->
        Nullable(Arr(LowCardinality(CHString))),
      "Decimal(18, 4)" -> Decimal(18, 4),
      "Decimal64(4)" -> Decimal(18, 4),
      "DateTime64(3, 'UTC')" -> DateTime64(3, Some("UTC")),
      "Enum8('a' = 1, 'b' = 2)" -> Enum8(Seq("a" -> 1, "b" -> 2)),
      "Map(String, Array(Int64))" -> CHMap(CHString, Arr(Int64)),
      "Tuple(Int64, Float64)" -> Tup(Seq(Int64, Float64)),
      "Tuple(x Int64, y Float64)" -> Tup(Seq(Int64, Float64), Seq("x", "y")),
      "Nested(a Int64, b String)" -> Nested(Seq("a" -> Int64, "b" -> CHString)),
      "AggregateFunction(quantiles(0.5, 0.9), Float64)" ->
        AggregateFunction("quantiles(0.5, 0.9)", Seq(Float64)),
      "SimpleAggregateFunction(sum, Int64)" ->
        SimpleAggregateFunction("sum", Seq(Int64)),
      "Variant(String, UInt64, Float64)" -> Variant(Seq(CHString, UInt64, Float64)),
      "Dynamic(max_types=3)" -> Dynamic(Some(3)),
      "Object('json')" -> Json,
      "FixedString(16)" -> FixedString(16))
    cases.foreach { case (s, expected) => assert(parse(s) === expected, s) }
  }

  test("whitespace-insensitive parsing") {
    assert(parse("Map( String , Int64 )") === CHMap(CHString, Int64))
    assert(parse(" Nullable( Int8 ) ") === Nullable(Int8))
  }

  test("rejects garbage") {
    assertThrows[IllegalArgumentException](parse("NotAType"))
    assertThrows[IllegalArgumentException](parse("Int8 garbage"))
  }

  // ---- Spark mapping --------------------------------------------------

  test("CH → Spark mapping matches SURVEY §1.2") {
    assert(toSpark(Int8) === (ByteType, false))
    assert(toSpark(UInt8) === (ShortType, false))
    assert(toSpark(UInt64) === (DecimalType(20, 0), false))
    assert(toSpark(Int128) === (DecimalType(38, 0), false))
    assert(toSpark(Int256) === (BinaryType, false))
    assert(toSpark(BFloat16) === (FloatType, false))
    assert(toSpark(Decimal(9, 2)) === (DecimalType(9, 2), false))
    assert(toSpark(Decimal(76, 10)) === (DecimalType(38, 10), false))
    assert(toSpark(Nullable(CHString)) === (StringType, true))
    assert(toSpark(LowCardinality(Nullable(CHString))) === (StringType, true))
    assert(toSpark(DateTime64(9, Some("UTC"))) === (TimestampType, false))
    assert(toSpark(Arr(Nullable(Int32))) === (ArrayType(IntegerType, true), false))
    assert(toSpark(CHMap(CHString, Int64)) === (MapType(StringType, LongType, false), false))
    assert(toSpark(Nested(Seq("a" -> Int64))) ===
      (ArrayType(StructType(Seq(StructField("a", LongType, false))), false), false))
    assert(toSpark(Enum8(Seq("x" -> 1))) === (StringType, false))
    assert(toSpark(AggregateFunction("uniq", Seq(Int64))) === (BinaryType, false))
    assert(toSpark(SimpleAggregateFunction("sum", Seq(Int64))) === (LongType, false))
    // geo: Point = Tuple(F64, F64); Polygon = Array(Array(Point))
    assert(toSpark(Point)._1.isInstanceOf[StructType])
    assert(toSpark(Ring)._1 === ArrayType(toSpark(Point)._1, false))
  }

  test("Spark → CH → Spark is identity on the canonical subset") {
    val canonical: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, StringType, DateType,
      DecimalType(12, 3), ArrayType(LongType, false),
      MapType(StringType, DoubleType, false),
      StructType(Seq(StructField("a", LongType, false))))
    canonical.foreach { dt =>
      val ch = fromSpark(dt, nullable = false)
      assert(toSpark(ch)._1 === dt, s"via ${format(ch)}")
    }
    // nullability propagates
    assert(fromSpark(LongType, nullable = true) === Nullable(Int64))
    // TimestampType is µs → DateTime64(6)
    assert(fromSpark(TimestampType, nullable = false) === DateTime64(6, None))
    // Bool widens to UInt8 on write like the reference
    assert(fromSpark(BooleanType, nullable = false) === UInt8)
  }

  test("UInt64 round-trips only through the field-metadata marker") {
    // CH-origin UInt64 → Decimal(20,0) + unsigned marker → UInt64 again
    val f = toSparkField("u", UInt64)
    assert(f.dataType === DecimalType(20, 0))
    assert(f.metadata.getBoolean(UnsignedOriginKey))
    assert(fromSparkField(f) === UInt64)
    val fn = toSparkField("un", Nullable(UInt64))
    assert(fromSparkField(fn) === Nullable(UInt64))
    // a bare signed Decimal(20,0) must NOT become UInt64 (it can hold
    // negatives a UInt64 column would reject)
    assert(fromSpark(DecimalType(20, 0), nullable = false) === Decimal(20, 0))
    assert(fromSparkField(StructField("d", DecimalType(20, 0))) === Nullable(Decimal(20, 0)))
  }

  test("normalization: Nullable(LowCardinality(T)) transposes; Nullable(Array) illegal") {
    assert(normalize(Nullable(LowCardinality(CHString))) ===
      LowCardinality(Nullable(CHString)))
    assert(!isNullableCompatible(Arr(Int8)))
    assert(fromSpark(ArrayType(LongType, false), nullable = true) === Arr(Int64))
    // geo aliases expand
    assert(normalize(Polygon) === Arr(Arr(Point)))
  }

  test("geo types normalize to the reference's Tuple/Array aliases (geo.rs:11)") {
    import org.apache.spark.sql.types._
    // Point = Tuple(Float64, Float64); each level wraps an Array — the
    // Spark mapping must equal the mapping of the NORMALIZED form, the
    // invariant the reference's normalize_geo_type test pins
    val pointShape = StructType(Seq(
      StructField("x", DoubleType, false), StructField("y", DoubleType, false)))
    assert(toSpark(Point)._1 === pointShape)
    assert(toSpark(Ring)._1 === toSpark(Arr(Point))._1)
    assert(toSpark(Polygon)._1 === toSpark(Arr(Ring))._1)
    assert(toSpark(MultiPolygon)._1 === toSpark(Arr(Polygon))._1)
    assert(toSpark(MultiPolygon)._1 ===
      ArrayType(ArrayType(ArrayType(pointShape, false), false), false))
  }

  test("Date32 epoch rebase constant (1900-01-01 → 1970-01-01)") {
    val d0 = java.time.LocalDate.of(1900, 1, 1)
    val d1 = java.time.LocalDate.of(1970, 1, 1)
    assert(java.time.temporal.ChronoUnit.DAYS.between(d0, d1) === Date32EpochOffsetDays.toLong)
  }
}
