package graft.connector

import java.util.Locale

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.types.CHType

/** Read-path per-column type overrides and the string/binary mode — the
  * reference's query-time `SchemaConversions` + `ArrowOptions`
  * (`clickhouse-arrow/src/arrow/types.rs:81-116` `schema_conversion`;
  * `src/client/options.rs:284-290` `strings_as_strings`) surfaced the
  * DSv2 way, as scan options:
  *
  * {{{
  * spark.read.format("graft-ch")
  *   .option("schema.status", "Enum8('active'=1,'gone'=2)")  // per-column
  *   .option("stringsAsStrings", "false")  // CH String → BinaryType
  * }}}
  *
  * Conversion targets mirror the reference's `schema_conversion` match
  * arms exactly: Enum8/Enum16 over a string wire column (every value is
  * validated against the declared name set — an unknown element fails
  * the scan loudly, CH-style), Date/Date32 over a date wire column, and
  * geo types (preserved as their Struct/Array shape). Any other target
  * raises at schema time, mirroring the reference's `TypeConversion`
  * error rather than guessing.
  *
  * `stringsAsStrings=false` is the reference's DEFAULT Arrow mapping
  * (CH String → Arrow Binary); this connector defaults to `true`
  * (String → Utf8, the Spark-idiomatic reading, documented deviation)
  * and the option restores the reference behavior per scan. It applies
  * to plain CH String/LowCardinality(String) columns only — UUID/IP
  * canonical text, JSON and Dynamic renderings keep their declared
  * type, like the reference scopes the flag to the String type map.
  */
object ReadConversions {

  /** Serializable per-scan spec: raw option strings travel to executors
    * inside the `InputPartition`; parsing happens where it's used. */
  final case class Spec(targets: Map[String, String], stringsAsStrings: Boolean) {
    def isNoop: Boolean = targets.isEmpty && stringsAsStrings
    /** column (lower-cased) → parsed target, validated eagerly. */
    @transient lazy val parsed: Map[String, CHType] =
      targets.map { case (c, ts) => c -> stripNull(CHType.parse(ts)) }
  }

  val none: Spec = Spec(Map.empty, stringsAsStrings = true)

  /** `schema.<col>` option keys arrive lower-cased from
    * [[CaseInsensitiveStringMap]]; column matching is case-insensitive
    * to match. */
  def fromOptions(options: CaseInsensitiveStringMap): Spec = {
    val targets = options.asCaseSensitiveMap().asScala.toSeq.collect {
      case (k, v) if k.toLowerCase(Locale.ROOT).startsWith("schema.") =>
        k.toLowerCase(Locale.ROOT).stripPrefix("schema.") -> v
    }.toMap
    Spec(targets, options.getBoolean("stringsAsStrings", true))
  }

  private def stripNull(t: CHType): CHType = t match {
    case CHType.Nullable(i) => stripNull(i)
    case CHType.LowCardinality(i) => stripNull(i)
    case other => other
  }

  private def declaredOf(f: StructField): String =
    if (f.metadata.contains(ArrowCodec.CHTypeKey))
      f.metadata.getString(ArrowCodec.CHTypeKey)
    else ""

  /** A Utf8 column with no contrary declared CH identity — the columns
    * the reference's `strings_as_strings` flag governs. */
  def isPlainString(dataType: DataType, declared: String): Boolean =
    dataType == StringType &&
      (declared.isEmpty || declared == "String" ||
        declared.startsWith("LowCardinality") || declared.startsWith("Nullable"))

  /** Driver side: rewrite the fetched server schema per the spec. Fails
    * loudly on an unsupported target or a wire/target mismatch — the
    * same place the reference's `schema_conversion` errors. */
  def applySchema(schema: StructType, spec: Spec): StructType = {
    if (spec.isNoop) return schema
    StructType(schema.fields.map { f =>
      spec.parsed.get(f.name.toLowerCase(Locale.ROOT)) match {
        case Some(target) => convertField(f, target)
        case None =>
          if (!spec.stringsAsStrings && isPlainString(f.dataType, declaredOf(f)))
            f.copy(dataType = BinaryType)
          else f
      }
    })
  }

  /** Structural shape with every nullability flag erased (the wire
    * arrives with nullable children; the geo alias declares them
    * non-null — same shape either way). */
  private def shapeOf(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, shapeOf(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(shapeOf(a.elementType), containsNull = true)
    case m: MapType => MapType(shapeOf(m.keyType), shapeOf(m.valueType), valueContainsNull = true)
    case other => other
  }

  private def fmtEnum(vs: Seq[(String, Int)]): String =
    vs.map { case (n, c) => s"$n=$c" }.mkString(",")

  private def convertField(f: StructField, target: CHType): StructField = {
    import CHType._
    def bad(why: String): Nothing = throw new IllegalArgumentException(
      s"graft-ch: schema.${f.name}: $why")
    target match {
      case Enum8(vs) =>
        // reference convert_to_enum: the source must be a string form
        if (f.dataType != StringType && f.dataType != BinaryType)
          bad(s"expected LowCardinality(String) or String/Binary, found ${f.dataType.simpleString}")
        f.copy(dataType = StringType, metadata = new MetadataBuilder()
          .withMetadata(f.metadata)
          .putString(ArrowCodec.CHTypeKey, "Enum8")
          .putString(ArrowCodec.EnumValuesKey, fmtEnum(vs)).build())
      case Enum16(vs) =>
        if (f.dataType != StringType && f.dataType != BinaryType)
          bad(s"expected LowCardinality(String) or String/Binary, found ${f.dataType.simpleString}")
        f.copy(dataType = StringType, metadata = new MetadataBuilder()
          .withMetadata(f.metadata)
          .putString(ArrowCodec.CHTypeKey, "Enum16")
          .putString(ArrowCodec.EnumValuesKey, fmtEnum(vs)).build())
      case Date | Date32 =>
        if (f.dataType != DateType)
          bad(s"expected Date or Date32, found ${f.dataType.simpleString}")
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString(ArrowCodec.CHTypeKey, CHType.format(target)).build())
      case Point | Ring | Polygon | MultiPolygon =>
        // "For schemas, preserve geo types" (types.rs:111-114): declare
        // the Struct/Array shape §1.2 maps the geo type onto (same
        // normalization as the reference's normalize_geo_type,
        // native/types/geo.rs:11 — Point = Tuple(F64,F64), Ring =
        // Array(Point), …). Shape compare ignores nullability: the wire
        // struct arrives with nullable children.
        val (dt, _) = CHType.toSpark(target)
        if (shapeOf(f.dataType) != shapeOf(dt))
          bad(s"geo target ${CHType.format(target)} expects wire shape ${dt.simpleString}, found ${f.dataType.simpleString}")
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString(ArrowCodec.CHTypeKey, CHType.format(target)).build())
      case other =>
        bad(s"unsupported read conversion target ${CHType.format(other)} " +
          "(Enum8/Enum16, Date/Date32 and geo types convert on scan, " +
          "matching the reference's schema_conversion)")
    }
  }
}
