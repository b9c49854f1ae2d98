package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-able Catalyst expressions over the [[CHValues]] kernels
  * (SURVEY.md §4.2). Each `doGenCode` emits a direct static call into the
  * whole-stage-generated code — these stay inside the codegen span, unlike
  * a Scala UDF (serialization + boxing per row) or an interpreted HOF.
  *
  * Registered under SQL names by [[graft.GraftExtensions]]
  * (SparkSessionExtensions.injectFunction), usable via
  * `functions.call_function("ipv4_string", col)` or plain SQL.
  */
object ValueExpressions {

  private def callOf(fn: String): String =
    s"graft.functions.CHValues.$fn"

  abstract class CHUnary(fn: String, in: DataType, out: DataType)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = out
    override def nullable: Boolean = child.nullable
    override def prettyName: String = fn

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == in) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$fn expects ${in.simpleString}, got ${child.dataType.simpleString}")

    override protected def nullSafeEval(v: Any): Any = evalKernel(v)
    protected def evalKernel(v: Any): Any

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"${callOf(kernelName)}($c)")
    protected def kernelName: String
  }

  final case class Ipv4String(child: Expression)
      extends CHUnary("ipv4_string", BinaryType, StringType) {
    protected def kernelName = "ipv4ToString"
    protected def evalKernel(v: Any): Any = CHValues.ipv4ToString(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Ipv4String = copy(child = c)
  }
  final case class Ipv4Binary(child: Expression)
      extends CHUnary("ipv4_binary", StringType, BinaryType) {
    protected def kernelName = "ipv4FromString"
    protected def evalKernel(v: Any): Any = CHValues.ipv4FromString(v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): Ipv4Binary = copy(child = c)
  }
  final case class Ipv6String(child: Expression)
      extends CHUnary("ipv6_string", BinaryType, StringType) {
    protected def kernelName = "ipv6ToString"
    protected def evalKernel(v: Any): Any = CHValues.ipv6ToString(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Ipv6String = copy(child = c)
  }
  final case class Ipv6Binary(child: Expression)
      extends CHUnary("ipv6_binary", StringType, BinaryType) {
    protected def kernelName = "ipv6FromString"
    protected def evalKernel(v: Any): Any = CHValues.ipv6FromString(v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): Ipv6Binary = copy(child = c)
  }
  final case class UuidString(child: Expression)
      extends CHUnary("uuid_string", BinaryType, StringType) {
    protected def kernelName = "uuidToString"
    protected def evalKernel(v: Any): Any = CHValues.uuidToString(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): UuidString = copy(child = c)
  }
  final case class UuidBinary(child: Expression)
      extends CHUnary("uuid_binary", StringType, BinaryType) {
    protected def kernelName = "uuidFromString"
    protected def evalKernel(v: Any): Any = CHValues.uuidFromString(v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): UuidBinary = copy(child = c)
  }
  final case class Int256String(child: Expression)
      extends CHUnary("int256_string", BinaryType, StringType) {
    protected def kernelName = "int256ToString"
    protected def evalKernel(v: Any): Any = CHValues.int256ToString(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Int256String = copy(child = c)
  }
  final case class Int256FromString(child: Expression)
      extends CHUnary("int256_from_string", StringType, BinaryType) {
    protected def kernelName = "int256FromString"
    protected def evalKernel(v: Any): Any = CHValues.int256FromString(v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): Int256FromString = copy(child = c)
  }
  /** Order-preserving binary key: `orderBy(int256_sort_key(c))` sorts
    * numerically using Spark's NATIVE unsigned binary comparator — Int256
    * ordering scales with zero custom physical operators. */
  final case class Int256SortKey(child: Expression)
      extends CHUnary("int256_sort_key", BinaryType, BinaryType) {
    protected def kernelName = "int256SortKey"
    protected def evalKernel(v: Any): Any = CHValues.int256SortKey(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Int256SortKey = copy(child = c)
  }

  /** Codegen'd Karp-Rabin document fingerprint (replaces the interpreted
    * `aggregate(...)` HOF form — the per-char lambda never leaves the
    * generated code now). */
  final case class RollingFingerprint(child: Expression)
      extends CHUnary("ch_fingerprint", StringType,
        org.apache.spark.sql.types.LongType) {
    protected def kernelName = "rollingFingerprint"
    protected def evalKernel(v: Any): Any =
      CHValues.rollingFingerprint(v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): RollingFingerprint =
      copy(child = c)
  }

  /** Fused canonical-text kernel — equivalent to the 4-op chain
    * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", " "),
    * " +", " "))` in one codegen'd pass (see [[CHValues.canonText]]);
    * fronts the fuzzy-dedup group keys, the curation pipeline and
    * shard packing, where two Java-regex passes per document were the
    * cost center. */
  final case class CanonText(child: Expression)
      extends CHUnary("canon_text", StringType, StringType) {
    protected def kernelName = "canonText"
    protected def evalKernel(v: Any): Any =
      CHValues.canonText(v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): CanonText =
      copy(child = c)
  }

  /** Zero-key SipHash-2-4 over raw bytes — the CH `sipHash64` core
    * (ClickHouse hash-functions reference; core pinned to the SipHash
    * paper's test vectors in ChDialectSpec). Raw signed-long form; the
    * dialect spelling widens it to the §1.2 UInt64 decimal. */
  final case class SipHash64Raw(child: Expression)
      extends CHUnary("sip_hash64_raw", BinaryType,
        org.apache.spark.sql.types.LongType) {
    protected def kernelName = "sipHash64"
    protected def evalKernel(v: Any): Any =
      CHValues.sipHash64(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): SipHash64Raw =
      copy(child = c)
  }

  /** Two-string → double kernels (jaro family): codegen'd static call,
    * same contract as CHUnary. */
  abstract class StrSimBinary(fn: String) extends BinaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def prettyName: String = fn
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$fn expects two strings, got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
    protected def kernelName: String
    override protected def nullSafeEval(a: Any, b: Any): Any =
      evalKernel(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    protected def evalKernel(a: UTF8String, b: UTF8String): Double
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"${callOf(kernelName)}($a, $b)")
  }

  /** Jaro similarity — CH `jaroSimilarity` (DuckDB-oracled). */
  final case class JaroSim(left: Expression, right: Expression)
      extends StrSimBinary("jaro_similarity") {
    protected def kernelName = "jaroSimilarity"
    protected def evalKernel(a: UTF8String, b: UTF8String): Double =
      CHValues.jaroSimilarity(a, b)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSim =
      copy(left = l, right = r)
  }

  /** Jaro-Winkler similarity — CH `jaroWinklerSimilarity`. */
  final case class JaroWinklerSim(left: Expression, right: Expression)
      extends StrSimBinary("jaro_winkler_similarity") {
    protected def kernelName = "jaroWinklerSimilarity"
    protected def evalKernel(a: UTF8String, b: UTF8String): Double =
      CHValues.jaroWinklerSimilarity(a, b)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
      copy(left = l, right = r)
  }

  /** CityHash64 v1.0.2 over raw bytes — the CH `cityHash64` core (CH's
    * default sharding/sampling hash; the reference checksums blocks with
    * the sibling CityHash128, clickhouse-arrow/src/compression.rs:47). */
  final case class CityHash64Raw(child: Expression)
      extends CHUnary("city_hash64_raw", BinaryType,
        org.apache.spark.sql.types.LongType) {
    protected def kernelName = "cityHash64"
    protected def evalKernel(v: Any): Any =
      CHValues.cityHash64(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): CityHash64Raw =
      copy(child = c)
  }

  /** FarmHash Fingerprint64 — CH `farmFingerprint64` (the stable,
    * dispatch-free FarmHash; cross-validated against Guava's independent
    * implementation in CHTypeSpec). */
  final case class FarmFingerprint64Raw(child: Expression)
      extends CHUnary("farm_fingerprint64_raw", BinaryType,
        org.apache.spark.sql.types.LongType) {
    protected def kernelName = "farmFingerprint64"
    protected def evalKernel(v: Any): Any =
      CHValues.farmFingerprint64(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): FarmFingerprint64Raw =
      copy(child = c)
  }

  /** MurmurHash64A, seed 0 — CH `murmurHash2_64`. */
  final case class MurmurHash2_64Raw(child: Expression)
      extends CHUnary("murmur_hash2_64_raw", BinaryType,
        org.apache.spark.sql.types.LongType) {
    protected def kernelName = "murmurHash2_64"
    protected def evalKernel(v: Any): Any =
      CHValues.murmurHash2_64(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): MurmurHash2_64Raw =
      copy(child = c)
  }

  /** MurmurHash3_x86_32 seed 0, UInt32 zero-extended into a Long — CH
    * `murmurHash3_32` (Guava-cross-validated). */
  final case class MurmurHash3_32Raw(child: Expression)
      extends CHUnary("murmur_hash3_32_raw", BinaryType,
        org.apache.spark.sql.types.LongType) {
    protected def kernelName = "murmurHash3_32"
    protected def evalKernel(v: Any): Any =
      CHValues.murmurHash3_32(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): MurmurHash3_32Raw =
      copy(child = c)
  }

  /** XOR of the MurmurHash3_x64_128 digest halves — CH `murmurHash3_64`
    * (MurmurHash3Impl64). */
  final case class MurmurHash3_64Raw(child: Expression)
      extends CHUnary("murmur_hash3_64_raw", BinaryType,
        org.apache.spark.sql.types.LongType) {
    protected def kernelName = "murmurHash3_64"
    protected def evalKernel(v: Any): Any =
      CHValues.murmurHash3_64(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): MurmurHash3_64Raw =
      copy(child = c)
  }

  /** The 16 raw MurmurHash3_x64_128 digest bytes — CH `murmurHash3_128`
    * (FixedString(16) there, BinaryType here). */
  final case class MurmurHash3_128Raw(child: Expression)
      extends CHUnary("murmur_hash3_128_raw", BinaryType, BinaryType) {
    protected def kernelName = "murmurHash3_128"
    protected def evalKernel(v: Any): Any =
      CHValues.murmurHash3_128(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): MurmurHash3_128Raw =
      copy(child = c)
  }

  /** CH `empty`/`notEmpty` are polymorphic over strings, binaries,
    * arrays and maps — no single builtin covers all four, so this is a
    * tiny codegen'd expression instead of a dialect alias. */
  final case class ChEmpty(child: Expression)
      extends UnaryExpression with Serializable {
    import org.apache.spark.sql.types._
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "empty"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType | BinaryType | _: ArrayType | _: MapType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"empty expects a string, binary, array or map, got ${other.simpleString}")
      }
    override protected def nullSafeEval(v: Any): Any = child.dataType match {
      case StringType => v.asInstanceOf[UTF8String].numBytes() == 0
      case BinaryType => v.asInstanceOf[Array[Byte]].length == 0
      case _: ArrayType => v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements() == 0
      case _: MapType => v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData].numElements() == 0
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val probe = child.dataType match {
        case StringType => (c: String) => s"($c.numBytes() == 0)"
        case BinaryType => (c: String) => s"($c.length == 0)"
        case _ => (c: String) => s"($c.numElements() == 0)"
      }
      defineCodeGen(ctx, ev, probe)
    }
    override protected def withNewChildInternal(c: Expression): ChEmpty = copy(child = c)
  }

  /** First-match string replacement (CH `replaceOne` /
    * `replaceRegexpOne`; Spark's builtins replace ALL matches). */
  abstract class CHTernaryString(fn: String, kernel: String)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with Serializable {
    override def dataType: DataType = StringType
    override def prettyName: String = fn
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (children.forall(_.dataType == StringType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$fn expects three strings")
    override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
      evalKernel(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String])
    protected def evalKernel(a: UTF8String, b: UTF8String, c: UTF8String): UTF8String
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) => s"${callOf(kernel)}($a, $b, $c)")
  }

  final case class ReplaceOne(first: Expression, second: Expression, third: Expression)
      extends CHTernaryString("replaceOne", "replaceOne") {
    protected def evalKernel(a: UTF8String, b: UTF8String, c: UTF8String): UTF8String =
      CHValues.replaceOne(a, b, c)
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): ReplaceOne = copy(f, s, t)
  }

  final case class ReplaceRegexpOne(first: Expression, second: Expression, third: Expression)
      extends CHTernaryString("replaceRegexpOne", "replaceRegexpOne") {
    protected def evalKernel(a: UTF8String, b: UTF8String, c: UTF8String): UTF8String =
      CHValues.replaceRegexpOne(a, b, c)
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): ReplaceRegexpOne = copy(f, s, t)
  }

  /** (name, builder) pairs for FunctionRegistry injection. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    def one(name: String, build: Expression => Expression) =
      (new FunctionIdentifier(name),
        new ExpressionInfo(classOf[CHValues.type].getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name expects exactly one argument")
          build(args.head)
        })
    Seq(
      one("ipv4_string", Ipv4String),
      one("ipv4_binary", Ipv4Binary),
      one("ipv6_string", Ipv6String),
      one("ipv6_binary", Ipv6Binary),
      one("uuid_string", UuidString),
      one("uuid_binary", UuidBinary),
      one("int256_string", Int256String),
      one("int256_from_string", Int256FromString),
      one("int256_sort_key", Int256SortKey),
      one("ch_fingerprint", RollingFingerprint),
      one("canon_text", CanonText),
      one("sip_hash64_raw", SipHash64Raw))
  }
}

/** Enum name ⇄ code over the CHType Enum dictionary (reference maps
  * Enum8/16 to `Dictionary(Int, Utf8)`, `arrow/types.rs:471-474`) —
  * composed from BUILT-IN map expressions (codegen'd), no custom
  * Expression needed: the Spark-first preference order in action.
  */
object EnumCodec {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def toCode(c: Column, dict: Seq[(String, Int)]): Column =
    element_at(typedLit(dict.toMap), c)

  def toName(c: Column, dict: Seq[(String, Int)]): Column =
    element_at(typedLit(dict.map(_.swap).toMap), c)

  /** Dictionary straight from a parsed CH Enum type. */
  def dictOf(t: graft.types.CHType): Seq[(String, Int)] = t match {
    case graft.types.CHType.Enum8(entries) => entries
    case graft.types.CHType.Enum16(entries) => entries
    case other => throw new IllegalArgumentException(s"not an Enum type: $other")
  }
}

/** CH `toTypeName(x)` — the §1.2 canonical ClickHouse type name of the
  * argument's resolved Spark type (via [[graft.types.CHType.fromSpark]]).
  * Foldable: the name is a per-plan constant, so `ConstantFolding`
  * replaces the node with a string literal before execution — it never
  * reaches runtime codegen (the `doGenCode` below exists for the
  * pathological non-folded path only).
  */
case class ChTypeName(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def prettyName: String = "toTypeName"

  private lazy val name: UTF8String = UTF8String.fromString(
    graft.types.CHType.format(
      graft.types.CHType.fromSpark(child.dataType, child.nullable)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = name

  override protected def withNewChildInternal(newChild: Expression): ChTypeName =
    copy(child = newChild)
}
