package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Vector math over Catalyst `ArrayData` — static kernels shared by the
  * interpreted eval path and generated code (each `doGenCode` emits a
  * direct static call that stays inside the whole-stage span). This is
  * the §7.2 preference order case (b): similarity scoring as a custom
  * codegen'd `Expression`, replacing the interpreted higher-order
  * `aggregate`/`zip_with` lambdas that cost 10-50x in round 1.
  *
  * Null elements count as 0; a zero-norm side yields cosine 0.0 (not
  * NaN), so downstream `>= tau` filters never admit degenerate vectors.
  */
object VecMath {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i)) { val v = a.getDouble(i); s += v * v }
      i += 1
    }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = norm(a) * norm(b)
    if (d == 0.0) 0.0 else dot(a, b) / d
  }
}

object VecExpressions {

  private val arrDouble = ArrayType(DoubleType)

  private def checkArr(fn: String, dts: Seq[DataType]): TypeCheckResult =
    if (dts.forall {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects ${arrDouble.simpleString} arguments, got ${dts.map(_.simpleString).mkString(", ")}")

  abstract class VecBinary(fn: String) extends BinaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def prettyName: String = fn
    override def checkInputDataTypes(): TypeCheckResult =
      checkArr(fn, Seq(left.dataType, right.dataType))
    protected def kernel: String
    override protected def nullSafeEval(a: Any, b: Any): Any =
      evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    protected def evalKernel(a: ArrayData, b: ArrayData): Double
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecMath.$kernel($a, $b)")
  }

  final case class VecDot(left: Expression, right: Expression) extends VecBinary("vec_dot") {
    protected def kernel = "dot"
    protected def evalKernel(a: ArrayData, b: ArrayData): Double = VecMath.dot(a, b)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
  }

  final case class VecCosine(left: Expression, right: Expression) extends VecBinary("vec_cosine") {
    protected def kernel = "cosine"
    protected def evalKernel(a: ArrayData, b: ArrayData): Double = VecMath.cosine(a, b)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
      copy(left = l, right = r)
  }

  final case class VecNorm(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"
    override def checkInputDataTypes(): TypeCheckResult =
      checkArr("vec_norm", Seq(child.dataType))
    override protected def nullSafeEval(v: Any): Any = VecMath.norm(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecMath.norm($c)")
    override protected def withNewChildInternal(c: Expression): VecNorm = copy(child = c)
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    def info(name: String) = new ExpressionInfo(classOf[VecMath.type].getName, name)
    Seq(
      (new FunctionIdentifier("vec_dot"), info("vec_dot"), (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot expects two arguments"); VecDot(args(0), args(1))
      }),
      (new FunctionIdentifier("vec_cosine"), info("vec_cosine"), (args: Seq[Expression]) => {
        require(args.length == 2, "vec_cosine expects two arguments"); VecCosine(args(0), args(1))
      }),
      (new FunctionIdentifier("vec_norm"), info("vec_norm"), (args: Seq[Expression]) => {
        require(args.length == 1, "vec_norm expects one argument"); VecNorm(args.head)
      }))
  }
}
