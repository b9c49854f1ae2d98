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

  // CH vector-distance family (ClickHouse SQL reference, distance
  // functions): same null-as-0 convention as above.

  def l1Norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { if (!a.isNullAt(i)) s += math.abs(a.getDouble(i)); i += 1 }
    s
  }

  def linfNorm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i)) s = math.max(s, math.abs(a.getDouble(i)))
      i += 1
    }
    s
  }

  @inline private def el(a: ArrayData, i: Int): Double =
    if (i < a.numElements() && !a.isNullAt(i)) a.getDouble(i) else 0.0

  def l1Dist(a: ArrayData, b: ArrayData): Double = {
    val n = math.max(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += math.abs(el(a, i) - el(b, i)); i += 1 }
    s
  }

  def l2SqDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.max(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = el(a, i) - el(b, i); s += d * d; i += 1 }
    s
  }

  def l2Dist(a: ArrayData, b: ArrayData): Double = math.sqrt(l2SqDist(a, b))

  def linfDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.max(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s = math.max(s, math.abs(el(a, i) - el(b, i))); i += 1 }
    s
  }

  /** CH cosineDistance = 1 − cosine similarity. */
  def cosineDistance(a: ArrayData, b: ArrayData): Double = 1.0 - cosine(a, b)

  /** CH `arrayAUC(scores, labels)`: ROC area from per-row score/label
    * arrays — rank-sum form with AVERAGE ranks on score ties (the exact
    * Mann–Whitney identity); labels > 0 count positive. NaN when one
    * class is absent, like CH. */
  def auc(scores: ArrayData, labels: ArrayData): Double = {
    val n = math.min(scores.numElements(), labels.numElements())
    val s = Array.tabulate(n)(i => scores.getDouble(i))
    val pos = Array.tabulate(n)(i => labels.getDouble(i) > 0)
    val order = Array.tabulate(n)(identity).sortBy(s(_))
    val rank = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && s(order(j + 1)) == s(order(i))) j += 1
      val avg = (i + j + 2) / 2.0 // 1-based average rank across the tie run
      var t = i
      while (t <= j) { rank(order(t)) = avg; t += 1 }
      i = j + 1
    }
    var p = 0L
    var sumPos = 0.0
    i = 0
    while (i < n) { if (pos(i)) { p += 1; sumPos += rank(i) }; i += 1 }
    val ng = n - p
    if (p == 0 || ng == 0) Double.NaN
    else (sumPos - p * (p + 1) / 2.0) / (p.toDouble * ng)
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

  /** Generic kernel-dispatched forms for the CH distance family — one
    * class per arity, kernel chosen by name (all static VecMath calls,
    * codegen'd like the named expressions above). */
  final case class VecBinaryK(left: Expression, right: Expression, k: String)
      extends VecBinary(k) {
    protected def kernel = k
    protected def evalKernel(a: ArrayData, b: ArrayData): Double = k match {
      case "l1Dist" => VecMath.l1Dist(a, b)
      case "l2Dist" => VecMath.l2Dist(a, b)
      case "l2SqDist" => VecMath.l2SqDist(a, b)
      case "linfDist" => VecMath.linfDist(a, b)
      case "cosineDistance" => VecMath.cosineDistance(a, b)
      case "auc" => VecMath.auc(a, b)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecBinaryK =
      copy(left = l, right = r)
  }

  final case class VecUnaryK(child: Expression, k: String)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def prettyName: String = k
    override def checkInputDataTypes(): TypeCheckResult =
      checkArr(k, Seq(child.dataType))
    override protected def nullSafeEval(v: Any): Any = k match {
      case "l1Norm" => VecMath.l1Norm(v.asInstanceOf[ArrayData])
      case "linfNorm" => VecMath.linfNorm(v.asInstanceOf[ArrayData])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecMath.$k($c)")
    override protected def withNewChildInternal(c: Expression): VecUnaryK = copy(child = c)
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
