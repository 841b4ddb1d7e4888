package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native per-row vector kernels — r15 optimization round.
  *
  * Spark's higher-order functions (`transform`, `zip_with`,
  * `aggregate`) are CodegenFallback: inside an otherwise
  * whole-stage-codegen'd projection each HOF subtree evaluates
  * INTERPRETED — one boxed lambda invocation per element, with
  * `BoundReference.eval`/`Double.valueOf` churn. Solo jstack profiles
  * of q44/q135 (r15, committed in OPTIMIZATION_r15.md) put
  * `ArrayTransform.nullSafeEval` at the top of every task-thread
  * sample on the per-rating trainer paths and the ANN normalize path.
  *
  * Each kernel below is a BIT-EXACT mirror of the HOF expression it
  * replaces (same element order, same widening to double, same
  * left-to-right accumulation), so swapping it in cannot change any
  * query result — specs pin kernel-vs-HOF equality on shared golden
  * inputs. Same idiom as [[VecDot]]/[[SortedIntersect]]: a static
  * kernel object + a thin codegen'd Expression.
  */
object VecMathKernels {
  @inline private def get(a: ArrayData, i: Int, f: Boolean): Double =
    if (f) a.getFloat(i).toDouble else a.getDouble(i)

  /** transform(a, x => x * s) / transform(a, x => x / s). */
  def scale(a: ArrayData, s: Double, aF: Boolean, divide: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    if (divide) while (i < n) { out(i) = get(a, i, aF) / s; i += 1 }
    else while (i < n) { out(i) = get(a, i, aF) * s; i += 1 }
    new GenericArrayData(out)
  }

  /** zip_with(a, b, (x, y) => x * y) — callers pass equal-length arrays. */
  def hadamard(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = get(a, i, aF) * get(b, i, bF); i += 1 }
    new GenericArrayData(out)
  }

  /** zip_with(a, b, (x, y) => x + y) — equal-length arrays. */
  def add(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = get(a, i, aF) + get(b, i, bF); i += 1 }
    new GenericArrayData(out)
  }

  /** zip_with(a, b, (p, n) => s·p − t·n) — the RBM CD-1 gradient row. */
  def scaleDiff(a: ArrayData, b: ArrayData, s: Double, t: Double,
                aF: Boolean, bF: Boolean): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = s * get(a, i, aF) - t * get(b, i, bF); i += 1 }
    new GenericArrayData(out)
  }

  /** aggregate(zip_with(zip_with(a,b,_*_), c, _*_), 0d, _+_):
    * Σ left-to-right ((aᵢ·bᵢ)·cᵢ).
    */
  def dot3(a: ArrayData, b: ArrayData, c: ArrayData,
           aF: Boolean, bF: Boolean, cF: Boolean): Double = {
    val n = math.min(a.numElements(), math.min(b.numElements(), c.numElements()))
    var acc = 0.0d
    var i = 0
    while (i < n) { acc += get(a, i, aF) * get(b, i, bF) * get(c, i, cF); i += 1 }
    acc
  }

  /** aggregate(zip_with(s, s2, (x, y) => x*x − y), 0d, _+_):
    * Σ left-to-right (sᵢ² − s2ᵢ) — the FM prediction term.
    */
  def sqDiffSum(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val x = get(a, i, aF)
      acc += x * x - get(b, i, bF)
      i += 1
    }
    acc
  }

  /** aggregate(zip_with(a, b, (x, y) => (x−y)·(x−y)), 0d, _+_):
    * Σ left-to-right (aᵢ − bᵢ)² — squared Euclidean distance.
    */
  def sqDistSum(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val d = get(a, i, aF) - get(b, i, bF)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Similarity.normalize exactly: n = sqrt(Σ L2R xᵢ·xᵢ) (VecDot's own
    * accumulation); n > 0 → transform(a, x => x / n), else the input
    * widened to double (what the `when` branch coercion produced).
    */
  def normalize(a: ArrayData, aF: Boolean): ArrayData = {
    val n = a.numElements()
    var acc = 0.0d
    var i = 0
    while (i < n) { val x = get(a, i, aF); acc += x * x; i += 1 }
    val nrm = math.sqrt(acc)
    val out = new Array[Double](n)
    i = 0
    if (nrm > 0) while (i < n) { out(i) = get(a, i, aF) / nrm; i += 1 }
    else while (i < n) { out(i) = get(a, i, aF); i += 1 }
    new GenericArrayData(out)
  }

  /** zip_with(x, g, (p, q) => p + lr·(q − reg·p)) — the shared SGD-family
    * factor update row.
    */
  def update(x: ArrayData, g: ArrayData, lr: Double, reg: Double,
             xF: Boolean, gF: Boolean): ArrayData = {
    val n = math.min(x.numElements(), g.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = get(x, i, xF)
      out(i) = p + lr * (get(g, i, gF) - reg * p)
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait VecArgFloat {
  protected def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

case class VecScale(child: Expression, scalar: Expression, divide: Boolean)
    extends BinaryExpression with VecArgFloat {
  override def left: Expression = child
  override def right: Expression = scalar
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val aF = isFloatArr(child)
  override protected def nullSafeEval(a: Any, s: Any): Any =
    VecMathKernels.scale(a.asInstanceOf[ArrayData],
      s.asInstanceOf[Double], aF, divide)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"${ev.value} = graft.functions.VecMathKernels.scale($a, $s, $aF, $divide);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecScale = copy(child = newLeft, scalar = newRight)
  override def prettyName: String = if (divide) "vec_scale_div" else "vec_scale"
}

case class VecHadamard(left: Expression, right: Expression)
    extends BinaryExpression with VecArgFloat {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val aF = isFloatArr(left)
  private lazy val bF = isFloatArr(right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMathKernels.hadamard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecMathKernels.hadamard($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecHadamard = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_hadamard"
}

case class VecAdd(left: Expression, right: Expression)
    extends BinaryExpression with VecArgFloat {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val aF = isFloatArr(left)
  private lazy val bF = isFloatArr(right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMathKernels.add(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecMathKernels.add($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecAdd = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_add"
}

/** s·aᵢ − t·bᵢ (four children: a, b, s, t). */
case class VecScaleDiff(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with VecArgFloat {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val aF = isFloatArr(first)
  private lazy val bF = isFloatArr(second)
  override protected def nullSafeEval(a: Any, b: Any, s: Any, t: Any): Any =
    VecMathKernels.scaleDiff(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], s.asInstanceOf[Double],
      t.asInstanceOf[Double], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s, t) =>
      s"${ev.value} = graft.functions.VecMathKernels.scaleDiff($a, $b, $s, $t, $aF, $bF);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): VecScaleDiff =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
  override def prettyName: String = "vec_scale_diff"
}

case class VecDot3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with VecArgFloat {
  override def dataType: DataType = DoubleType
  private lazy val aF = isFloatArr(first)
  private lazy val bF = isFloatArr(second)
  private lazy val cF = isFloatArr(third)
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VecMathKernels.dot3(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], aF, bF, cF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.VecMathKernels.dot3($a, $b, $c, $aF, $bF, $cF);")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): VecDot3 =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "vec_dot3"
}

case class VecSqDiffSum(left: Expression, right: Expression)
    extends BinaryExpression with VecArgFloat {
  override def dataType: DataType = DoubleType
  private lazy val aF = isFloatArr(left)
  private lazy val bF = isFloatArr(right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMathKernels.sqDiffSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecMathKernels.sqDiffSum($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecSqDiffSum = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_sqdiff_sum"
}

case class VecSqDistSum(left: Expression, right: Expression)
    extends BinaryExpression with VecArgFloat {
  override def dataType: DataType = DoubleType
  private lazy val aF = isFloatArr(left)
  private lazy val bF = isFloatArr(right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMathKernels.sqDistSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecMathKernels.sqDistSum($a, $b, $aF, $bF);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecSqDistSum = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_sqdist_sum"
}

case class VecNormalize(child: Expression)
    extends UnaryExpression with VecArgFloat {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val aF = isFloatArr(child)
  override protected def nullSafeEval(a: Any): Any =
    VecMathKernels.normalize(a.asInstanceOf[ArrayData], aF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecMathKernels.normalize($a, $aF)")
  override protected def withNewChildInternal(newChild: Expression): VecNormalize =
    copy(child = newChild)
  override def prettyName: String = "vec_normalize"
}

case class VecUpdate(left: Expression, right: Expression, lr: Double, reg: Double)
    extends BinaryExpression with VecArgFloat {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private lazy val aF = isFloatArr(left)
  private lazy val bF = isFloatArr(right)
  override protected def nullSafeEval(x: Any, g: Any): Any =
    VecMathKernels.update(x.asInstanceOf[ArrayData], g.asInstanceOf[ArrayData],
      lr, reg, aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, g) =>
      s"${ev.value} = graft.functions.VecMathKernels.update($x, $g, $lr, $reg, $aF, $bF);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecUpdate = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_update"
}

/** Column API for the r15 vector kernels. */
object VecMath {
  private def c(e: Expression): Column = GraftShims.column(e)
  private def e(col: Column): Expression = GraftShims.expression(col)

  /** transform(a, x => x * s) */
  def scale(a: Column, s: Column): Column = c(VecScale(e(a), e(s), divide = false))
  /** transform(a, x => x / s) */
  def scaleDiv(a: Column, s: Column): Column = c(VecScale(e(a), e(s), divide = true))
  /** zip_with(a, b, _ * _) */
  def hadamard(a: Column, b: Column): Column = c(VecHadamard(e(a), e(b)))
  /** zip_with(a, b, _ + _) */
  def add(a: Column, b: Column): Column = c(VecAdd(e(a), e(b)))
  /** zip_with(a, b, (p, n) => s·p − t·n) */
  def scaleDiff(a: Column, b: Column, s: Column, t: Column): Column =
    c(VecScaleDiff(e(a), e(b), e(s), e(t)))
  // (VecScaleDiff is a QuaternaryExpression: a, b, s, t)
  /** Σ (aᵢ·bᵢ)·cᵢ */
  def dot3(a: Column, b: Column, cc: Column): Column = c(VecDot3(e(a), e(b), e(cc)))
  /** Σ (aᵢ² − bᵢ) */
  def sqDiffSum(a: Column, b: Column): Column = c(VecSqDiffSum(e(a), e(b)))
  /** Σ (aᵢ − bᵢ)² */
  def sqDistSum(a: Column, b: Column): Column = c(VecSqDistSum(e(a), e(b)))
  /** L2-normalize (Similarity.normalize semantics) */
  def normalize(a: Column): Column = c(VecNormalize(e(a)))
  /** zip_with(x, g, (p, q) => p + lr·(q − reg·p)) */
  def update(x: Column, g: Column, lr: Double, reg: Double): Column =
    c(VecUpdate(e(x), e(g), lr, reg))
}
