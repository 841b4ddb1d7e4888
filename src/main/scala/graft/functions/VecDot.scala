package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric array columns.
  *
  * The HOF formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * evaluates its lambdas interpreted (outside whole-stage codegen) —
  * at ~O(dim) boxed calls per row it dominates every similarity-search
  * operator's runtime. This expression compiles to one static kernel
  * call; elements are widened to double before multiplying (the same
  * arithmetic an ANSI engine applies after CAST(x AS DOUBLE)), and
  * accumulation is left-to-right like the fold it replaces.
  */
object VecDotKernel {
  /** aF/bF: true when the corresponding array stores 4-byte floats. */
  def compute(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private lazy val aFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val bFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDotKernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecDotKernel.compute($a, $b, $aFloat, $bFloat);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** Column API: Σ aᵢ·bᵢ as double. Arrays must be float or double. */
  def of(a: Column, b: Column): Column =
    GraftShims.column(VecDot(GraftShims.expression(a), GraftShims.expression(b)))
}
