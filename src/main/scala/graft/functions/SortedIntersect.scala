package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Merge-scan intersection of two SORTED long arrays — the inner loop
  * of adjacency-list triangle counting (reference:
  * `examples/trianglecounting.cpp:134-161`'s pivot scan over sorted
  * neighbor arrays). O(|a| + |b|) per call, no hash set, no per-element
  * boxing; codegen'd so the whole per-edge intersection stays inside
  * WholeStageCodegen. Callers must pass strictly sorted arrays
  * (`sort_array(collect_list(...))` upstream).
  */
object SortedIntersectKernel {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def elems(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { out(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectKernel.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectKernel.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

case class SortedIntersectArray(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectKernel.elems(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectKernel.elems($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectArray =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect"
}

object SortedIntersect {
  /** Column API: |a ∩ b| for sorted `array<long>` columns. */
  def countOf(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectCount(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Column API: a ∩ b (sorted) for sorted `array<long>` columns. */
  def of(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectArray(
      GraftShims.expression(a), GraftShims.expression(b)))
}
