package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native element-wise sum aggregate over fixed-length
  * `array<double>` columns — Σ over a group of k-vectors.
  *
  * Replaces the `aggregate(collect_list(v), zeros, zip_with(_+_))`
  * pattern every factor-model trainer used for gradient folding. That
  * shape is doubly wrong at scale: collect_list ships EVERY per-rating
  * vector through the shuffle (no partial aggregation), and the fold
  * then runs as interpreted lambdas. This aggregate combines map-side —
  * the shuffle carries one k-vector per key per mapper — and its inner
  * loop is plain JVM arithmetic.
  */
case class VecSum(child: Expression, vecLen: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = new Array[Double](vecLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(vecLen, arr.numElements())
      var i = 0
      while (i < n) { buf(i) += arr.getDouble(i); i += 1 }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < vecLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vecLen * 8)
    var i = 0
    while (i < vecLen) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](vecLen)
    var i = 0
    while (i < vecLen) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)

  override def prettyName: String = "vec_sum"
}

object VecSum {
  /** Column API: element-wise Σ of a k-length `array<double>` column. */
  def of(vec: Column, k: Int): Column =
    GraftShims.column(
      VecSum(GraftShims.expression(vec), k).toAggregateExpression())
}
