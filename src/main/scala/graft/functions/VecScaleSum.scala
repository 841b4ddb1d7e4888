package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Σ s·v aggregate: element-wise sum of a scalar-scaled
  * `array<double>` column — the gradient fold every factor-model
  * trainer runs (Σ err·q_i per user, Σ err·p_u per item).
  *
  * [[VecSum]] over `transform(v, x => x*s)` already partial-aggregates
  * map-side, but the higher-order `transform` allocates a fresh array
  * and evaluates an interpreted lambda per input ROW — at one row per
  * rating that dominates trainer iteration cost. This fused aggregate
  * reads the scalar and the vector directly and multiply-accumulates
  * into the buffer: zero per-row allocation, plain JVM arithmetic.
  */
case class VecScaleSum(left: Expression, right: Expression, vecLen: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with BinaryLike[Expression] with ExpectsInputTypes {

  // reject (or implicitly cast) a wrong-typed scale column at analysis
  // time — update() trusts the Double cast
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, ArrayType(DoubleType))

  override def createAggregationBuffer(): Array[Double] = new Array[Double](vecLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val s = left.eval(input)
    val v = right.eval(input)
    if (s != null && v != null) {
      val scale = s.asInstanceOf[Double]
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(vecLen, arr.numElements())
      var i = 0
      while (i < n) { buf(i) += scale * arr.getDouble(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): VecScaleSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecScaleSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecScaleSum =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_scale_sum"
}

object VecScaleSum {
  /** Column API: element-wise Σ scale·vec of a k-length `array<double>`
    * column. The scale column must be DoubleType (cast upstream).
    */
  def of(scale: Column, vec: Column, k: Int): Column =
    GraftShims.column(
      VecScaleSum(GraftShims.expression(scale), GraftShims.expression(vec), k)
        .toAggregateExpression())
}
