package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native random-hyperplane sign-LSH bucketing: for each of `numTables`
  * tables, packs `numPlanes` projection signs into one int bucket id.
  *
  * Plane components are hash-derived (deterministic — reproducible runs,
  * no RNG state to ship) and cached per (plane, dim) on first use, so
  * per row the work is a dense multiply-add sweep instead of the HOF
  * formulation's O(tables × planes × dim) interpreted lambda calls.
  */
object SignLshKernel {
  // (numPlanes, numTables, dim) → [table*planes+p][j] plane components
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planes(numPlanes: Int, numTables: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((numPlanes, numTables, dim), _ => {
      Array.tabulate(numTables * numPlanes, dim) { (p, j) =>
        // xxhash64 over the two longs (plane, j), seed 42 — matches the
        // engine's other hash-seeded initializers.
        val h = XXH64.hashLong(j.toLong, XXH64.hashLong(p.toLong, 42L))
        (java.lang.Math.floorMod(h, 1000000L).toDouble / 1000000.0) - 0.5
      }
    })

  def compute(vec: ArrayData, numPlanes: Int, numTables: Int,
              isFloat: Boolean): ArrayData = {
    val dim = vec.numElements()
    val pl = planes(numPlanes, numTables, dim)
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      v(j) = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      j += 1
    }
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var p = 0
      while (p < numPlanes) {
        val plane = pl(t * numPlanes + p)
        var proj = 0.0
        var i = 0
        while (i < dim) { proj += v(i) * plane(i); i += 1 }
        if (proj >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class SignLsh(child: Expression, numPlanes: Int, numTables: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    SignLshKernel.compute(input.asInstanceOf[ArrayData], numPlanes, numTables,
      isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignLshKernel.compute($c, $numPlanes, " +
        s"$numTables, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): SignLsh =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh"
}

object SignLsh {
  /** Column API: per-table bucket ids of a float/double array column. */
  def of(vec: Column, numPlanes: Int, numTables: Int): Column =
    GraftShims.column(
      SignLsh(GraftShims.expression(vec), numPlanes, numTables))
}
