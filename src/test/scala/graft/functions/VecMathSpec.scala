package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-exactness pins for the r15 vector kernels: each kernel must
  * reproduce the HOF expression it replaced EXACTLY (same element
  * order, same widening, same left-to-right accumulation) on shared
  * inputs — the guarantee that lets the optimization round swap them
  * into declared-query paths without moving any oracle hash.
  */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  // deterministic "awkward" doubles: non-representable fractions,
  // denormal-ish magnitudes, negative zero, mixed signs
  private val a1 = Array(0.1, -2.7, 3.4028235e37, -0.0, 5e-324, 1.0 / 3.0)
  private val a2 = Array(-7.3, 0.2, 1e-17, 4.5, -1.0 / 7.0, 2.5)
  private val f1 = Array(1.5f, -2.25f, 0.1f, 3.7f)
  private val dfD = Seq((a1, a2, 2.7, -1.3)).toDF("a", "b", "s", "t")
  private val dfF = Seq((f1, 0.37)).toDF("a", "s")

  private def one(df: org.apache.spark.sql.DataFrame,
                  c: org.apache.spark.sql.Column): Any =
    df.select(c.as("x")).collect()(0).get(0)

  test("VecScale == transform(a, _ * s) and transform(a, _ / s), double and float") {
    assert(one(dfD, VecMath.scale(col("a"), col("s"))) ==
      one(dfD, transform(col("a"), x => x * col("s"))))
    assert(one(dfD, VecMath.scaleDiv(col("a"), col("s"))) ==
      one(dfD, transform(col("a"), x => x / col("s"))))
    assert(one(dfF, VecMath.scale(col("a"), col("s"))) ==
      one(dfF, transform(col("a"), x => x * col("s"))))
  }

  test("VecHadamard / VecAdd == zip_with products and sums") {
    assert(one(dfD, VecMath.hadamard(col("a"), col("b"))) ==
      one(dfD, zip_with(col("a"), col("b"), (x, y) => x * y)))
    assert(one(dfD, VecMath.add(col("a"), col("b"))) ==
      one(dfD, zip_with(col("a"), col("b"), (x, y) => x + y)))
    // self-hadamard (the FM S2 term)
    assert(one(dfD, VecMath.hadamard(col("a"), col("a"))) ==
      one(dfD, transform(col("a"), x => x * x)))
  }

  test("VecScaleDiff == zip_with(a, b, (p, n) => s*p - t*n)") {
    assert(one(dfD, VecMath.scaleDiff(col("a"), col("b"), col("s"), col("t"))) ==
      one(dfD, zip_with(col("a"), col("b"),
        (p, n) => col("s") * p - col("t") * n)))
  }

  test("VecDot3 == aggregate(zip_with(zip_with(a,b,_*_), c, _*_), 0d, _+_)") {
    val df3 = Seq((a1, a2, a1.map(_ * 0.5))).toDF("a", "b", "c")
    assert(one(df3, VecMath.dot3(col("a"), col("b"), col("c"))) ==
      one(df3, aggregate(zip_with(zip_with(col("a"), col("b"), (x, y) => x * y),
        col("c"), (xy, z) => xy * z), lit(0.0d), (acc, v) => acc + v)))
  }

  test("VecSqDiffSum == aggregate(zip_with(S, S2, s*s - s2), 0d, _+_)") {
    assert(one(dfD, VecMath.sqDiffSum(col("a"), col("b"))) ==
      one(dfD, aggregate(zip_with(col("a"), col("b"),
        (s, s2) => s * s - s2), lit(0.0d), (acc, x) => acc + x)))
  }

  test("VecSqDistSum == aggregate(zip_with(a, b, (x-y)^2), 0d, _+_)") {
    assert(one(dfD, VecMath.sqDistSum(col("a"), col("b"))) ==
      one(dfD, aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)))
  }

  test("VecNormalize == when(norm > 0, transform(a, _ / norm)).otherwise(a)") {
    def hofNorm(a: org.apache.spark.sql.Column) = {
      val n = sqrt(VecDot.of(a, a))
      when(n > 0, transform(a, x => x / n)).otherwise(a)
    }
    assert(one(dfD, VecMath.normalize(col("a"))) == one(dfD, hofNorm(col("a"))))
    // zero vector: falls through to the (widened) input
    val z = Seq(Tuple1(Array(0.0, -0.0, 0.0))).toDF("a")
    assert(one(z, VecMath.normalize(col("a"))) == one(z, hofNorm(col("a"))))
    // float input widens identically to the when-branch coercion
    val zf = Seq(Tuple1(f1)).toDF("a")
    assert(one(zf, VecMath.normalize(col("a"))) ==
      one(zf, hofNorm(col("a")).cast("array<double>")))
  }

  test("VecUpdate == zip_with(x, g, (p, q) => p + lr*(q - reg*p))") {
    val (lr, reg) = (0.01, 0.05)
    assert(one(dfD, VecMath.update(col("a"), col("b"), lr, reg)) ==
      one(dfD, zip_with(col("a"), col("b"),
        (p, g) => p + lit(lr) * (g - lit(reg) * p))))
  }
}
