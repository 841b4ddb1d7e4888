package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-token PORTABLE polynomial hash — base 31 over the code points of
  * the lowercased token, mod 2³¹−1 — the same oracle-derivable hash
  * family as [[WinnowKernel]] (which hashes k-token grams; this hashes
  * single tokens, positionally, WITHOUT dedup — counts matter to the
  * callers). Compiled kernel for the same reason as its siblings: the
  * HOF tower (`transform(toks, t => aggregate(split(t, ""), …))`)
  * evaluates interpreted with a per-character array allocation.
  *
  * Used for hashed FEATURE buckets (DSIR-style importance weighting,
  * hashed linear classifiers): the hash value is taken mod the bucket
  * count by the caller, so both engines derive identical buckets.
  */
object PolyHashTokensKernel {
  private val M = 2147483647L

  def hashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i).toLowerCase.toString
      var h = 0L
      var j = 0
      while (j < t.length) {
        val cp = t.codePointAt(j)
        h = (h * 31L + cp) % M
        j += Character.charCount(cp)
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string>` tokens → `array<long>` positional polynomial hashes
  * (one per token, duplicates preserved). Tokens need not be
  * pre-lowercased.
  */
case class PolyHashTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    PolyHashTokensKernel.hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHashTokensKernel.hashes($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyHashTokens =
    copy(child = newChild)

  override def prettyName: String = "poly_hash_tokens"
}

object PolyHashTokens {
  /** Column API over an `array<string>` token column. */
  def of(tokens: Column): Column =
    GraftShims.column(PolyHashTokens(GraftShims.expression(tokens)))
}
