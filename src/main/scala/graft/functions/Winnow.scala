package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing-fingerprint kernel (Schleimer/Wilkerson/Aiken 2003,
  * the MOSS local fingerprinting scheme): lowercase the tokens, hash
  * every k-token gram with the PORTABLE polynomial hash (base 31 over
  * the code points of the space-joined gram, mod 2^31−1 — the oracle-
  * derivable hash q132/q133 publish, not xxhash64), slide a w-window
  * over the gram hashes, keep each window's minimum, and emit the
  * distinct minima in first-occurrence order — all in one compiled pass.
  *
  * Exists for the same reason as [[MinHashKernel]]: the HOF formulation
  * (`transform(grams, g => aggregate(split(g, ""), …, pmod(acc*31 +
  * ascii(c), M)))`) evaluates every lambda interpreted with a per-
  * character array allocation — O(chars × grams) boxed work per
  * document, the exact expression family that previously swung 6–197 s
  * with C2 compile timing (q108) and had to be checkpoint-barriered
  * against CollapseProject blowup (q133).
  *
  * Cost here is O(total chars + grams × k): per-token hashes and their
  * base-31 length powers are computed once, gram hashes compose them
  * modularly — `H(a ++ " " ++ b) = ((H(a)·31 + 32)·31^|b| + H(b)) mod M`
  * — instead of re-walking k token strings per gram.
  */
object WinnowKernel {
  private val M = 2147483647L // 2^31−1; acc < M keeps every product < 2^62

  /** Distinct sliding-window gram-hash minima in first-occurrence order.
    * Bit- and order-identical to the HOF tower it replaces:
    * grams exist only when numTokens >= k; fingerprints only when
    * numGrams >= w (else an empty array).
    */
  def fingerprintSet(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val nG = n - k + 1
    if (nG < w) return new GenericArrayData(Array.emptyLongArray)
    // per-token polynomial hash and 31^(codepoints) mod M, once per token
    val th = new Array[Long](n)
    val tp = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i).toLowerCase.toString
      var h = 0L
      var p = 1L
      var j = 0
      while (j < t.length) {
        val cp = t.codePointAt(j)
        h = (h * 31L + cp) % M
        p = (p * 31L) % M
        j += Character.charCount(cp)
      }
      th(i) = h
      tp(i) = p
      i += 1
    }
    val gh = new Array[Long](nG)
    var g = 0
    while (g < nG) {
      var acc = th(g)
      var j = g + 1
      while (j < g + k) {
        acc = (acc * 31L + 32L) % M // the ' ' separator
        acc = (acc * tp(j) % M + th(j)) % M
        j += 1
      }
      gh(g) = acc
      g += 1
    }
    // sliding-window minima via a monotone deque (O(nG) for any w),
    // distinct in first-occurrence order (matches array_distinct over
    // transform(sequence(...), j => array_min(slice(gh, j+1, w))))
    val nW = nG - w + 1
    val deque = new Array[Int](nG)
    var head = 0
    var tail = 0 // [head, tail) holds indices with increasing gh values
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nW)
    var nOut = 0
    i = 0
    while (i < nG) {
      while (tail > head && gh(deque(tail - 1)) >= gh(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = gh(deque(head))
        if (seen.add(m)) { out(nOut) = m; nOut += 1 }
      }
      i += 1
    }
    new GenericArrayData(
      if (nOut == nW) out else java.util.Arrays.copyOf(out, nOut))
  }
}

/** `array<string>` tokens → `array<long>` distinct winnowing
  * fingerprints. Tokens need not be pre-lowercased (the kernel
  * lowercases per token, matching `transform(toks, lower)`).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.fingerprintSet(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernel.fingerprintSet($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {
  /** Column API over an `array<string>` token column. */
  def of(tokens: Column, k: Int, w: Int): Column =
    GraftShims.column(WinnowFingerprints(GraftShims.expression(tokens), k, w))
}
