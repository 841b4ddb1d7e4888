package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash-signature kernel: word `k`-shingling, xxhash64 of each
  * shingle, and the `numHashes` per-seed minima, all in one compiled
  * pass over the token array.
  *
  * Exists because Spark's higher-order functions (`transform` /
  * `aggregate`) evaluate their lambdas interpreted, outside whole-stage
  * codegen — the HOF formulation of this signature costs
  * O(shingles × numHashes) boxed lambda calls per document and
  * dominated the near-dup pipeline's runtime. Per-seed hashes derive
  * from the shingle's xxhash64 via a splitmix64 finalizer (no string
  * re-hash per seed), mirroring the single-pass design of the HOF
  * version it replaces (reference semantics: the minhash sketch of
  * `toolkits/collaborative_filtering/../parsers` pipelines; SURVEY.md
  * LLM-pipeline dedup).
  */
object MinHashKernel {
  private val Space = UTF8String.fromString(" ")

  /** Min of the raw shingle xxhash64 values (the document fingerprint —
    * bit-identical to `array_min(transform(shingles, xxhash64))`).
    */
  def minShingleHash(tokens: ArrayData, k: Int): Long = {
    val n = tokens.numElements()
    var min = Long.MaxValue
    def visit(s: UTF8String): Unit = {
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      if (h < min) min = h
    }
    if (n < k) {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = tokens.getUTF8String(i); i += 1 }
      visit(UTF8String.concatWs(Space, parts: _*))
    } else {
      var i = 0
      while (i + k <= n) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        visit(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
    }
    min
  }

  /** Sorted distinct xxhash64 values of the lowercased word k-shingles —
    * set-equal to `array_distinct(transform(shingles(lowered), xxhash64))`
    * (order differs: ascending here, first-seen there; every consumer is
    * set-shaped). Short documents (< k tokens) hash one shingle of
    * everything, matching TextAnalysis.shingles.
    */
  def shingleHashSet(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    def hashOf(parts: Array[UTF8String]): Long = {
      val s = UTF8String.concatWs(Space, parts: _*)
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    }
    val low = new Array[UTF8String](n)
    var i = 0
    while (i < n) { low(i) = tokens.getUTF8String(i).toLowerCase; i += 1 }
    val m = if (n < k) 1 else n - k + 1
    val hs = new Array[Long](m)
    if (n < k) hs(0) = hashOf(low)
    else {
      i = 0
      while (i + k <= n) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = low(i + j); j += 1 }
        hs(i) = hashOf(parts)
        i += 1
      }
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Distinct shingle STRINGS in first-occurrence order — bit- and
    * ORDER-identical to `array_distinct(shingles(text, k))` (lowercase
    * tokens, space-joined k-grams, whole doc if shorter than k), for
    * the operators that must emit the n-gram text itself. Exists for
    * the same reason as [[shingleHashSet]]: the HOF chain evaluates
    * interpreted, and a single-file scan partition at the mercy of C2
    * compile timing ran q108 anywhere from 6 s to 197 s; the compiled
    * kernel is deterministic milliseconds.
    */
  def shingleStringSet(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val low = new Array[UTF8String](n)
    var i = 0
    while (i < n) { low(i) = tokens.getUTF8String(i).toLowerCase; i += 1 }
    if (n < k)
      return new GenericArrayData(
        Array[Any](UTF8String.concatWs(Space, low: _*)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i + k <= n) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = low(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Fills `mins` with the signature of the shingle stream. */
  def compute(tokens: ArrayData, numHashes: Int, k: Int): ArrayData = {
    val n = tokens.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)

    def update(s: UTF8String): Unit = {
      val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      var i = 0
      while (i < numHashes) {
        var z = base ^ (0x9e3779b97f4a7c15L * (i + 1))
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        if (z < mins(i)) mins(i) = z
        i += 1
      }
    }

    if (n < k) {
      // fewer tokens than the shingle width → one shingle of everything
      // (matches TextAnalysis.shingles' short-document special case)
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = tokens.getUTF8String(i); i += 1 }
      update(UTF8String.concatWs(Space, parts: _*))
    } else {
      var i = 0
      while (i + k <= n) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        update(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** Expression wrapper: `MinHashSig(tokens, numHashes, shingleK)` over an
  * `array<string>` token column. Codegen emits a single static kernel
  * call — no interpreted lambdas, no per-seed string hashing.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[ArrayData], numHashes, shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.compute($c, $numHashes, $shingleK);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Column API: signature of an `array<string>` token column. */
  def of(tokens: Column, numHashes: Int, shingleK: Int): Column =
    GraftShims.column(
      MinHashSig(GraftShims.expression(tokens), numHashes, shingleK))
}

/** Document fingerprint: min shingle hash in one compiled pass. */
case class ShingleMinHash(child: Expression, shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.minShingleHash(input.asInstanceOf[ArrayData], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.minShingleHash($c, $shingleK);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)

  override def prettyName: String = "shingle_min_hash"
}

object ShingleMinHash {
  def of(tokens: Column, shingleK: Int): Column =
    GraftShims.column(ShingleMinHash(GraftShims.expression(tokens), shingleK))
}

/** Distinct word-shingle hash SET in one compiled pass: lowercase each
  * token, k-shingle, xxhash64 each shingle (seed 42 — bit-identical to
  * `xxhash64(shingle)` on the string path), sort, dedupe. The sorted
  * distinct `array<long>` drives every set-shaped n-gram operator
  * (jaccard intersect/union sizes, overlap joins) at 8 bytes per
  * n-gram instead of the string — and replaces the interpreted
  * `transform(lower) → transform(slice+concat_ws) → array_distinct`
  * HOF chain that costs ~6 s per pass over a 5k-doc scan at sf0.1
  * (HOF lambdas evaluate outside whole-stage codegen).
  */
case class ShingleHashes(child: Expression, shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleHashSet(input.asInstanceOf[ArrayData], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.shingleHashSet($c, $shingleK);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  /** Column API over an `array<string>` token column (NOT pre-lowered —
    * the kernel lowercases per token, matching
    * `transform(tokens, lower)` on the HOF path).
    */
  def of(tokens: Column, shingleK: Int): Column =
    GraftShims.column(ShingleHashes(GraftShims.expression(tokens), shingleK))
}

/** Distinct shingle strings (first-occurrence order) in one compiled
  * pass — the string-output sibling of [[ShingleHashes]] for operators
  * that must emit the n-gram text (boilerplate detection/strip, string
  * oracle paths). Drop-in for `array_distinct(shingles(text, k))`,
  * ordering included.
  */
case class ShingleStrings(child: Expression, shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleStringSet(input.asInstanceOf[ArrayData], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.shingleStringSet($c, $shingleK);")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)

  override def prettyName: String = "shingle_strings"
}

object ShingleStrings {
  /** Column API over an `array<string>` token column (NOT pre-lowered —
    * the kernel lowercases per token, matching `shingles`).
    */
  def of(tokens: Column, shingleK: Int): Column =
    GraftShims.column(ShingleStrings(GraftShims.expression(tokens), shingleK))
}
