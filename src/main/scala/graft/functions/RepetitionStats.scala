package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Native one-pass kernel for the repetition-based quality signals of
  * the Gopher curation rules (Rae et al. 2021 §A1.1, public method):
  * per-document distinct-token count, the occurrence count of the most
  * frequent token BIGRAM, and the number of trigram occurrences whose
  * trigram repeats (≥ 2 occurrences) — the raw integers behind the
  * "fraction of characters/tokens in duplicated n-grams" filters every
  * LLM curation pipeline applies.
  *
  * Emits exact INTEGERS (counts and denominators), not fractions: the
  * caller derives the rounded ratios, so every cross-engine comparison
  * is integer-exact and the oracle never depends on float summation
  * order. Gram keys are the joined lowercased token STRINGS (a
  * java.util.HashMap per row), not 31-bit polynomial hashes — a hash
  * collision would silently merge two distinct grams and break the
  * string-based oracle (at ~10³ grams/doc a 31-bit space collides once
  * per ~10⁴ docs; the string map is collision-free by construction).
  *
  * Cost: O(total chars) per document, one compiled pass, zero shuffle —
  * the per-row scan shape that holds at 100 TB. Exists as a native
  * expression for the same reason as [[WinnowKernel]]: the HOF
  * formulation (explode grams → groupBy) would shuffle every corpus
  * token, and the in-row HOF alternative (array_sort + aggregate)
  * evaluates interpreted per-element lambdas.
  */
object RepetitionStatsKernel {
  /** (n_tokens, n_distinct, top_bigram_count, n_bigrams,
    * dup_trigram_occurrences, n_trigrams) over lowercased tokens.
    */
  def stats(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      toks(i) = tokens.getUTF8String(i).toLowerCase.toString
      i += 1
    }
    val distinct = new java.util.HashSet[String]()
    i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    // bigrams: track the max count while counting
    val big = new java.util.HashMap[String, Int]()
    var topBigram = 0L
    i = 0
    while (i < n - 1) {
      val g = toks(i) + " " + toks(i + 1)
      val c = big.merge(g, 1, Integer.sum)
      if (c > topBigram) topBigram = c.toLong
      i += 1
    }
    // trigrams: occurrences belonging to grams seen >= 2 times
    val tri = new java.util.HashMap[String, Int]()
    i = 0
    while (i < n - 2) {
      tri.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), 1, Integer.sum)
      i += 1
    }
    var dupTri = 0L
    val it = tri.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c >= 2) dupTri += c
    }
    new GenericInternalRow(Array[Any](
      n.toLong, distinct.size.toLong, topBigram,
      math.max(n - 1, 0).toLong, dupTri, math.max(n - 2, 0).toLong))
  }
}

/** `array<string>` tokens → struct of the six repetition integers.
  * Tokens need not be pre-lowercased (the kernel lowercases per token,
  * matching the oracle's `lower(text)`-before-split).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup_trigram_occ", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsKernel.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStatsKernel.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  /** Column API over an `array<string>` token column. */
  def of(tokens: Column): Column =
    GraftShims.column(RepetitionStats(GraftShims.expression(tokens)))
}
