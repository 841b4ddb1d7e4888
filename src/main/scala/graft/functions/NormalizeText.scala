package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization kernels for corpus cleaning — the
  * canonicalization step every dedup/fingerprint pipeline wants BEFORE
  * hashing (visually-identical strings with different codepoint
  * sequences otherwise hash apart). Spark has no built-in for either;
  * these are native `UnaryExpression`s that stay inside whole-stage
  * codegen rather than Scala UDFs.
  *
  * Both kernels short-circuit pure-ASCII input (numBytes == numChars)
  * to the input buffer itself — no String materialization on the
  * overwhelmingly-ASCII common case, so the scan stays allocation-free
  * for English corpora.
  *
  * Reference analog: the reference tokenizes bytes as-is
  * (`toolkits/parsers/texttokens.cpp:77-96` splits on raw separators);
  * a Spark-first pipeline normalizes first so downstream shingle/token
  * hashes are canonical.
  */
object NormalizeTextKernel {
  private def asciiFast(s: UTF8String): Boolean = s.numBytes == s.numChars

  /** Canonical composition (Unicode NFC) — DuckDB `nfc_normalize`
    * semantics: decomposed sequences ("e" + U+0301) compose to their
    * canonical precomposed form ("é").
    */
  def nfc(s: UTF8String): UTF8String = {
    if (asciiFast(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Accent removal — DuckDB `strip_accents` semantics: canonical
    * decomposition, drop combining marks (category Mn), recompose.
    * "école" → "ecole", and already-decomposed input strips the same.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    if (asciiFast(s)) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

case class UnicodeNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeTextKernel.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextKernel.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeTextKernel.stripAccents($c);")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)

  override def prettyName: String = "strip_accents"
}

object NormalizeText {
  /** Column API: Unicode NFC canonical composition. */
  def nfc(text: Column): Column =
    GraftShims.column(UnicodeNormalize(GraftShims.expression(text)))

  /** Column API: remove accents/diacritics (NFD → drop Mn → NFC). */
  def stripAccents(text: Column): Column =
    GraftShims.column(StripAccents(GraftShims.expression(text)))
}
