package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalizer helpers behind [[NfcNormalize]]/[[NfkcNormalize]]: a
  * standalone object compiles with static forwarders so generated code
  * calls them directly. `java.text.Normalizer` implements the standard
  * Unicode normalization algorithm (UAX #15), the same spec DuckDB's
  * `nfc_normalize` (utf8proc) implements — which is what lets the gate
  * grade the expression cross-engine. */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  def nfkc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKC))
}

/** `nfc_normalize(text)` — Unicode canonical composition (NFC). Web
  * crawls mix composed and decomposed encodings of the SAME visible
  * text ("é" as one codepoint vs "e"+U+0301); without normalization,
  * exact dedup, span dedup, decontamination and tokenizer lookups all
  * treat the variants as distinct content. Scan-local, codegen'd; runs
  * in the same pass as the other normalization signals ([[graft.ops
  * .TextOps.normalize]] handles case/punct/whitespace, this handles
  * the codepoint layer beneath it). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(newChild)
}

/** `nfkc_normalize(text)` — compatibility composition (NFKC): NFC plus
  * compatibility folding (fullwidth → ASCII, ligature fi → fi,
  * superscripts → digits). The normalization LLM pipelines actually
  * deploy before tokenization — compatibility variants would otherwise
  * fragment the token distribution. No DuckDB twin (utf8proc exposes
  * only NFC there), so NFKC behavior is spec-pinned and the graded
  * entry uses NFC. */
case class NfkcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfkc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfkc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfkcNormalize = copy(newChild)
}
