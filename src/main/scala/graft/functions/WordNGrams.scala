package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(tokens, n)`: space-joined word n-gram shingles of a token
  * array (the materialized-string counterpart of [[MinHashShingle]], for
  * verification joins that need the actual shingle sets). Single-token
  * fallback mirrors MinHashShingle: one shingle = all tokens joined.
  *
  * Codegen'd because the built-in formulation
  * (`transform(sequence(...), i -> concat(element_at(...)))`) evaluates
  * three interpreted lambda layers per shingle. */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 16)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.build(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.WordNGrams.build($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  private val SPACE = UTF8String.fromString(" ")

  def build(toks: ArrayData, n: Int): GenericArrayData = {
    val nt = toks.numElements()
    if (nt == 0) return new GenericArrayData(Array.empty[Any])
    val count = if (nt >= n) nt - n + 1 else 1
    val out = new Array[Any](count)
    var i = 0
    if (nt < n) {
      out(0) = concatRange(toks, 0, nt)
      return new GenericArrayData(out)
    }
    while (i < count) {
      out(i) = concatRange(toks, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def concatRange(toks: ArrayData, start: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * len - 1)
    var j = 0
    while (j < len) {
      parts(2 * j) = toks.getUTF8String(start + j)
      if (j < len - 1) parts(2 * j + 1) = SPACE
      j += 1
    }
    UTF8String.concat(parts: _*)
  }
}
