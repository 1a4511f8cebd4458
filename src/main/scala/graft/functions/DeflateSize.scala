package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate helper behind [[DeflateSize]]: compressed byte count at FIXED
  * settings (level 6, raw deflate, default strategy), so the result is a
  * pure function of the input bytes — the determinism the curation
  * invariants rely on. A standalone object compiles with static
  * forwarders, so generated code calls `graft.functions.Deflate.size`
  * directly. */
object Deflate {
  def size(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }
}

/** `deflate_size(text)` — compressed size of a string's UTF-8 bytes: the
  * compression-ratio quality signal of the Gopher/Dolma filter family
  * (highly compressible text is repetitive boilerplate; incompressible
  * text is noise/binary junk). Scan-local and codegen'd; the per-row
  * Deflater is the cost of the signal itself, not a plan inefficiency —
  * at 100 TB the ratio is computed once in the same pass as the other
  * quality signals and persisted alongside them. */
case class DeflateSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(s: Any): Any =
    Deflate.size(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Deflate.size(($c).getBytes())")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateSize = copy(newChild)
}
