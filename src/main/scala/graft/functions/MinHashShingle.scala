package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_shingle(tokens, n, k)`: k-permutation MinHash signature over
  * the n-gram (word shingle) multiset of a token array, fused into one
  * pass: shingle bytes → XXH64 → splitmix64-mixed per-permutation minima.
  *
  * Fusion notes:
  *  - MinHash of a multiset equals MinHash of its distinct set (min is
  *    idempotent), so no distinct step is needed for the signature;
  *  - shingle strings are never materialized as columns — each shingle is
  *    hashed from the concatenated token bytes ('\\0'-separated) in a
  *    reused buffer;
  *  - replaces three interpreted layers (ngram transform lambda, per-
  *    shingle hash lambda, per-permutation min lambda) with JIT'd Java.
  * On the 100 TB dedup path, signature computation touches every
  * document, so this is scan-rate-critical.
  */
case class MinHashShingle(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= 16 && k > 0 && k <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingle"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    UnsafeArrayData.fromPrimitiveArray(
      MinHashShingle.signature(toks, n, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.MinHashShingle.signature($toks, $n, $k));"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashShingle =
    copy(child = newChild)
}

object MinHashShingle {
  /** Shared by eval and generated code (the loop body itself is plain
    * JIT-friendly Java either way; codegen only avoids boxing/virtual
    * dispatch around it). */
  def signature(toks: ArrayData, n: Int, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val nt = toks.numElements()
    val count = if (nt >= n) nt - n + 1 else 0
    var i = 0
    if (count == 0 && nt > 0) {
      // degenerate short doc: single shingle = all tokens
      updateMins(mins, hashRange(toks, 0, nt), k)
    }
    while (i < count) {
      updateMins(mins, hashRange(toks, i, n), k)
      i += 1
    }
    mins
  }

  private def hashRange(toks: ArrayData, start: Int, len: Int): Long = {
    var total = 0
    var j = 0
    while (j < len) {
      total += toks.getUTF8String(start + j).numBytes() + 1
      j += 1
    }
    val buf = new Array[Byte](total)
    var off = 0
    j = 0
    while (j < len) {
      val s = toks.getUTF8String(start + j)
      s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
      off += s.numBytes()
      buf(off) = 0
      off += 1
      j += 1
    }
    XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      total, 42L)
  }

  private def updateMins(mins: Array[Long], h: Long, k: Int): Unit = {
    var p = 0
    while (p < k) {
      var z = h + 0x9E3779B97F4A7C15L * (p + 1)
      z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
      z ^= z >>> 27; z *= 0x94D049BB133111EBL
      z ^= z >>> 31
      if (z < mins(p)) mins(p) = z
      p += 1
    }
  }
}
