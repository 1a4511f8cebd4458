package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `minhash_sig(hashes, k)`: k-permutation MinHash signature from an array
  * of 64-bit shingle hashes. Permutation i is the splitmix64 finalizer of
  * `hash + GOLDEN*(i+1)` — a standalone universal-ish mixer, so only ONE
  * base hash per shingle is needed (vs k string-concat hashes in the
  * built-in formulation), and the k×|shingles| minima loop runs in
  * generated Java.
  *
  * Signature cost per doc drops from k interpreted lambda evals per
  * shingle to |shingles| multiply-xor mixes — the difference between
  * minutes and seconds per 10⁶ docs at 100 TB shingling rates. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @inline private def mix(x: Long): Long = {
    var z = x
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var p = 0
      while (p < k) {
        val v = mix(h + 0x9E3779B97F4A7C15L * (p + 1))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      val mins = ctx.freshName("mins")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $p = 0; $p < $k; $p++) {
         |    long $z = $h + 0x9E3779B97F4A7C15L * ($p + 1);
         |    $z ^= $z >>> 30; $z *= 0xBF58476D1CE4E5B9L;
         |    $z ^= $z >>> 27; $z *= 0x94D049BB133111EBL;
         |    $z ^= $z >>> 31;
         |    if ($z < $mins[$p]) $mins[$p] = $z;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
