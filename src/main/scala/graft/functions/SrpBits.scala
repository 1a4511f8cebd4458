package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-random-projection LSH bucket of a numeric vector: `bits`
  * hyperplanes whose ±1 components are derived from `XXH64(dim, XXH64(
  * plane, seed))`, packed into a long. Vectors on the same side of every
  * plane share a bucket; `seed` decorrelates hash tables (multi-table
  * LSH trades candidate volume for recall).
  *
  * Native codegen expression (not `aggregate(...)` higher-order SQL): the
  * similarity operators compute this once per corpus row, and the
  * interpreted higher-order form was the dominant cost of the LSH ANN
  * path (two nested lambda evaluations per plane×dim). The hash is
  * evaluated inline per (plane, dim) — no per-row allocation.
  */
case class SrpBits(vec: Expression, bits: Expression, seed: Expression)
    extends TernaryExpression {
  override def first: Expression = vec
  override def second: Expression = bits
  override def third: Expression = seed
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bits"

  private def isFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, b: Any, s: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val nBits = b.asInstanceOf[Int]
    val sd = s.asInstanceOf[Int].toLong
    val n = a.numElements()
    val f = isFloat
    var out = 0L
    var p = 0
    while (p < nBits) {
      val planeSeed = XXH64.hashLong(p.toLong, sd)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val x = if (f) a.getFloat(d).toDouble else a.getDouble(d)
        val sign = if ((XXH64.hashLong(d.toLong, planeSeed) & 1L) == 0L) 1.0 else -1.0
        acc += x * sign
        d += 1
      }
      if (acc > 0.0) out |= (1L << p)
      p += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, s) => {
      val xxh = classOf[XXH64].getName
      val get = if (isFloat) "getFloat" else "getDouble"
      val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val ps = ctx.freshName("planeSeed"); val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |long $out = 0L;
         |for (int $p = 0; $p < $b; $p++) {
         |  long $ps = $xxh.hashLong((long) $p, (long) $s);
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += (double) $v.$get($d) *
         |      ((($xxh.hashLong((long) $d, $ps)) & 1L) == 0L ? 1.0 : -1.0);
         |  }
         |  if ($acc > 0.0) $out |= (1L << $p);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SrpBits = copy(f, s, t)
}
