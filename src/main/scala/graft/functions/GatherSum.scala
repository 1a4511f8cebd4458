package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `gather_sum(idx, vals)` = Σᵢ vals[idx[i]] — the asymmetric-distance
  * (ADC) kernel of product-quantized search: `idx` is a vector's PQ code
  * array (global code ids, [[PqEncode]]), `vals` the query's flattened
  * per-code lookup table, and the sum reconstructs the approximate inner
  * product. Strict ascending-index fold in double precision, so results
  * are bit-identical to a sequential-loop oracle.
  *
  * Native codegen expression for the same reason as [[VecDot]]: this
  * evaluates once per (query, corpus-vector) pair in the ADC scan — the
  * hot loop of PQ search — and the HOF formulation
  * (`aggregate(transform(...))`) is CodegenFallback, interpreted with a
  * per-row allocation. Out-of-range indices contribute 0 (never occur
  * for codes produced by the paired encoder; the guard keeps the kernel
  * total).
  */
case class GatherSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "gather_sum"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val idx = l.asInstanceOf[ArrayData]
    val vals = r.asInstanceOf[ArrayData]
    val n = idx.numElements()
    val nv = vals.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val j = idx.getInt(i)
      if (j >= 0 && j < nv) acc += vals.getDouble(j)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idx, vals) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val nv = ctx.freshName("nv")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $idx.numElements();
         |int $nv = $vals.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $j = $idx.getInt($i);
         |  if ($j >= 0 && $j < $nv) $acc += $vals.getDouble($j);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GatherSum =
    copy(newLeft, newRight)
}
