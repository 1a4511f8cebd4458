package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernel behind [[RangeBucket]]: greatest i with bounds(i) <= v,
  * -1 when v is outside [bounds(0), bounds(n-1)). Plain binary search —
  * O(log n) per row against an n that is a broadcast-sized dimension, vs
  * the O(n) per-row scan a BroadcastNestedLoopJoin pays for the same
  * lookup. Non-strictly-ascending bounds are fine: equal consecutive
  * boundaries describe an empty bucket, and the "v >= mid moves lo" rule
  * lands on the LAST index with bounds(i) <= v, skipping empties. */
object RangeBucket {
  def lookup(v: Long, bounds: ArrayData): Int = {
    val n = bounds.numElements()
    if (n < 2 || v < bounds.getLong(0) || v >= bounds.getLong(n - 1)) return -1
    var lo = 0
    var hi = n - 1 // invariant: bounds(lo) <= v < bounds(hi)
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (v >= bounds.getLong(mid)) lo = mid else hi = mid
    }
    lo
  }
}

/** `range_bucket(v, bounds)` — index of the half-open bucket
  * [bounds(i), bounds(i+1)) containing v, NULL when v falls before the
  * first or at/after the last boundary. `bounds` must be ascending
  * array<bigint> (validated by the caller that builds it — typically a
  * literal collected from a dimension table, riding the closure into
  * every task like a broadcast variable).
  *
  * This is the probe side of a shuffle-free interval join
  * ([[graft.ops.BroadcastLookup]]): where Spark's own planner turns
  * `fact JOIN dim ON v BETWEEN lo AND hi` into a
  * BroadcastNestedLoopJoin (O(|dim|) comparisons per fact row), this
  * expression does the same lookup in O(log |dim|) inside whole-stage
  * codegen, and the residual equi-join on the found ordinal broadcasts.
  * At 100 TB with a 100k-range dimension that is ~17 comparisons per
  * row instead of 100 000. */
case class RangeBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"range_bucket needs (bigint, array<bigint>), got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "range_bucket"

  override def nullSafeEval(v: Any, bounds: Any): Any = {
    val i = RangeBucket.lookup(v.asInstanceOf[Long],
      bounds.asInstanceOf[ArrayData])
    if (i < 0) null else i
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.freshName("rbIdx")
    nullSafeCodeGen(ctx, ev, (v, b) => s"""
      |int $idx = graft.functions.RangeBucket.lookup($v, $b);
      |if ($idx < 0) { ${ev.isNull} = true; }
      |else { ${ev.value} = $idx; }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RangeBucket = copy(left = newLeft, right = newRight)
}
