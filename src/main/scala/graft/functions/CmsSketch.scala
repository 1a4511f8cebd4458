package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min row indexing shared by the aggregate and the probe
  * expression. A standalone object compiles with static forwarders, so
  * generated code calls `graft.functions.Cms.estimate` directly.
  *
  * Sketch layout (array<bigint>): [depth, width, n, counters(depth*width)]
  * — self-describing, so the probe side needs no extra parameters and a
  * sketch persisted to parquet stays probeable. Row d hashes with XXH64
  * seed d+1 (seed 0 stays free for callers that pre-hash with the
  * engine-wide xxhash64 default).
  */
object Cms {
  def index(item: UTF8String, d: Int, width: Int): Int =
    ((XXH64.hashUTF8String(item, d + 1L) % width + width) % width).toInt

  /** min over depth rows of the item's counter — the CMS point estimate:
    * always ≥ the true count (counters only ever add), and ≤ true +
    * 2e·n/width for each row independently with prob ≥ 1 − width/(2e·n)
    * by Markov, so the min over `depth` rows fails that slack only with
    * prob ≤ (e/(2e))^depth. */
  def estimate(sk: ArrayData, item: UTF8String): Long = {
    val depth = sk.getLong(0).toInt
    val width = sk.getLong(1).toInt
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sk.getLong(3 + d * width + index(item, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }
}

/** `cms_sketch(col, depth, width)`: Count-Min frequency sketch as a native
  * `TypedImperativeAggregate` — a depth×width counter matrix each input
  * row increments once per hash row. The sketch is LINEAR (merge =
  * element-wise add), so partial aggregation ships one fixed-size array
  * per group regardless of input cardinality, and sketches of disjoint
  * corpus shards union by addition — the property that lets a 100 TB
  * corpus keep per-shard token-frequency sketches and answer global
  * point queries without re-scanning.
  *
  * Complements the sketch family: HLL/KMV answer "how many distinct",
  * Misra-Gries answers "which items are heavy", CMS answers "how often
  * does THIS item occur" for arbitrary probe items after the scan is
  * gone. Guarantee: estimate ≥ true count always (counters only add);
  * estimate ≤ true + ε·n with ε = e/width per probe w.h.p. (see
  * [[Cms.estimate]]). Probe with `cms_estimate(sketch, item)`.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && depth <= 16, "cms_sketch: depth must be in [1, 16]")
  require(width >= 16 && width <= (1 << 22),
    "cms_sketch: width must be in [16, 4194304]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch needs a string column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](3 + depth * width)
    buf(0) = depth.toLong
    buf(1) = width.toLong
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf(2) += 1
      var d = 0
      while (d < depth) {
        buf(3 + d * width + Cms.index(s, d, width)) += 1
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 2 // [0]/[1] are shape constants, identical by construction
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 * buf.length)
    b.asLongBuffer().put(buf)
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val lb = ByteBuffer.wrap(bytes).asLongBuffer()
    val out = new Array[Long](lb.remaining())
    lb.get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch, item)` — point-frequency probe against a
  * [[CmsSketch]] result (or any parquet-persisted copy of one). Codegen'd
  * static call so a probe column over millions of items stays inside
  * whole-stage codegen. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (array<bigint>, string), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sk: Any, item: Any): Any =
    Cms.estimate(sk.asInstanceOf[ArrayData], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (sk, item) => s"graft.functions.Cms.estimate($sk, $item)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
