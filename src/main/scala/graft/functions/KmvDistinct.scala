package graft.functions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `kmv_distinct(col, k)`: K-Minimum-Values distinct-count sketch as a
  * native `TypedImperativeAggregate` (SURVEY §7.4's "novel sketch"
  * slot; see also the built-in HLL in hll1_approx_distinct).
  *
  * The buffer keeps the k smallest XXH64 hashes seen (sign-bit-flipped
  * so signed ordering equals unsigned hash ordering). With fewer than k
  * distinct hashes the count is EXACT; otherwise the estimator is
  * (k-1)/u_k where u_k is the k-th smallest hash normalized to (0,1) —
  * standard error ≈ 1/√(k-2).
  *
  * Why TypedImperativeAggregate: the buffer is a bounded mutable set
  * (k longs), merged associatively — partial aggregation ships k longs
  * per group per partition regardless of input cardinality, the same
  * wire shape HLL uses. */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {
  require(k >= 4 && k <= 65536, "kmv_distinct: k must be in [4, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  // hashing/insert/estimator shared with the persistable-sketch trio
  // (kmv_sketch / kmv_merge / kmv_value) in [[Kmv]], so the direct and
  // re-aggregated paths can never drift apart.
  override def update(buf: JTreeSet[java.lang.Long],
      input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) Kmv.insert(buf, k, Kmv.hashOf(v))
    buf
  }

  override def merge(buf: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) Kmv.insert(buf, k, it.next())
    buf
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any =
    Kmv.estimate(buf.size, k, if (buf.isEmpty) 0L else buf.last())

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + 8 * buf.size)
    b.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) b.putLong(it.next())
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val b = ByteBuffer.wrap(bytes)
    val n = b.getInt()
    val out = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(b.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}
