package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.{HashMap => JHashMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `mg_topk(col, k)`: Misra–Gries heavy-hitters summary as a native
  * `TypedImperativeAggregate` — at most k (item, weight) counters per
  * partial buffer, merged by count-addition + rank-(k+1) subtraction
  * (the mergeable-summaries construction), so partial aggregation ships
  * O(k) state per group regardless of input cardinality.
  *
  * Guarantee (survives arbitrary merge trees): every item with true
  * frequency > n/(k+1) of n non-null rows is present in the output, and
  * each reported weight is a lower bound within n/(k+1) of the true
  * count. Output: array<struct<item string, weight long>> sorted by
  * (weight desc, item) — the heavy-hitter detection a corpus pipeline
  * runs on domains/URLs/tokens before dedup or rebalancing. */
case class MgTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JHashMap[String, Long]] {
  require(k >= 2 && k <= 65536, "mg_topk: k must be in [2, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("weight", LongType, nullable = false))))
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): JHashMap[String, Long] =
    new JHashMap[String, Long]()

  private def offer(buf: JHashMap[String, Long], item: String, w: Long): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + w)
    else if (buf.size < k) buf.put(item, w)
    else {
      // decrement-all by the offered weight (capped at the smallest
      // counter would break the invariant; classic MG decrements by 1
      // per element — weights here are 1 from update, so this is exact)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - w
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }

  override def update(buf: JHashMap[String, Long],
      input: InternalRow): JHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: JHashMap[String, Long],
      other: JHashMap[String, Long]): JHashMap[String, Long] = {
    other.forEach { (item, w) =>
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + w)
      else buf.put(item, w)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest weight from all, drop non-positive
      val weights = buf.values().asScala.toArray.sortBy(-_)
      val cut = weights(k)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - cut
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
    buf
  }

  override def eval(buf: JHashMap[String, Long]): Any = {
    val rows = buf.asScala.toSeq.sortBy { case (item, w) => (-w, item) }
      .map { case (item, w) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(item), w))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: JHashMap[String, Long]): Array[Byte] = {
    val entries = buf.asScala.toSeq
      .map { case (s, w) => (s.getBytes(UTF_8), w) }
    val b = ByteBuffer.allocate(4 + entries.map(12 + _._1.length).sum)
    b.putInt(entries.size)
    entries.foreach { case (bytes, w) =>
      b.putInt(bytes.length); b.put(bytes); b.putLong(w)
    }
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): JHashMap[String, Long] = {
    val b = ByteBuffer.wrap(bytes)
    val n = b.getInt()
    val out = new JHashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = b.getInt()
      val sb = new Array[Byte](len)
      b.get(sb)
      out.put(new String(sb, UTF_8), b.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): MgTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgTopK =
    copy(child = newChildren.head)
}
