package graft.functions

import java.nio.ByteBuffer
import java.util.{PriorityQueue => JPriorityQueue, Comparator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_pairs(id, score, k)`: bounded mergeable per-group top-k as a
  * native `TypedImperativeAggregate` — keeps at most k (id, score)
  * entries per partial buffer, ordered best-first by
  * (score desc, id asc), merged by offering one heap into the other.
  *
  * This is the scale-safe replacement for the
  * `row_number().over(Window.partitionBy(group).orderBy(score))` +
  * `filter(rn <= k)` selection idiom: the window formulation shuffles
  * EVERY scored row into |groups| partitions before discarding all but
  * k — with a handful of query groups over a corpus-sized scored set
  * (the ANN ADC scan shape) that funnels the whole corpus's scores
  * through a few tasks. As an aggregate, each map task keeps an O(k)
  * heap per group and only k-sized partial states cross the exchange;
  * selection work stays distributed no matter how few groups there are.
  *
  * Output: array<struct<nn long, score double>> sorted by
  * (score desc, nn asc) — `posexplode` restores (rank, id) downstream.
  * Ties and ordering match the window formulation bit-for-bit, so
  * results are identical, not just equivalent. */
case class TopKPairs(
    idChild: Expression,
    scoreChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JPriorityQueue[TopKPairs.Entry]] {
  require(k >= 1 && k <= (1 << 20), "topk_pairs: k must be in [1, 1048576]")

  override def children: Seq[Expression] = Seq(idChild, scoreChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nn", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))))
  override def prettyName: String = "topk_pairs"

  // Worst-first ordering (min-heap of a max-k selection): an entry is
  // worse when its score is lower, or equal-scored with a larger id.
  override def createAggregationBuffer(): JPriorityQueue[TopKPairs.Entry] =
    new JPriorityQueue[TopKPairs.Entry](k, TopKPairs.WorstFirst)

  private def offer(buf: JPriorityQueue[TopKPairs.Entry],
      id: Long, score: Double): Unit = {
    if (buf.size < k) buf.add(new TopKPairs.Entry(id, score))
    else {
      val worst = buf.peek()
      val better = java.lang.Double.compare(score, worst.score) match {
        case c if c > 0 => true
        case 0 => id < worst.id
        case _ => false
      }
      if (better) {
        buf.poll()
        buf.add(new TopKPairs.Entry(id, score))
      }
    }
  }

  override def update(buf: JPriorityQueue[TopKPairs.Entry],
      input: InternalRow): JPriorityQueue[TopKPairs.Entry] = {
    val idv = idChild.eval(input)
    val sv = scoreChild.eval(input)
    if (idv != null && sv != null)
      offer(buf, idv.asInstanceOf[Long], sv.asInstanceOf[Double])
    buf
  }

  override def merge(buf: JPriorityQueue[TopKPairs.Entry],
      other: JPriorityQueue[TopKPairs.Entry]): JPriorityQueue[TopKPairs.Entry] = {
    val it = other.iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.id, e.score)
    }
    buf
  }

  override def eval(buf: JPriorityQueue[TopKPairs.Entry]): Any = {
    val arr = new Array[TopKPairs.Entry](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, TopKPairs.BestFirst)
    new GenericArrayData(arr.map(e =>
      new GenericInternalRow(Array[Any](e.id, e.score))): Array[Any])
  }

  override def serialize(buf: JPriorityQueue[TopKPairs.Entry]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + buf.size * 16)
    b.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      b.putLong(e.id); b.putDouble(e.score)
    }
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): JPriorityQueue[TopKPairs.Entry] = {
    val b = ByteBuffer.wrap(bytes)
    val n = b.getInt()
    val out = createAggregationBuffer()
    var i = 0
    while (i < n) {
      out.add(new TopKPairs.Entry(b.getLong(), b.getDouble()))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(idChild = newChildren(0), scoreChild = newChildren(1))
}

object TopKPairs {
  final class Entry(val id: Long, val score: Double)

  /** (score desc, id asc) — the selection order. */
  val BestFirst: Comparator[Entry] = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  /** Heap order: the entry the next better offer should evict sits at
    * the head. */
  val WorstFirst: Comparator[Entry] = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = BestFirst.compare(b, a)
  }
}
