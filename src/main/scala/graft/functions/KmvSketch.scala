package graft.functions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV internals shared by [[KmvDistinct]] (direct estimate), the
  * sketch-producing aggregate [[KmvSketch]], the sketch-merging
  * aggregate [[KmvMerge]], and the probe expression [[KmvValue]].
  *
  * Persisted-sketch layout (array<bigint>): [k, h₁..hₘ ascending],
  * m ≤ k — self-describing, so sketches written to parquet stay
  * mergeable and probeable across jobs. A standalone object compiles
  * with static forwarders for the codegen'd probe. */
object Kmv {
  /** Sign-flipped XXH64 so natural Long ordering = unsigned hash order. */
  def hashOf(v: Any): Long = (v match {
    case l: Long => XXH64.hashLong(l, 42L)
    case i: Int => XXH64.hashInt(i, 42L)
    case s: UTF8String => XXH64.hashUTF8String(s, 42L)
    case d: Double => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), 42L)
    case f: Float => XXH64.hashInt(java.lang.Float.floatToIntBits(f), 42L)
    case b: Boolean => XXH64.hashInt(if (b) 1 else 0, 42L)
    case other => XXH64.hashUTF8String(UTF8String.fromString(other.toString), 42L)
  }) ^ Long.MinValue

  def insert(buf: JTreeSet[java.lang.Long], k: Int, h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) buf.pollLast()
      ()
    }
  }

  /** The KMV estimator over the k smallest distinct hashes: exact below
    * k; else (k-1)/u_k with u_k the k-th smallest normalized to (0,1). */
  def estimate(size: Int, k: Int, kth: Long): Long =
    if (size < k) size.toLong
    else {
      val u = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1) / u)
    }

  /** Distinct-count estimate from a persisted sketch array. */
  def value(sk: ArrayData): Long = {
    val m = sk.numElements() - 1
    estimate(m, sk.getLong(0).toInt, if (m > 0) sk.getLong(m) else 0L)
  }

  def toArray(buf: JTreeSet[java.lang.Long], k: Int): GenericArrayData = {
    val out = new Array[Long](1 + buf.size)
    out(0) = k.toLong
    var i = 1
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct-INTERSECTION estimate from two persisted sketches with the
    * same k — the join-cardinality probe a planner wants before choosing
    * a strategy (broadcast vs shuffle, salt factor) without scanning
    * either side: |A∩B| ≈ Ĵ·|A∪B|, where the union sketch U is the k
    * smallest hashes of A∪B (a two-pointer merge of the two ascending
    * arrays — bit-identical to kmv_merge of the same sketches) and Ĵ is
    * the fraction of U present in BOTH inputs (the standard KMV Jaccard
    * estimator). Exact whenever the union fits below k (both counts are
    * then the true hash-set sizes). */
  def intersectEstimate(a: ArrayData, b: ArrayData): Long = {
    val ka = a.getLong(0).toInt
    val kb = b.getLong(0).toInt
    require(ka == kb, s"kmv_intersect: mixed sketch sizes (k=$ka vs $kb)")
    val k = ka
    val ma = a.numElements() - 1
    val mb = b.numElements() - 1
    var i = 1
    var j = 1
    var taken = 0
    var both = 0
    var kth = 0L
    while (taken < k && (i <= ma || j <= mb)) {
      if (i <= ma && j <= mb && a.getLong(i) == b.getLong(j)) {
        kth = a.getLong(i); both += 1; i += 1; j += 1
      } else if (j > mb || (i <= ma && a.getLong(i) < b.getLong(j))) {
        kth = a.getLong(i); i += 1
      } else {
        kth = b.getLong(j); j += 1
      }
      taken += 1
    }
    if (taken == 0 || both == 0) 0L
    else math.round(both.toDouble * estimate(taken, k, kth) / taken)
  }

  def serialize(buf: JTreeSet[java.lang.Long], k: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + 8 * buf.size)
    b.putInt(k)
    b.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) b.putLong(it.next())
    b.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, JTreeSet[java.lang.Long]) = {
    val b = ByteBuffer.wrap(bytes)
    val k = b.getInt()
    val n = b.getInt()
    val out = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(b.getLong()); i += 1 }
    (k, out)
  }
}

/** `kmv_sketch(col, k)`: the KMV distinct sketch as a PERSISTABLE VALUE
  * instead of a final estimate — the re-aggregation pattern (per-shard /
  * per-day sketch columns written once, merged later with [[KmvMerge]]
  * and read with [[KmvValue]]), so incremental corpus profiles never
  * re-scan history: yesterday's sketches + today's shard = today's
  * totals. Same buffer, hashing, and estimator as [[KmvDistinct]] —
  * merge-then-value is bit-identical to sketching the union directly
  * (both keep the k smallest distinct hashes of the union). */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {
  require(k >= 4 && k <= 65536, "kmv_sketch: k must be in [4, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

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

  override def eval(buf: JTreeSet[java.lang.Long]): Any = Kmv.toArray(buf, k)

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] =
    Kmv.serialize(buf, k)
  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] =
    Kmv.deserialize(bytes)._2

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

/** [[KmvMerge]]'s buffer: k is discovered from the first sketch seen
  * (0 = none yet) and must agree across inputs. */
final class KmvMergeBuffer {
  var k: Int = 0
  val set: JTreeSet[java.lang.Long] = new JTreeSet[java.lang.Long]()
}

/** `kmv_merge(sketch)`: union of persisted [[KmvSketch]] arrays, itself
  * a sketch array — associative and commutative (keep the k smallest
  * distinct hashes of the union), so daily/shard sketches roll up in
  * any grouping or order. */
case class KmvMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvMergeBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge needs an array<bigint> sketch column, got ${other.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_merge"

  override def createAggregationBuffer(): KmvMergeBuffer = new KmvMergeBuffer

  private def absorb(buf: KmvMergeBuffer, sk: ArrayData): Unit = {
    val k = sk.getLong(0).toInt
    require(k >= 4 && k <= 65536, s"kmv_merge: corrupt sketch (k=$k)")
    require(buf.k == 0 || buf.k == k,
      s"kmv_merge: mixed sketch sizes (k=${buf.k} vs $k)")
    buf.k = k
    var i = 1
    val n = sk.numElements()
    while (i < n) { Kmv.insert(buf.set, k, sk.getLong(i)); i += 1 }
  }

  override def update(buf: KmvMergeBuffer, input: InternalRow): KmvMergeBuffer = {
    val v = child.eval(input)
    if (v != null) absorb(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: KmvMergeBuffer, other: KmvMergeBuffer): KmvMergeBuffer = {
    if (other.k != 0) {
      require(buf.k == 0 || buf.k == other.k,
        s"kmv_merge: mixed sketch sizes (k=${buf.k} vs ${other.k})")
      buf.k = other.k
      val it = other.set.iterator()
      while (it.hasNext) Kmv.insert(buf.set, buf.k, it.next())
    }
    buf
  }

  override def eval(buf: KmvMergeBuffer): Any =
    Kmv.toArray(buf.set, if (buf.k == 0) 4 else buf.k)

  override def serialize(buf: KmvMergeBuffer): Array[Byte] =
    Kmv.serialize(buf.set, buf.k)
  override def deserialize(bytes: Array[Byte]): KmvMergeBuffer = {
    val (k, set) = Kmv.deserialize(bytes)
    val out = new KmvMergeBuffer
    out.k = k
    val it = set.iterator()
    while (it.hasNext) { out.set.add(it.next()); () }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMerge =
    copy(child = newChildren.head)
}

/** `kmv_value(sketch)` — distinct-count estimate from a persisted or
  * merged sketch array; bit-identical to what `kmv_distinct` would have
  * returned over the same rows. Codegen'd static call. */
case class KmvValue(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_value needs an array<bigint> sketch column, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_value"

  override def nullSafeEval(sk: Any): Any =
    Kmv.value(sk.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kmv.value($c)")

  override protected def withNewChildInternal(newChild: Expression): KmvValue =
    copy(newChild)
}

/** `kmv_intersect(sketchA, sketchB)` — distinct-intersection estimate
  * from two persisted sketches (same k): the pre-join cardinality probe.
  * Build one sketch per side's join key (a 1-row aggregate each, or read
  * back columns persisted by earlier jobs), and this scalar answers "how
  * many keys actually meet" without scanning either fact table — the
  * input a planner needs for broadcast/salt decisions at 100 TB, where a
  * mis-sized shuffle join is the dominant failure mode. Codegen'd static
  * call; estimator details on [[Kmv.intersectEstimate]]. */
case class KmvIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_intersect needs two array<bigint> sketches, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kmv.intersectEstimate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Kmv.intersectEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}
