package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the elementwise mean of embedding vectors
  * (per-group centroid) — the `Dataset` typed-API counterpart of the
  * posexplode+groupBy formulation in the v1_label_centroid query (SURVEY
  * §7.4: "MinHash/similarity agg as Aggregator[IN,BUF,OUT]").
  *
  * Buffer = (running sums, count): associative + commutative, so Spark
  * merges partial buffers map-side before the shuffle — one (dims+1)-wide
  * buffer per group per partition crosses the wire, never the vectors. */
class VectorMeanAggregator(dims: Int)
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]]
    with Serializable {

  override def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)

  override def reduce(b: (Array[Double], Long),
      v: Array[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    val m = math.min(dims, v.length)
    while (i < m) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long),
      b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dims) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) r._1 else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
