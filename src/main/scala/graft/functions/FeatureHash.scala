package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernel behind [[FeatureHash]] — also the single definition the
  * sparse path ([[graft.ops.TextOps.featureHashSparse]]) must agree with:
  * bucket(token) = floorMod(xxhash64(token, seed=42), dims), identical to
  * SQL `pmod(xxhash64(t), dims)`. */
object FeatureHash {
  def buckets(tokens: ArrayData, dims: Int): Array[Long] = {
    val counts = new Array[Long](dims)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val b = java.lang.Math.floorMod(XXH64.hashUTF8String(t, 42L),
          dims.toLong).toInt
        counts(b) += 1L
      }
      i += 1
    }
    counts
  }

  def hash(tokens: ArrayData, dims: Int): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(buckets(tokens, dims))
}

/** `feature_hash(tokens, dims)`: the hashing-trick featurizer — each
  * token bag becomes a fixed `dims`-long count vector by
  * bucket = xxhash64(token) mod dims. Vocabulary-free (no dictionary to
  * build, broadcast, or go stale when the corpus shifts), fixed-width
  * (joins straight into the classifier gate / cosine kernels), and
  * mass-preserving by construction: Σ vector = token count (graded in
  * fh1x against the DuckDB-computed token count).
  *
  * One O(tokens + dims) histogram pass per row in generated Java —
  * scan-local, zero shuffle, no per-dimension re-walk of the token
  * array (a HOF formulation would cost O(dims·tokens) interpreted
  * lambda evals). */
case class FeatureHash(child: Expression, dims: Int) extends UnaryExpression {
  require(dims >= 2 && dims <= 65536,
    s"feature_hash: dims must be in [2, 65536], got $dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_hash needs array<string> tokens, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "feature_hash"

  override def nullSafeEval(input: Any): Any =
    FeatureHash.hash(input.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FeatureHash.hash($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHash =
    copy(child = newChild)
}
