package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** Registration of graft's native Catalyst expressions as SQL functions. */
object GraftFunctions {
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> ((es: Seq[Expression]) => VecDot(es(0), es(1))),
    "vec_l2sq" -> ((es: Seq[Expression]) => VecL2Sq(es(0), es(1))),
    "cdc_cuts" -> ((es: Seq[Expression]) => ContentCuts(es(0), es(1))),
    "mask_intersect" -> ((es: Seq[Expression]) => MaskIntersect(es(0), es(1))),
    "simhash64" -> ((es: Seq[Expression]) => SimHash64(es(0))),
    "minhash_sig" -> ((es: Seq[Expression]) => MinHashSig(es(0), litInt(es(1)))),
    "minhash_shingle" -> ((es: Seq[Expression]) =>
      MinHashShingle(es(0), litInt(es(1)), litInt(es(2)))),
    "word_ngrams" -> ((es: Seq[Expression]) => WordNGrams(es(0), litInt(es(1)))),
    "kmv_distinct" -> ((es: Seq[Expression]) => KmvDistinct(es(0), litInt(es(1)))),
    "kmv_sketch" -> ((es: Seq[Expression]) => KmvSketch(es(0), litInt(es(1)))),
    "kmv_merge" -> ((es: Seq[Expression]) => KmvMerge(es(0))),
    "kmv_value" -> ((es: Seq[Expression]) => KmvValue(es(0))),
    "kmv_intersect" -> ((es: Seq[Expression]) => KmvIntersect(es(0), es(1))),
    "feature_hash" -> ((es: Seq[Expression]) => FeatureHash(es(0), litInt(es(1)))),
    "range_bucket" -> ((es: Seq[Expression]) => RangeBucket(es(0), es(1))),
    "srp_bits" -> ((es: Seq[Expression]) => SrpBits(es(0), es(1), es(2))),
    "sorted_intersect_count" -> ((es: Seq[Expression]) =>
      SortedIntersectCount(es(0), es(1))),
    "deflate_size" -> ((es: Seq[Expression]) => DeflateSize(es(0))),
    "nfc_normalize" -> ((es: Seq[Expression]) => NfcNormalize(es(0))),
    "nfkc_normalize" -> ((es: Seq[Expression]) => NfkcNormalize(es(0))),
    "mg_topk" -> ((es: Seq[Expression]) => MgTopK(es(0), litInt(es(1)))),
    "cms_sketch" -> ((es: Seq[Expression]) =>
      CmsSketch(es(0), litInt(es(1)), litInt(es(2)))),
    "cms_estimate" -> ((es: Seq[Expression]) => CmsEstimate(es(0), es(1))),
    // id/score children are coerced (int id → bigint, float score →
    // double) or rejected HERE, at analysis: update() casts straight to
    // Long/Double, so an uncoerced int id would fail row-at-a-time at
    // runtime with a bare ClassCastException.
    "topk_pairs" -> ((es: Seq[Expression]) =>
      TopKPairs(asLong(es(0), "topk_pairs id"),
        asDouble(es(1), "topk_pairs score"), litInt(es(2)))),
    "centroid_assign" -> ((es: Seq[Expression]) => CentroidAssign.fromArgs(es)),
    "pq_encode" -> ((es: Seq[Expression]) => PqEncode.fromArgs(es)),
    "kll_quantiles" -> ((es: Seq[Expression]) => KllQuantiles.fromArgs(es)),
    "gather_sum" -> ((es: Seq[Expression]) => GatherSum(es(0), es(1))),
    "bpe_encode" -> ((es: Seq[Expression]) => BpeEncode.fromArgs(es)),
    "unigram_encode" -> ((es: Seq[Expression]) => UnigramEncode.fromArgs(es)),
    // Spark's own runtime-filter expressions, surfaced as SQL functions
    // (upstream keeps them internal to the InjectRuntimeFilter rule):
    // bloom_filter_agg(xxhash64(x), est_items, num_bits) builds the filter,
    // might_contain(<scalar subquery>, xxhash64(x)) probes it.
    "bloom_filter_agg" -> ((es: Seq[Expression]) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), es(1), es(2))),
    "might_contain" -> ((es: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        es(0), es(1)))
  )

  private def litInt(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => other.eval().asInstanceOf[Number].intValue()
  }

  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types._
  private def asLong(e: Expression, what: String): Expression =
    if (!e.resolved) Cast(e, LongType) // type known only post-analysis
    else e.dataType match {
      case LongType => e
      case ByteType | ShortType | IntegerType => Cast(e, LongType)
      case other => throw new IllegalArgumentException(
        s"$what must be an integral column, got ${other.sql}")
    }
  private def asDouble(e: Expression, what: String): Expression =
    if (!e.resolved) Cast(e, DoubleType)
    else e.dataType match {
      case DoubleType => e
      case _: NumericType => Cast(e, DoubleType)
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric column, got ${other.sql}")
    }

  /** Inject every function into a SparkSessionExtensions (cluster path:
    * `--conf spark.sql.extensions=graft.functions.GraftExtensions`). */
  private[functions] def injectAll(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.getClass.getName, name), b))
    }

  /** Per-session registration (temp functions). Idempotent — and
    * genuinely so: re-registering an existing name via
    * createOrReplaceTempFunction logs a "replaced a previously
    * registered function" WARN per function per call, which buries real
    * warnings in any harness that calls register() once per query. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** `spark.sql.extensions`-injectable variant for cluster deployments:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.injectAll(e)
    // plan rewrites ride the same deploy hook as the function library
    e.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    e.injectOptimizerRule(_ => graft.plans.RewriteToMv)
  }
}
