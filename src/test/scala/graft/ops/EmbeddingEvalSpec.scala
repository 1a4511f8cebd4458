package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the embedding evaluation operators
  * (drift between cohorts, LOO k-NN accuracy); the sf-data runs are
  * graded by the DuckDB oracle (ed1, knn1). */
class EmbeddingEvalSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark) // knn uses topk_pairs

  test("embeddingDrift: identical cohorts → cos 1, shift 0") {
    val df = Seq((0L, Seq(0.5f, 0.5f)), (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(0.1f, 0.9f)), (3L, Seq(0.1f, 0.9f)))
      .toDF("id", "v").withColumn("co", expr("id % 2"))
    val r = Similarity.embeddingDrift(df, "v", "co").collect().head
    assert(r.getAs[Long]("n0") == 2L && r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("cos_micro") == 1000000L)
    assert(r.getAs[Long]("mean_shift_micro") == 0L)
  }

  test("embeddingDrift: orthogonal means → cos 0, known shift") {
    // cohort 0 mean = (1, 0); cohort 1 mean = (0, 1):
    // cos = 0; ||m0 - m1|| = sqrt(2) → 1414213 micro
    val df = Seq((0L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("id", "v").withColumn("co", expr("id % 2"))
    val r = Similarity.embeddingDrift(df, "v", "co").collect().head
    assert(r.getAs[Long]("cos_micro") == 0L)
    assert(math.abs(r.getAs[Long]("mean_shift_micro") - 1414214L) <= 1L)
  }

  test("knnLooAccuracy: separable clusters predict perfectly") {
    // two tight clusters, labels 0 and 1; every point's neighbors are
    // its own cluster (excluding itself) → all predictions correct
    val pts = (0 until 6).map(i => (i.toLong, 0,
      Seq(0.1f + 0.001f * i, 0.1f))) ++
      (6 until 12).map(i => (i.toLong, 1, Seq(0.9f, 0.9f + 0.001f * i)))
    val df = pts.toDF("vec_id", "label", "v")
    val got = Similarity.knnLooAccuracy(df, "vec_id", "v", "label",
      queryPred = col("vec_id") < 12, k = 3).collect()
    assert(got.length == 12)
    assert(got.forall(_.getAs[Boolean]("correct")))
  }

  test("knnLooAccuracy: majority tie breaks to the smaller label") {
    // query 0 at origin; k=2 neighbors: one label-5 point and one
    // label-3 point equally voted → tie → pred = 3 (label asc)
    val df = Seq(
      (0L, 9, Seq(0.0f, 0.0f)),
      (1L, 5, Seq(0.1f, 0.0f)),
      (2L, 3, Seq(0.0f, 0.2f)),
      (3L, 7, Seq(5.0f, 5.0f))).toDF("vec_id", "label", "v")
    val got = Similarity.knnLooAccuracy(df, "vec_id", "v", "label",
      queryPred = col("vec_id") === 0, k = 2).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("pred_label") == 3L)
    assert(!got.head.getAs[Boolean]("correct"))
  }
}
