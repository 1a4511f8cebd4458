package graft.ops

import graft.SparkSpec

/** Hand-computed fixtures for the PCA operator: the exact covariance
  * pass (pca1's arithmetic), the driver Jacobi eigensolve, and the
  * projection seam. The sf-data run is graded by the DuckDB oracle
  * (pca1/pca1x); these pin the formulas on inputs with known answers. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covarianceSums: hand-computed 2D moments") {
    // vectors (quantized 1e4): (1.0, 2.0) → (10000, 20000);
    // (3.0, 4.0) → (30000, 40000). n=2.
    // sum_0=40000, sum_1=60000, s00=1e9, s01=1.4e9, s11=2e9
    // cov00 = 2·1e9 − 40000² = 4e8; cov01 = 2·1.4e9 − 40000·60000 = 4e8
    // cov11 = 2·2e9 − 60000² = 4e8
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)).toDF("v")
    val got = Pca.covarianceSums(df, "v", scalePow = 4)
      .orderBy("i", "j").collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[Long]("cov_num")).toSeq ==
      Seq(400000000L, 400000000L, 400000000L))
    assert(got.head.getAs[Long]("sum_i") == 40000L)
    assert(got.head.getAs[Long]("n") == 2L)
  }

  test("covarianceSums: floor quantization is the portable truncation") {
    // -0.00005 floors to -1 (toward -inf), not 0
    val df = Seq(Seq(-0.00005f), Seq(0.00005f)).toDF("v")
    val got = Pca.covarianceSums(df, "v", scalePow = 4).collect().head
    assert(got.getAs[Long]("sum_i") == -1L) // -1 + 0
  }

  test("mergeCovarianceSums: split + merge equals the direct pass") {
    val all = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 1.0f),
      Seq(2.0f, 2.0f)).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val direct = Pca.covarianceSums(all, "v").orderBy("i", "j")
      .collect().map(_.toSeq).toSeq
    val merged = Pca.mergeCovarianceSums(
      Pca.covarianceSums(all.filter("id % 2 = 0"), "v"),
      Pca.covarianceSums(all.filter("id % 2 = 1"), "v"))
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    assert(merged == direct)
  }

  test("jacobiEigen: known 2x2 eigensystem") {
    // [[2,1],[1,2]] → λ = 3, 1; v0 = (1,1)/√2, v1 = (1,-1)/√2 (canon +)
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - s) < 1e-12 &&
      math.abs(vecs(0)(1) - s) < 1e-12)
    assert(math.abs(math.abs(vecs(1)(0)) - s) < 1e-12)
    // sign canon: largest-|component| positive
    assert(vecs(1).maxBy(math.abs) > 0)
  }

  test("jacobiEigen: diagonal matrix is a fixed point, sorted desc") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0),
        Array(0.0, 0.0, 3.0)))
    assert(vals.toSeq == Seq(5.0, 3.0, 1.0))
    assert(vecs(0).toSeq == Seq(0.0, 1.0, 0.0))
  }

  test("saveModel/loadModel round-trips the fitted model exactly") {
    val df = Seq(Seq(0.1f, 0.9f), Seq(0.4f, 0.2f), Seq(0.7f, 0.5f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val model = Pca.fit(df, "v")
    val dir = tmpDir("pca-model")
    Pca.saveModel(model, spark, dir)
    val back = Pca.loadModel(spark, dir)
    assert(back.n == model.n && back.dims == model.dims)
    assert(back.eigenvalues.toSeq == model.eigenvalues.toSeq)
    assert(back.components.map(_.toSeq).toSeq ==
      model.components.map(_.toSeq).toSeq)
    assert(back.covariance.map(_.toSeq).toSeq ==
      model.covariance.map(_.toSeq).toSeq)
  }

  test("fit + project: rank-1 data lands on one component") {
    // points t·(3,4)/5 for t = 1..40: variance is all along (0.6, 0.8)
    val pts = (1 to 40).map { t =>
      Seq(0.006f * t * 3, 0.006f * t * 4)
    }
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    graft.functions.GraftFunctions.register(spark) // project uses vec_dot
    val model = Pca.fit(df, "v", scalePow = 4)
    assert(model.dims == 2)
    // second eigenvalue ~0 (quantization noise only)
    assert(model.eigenvalues(1) < 1e-6 * model.eigenvalues(0))
    assert(math.abs(model.components(0)(0) - 0.6) < 1e-3)
    assert(math.abs(model.components(0)(1) - 0.8) < 1e-3)
    val proj = Pca.project(df, "id", "v", model, k = 1).collect()
    assert(proj.length == 40)
    assert(proj.head.getSeq[Long](
      proj.head.fieldIndex("proj_micro")).length == 1)
  }
}
