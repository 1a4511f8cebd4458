package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions

/** The pre-join planning + eval kit added in round 8's last session:
  * kmv_intersect (join-cardinality probe), SkewJoin.profileKeys,
  * Profile.madOutliers, TextOps.featureHash / featureHashSparse,
  * TextOps.retrievalEval. */
class PlanningOpsSpec extends SparkSpec {
  import spark.implicits._

  private def fn = { GraftFunctions.register(spark); spark }

  test("kmv_intersect is exact below k and within 10% above") {
    fn
    // below k: A = 0..99, B = 50..149 → union 150 < k → exact 50
    val a = (0L until 100L).toDF("v").agg(expr("kmv_sketch(v, 4096)").as("s"))
    val b = (50L until 150L).toDF("v").agg(expr("kmv_sketch(v, 4096)").as("s"))
    val exactSmall = a.crossJoin(b.withColumnRenamed("s", "t"))
      .select(expr("kmv_intersect(s, t)")).head().getLong(0)
    assert(exactSmall == 50L)
    // above k: A = 0..49999, B = 25000..74999 → true intersection 25000
    val bigA = (0L until 50000L).toDF("v")
      .agg(expr("kmv_sketch(v, 4096)").as("s"))
    val bigB = (25000L until 75000L).toDF("v")
      .agg(expr("kmv_sketch(v, 4096)").as("t"))
    val est = bigA.crossJoin(bigB)
      .select(expr("kmv_intersect(s, t)")).head().getLong(0)
    assert(math.abs(est - 25000L) <= 2500L, s"est=$est")
  }

  test("kmv_intersect rejects mixed sketch sizes") {
    fn
    val a = (0L until 10L).toDF("v").agg(expr("kmv_sketch(v, 64)").as("s"))
    val b = (0L until 10L).toDF("v").agg(expr("kmv_sketch(v, 128)").as("t"))
    val ex = intercept[Exception] {
      a.crossJoin(b).select(expr("kmv_intersect(s, t)")).collect()
    }
    assert(ex.getMessage.contains("mixed sketch sizes") ||
      ex.getCause != null)
  }

  test("feature_hash dense and sparse paths agree, and preserve mass") {
    fn
    val docs = Seq((1L, "a b a c"), (2L, ""), (3L, "x x x x x"))
      .toDF("doc_id", "text")
    val dense = TextOps.featureHash(docs, "doc_id", "text", 16)
    // mass: sum(features) == n_tokens
    assert(dense.filter(
      expr("aggregate(features, 0L, (s, v) -> s + v) != n_tokens"))
      .isEmpty)
    // dense vector length is always dims
    assert(dense.filter(expr("size(features) != 16")).isEmpty)
    // sparse twin: same (bucket, cnt) pairs as the dense non-zeros
    val sparse = TextOps.featureHashSparse(docs, "doc_id", "text", 16)
    val denseNz = dense.select(col("doc_id"),
        posexplode(col("features")).as(Seq("bucket", "cnt")))
      .filter(col("cnt") > 0)
      .select(col("doc_id"), col("bucket").cast("long"), col("cnt"))
    assert(denseNz.exceptAll(sparse).isEmpty &&
      sparse.exceptAll(denseNz).isEmpty)
  }

  test("profileKeys reports exact shares and clamped salt factors") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      Seq.fill(10)("cold")).toDF("k")
    val prof = SkewJoin.profileKeys(df, "k", 2, 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4)))
    // hot: 60/100 → 600000 ppm, salt = ceil(60*8/100) = 5
    // warm: 30/100 → 300000 ppm, salt = ceil(30*8/100) = 3
    assert(prof.toSeq == Seq(("hot", 60L, 600000L, 5L),
      ("warm", 30L, 300000L, 3L)))
    // a uniform key never recommends more than 1
    val uni = (0 until 64).map(i => s"k$i").toDF("k")
    assert(SkewJoin.profileKeys(uni, "k", 64, 8)
      .filter(col("recommended_salt") =!= 1L).isEmpty)
  }

  test("madOutliers flags exactly the >3-MAD points, in integer space") {
    // group g: values 1..9 plus a wild 100 → median 5.5 (of the 10),
    // med2 = 11; deviations d = |2v-11| sorted = {1,1,3,3,5,5,7,7,9,189},
    // median(d) = 5 → mad2 = 10; outlier iff 2d > 30 → d > 15 → only 189.
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _))
      .toDF("grp", "value")
    val row = Profile.madOutliers(df, "grp", "value", unit = 1, kSigma = 3)
      .head()
    assert(row.getLong(1) == 10L) // n
    assert(row.getLong(2) == 11L) // med2
    assert(row.getLong(3) == 10L) // mad2
    assert(row.getLong(4) == 1L) // n_outliers
    assert(row.getLong(5) == 100000L) // 1/10 → 100000 ppm
  }

  test("retrievalEval computes MRR/P@k/R@k in exact ppm") {
    val ranked = Seq(
      (0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L),
      (1L, 1L, 20L), (1L, 2L, 21L), (1L, 3L, 22L),
      (2L, 1L, 30L)).toDF("query_id", "rank", "doc_id")
    val rel = Seq((0L, 11L), (0L, 12L), (0L, 99L), (1L, 23L), (2L, 30L))
      .toDF("query_id", "doc_id")
    val out = TextOps.retrievalEval(ranked, rel, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      // q0: rel {11,12,99}, hits {11@2, 12@3} → mrr 1/2, p 2/3, r 2/3
      (0L, 3L, 2L, 2L, 500000L, 666667L, 666667L),
      // q1: rel {23}, no hits → zeros
      (1L, 1L, 0L, 0L, 0L, 0L, 0L),
      // q2: rel {30}, hit @1 → mrr 1, p 1/3, r 1
      (2L, 1L, 1L, 1L, 1000000L, 333333L, 1000000L)))
  }
}
