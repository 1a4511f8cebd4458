package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymous: suppresses small quasi groups, keeps rows intact") {
    // (city, segment) groups: (a,x)=3 rows, (a,y)=1, (b,x)=2
    val df = Seq(
      ("a", "x", 1L), ("a", "x", 2L), ("a", "x", 3L),
      ("a", "y", 4L), ("b", "x", 5L), ("b", "x", 6L))
      .toDF("city", "segment", "id")
    val k2 = Privacy.kAnonymous(df, Seq("city", "segment"), 2)
      .select("id").as[Long].collect().sorted
    assert(k2.toSeq == Seq(1L, 2L, 3L, 5L, 6L)) // (a,y) suppressed
    val k3 = Privacy.kAnonymous(df, Seq("city", "segment"), 3)
      .select("id").as[Long].collect().sorted
    assert(k3.toSeq == Seq(1L, 2L, 3L)) // only (a,x) reaches 3
    // payload columns survive the semi join untouched
    assert(Privacy.kAnonymous(df, Seq("city", "segment"), 2)
      .columns.toSeq == Seq("city", "segment", "id"))
  }

  test("lDiverse: a large-but-homogeneous group is still suppressed") {
    // (a,x): 3 rows but every sensitive value identical — k=2 passes,
    // l=2 kills it (the homogeneity attack); (b,x): 2 rows, 2 values ok
    val df = Seq(
      ("a", "x", "flu", 1L), ("a", "x", "flu", 2L), ("a", "x", "flu", 3L),
      ("b", "x", "flu", 5L), ("b", "x", "cold", 6L))
      .toDF("city", "segment", "dx", "id")
    val kept = Privacy.lDiverse(df, Seq("city", "segment"), "dx",
        k = 2, l = 2)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(5L, 6L))
    // with l satisfied everywhere, lDiverse degrades to kAnonymous
    val k2 = Privacy.kAnonymous(df, Seq("city", "segment"), 2)
      .select("id").as[Long].collect().sorted
    val l1ish = Privacy.lDiverse(
        df.withColumn("dx2", col("id").cast("string")),
        Seq("city", "segment"), "dx2", k = 2, l = 2)
      .select("id").as[Long].collect().sorted
    assert(l1ish.toSeq == k2.toSeq)
  }

  test("deletionCascade: victims propagate down the FK chain, audited") {
    // users 1,2,3; erase 1. orders: (10,u1),(11,u1),(12,u2).
    // items: (10,a),(10,b),(11,a),(12,a) — removing u1 takes orders
    // 10,11 and their 3 items; order 12 / its item stay.
    val users = Seq(1L, 2L, 3L).toDF("uid")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("oid", "uid")
    val items = Seq((10L, "a"), (10L, "b"), (11L, "a"), (12L, "a"))
      .toDF("oid", "sku")
    val audit = Privacy.deletionCascade(
        "users", users, "uid", Seq(1L).toDF("uid"), "uid",
        Seq(Privacy.CascadeLevel("orders", orders, "uid", "oid"),
          Privacy.CascadeLevel("items", items, "oid", "sku")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(audit("users") == ((3L, 1L, 2L)))
    assert(audit("orders") == ((3L, 2L, 1L)))
    assert(audit("items") == ((4L, 3L, 1L)))
  }

  test("dpNoisyCount: deterministic per seed, seed moves the noise") {
    val df = Seq.tabulate(300)(i => (s"g${i % 7}", i)).toDF("g", "v")
    def run(seed: Long): Map[String, (Long, Long)] =
      Privacy.dpNoisyCount(df, Seq("g"), epsilon = 0.5, seed = seed)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    val a = run(1L)
    assert(a == run(1L)) // reproducible release
    assert(a.values.forall { case (t, _) => t > 0 })
    // bound: |noisy - true| <= 15/eps = 30 for every group (P ~ e^-15)
    assert(a.values.forall { case (t, n) => math.abs(n - t) <= 30 })
    // a different seed draws different noise somewhere
    val b = run(2L)
    assert(a != b)
  }
  test("driftTvd: hand-computed TVD, identical halves give zero") {
    val a = (Seq.fill(60)("x") ++ Seq.fill(40)("y")).toDF("k")
    val b = (Seq.fill(30)("x") ++ Seq.fill(50)("y") ++ Seq.fill(20)("z"))
      .toDF("k")
    val r = Profile.driftTvd(a, b, "k").head()
    // p = (.6, .4, 0), q = (.3, .5, .2) -> TVD = .5*(.3+.1+.2) = .3
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((100L, 100L, 300000L)))
    // self-drift is exactly zero; bounds hold
    assert(Profile.driftTvd(a, a, "k").head().getLong(2) == 0L)
    // disjoint supports -> exactly 1.0
    val c = Seq.fill(10)("only").toDF("k")
    assert(Profile.driftTvd(a, c, "k").head().getLong(2) == 1000000L)
  }

  test("tCloseness: exact ordered-EMD ppm, hand-computed") {
    // corpus: values {0,1,2}, N=6, global counts c=(3,2,1)
    // group a (0,0,1,2): prefix d = (2·6−3·4, +1·6−2·4, +1·6−1·4)
    //   = (0, −2, 0) → Σ|d| = 2 → emd = 2e6/((3−1)·4·6) = 41666
    // group c (0,1): d = (0, +2, 0) → 2e6/((3−1)·2·6) = 83333
    val df = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("a", 2L),
      ("c", 0L), ("c", 1L)).toDF("g", "v")
    val audit = Privacy.tCloseness(df, Seq("g"), "v", tPpm = 50000L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("emd_ppm"),
          r.getAs[Long]("published")))).toMap
    assert(audit == Map("a" -> ((4L, 41666L, 1L)),
      "c" -> ((2L, 83333L, 0L))))
    // a single observed sensitive value has no distribution to compare
    val e = intercept[IllegalArgumentException](
      Privacy.tCloseness(Seq(("a", 1L), ("b", 1L)).toDF("g", "v"),
        Seq("g"), "v", 0L))
    assert(e.getMessage.contains("sensitive"))
  }
}
