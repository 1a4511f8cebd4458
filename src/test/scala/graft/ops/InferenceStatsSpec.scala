package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the session-7 Stats operators (survival
  * hazard, Benford, Poisson bootstrap, truncated EWMA, frequent pairs);
  * the sf-data values are graded by the DuckDB oracle
  * (na1/bd1/bs1/ew1/fi1/cf1). These pin the arithmetic the oracle can't
  * distinguish from a coincidentally-equal wrong formula. */
class InferenceStatsSpec extends SparkSpec {
  import spark.implicits._

  test("nelsonAalen: textbook risk sets and hazard increments") {
    // durations: 1(obs), 2(obs), 2(cens), 3(obs) — n=4 subjects.
    // t=1: risk 4, d 1, step 250000, H 250000
    // t=2: risk 3, d 1, step 333333, H 583333
    // t=3: risk 1, d 1, step 1000000, H 1583333
    val df = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 1))
      .toDF("dur", "obs")
    val got = Stats.nelsonAalen(df, Seq.empty, "dur", "obs")
      .orderBy("dur").collect()
    assert(got.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 3L, 1L))
    assert(got.map(_.getAs[Long]("hazard_step_ppm")).toSeq ==
      Seq(250000L, 333333L, 1000000L))
    assert(got.map(_.getAs[Long]("cum_hazard_ppm")).toSeq ==
      Seq(250000L, 583333L, 1583333L))
  }

  test("nelsonAalen: censored-only durations add risk but no step row") {
    val df = Seq((1L, 0), (1L, 0), (2L, 1)).toDF("dur", "obs")
    val got = Stats.nelsonAalen(df, Seq.empty, "dur", "obs").collect()
    // only t=2 emits; its risk set is 1 (the two t=1 subjects left)
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_risk") == 1L)
    assert(got.head.getAs[Long]("cum_hazard_ppm") == 1000000L)
  }

  test("benford: expected ppm constants sum to ~1e6 and digits are lexical") {
    assert(Stats.benfordPpm.map(_._2).sum === 999995L) // floor loss < 9
    // 100, 19, 2000, 999 → digits 1, 1, 2, 9
    val df = Seq(100L, 19L, 2000L, 999L).toDF("v")
    val got = Stats.benford(df, "v").orderBy("digit").collect()
    assert(got.map(r => (r.getAs[Long]("digit"), r.getAs[Long]("observed")))
      .toSeq == Seq((1L, 2L), (2L, 1L), (9L, 1L)))
    // observed shares are exact ppm of n=4
    assert(got.head.getAs[Long]("observed_ppm") == 500000L)
  }

  test("poissonBootstrap: deterministic, mean-preserving on a constant") {
    // constant value: every replicate mean is exactly that constant,
    // whatever the weights — and the run is bit-deterministic.
    val df = (1L to 200L).map(i => (i, 7000L)).toDF("id", "v")
    val a = Stats.poissonBootstrap(df, Seq("id"), "v", replicates = 8)
      .orderBy("replicate").collect()
    val b = Stats.poissonBootstrap(df, Seq("id"), "v", replicates = 8)
      .orderBy("replicate").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall(_.getAs[Long]("mean_value") == 7000L))
    // Poisson(1) weights: n_eff should be near n, not 0 or 8n
    assert(a.forall(r => r.getAs[Long]("n_eff") > 100L &&
      r.getAs[Long]("n_eff") < 400L))
  }

  test("ewma weights: ladder is the truncated geometric series") {
    val w = Stats.ewmaWeightsMicro(250, 16)
    assert(w.head == 250000L)          // α
    assert(w(1) == 187500L)            // α(1−α)
    assert(w.sum <= 1000000L)          // truncated mass never exceeds 1
    assert(w == w.sorted.reverse)      // monotone decreasing
  }

  test("ewmaSmooth: hand-computed two-point series") {
    // series x_0=1000 at t=0, x_1=2000 at t=1 (single key):
    // t=0: w0·1000 = 250000·1000 → 250000000 div 1e6 = 250000? No —
    // ewma_micro = Σ w_k x div 1e6 = 250000·1000 div 1e6 = 250000.
    // t=1: (250000·2000 + 187500·1000) div 1e6 = 687500 div 1e3... =
    // (500000000 + 187500000) div 1000000 = 687.
    val df = Seq(("k", 0L, 1000L), ("k", 1L, 2000L)).toDF("g", "t", "x")
    val got = Stats.ewmaSmooth(df, Seq("g"), "t", "x",
      alphaPm = 250, lookback = 16).orderBy("t").collect()
    assert(got(0).getAs[Long]("ewma_micro_value") == 250L)
    assert(got(1).getAs[Long]("ewma_micro_value") == 687L)
    assert(got(1).getAs[Long]("n_lags") == 2L)
  }

  test("frequentPairs: apriori prune drops infrequent items pre-join") {
    // baskets: {a,b} ×3, {a,c} ×1 — with minSupport 2, c (support 1)
    // must never reach the pair join; pair (a,b) has support 3.
    val rows = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a"), (4L, "c"))
    val df = rows.toDF("basket", "item")
    val got = Stats.frequentPairs(df, "basket", "item", minSupport = 2L)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("item_a") == "a" &&
      r.getAs[String]("item_b") == "b")
    assert(r.getAs[Long]("pair_count") == 3L)
    // lift = 1e6·3·4 div (4·3) = 1e6 (independence exactly)
    assert(r.getAs[Long]("lift_ppm") == 1000000L)
  }

  test("frequentPairs: per-basket duplicates count presence once") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("basket", "item")
    val got = Stats.frequentPairs(df, "basket", "item", minSupport = 2L)
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("pair_count") == 2L)
  }

  test("decisionStump: clean two-level signal splits at the boundary") {
    // x in {1, 2} with y = 1000000 below, 5000000 above: the only
    // sensible split is x <= 1, recovering both means exactly.
    val df = Seq((1L, 1000000L), (1L, 1000000L), (2L, 5000000L),
      (2L, 5000000L), (2L, 5000000L)).toDF("x", "y")
    val r = Stats.decisionStump(df, "x", "y").collect().head
    assert(r.getAs[Long]("best_x") == 1L)
    assert(r.getAs[Long]("n_left") == 2L &&
      r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Long]("mean_left_micro") == 1000000L * 1000000L)
    assert(r.getAs[Long]("mean_right_micro") == 5000000L * 1000000L)
    assert(r.getAs[Long]("gain_per_row") > 0L)
  }

  test("decisionStump: tie-break picks the smallest threshold") {
    // constant y: every split scores the same — smallest x must win
    val df = Seq((1L, 7000L), (2L, 7000L), (3L, 7000L)).toDF("x", "y")
    val r = Stats.decisionStump(df, "x", "y").collect().head
    assert(r.getAs[Long]("best_x") == 1L)
  }

  test("mutualInformation: independence gives exactly 0; identity > 0") {
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    assert(Stats.mutualInformation(ind, "u", "v").collect().head
      .getAs[Long]("mi_micro") == 0L)
    // perfectly dependent 2-symbol: MI = ln 2 ≈ 0.693147 nats
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "v")
    val mi = Stats.mutualInformation(dep, "u", "v").collect().head
      .getAs[Long]("mi_micro")
    assert(mi == 693147L)
  }

  test("isotonicFit: pools adjacent violators to the weighted mean") {
    // raw rates by bin: 0.2, 0.6, 0.4, 0.8 — bins 2 and 3 violate and
    // pool to (3+2)/(5+5) = 0.5; the rest stand.
    val rows = Seq.tabulate(5)(i => (1L, if (i < 1) 1 else 0)) ++
      Seq.tabulate(5)(i => (2L, if (i < 3) 1 else 0)) ++
      Seq.tabulate(5)(i => (3L, if (i < 2) 1 else 0)) ++
      Seq.tabulate(5)(i => (4L, if (i < 4) 1 else 0))
    val df = rows.toDF("bin", "pos")
    val got = Stats.isotonicFit(df, "bin", "pos").orderBy("bin")
      .collect()
    assert(got.map(_.getAs[Long]("fit_ppm")).toSeq ==
      Seq(200000L, 500000L, 500000L, 800000L))
    assert(got.map(_.getAs[Long]("raw_ppm")).toSeq ==
      Seq(200000L, 600000L, 400000L, 800000L))
  }

  test("isotonicFit: already-monotone input is untouched") {
    val rows = Seq((1L, 0), (1L, 0), (2L, 1), (2L, 0), (3L, 1), (3L, 1))
    val got = Stats.isotonicFit(rows.toDF("bin", "pos"), "bin", "pos")
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Long]("fit_ppm")).toSeq ==
      Seq(0L, 500000L, 1000000L))
  }

  test("isotonicFit: fully decreasing input pools to one global rate") {
    val rows = Seq((1L, 1), (1L, 1), (2L, 1), (2L, 0), (3L, 0), (3L, 0))
    val got = Stats.isotonicFit(rows.toDF("bin", "pos"), "bin", "pos")
      .collect()
    assert(got.map(_.getAs[Long]("fit_ppm")).distinct.toSeq ==
      Seq(500000L))
  }

  test("trimmedMean: drops exactly the rank-interval mass") {
    // 10 values 1..10 in one group, trim 10% each side → keep ranks
    // 2..9 → mean = 44/8 = 5.5 → 5500000 micro; raw mean 5.5 too
    val df = (1L to 10L).map(v => ("g", v)).toDF("g", "v")
    val r = Stats.trimmedMean(df, Seq("g"), "v", trimPm = 100)
      .collect().head
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("kept") == 8L)
    assert(r.getAs[Long]("trimmed_mean_micro") == 5500000L)
    // outliers on both ends: trimmed mean ignores them, raw mean moves
    val df2 = (Seq(-1000L) ++ (1L to 8L) ++ Seq(1000L))
      .map(v => ("g", v)).toDF("g", "v")
    val r2 = Stats.trimmedMean(df2, Seq("g"), "v", trimPm = 100)
      .collect().head
    assert(r2.getAs[Long]("trimmed_mean_micro") == 4500000L) // mean 1..8
    assert(r2.getAs[Long]("mean_micro") == 3600000L)
  }

  test("trimmedMean: duplicate values split across the trim boundary") {
    // values: 1,2,2,2,3 — trim 20% each side (n=5 → lo=1, hi=4):
    // keep ranks 2..4 = the three 2s → trimmed mean 2.0
    val df = Seq(1L, 2L, 2L, 2L, 3L).map(("g", _)).toDF("g", "v")
    val r = Stats.trimmedMean(df, Seq("g"), "v", trimPm = 200)
      .collect().head
    assert(r.getAs[Long]("kept") == 3L)
    assert(r.getAs[Long]("trimmed_mean_micro") == 2000000L)
  }

  test("ransacLine: outlier-resistant — finds the line OLS would miss") {
    graft.functions.GraftFunctions.register(spark) // topk_pairs
    // 20 points exactly on y = 3x + 7 with x spread 100..2000 (so no
    // near-vertical sample line can sweep up the cloud within eps),
    // plus 4 gross outliers: only the true line collects all 20.
    val online = (1L to 20L).map(i => (i, 100L * i, 300L * i + 7L))
    val outliers = Seq((21L, 500L, 99000L), (22L, 1000L, 88000L),
      (23L, 1500L, 77000L), (24L, 200L, 66000L))
    val df = (online ++ outliers).toDF("id", "x", "y")
    val r = Stats.ransacLine(df, Seq("id"), "x", "y",
      eps = 10L, trials = 32).collect().head
    assert(r.getAs[Long]("inliers") == 20L,
      s"expected the 20 collinear points, got $r")
    assert(r.getAs[Long]("slope_ppm") == 3000000L) // slope 3
    assert(r.getAs[Long]("n") == 24L)
  }

  test("ransacLine: run is deterministic") {
    graft.functions.GraftFunctions.register(spark)
    val df = (1L to 30L).map(i => (i, i % 7, i * 13 % 1000))
      .toDF("id", "x", "y")
    val a = Stats.ransacLine(df, Seq("id"), "x", "y", eps = 50L,
      trials = 8).collect().head.toSeq
    val b = Stats.ransacLine(df, Seq("id"), "x", "y", eps = 50L,
      trials = 8).collect().head.toSeq
    assert(a == b)
  }

  test("kFoldAssign: exact quotas — fold sizes differ by at most one") {
    val df = (1L to 103L).map(i => (i, i * 7)).toDF("a", "b")
    val got = Stats.kFoldAssign(df, Seq("a", "b"), k = 5).collect()
    assert(got.length == 103)
    val sizes = got.groupBy(_.getAs[Long]("fold")).map(_._2.length).toSeq
    assert(sizes.max - sizes.min <= 1, s"sizes: $sizes")
    assert(sizes.sum == 103 && sizes.size == 5)
    // deterministic across runs
    val again = Stats.kFoldAssign(df, Seq("a", "b"), k = 5).collect()
    assert(got.map(r => (r.getLong(0), r.getAs[Long]("fold"))).sortBy(_._1)
      .toSeq == again.map(r => (r.getLong(0), r.getAs[Long]("fold")))
      .sortBy(_._1).toSeq)
  }

  test("kFoldAssign: offset-rank matches the single-partition window rank") {
    // The r14 formulation derives the exact global rank from pinned
    // range partitions + monotonically_increasing_id offsets; pin it
    // against the obviously-correct (unscalable) global-window form on
    // a deliberately multi-partition input.
    val df = spark.range(1, 501).repartition(7)
      .selectExpr("id AS a", "id * 31 % 97 AS b")
    val got = Stats.kFoldAssign(df, Seq("a", "b"), k = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("fold"))).toMap
    import org.apache.spark.sql.expressions.Window
    val idStr = "concat_ws('-', CAST(a AS STRING), CAST(b AS STRING))"
    val ref = df
      .withColumn("__u", expr(TextOps.hex48Sql(s"md5($idStr)")))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("__u"), col("a"), col("b"))) - 1)
      .selectExpr("a", "CAST(rk % 4 AS BIGINT) AS fold")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)
  }

  test("kendallTau: perfect concordance, reversal, and ties") {
    // y strictly increasing in x → tau = +1
    val up = (1L to 10L).map(i => (i, i * 3)).toDF("x", "y")
    assert(Stats.kendallTau(up, "x", "y").collect().head
      .getAs[Long]("tau_b_ppm") == 1000000L)
    // y strictly decreasing → tau = -1
    val down = (1L to 10L).map(i => (i, 100L - i)).toDF("x", "y")
    assert(Stats.kendallTau(down, "x", "y").collect().head
      .getAs[Long]("tau_b_ppm") == -1000000L)
    // constant y: all pairs are y-ties → denominator zero → null
    val const = (1L to 10L).map(i => (i, 5L)).toDF("x", "y")
    val r = Stats.kendallTau(const, "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("tau_b_ppm")))
  }

  test("autocorrelation: constant series has zero denominator (null); " +
    "alternating series is perfectly anti-correlated at lag 1") {
    val const = (0L to 9L).map(t => ("k", t, 5L)).toDF("g", "t", "x")
    val rc = Stats.autocorrelation(const, Seq("g"), "t", "x", maxLag = 2)
      .collect()
    assert(rc.forall(_.isNullAt(rc.head.fieldIndex("acf_ppm"))))
    // x alternates 0,10,0,10,... (n=10, mean 5): r(1) = -25·9/(25·10)
    // = -0.9 → -900000 ppm; r(2) = +0.8 → 800000
    val alt = (0L to 9L).map(t => ("k", t, if (t % 2 == 0) 0L else 10L))
      .toDF("g", "t", "x")
    val ra = Stats.autocorrelation(alt, Seq("g"), "t", "x", maxLag = 2)
      .orderBy("lag").collect()
    assert(ra(0).getAs[Long]("acf_ppm") == -900000L)
    assert(ra(1).getAs[Long]("acf_ppm") == 800000L)
    assert(ra(0).getAs[Long]("n_pairs") == 9L)
  }

  test("retrieval eval dedups duplicate judgment rows (no fan-out)") {
    // run: one query, top-3 = docs 10, 20, 30
    val run = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("q", "d", "rank")
    val judged = Seq((1L, 10L, 2L), (1L, 30L, 1L))
      .toDF("q", "d", "grade")
    // same pool with doc 10 judged THREE times (twice at a lower grade)
    val dup = judged.union(Seq((1L, 10L, 1L), (1L, 10L, 2L))
      .toDF("q", "d", "grade"))
    def pr(j: org.apache.spark.sql.DataFrame) =
      Stats.binaryRetrievalEval(run, "q", "d", "rank", j, "q", "d",
        "grade", k = 3).collect()(0)
    val (clean, dirty) = (pr(judged), pr(dup))
    assert(clean.getAs[Long]("n_rel") == 2L)
    assert(clean.getAs[Long]("precision_ppm") == 666666L)
    assert(dirty == clean, s"duplicate judgments changed the eval: $dirty")
    def ndcg(j: org.apache.spark.sql.DataFrame) =
      Stats.ndcgAtK(run, "q", "d", "rank", j, "q", "d", "grade", k = 3)
        .collect()(0)
    val (nClean, nDirty) = (ndcg(judged), ndcg(dup))
    // dup rows carry a LOWER grade for doc 10: max-grade dedup must
    // keep grade 2 (gain 3), not sum or overwrite
    assert(nClean.getAs[Long]("dcg_ppb") ==
      3L * 1000000000L + 1L * 500000000L)
    assert(nDirty == nClean, s"duplicate judgments changed NDCG: $nDirty")
  }
}
