package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the Stats operators; the sf-data values are
  * graded by the DuckDB oracle (ols1/chi1/sky1/tg1/pp1). These pin the
  * arithmetic and the plan shapes the oracle can't see. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("linearFit recovers an exact line (slope 2, intercept 3)") {
    // y = 2x + 3 exactly: slope_ppm = 2e6, intercept_ppm = 3e6, r² = 1e6
    val df = Seq((1L, 5L), (2L, 7L), (3L, 9L), (4L, 11L))
      .toDF("x", "y").withColumn("g", lit("a"))
    val r = Stats.linearFit(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("slope_ppm") == 2000000L)
    assert(r.getAs[Long]("intercept_ppm") == 3000000L)
    assert(r.getAs[Long]("r2_ppm") == 1000000L)
  }

  test("linearFit: constant x gives NULL ratios, not a crash") {
    val df = Seq((5L, 1L), (5L, 9L)).toDF("x", "y").withColumn("g", lit("a"))
    val r = Stats.linearFit(df, Seq("g"), "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("slope_ppm")))
    assert(r.isNullAt(r.fieldIndex("r2_ppm")))
  }

  test("chiSquare: independent 2x2 gives chi2 0; dependent gives > 0") {
    // perfectly independent: O = E everywhere
    val ind = Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1))
      .toDF("k", "c")
    assert(Stats.chiSquare(ind, "k", "c").collect().head
      .getAs[Long]("chi2_ppm") == 0L)
    // perfectly dependent 2x2 (n=4): chi2 = n·min(r-1,c-1) = 4, V = 1
    val dep = Seq(("a", 0), ("a", 0), ("b", 1), ("b", 1)).toDF("k", "c")
    val r = Stats.chiSquare(dep, "k", "c").collect().head
    assert(r.getAs[Long]("chi2_ppm") == 4000000L)
    assert(r.getAs[Long]("cramers_v_ppm") == 1000000L)
  }

  test("paretoFrontier2D keeps exactly the non-dominated rows") {
    // points: (1,9) frontier, (3,7) frontier, (2,7) dominated by (3,7),
    // (3,5) dominated (same x, lower y), (5,1) frontier (max x),
    // (5,1) duplicate — both duplicates kept
    val df = Seq((1L, 9L, "a"), (3L, 7L, "b"), (2L, 7L, "c"),
      (3L, 5L, "d"), (5L, 1L, "e"), (5L, 1L, "f"))
      .toDF("x", "y", "id")
    val got = Stats.paretoFrontier2D(df, "x", "y")
      .select("id").as[String].collect().sorted.toSeq
    assert(got == Seq("a", "b", "e", "f"))
  }

  test("paretoFrontier2D matches the brute-force dominance check on 500 points") {
    val pts = (1 to 500).map { i =>
      val x = (i * 2654435761L) % 97
      val y = (i * 40503L) % 89
      (x, y, i.toLong)
    }
    val df = pts.toDF("x", "y", "id")
    val got = Stats.paretoFrontier2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (x, y, _) =>
      !pts.exists { case (x2, y2, _) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._3).toSet
    assert(got == want)
  }

  test("paretoFrontier2D plans no cartesian and no all-rows single-partition sort") {
    val df = (1 to 100).map(i => (i.toLong, (i * 7L) % 50, i)).toDF("x", "y", "id")
    val plan = Stats.paretoFrontier2D(df, "x", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the verify join against the tiny frontier must broadcast
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("targetEncodeLoo: exact LOO means, singleton falls back to global") {
    // group a: ys 10, 20, 30 → loo(10) = 25, loo(20) = 20, loo(30) = 15
    // group b: singleton 100 → global mean = 160/4 = 40
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 100L)).toDF("k", "id", "y")
    val got = Stats.targetEncodeLoo(df, "k", "y", "loo")
      .select("id", "loo").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 25L, 2L -> 20L, 3L -> 15L, 4L -> 40L))
  }

  test("timeBars: open/close at (ts,id) extremes, deterministic on ts ties") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:30:00")
    val df = Seq(("a", 1L, t0, 50L), ("a", 2L, t0, 20L), // tie: id 1 opens
      ("a", 3L, t1, 90L), ("b", 4L, t1, 5L))
      .toDF("k", "id", "ts", "v")
    val got = Stats.timeBars(df, Seq("k"), "ts", "id", "v")
      .select("k", "bar", "open", "high", "low", "close", "n_events", "sum_v")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("a", "2024-01-01 10:00:00", 50L, 90L, 20L, 90L, 3L, 160L),
      ("b", "2024-01-01 10:00:00", 5L, 5L, 5L, 5L, 1L, 5L)))
  }

  test("gini: uniform gives 0; full concentration approaches (n-1)/n") {
    val uni = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 10L))
      .toDF("k", "id", "v")
    assert(Stats.gini(uni, Seq("k"), "v", "id").collect().head
      .getAs[Long]("gini_ppm") == 0L)
    // one row owns everything: G = (n-1)/n = 3/4
    val conc = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 100L))
      .toDF("k", "id", "v")
    assert(Stats.gini(conc, Seq("k"), "v", "id").collect().head
      .getAs[Long]("gini_ppm") == 750000L)
  }

  test("mannWhitneyU: hand-worked case with a cross-cohort tie") {
    // key k: cohort1 = {1, 3}, cohort0 = {3, 5}
    // sorted: 1,3,3,5 → midranks 1, 2.5, 2.5, 4 (doubled: 2,5,5,8)
    // 2R1 = 2 + 5 = 7; 2U1 = 7 − n1(n1+1) = 7 − 6 = 1 (U1 = 0.5)
    // CLES = 2U1/(2 n1 n2) = 1/8 → 125000 ppm
    val df = Seq(("k", 1L, 1), ("k", 3L, 1), ("k", 3L, 0), ("k", 5L, 0))
      .toDF("g", "v", "c")
    val r = Stats.mannWhitneyU(df, Seq("g"), "v", "c").collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("u1_2x") == 1L)
    assert(r.getAs[Long]("cles_ppm") == 125000L)
  }

  test("spearman: perfect monotone gives rho2 1e6; reversed flips sign") {
    val up = Seq((1L, 10L), (2L, 40L), (3L, 90L), (4L, 160L))
      .toDF("x", "y").withColumn("g", lit("a"))
    val r1 = Stats.spearman(up, Seq("g"), "x", "y").collect().head
    assert(r1.getAs[Long]("rho_sign") == 1L)
    assert(r1.getAs[Long]("rho2_ppm") == 1000000L)
    val down = up.withColumn("y", -col("y"))
    val r2 = Stats.spearman(down, Seq("g"), "x", "y").collect().head
    assert(r2.getAs[Long]("rho_sign") == -1L)
    assert(r2.getAs[Long]("rho2_ppm") == 1000000L)
  }

  test("pmiLift: collocation outscores independent pairs") {
    // "x y" always together (4×); fillers make the marginals uneven
    val df = Seq((1L, "x y a b"), (2L, "x y b a"), (3L, "x y a a"),
      (4L, "x y b b")).toDF("id", "text")
    val got = TextOps.pmiLift(df, "id", "text", 10)
      .select("w1", "w2", "c_ab", "lift_ppm")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val (cxy, liftXy) = got(("x", "y"))
    assert(cxy == 4L)
    // r_a("x") = 4, c_b("y") = 4, N = 12 → lift = 12·4/(4·4) = 3×
    assert(liftXy == 3000000L)
    // an uncorrelated filler pair scores at or below independence
    assert(got.filterKeys(_ != ("x", "y")).values.forall(_._2 <= 1500000L))
  }

  test("vocabGrowth: cumulative tokens and first-seen vocab per checkpoint") {
    // bucket 2: checkpoint 2 covers ids 0,1; checkpoint 4 covers 2,3
    val df = Seq((0L, "a b"), (1L, "b c"), (2L, "c d d"), (3L, "a"))
      .toDF("id", "text")
    val got = TextOps.vocabGrowth(df, "id", "text", 2L)
      .orderBy("checkpoint")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // cp 2: 2 docs, 4 tokens, vocab {a,b,c} = 3
    // cp 4: 4 docs, 8 tokens, vocab {a,b,c,d} = 4
    assert(got == Seq((2L, 2L, 4L, 3L), (4L, 4L, 8L, 4L)))
  }

  test("contentChunks: boundaries reflow with content; recurrence counted") {
    // modulus 1: EVERY position >= 4 is a boundary -> chunks are
    // (first 4 chars), then 1-char chunks
    val df = Seq((1L, "abcdef"), (2L, "zzabcdef")).toDF("id", "text")
    val got = TextOps.contentChunks(df, "id", "text", 1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 1: "abcd","e","f" (3 chunks); doc 2: "zzab","c","d","e","f" (5)
    // shared instances: "e","f" in both -> doc1 n_shared 2, doc2 2
    assert(got == Seq((1L, 3L, 1L, 4L, 2L), (2L, 5L, 1L, 4L, 2L)))
    // huge modulus: no interior boundary -> one chunk per doc
    val whole = TextOps.contentChunks(df, "id", "text", 1 << 30)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(whole == Seq((1L, 1L, 6L, 6L, 0L), (2L, 1L, 8L, 8L, 0L)))
  }

  test("twap weights by holding time; last event carries no weight") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // v=10 held 2s, v=100 held 1s, v=7 last (no weight)
    // twap = (10*2e6 + 100*1e6) div 3e6 = 40
    val df = Seq(("k", 1L, t("2024-01-01 00:00:00"), 10L),
      ("k", 2L, t("2024-01-01 00:00:02"), 100L),
      ("k", 3L, t("2024-01-01 00:00:03"), 7L)).toDF("g", "id", "ts", "v")
    val r = Stats.twap(df, Seq("g"), "ts", "id", "v").collect().head
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Long]("span_us") == 3000000L)
    assert(r.getAs[Long]("twap") == 40L)
  }

  test("interArrivalLog2: exact bit-length buckets") {
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision ok
    // gaps: 1s, 3s -> log2(1e6)=19, log2(3e6)=21
    val df = Seq(("k", 1L, t(0L)), ("k", 2L, t(1000000L)),
      ("k", 3L, t(4000000L))).toDF("g", "id", "ts")
    val got = Stats.interArrivalLog2(df, Seq("g"), "ts", "id")
      .select("log2_gap", "n_gaps").as[(Long, Long)].collect().toSet
    assert(got == Set((19L, 1L), (21L, 1L)))
  }

  test("pathTrigrams: window gate and deterministic top-k") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val df = Seq(
      (1L, 1L, t(0), "a"), (1L, 2L, t(10), "b"), (1L, 3L, t(20), "c"),
      (1L, 4L, t(30), "a"), (1L, 5L, t(40), "b"), (1L, 6L, t(5000), "c"))
      .toDF("u", "id", "ts", "e")
    // windowUs 100s: (a,b,c), (b,c,a), (c,a,b) qualify; (a,b,c) via
    // ids 4,5,6 spans 4970s -> gated out
    val got = Stats.pathTrigrams(df, "u", "ts", "id", "e",
        windowUs = 100000000L, k = 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got.toSet == Set(("a", "b", "c", 1L), ("b", "c", "a", 1L),
      ("c", "a", "b", 1L)))
    // ties broken by labels ascending
    assert(got == got.sortBy(x => (-x._4, x._1, x._2, x._3)))
  }

  test("phraseSearch: adjacency, not co-occurrence; repeated hits counted") {
    val df = Seq((1L, "hash join beats sort merge hash join"),
      (2L, "join hash is reversed"), (3L, "hash only")).toDF("id", "text")
    val got = TextOps.phraseSearch(df, "id", "text", Seq("hash", "join"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 2L, 1L)))
    // 3-word phrase goes through the join chain
    val tri = TextOps.phraseSearch(df, "id", "text",
      Seq("sort", "merge", "hash")).as[(Long, Long, Long)].collect().toSeq
    assert(tri == Seq((1L, 1L, 4L)))
  }

  test("vocabOverlap: exact jaccard over distinct token sets") {
    val df = Seq(("s1", "a b c"), ("s1", "a a"), ("s2", "b c d"),
      ("s3", "x")).toDF("src", "text")
    val got = TextOps.vocabOverlap(df, "src", "text")
      .select("src_a", "src_b", "n_common", "jaccard_ppm")
      .as[(String, String, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    // s1={a,b,c}, s2={b,c,d}: inter 2, union 4 -> 500000 ppm; s3 disjoint
    assert(got == Seq(("s1", "s2", 2L, 500000L)))
  }

  test("robustOutliers: lower median on even n; MAD gate; MAD=0 group") {
    // values 1,3,5,100: lower median 3; |x-3| = 2,0,2,97 -> MAD 2
    // outliers (> 3*2=6): only 100
    val df = Seq(("k", 1L, 1L), ("k", 2L, 3L), ("k", 3L, 5L),
      ("k", 4L, 100L), ("c", 5L, 7L), ("c", 6L, 7L), ("c", 7L, 9L))
      .toDF("g", "id", "v")
    val got = Stats.robustOutliers(df, Seq("g"), "v", "id", k = 3)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("k") == ((4L, 3L, 2L, 1L)))
    // group c: median 7, deviations 0,0,2 -> MAD 0; 9 deviates > 0 -> outlier
    assert(got("c") == ((3L, 7L, 0L, 1L)))
  }

  test("sourceEntropy: uniform vs repeated; KL of a skewed source > 0") {
    // s1: 4 distinct tokens once each -> H = ln(4) = 1386294 micro
    // s2: one token 4 times -> H = 0
    val df = Seq(("s1", "a b c d"), ("s2", "e e e e")).toDF("src", "text")
    val got = TextOps.sourceEntropy(df, "src", "text")
      .select("source", "n_tokens", "vocab", "entropy_micro", "kl_micro")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s1")._4 == 1386294L && got("s1")._2 == 4L && got("s1")._3 == 4L)
    assert(got("s2")._4 == 0L)
    // each source's tokens are corpus-rare (p_c = 1/8 or 4/8 vs p_s) ->
    // KL strictly positive for s1 (its tokens are 2x likelier in-source)
    assert(got("s1")._5 > 0L && got("s2")._5 > 0L)
  }

  test("ksTest: identical cohorts give D 0; disjoint give n1*n2") {
    val same = Seq(("k", 1L, 1), ("k", 1L, 0), ("k", 5L, 1), ("k", 5L, 0))
      .toDF("g", "v", "c")
    val r1 = Stats.ksTest(same, Seq("g"), "v", "c").collect().head
    assert(r1.getAs[Long]("d_num") == 0L && r1.getAs[Long]("d_ppm") == 0L)
    // cohort 1 all below cohort 0: at v=2, |2*2 - 0*2| = 4 = n1*n2
    val split = Seq(("k", 1L, 1), ("k", 2L, 1), ("k", 8L, 0), ("k", 9L, 0))
      .toDF("g", "v", "c")
    val r2 = Stats.ksTest(split, Seq("g"), "v", "c").collect().head
    assert(r2.getAs[Long]("d_num") == 4L)
    assert(r2.getAs[Long]("d_ppm") == 1000000L)
  }

  test("cusumChangePoint finds the level shift; first index wins ties") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // 0,0,0,10,10,10: change right at i=3 (drift |6*S_i - i*30| peaks)
    val df = (1 to 6).map(i => ("k", i.toLong, t(i),
      if (i <= 3) 0L else 10L)).toDF("g", "id", "ts", "v")
    val r = Stats.cusumChangePoint(df, Seq("g"), "ts", "id", "v")
      .collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("change_idx") == 3L)
    assert(r.getAs[Long]("max_drift") == 90L) // |6*0 - 3*30|
  }

  test("interpolateGrid: exact midpoint interpolation + flat right edge") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // events at 0s (v=100) and 7200s (v=300); hourly grid: 0, 3600, 7200
    val df = Seq(("k", 1L, t(0), 100L), ("k", 2L, t(7200), 300L))
      .toDF("g", "id", "ts", "v")
    val got = Stats.interpolateGrid(df, Seq("g"), "ts", "id", "v",
        stepUs = 3600000000L)
      .select("grid_us", "v_interp").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 100L, 3600000000L -> 200L,
      7200000000L -> 300L))
  }

  test("seasonality: epoch-Thursday dow arithmetic, hour buckets") {
    // 1970-01-01 (epoch day 0) was a Thursday -> dow (0+4)%7 = 4
    // 1970-01-04 (day 3) was a Sunday -> dow 0
    val df = Seq(("k", java.sql.Timestamp.valueOf("1970-01-01 13:30:00")),
      ("k", java.sql.Timestamp.valueOf("1970-01-04 00:10:00")))
      .toDF("g", "ts")
    val got = Stats.seasonality(df, Seq("g"), "ts")
      .select("dow", "hour", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((4L, 13L, 1L), (0L, 0L, 1L)))
  }

  test("growthAccounting: new vs returning per day") {
    def t(day: Int) = new java.sql.Timestamp(day * 86400000L + 1000)
    val df = Seq((1L, t(0)), (2L, t(0)), (1L, t(1)), (3L, t(1)),
      (1L, t(1))).toDF("u", "ts")
    val got = Stats.growthAccounting(df, "u", "ts")
      .orderBy("day").as[(Long, Long, Long, Long)].collect().toSeq
    // day 0: active {1,2} all new; day 1: active {1,3}, new {3}
    assert(got == Seq((0L, 2L, 2L, 0L), (1L, 2L, 1L, 1L)))
  }

  test("twoProportionZ: equal rates give 0; a known case is exact") {
    val eq = Seq((1L, 1L, true), (2L, 0L, true), (3L, 1L, false),
      (4L, 0L, false)).toDF("u", "c", "conv")
    assert(Stats.twoProportionZ(eq, "u", "c", "conv").collect().head
      .getAs[Long]("z2_ppm") == 0L)
    // n1=2 (k1=2), n2=2 (k2=0): z2 = (2*2-0)^2*4/(2*2*2*2) = 4
    val sk = Seq((1L, 1L, true), (2L, 1L, true), (3L, 0L, false),
      (4L, 0L, false)).toDF("u", "c", "conv")
    val r = Stats.twoProportionZ(sk, "u", "c", "conv").collect().head
    assert(r.getAs[Long]("z2_ppm") == 4000000L)
  }

  test("psi: identical cohorts give ~0; a hard shift scores large") {
    // identical distributions: k1*n0 == k0*n1 in every bin -> PSI 0
    val same = (1 to 100).flatMap(i =>
      Seq(("k", i.toLong, 0), ("k", i.toLong, 1))).toDF("g", "v", "c")
    assert(Stats.psi(same, Seq("g"), "v", "c").collect().head
      .getAs[Long]("psi_micro") == 0L)
    // cohort 1 shifted wholly above the reference: PSI blows up
    val shift = ((1 to 100).map(i => ("k", i.toLong, 0)) ++
      (1 to 100).map(i => ("k", 1000L + i, 1))).toDF("g", "v", "c")
    val r = Stats.psi(shift, Seq("g"), "v", "c").collect().head
    assert(r.getAs[Long]("psi_micro") > 2000000L) // >> the 0.25 alarm bar
    assert(r.getAs[Long]("n0") == 100L && r.getAs[Long]("n1") == 100L)
  }

  test("preferencePairs picks argmax/argmin with margin gate") {
    val df = Seq(("g1", 1L, 100L), ("g1", 2L, 10L), ("g1", 3L, 50L),
      ("g2", 4L, 30L), ("g2", 5L, 25L), // margin 5 < 20 → dropped
      ("g3", 6L, 7L)) // singleton → dropped
      .toDF("k", "id", "s")
    val got = TextOps.preferencePairs(df, Seq("k"), "id", "s", minMargin = 20L)
      .select("k", "chosen_id", "rejected_id", "margin")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g1", 1L, 2L, 90L)))
  }
}
