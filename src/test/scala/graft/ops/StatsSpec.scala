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
