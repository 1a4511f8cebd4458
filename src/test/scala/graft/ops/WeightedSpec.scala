package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Weighted.weightedMedian / nucleusSelect — boundary-row semantics. */
class WeightedSpec extends SparkSpec {
  import spark.implicits._

  test("weightedMedian: lower weighted median, weights dominate count") {
    // values 1..4 with weights 1,1,1,7 → half of tot(10) is reached only
    // at value 4, even though the unweighted median is 2.
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 7L))
      .map { case (v, w) => ("g", v, w) }.toDF("k", "v", "w")
    val m = Weighted.weightedMedian(df, Seq("k"), "v", "w", "v")
      .select("wmedian").as[Long].head()
    assert(m == 4L)
    // uniform weights degrade to the ordinary lower median
    val u = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 1L))
      .toDF("k", "v", "w")
    assert(Weighted.weightedMedian(u, Seq("k"), "v", "w", "v")
      .select("wmedian").as[Long].head() == 2L)
  }

  test("nucleusSelect: shortest prefix reaching the mass target") {
    // weights 50,30,15,5: p=0.8 → 50+30 = exactly 80% → the 15 row's
    // prior mass (80) is NOT < 80% of 100 → keep exactly {50, 30}.
    val df = Seq(50L, 30L, 15L, 5L).zipWithIndex
      .map { case (w, i) => ("g", i.toLong, w) }.toDF("k", "id", "w")
    val kept = Weighted.nucleusSelect(df, Seq("k"), "w", "id", 800000L)
      .select("w").as[Long].collect().sorted.reverse
    assert(kept.toSeq == Seq(50L, 30L))
    // p=0.81 → needs the straddling row too
    val kept2 = Weighted.nucleusSelect(df, Seq("k"), "w", "id", 810000L)
      .select("w").as[Long].collect().sorted.reverse
    assert(kept2.toSeq == Seq(50L, 30L, 15L))
    // p=1 keeps everything, p=0 keeps nothing
    assert(Weighted.nucleusSelect(df, Seq("k"), "w", "id", 1000000L).count() == 4)
    assert(Weighted.nucleusSelect(df, Seq("k"), "w", "id", 0L).count() == 0)
  }

  test("neymanAllocation: variance-heavy stratum gets the budget") {
    // 'flat' is constant (w=0); 'wild' has all the variance.
    val df = (Seq.fill(50)(("flat", 10L)) ++
      (0 until 50).map(i => ("wild", (i * 100).toLong))).toDF("k", "v")
    val out = Weighted.neymanAllocation(df, "k", "v", budget = 100L)
      .select("k", "alloc").as[(String, Long)].collect().toMap
    assert(out == Map("flat" -> 0L, "wild" -> 100L))
  }

  test("neymanAllocation sums exactly to the budget (largest remainder)") {
    val df = (0 until 300).map { i =>
      (s"s${i % 3}", ((i * 37) % 97).toLong)
    }.toDF("k", "v")
    val out = Weighted.neymanAllocation(df, "k", "v", budget = 1000L)
    assert(out.agg(sum("alloc")).head().getLong(0) == 1000L)
    // roughly equal strata → no stratum starved
    assert(out.filter(col("alloc") < 200).count() == 0)
  }

  test("neymanAllocation: all-constant strata fail loudly") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L)).toDF("k", "v")
    val ex = intercept[Exception] {
      Weighted.neymanAllocation(df, "k", "v", 10L).collect()
    }
    assert(ex.getMessage.contains("total weight is 0"))
  }

  test("welchT: hand-checked statistic and arm ordering") {
    // arm 0: {1,2,3}, arm 1: {7,8,9}: means 2 and 8, var 1 each →
    // t = (2-8)/sqrt(1/3+1/3) = -6/sqrt(2/3)
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 7L), (1L, 8L), (1L, 9L))
      .toDF("arm", "v")
    val r = Profile.welchT(df, "arm", "v").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("s1_a") == 6L && r.getAs[Long]("s1_b") == 24L)
    val expected = -6.0 / math.sqrt(2.0 / 3.0)
    assert(math.abs(r.getAs[Double]("t_stat") - expected) < 1e-12)
    assert(r.getAs[Boolean]("significant"))
  }

  test("welchT: not exactly two arms fails loudly") {
    val df = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("arm", "v")
    val ex = intercept[Exception] { Profile.welchT(df, "arm", "v").collect() }
    assert(ex.getMessage.contains("need exactly 2 arms"))
  }

  test("nucleusSelect groups are independent") {
    val df = (Seq(("a", 0L, 90L), ("a", 1L, 10L)) ++
      (0 until 10).map(i => ("b", i.toLong, 10L))).toDF("k", "id", "w")
    val byKey = Weighted.nucleusSelect(df, Seq("k"), "w", "id", 900000L)
      .groupBy("k").count().as[(String, Long)].collect().toMap
    assert(byKey == Map("a" -> 1L, "b" -> 9L))
  }
}
