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

  test("nucleusSelect groups are independent") {
    val df = (Seq(("a", 0L, 90L), ("a", 1L, 10L)) ++
      (0 until 10).map(i => ("b", i.toLong, 10L))).toDF("k", "id", "w")
    val byKey = Weighted.nucleusSelect(df, Seq("k"), "w", "id", 900000L)
      .groupBy("k").count().as[(String, Long)].collect().toMap
    assert(byKey == Map("a" -> 1L, "b" -> 9L))
  }
}
