package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range joins: result-identical to the naive inequality join
  * (exactly-once pair emission, including ranges straddling many bins and
  * negative coordinates) while planning a hash join on the bin id instead
  * of a nested loop. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic pseudo-random fixture: ids hashed through xxhash64 give
  // well-spread points/intervals without Random (repeatable across runs).
  private def points(n: Int): DataFrame =
    spark.range(n).select(col("id").as("p_id"),
      pmod(xxhash64(col("id")), lit(100000L)).as("p"))

  private def ranges(n: Int, maxLen: Long): DataFrame =
    spark.range(n).select(col("id").as("r_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(100000L)).as("lo"))
      .withColumn("hi",
        col("lo") + pmod(xxhash64(col("r_id"), lit(2)), lit(maxLen)))

  test("pointInRange matches the naive inequality join exactly") {
    val p = points(500)
    val r = ranges(300, 5000) // lengths 0..5000 vs binWidth 1000: multi-bin
    val binned = RangeJoin.pointInRange(p, "p", r, "lo", "hi", 1000L)
      .select("p_id", "r_id")
    val naive = p.join(r, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p_id", "r_id")
    assert(binned.count() == naive.count())
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
  }

  test("pointInRange is exact on negative coordinates") {
    // Bin ids must floor toward -inf: truncate-toward-zero folds bins -1
    // and 0 together and silently drops matches near the origin.
    val p = points(400).withColumn("p", col("p") - 50000L)
    val r = ranges(200, 3000).withColumn("lo", col("lo") - 50000L)
      .withColumn("hi", col("hi") - 50000L)
    val binned = RangeJoin.pointInRange(p, "p", r, "lo", "hi", 700L)
      .select("p_id", "r_id")
    val naive = p.join(r, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p_id", "r_id")
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
  }

  test("intervalOverlap matches the naive join exactly (once per pair)") {
    val l = ranges(250, 4000).toDF("l_id", "l_lo", "l_hi")
    val r = ranges(250, 4000).select(col("r_id"),
      (col("lo") + 37L).as("r_lo"), (col("hi") + 37L).as("r_hi"))
    val binned = RangeJoin
      .intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi", 1000L)
      .select("l_id", "r_id")
    // The bare strict-inequality predicate wrongly claims a zero-length
    // interval sitting inside another "overlaps" it; set semantics (and
    // the op) say an empty interval overlaps nothing — filter empties
    // from the naive twin to compare like for like.
    val naive = l.filter(col("l_hi") > col("l_lo"))
      .join(r.filter(col("r_hi") > col("r_lo")),
        col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("l_id", "r_id")
    assert(binned.count() == naive.count())
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
    // exactly-once: no pair survives in two bins
    assert(binned.groupBy("l_id", "r_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("binned plan is a hash join; the naive plan is a nested loop") {
    val p = points(100)
    val r = ranges(100, 2000)
    val naivePlan = p.join(r,
        col("p") >= col("lo") && col("p") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"expected the naive inequality join to nested-loop:\n$naivePlan")
    val binnedPlan = RangeJoin.pointInRange(p, "p", r, "lo", "hi", 1000L)
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin") &&
      !binnedPlan.contains("CartesianProduct"),
      s"binned plan still nested-loops:\n$binnedPlan")
    assert(binnedPlan.contains("Join"), s"binned plan lost the join:\n$binnedPlan")
  }

  test("degenerate and runaway ranges: empty ranges drop, long ones fail") {
    val p = points(50)
    val empty = Seq((1L, 10L, 10L), (2L, 20L, 5L)).toDF("r_id", "lo", "hi")
    assert(RangeJoin.pointInRange(p, "p", empty, "lo", "hi", 100L).count() == 0)
    val runaway = Seq((1L, 0L, 10000000L)).toDF("r_id", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInRange(p, "p", runaway, "lo", "hi", 10L, 64).count()
    }
    // must be OUR guard, not an incidental explode/OOM failure — and it
    // must survive column pruning (it's fused into __hi_bin, not a
    // standalone column the optimizer could drop)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        messages(e.getCause))
    assert(messages(ex).exists(_.contains("bins of width")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("exactness holds across adversarial bin widths") {
    // Bin-boundary bugs are width-specific (off-by-one at width 1,
    // pow2 masking slips, widths larger than every range, widths larger
    // than the whole domain) — sweep the corners with one fixture.
    val p = points(200)
    val r = ranges(120, 3000)
    val naive = p.join(r, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p_id", "r_id")
    val nCount = naive.count()
    for (w <- Seq(1L, 7L, 64L, 999L, 4096L, 99991L, 10000000L)) {
      val binned = RangeJoin
        .pointInRange(p, "p", r, "lo", "hi", w, maxBinsPerRange = 1 << 20)
        .select("p_id", "r_id")
      assert(binned.count() == nCount, s"width $w changed the count")
      assert(binned.exceptAll(naive).count() == 0, s"width $w: extras")
      assert(naive.exceptAll(binned).count() == 0, s"width $w: missing")
    }
  }

  test("suggestBinWidth tracks the median range length and stays exact") {
    val r = ranges(300, 5000) // lengths ~uniform in [0, 5000)
    val w = RangeJoin.suggestBinWidth(r, "lo", "hi")
    assert(w >= 1000 && w <= 4000, s"suggested width $w")
    val p = points(500)
    val binned = RangeJoin.pointInRange(p, "p", r, "lo", "hi", w)
      .select("p_id", "r_id")
    val naive = p.join(r, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p_id", "r_id")
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
    // all-degenerate input: a sane default, no NPE
    import spark.implicits._
    val empty = Seq((1L, 5L, 5L)).toDF("r_id", "lo", "hi")
    assert(RangeJoin.suggestBinWidth(empty, "lo", "hi") == 1L)
  }

  test("column collisions are rejected up front") {
    val p = points(10)
    val r = ranges(10, 100).withColumnRenamed("r_id", "p_id")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInRange(p, "p", r, "lo", "hi", 100L)
    }
  }
}
