package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Layout.hilbert]] (canonical xy2d, unrolled): exact values on
  * the base case, bijectivity and THE Hilbert property — consecutive
  * curve positions are always grid neighbors — proven exhaustively on a
  * full grid, plus the locality edge over Morton that justifies having
  * both layouts. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def grid(bits: Int) = {
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    Layout.hilbert(cells.toDF("x", "y"), "x", "y", bits)
      .select("x", "y", "h_value")
      .as[(Long, Long, Long)].collect()
  }

  test("2x2 base case matches the canonical curve orientation") {
    val m = grid(1).map { case (x, y, h) => ((x, y), h) }.toMap
    assert(m == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L,
      (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("bijective on the full 16x16 grid") {
    val hs = grid(4).map(_._3)
    assert(hs.length == 256 && hs.toSet == (0L until 256L).toSet)
  }

  test("consecutive curve positions are always grid neighbors (32x32)") {
    val byH = grid(5).sortBy(_._3)
    val jumps = byH.sliding(2).map { case Array((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(jumps.forall(_ == 1L), s"max jump ${jumps.max}")
  }

  test("Morton makes long jumps on the same grid — the locality gap") {
    val n = 32
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val byZ = Layout.zorder(cells.toDF("x", "y"), Seq("x", "y"), bits = 5)
      .select("x", "y", "z_value").as[(Long, Long, Long)].collect()
      .sortBy(_._3)
    val maxJump = byZ.sliding(2).map { case Array((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxJump > 1L) // Z crosses quadrant seams in one step
  }

  test("hilbertWrite: disjoint per-file h-ranges (min/max stats prune)") {
    val n = 32
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val path = tmpDir("hilbert-write")
    val back = Layout.hilbertWrite(cells.toDF("x", "y"), "x", "y",
      path, numFiles = 4, bits = 5)
    assert(back.count() == (n * n).toLong)
    val ranges = Layout.fileRanges(back, "h_value")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach { case Array((_, _, hi1), (_, lo2, _)) =>
      assert(hi1 < lo2, "file h-ranges must not overlap")
    }
  }

  test("rejects out-of-budget bit widths") {
    intercept[IllegalArgumentException] {
      Layout.hilbertSteps("x", "y", 32)
    }
  }
}
