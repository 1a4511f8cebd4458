package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range joins — the scale-safe plan for inequality joins with NO
  * equi key.
  *
  * Spark plans a bare `a.ts BETWEEN b.lo AND b.hi` join as a
  * BroadcastNestedLoopJoin (small side) or CartesianProduct (both large):
  * O(|A|·|B|) comparisons regardless of how selective the band is. The
  * reference's interval-join shape (iv1) dodges this only because it has a
  * user_id equi key to hash on; point-in-range lookups (IP→geo, ts→
  * maintenance window, offset→shard) and interval-overlap joins have none.
  *
  * The fix is the classic binning rewrite: quantize the range dimension
  * into fixed-width bins, emit each point into its one bin and each range
  * into every bin it covers, hash-join on the bin id, then apply the exact
  * predicate as a residual filter. Each point lives in exactly one bin, so
  * point-in-range pairs are emitted exactly once — no distinct needed. For
  * interval×interval overlap both sides explode, so a pair can meet in
  * several bins; the standard guard (keep the pair only in the bin that
  * contains the later of the two starts) restores exactly-once without a
  * shuffle-heavy dedup.
  *
  * Scale shape: one hash exchange per side on the bin id, candidate volume
  * = Σ_bin |points_bin|·|ranges_bin| — proportional to the true match count
  * when binWidth ≈ the typical range length. Pick binWidth that order; a
  * too-small width inflates the range side ×(len/width), a too-large width
  * inflates residual-filter work. `maxBinsPerRange` fails loudly (at the
  * first offending row, not after an OOM) if a runaway interval would
  * explode the build side — at 100 TB one open-ended interval must be a
  * data-quality error, not a job-killing 10^9-row explode.
  */
object RangeJoin {

  /** Floor-division bin id, staying in integer space throughout (never
    * routes through a double — exact beyond 2^53) and flooring toward
    * -inf for negative values, unlike bare `div` which truncates toward
    * zero. pmod is the non-negative remainder, so `value - pmod(value, w)`
    * is the largest multiple of w ≤ value and the final `div` is exact. */
  private def bin(colSql: String, w: Long): Column =
    expr(s"(($colSql) - pmod(($colSql), ${w}L)) div ${w}L")

  /** The runaway-interval guard, fused into the hi-bin value itself so it
    * is part of the expression the explode consumes and can never be
    * pruned: fails at the FIRST offending row, before the explode turns
    * one bad interval into 10^9 rows. */
  private def guarded(hiBin: Column, loBin: Column, w: Long,
      maxBins: Int): Column =
    when(hiBin - loBin >= maxBins,
      raise_error(concat(lit(s"interval spans >= $maxBins bins of width " +
        s"$w (lo_bin="), loBin, lit(")")))).otherwise(hiBin)

  /** Planning helper: a good binWidth ≈ the typical range length — wider
    * only adds residual-filter work, narrower multiplies the range-side
    * explode by len/width. One approx-percentile aggregate over the
    * ranges side (the stats-collection analog; at very large |ranges|
    * run it on a sample — the answer only needs to be order-of-magnitude
    * right). */
  def suggestBinWidth(ranges: DataFrame, loCol: String,
      hiCol: String): Long = {
    val m = ranges.filter(col(hiCol) > col(loCol))
      .agg(expr(s"approx_percentile(`$hiCol` - `$loCol`, 0.5D)").as("m"))
      .head()
    if (m.isNullAt(0)) 1L else math.max(1L, m.getLong(0))
  }

  /** Inner join `points ⋈ ranges ON lo <= point < hi` (half-open) without
    * an equi key. Output columns = points ++ ranges (names must be
    * disjoint). Each matching pair appears exactly once. */
  def pointInRange(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, maxBinsPerRange: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(ranges.columns.toSet)
    require(overlap.isEmpty, s"column name collision: $overlap")
    val p = points.withColumn("__bin", bin(s"`$pointCol`", binWidth))
    // Degenerate (empty) ranges can't match and would make the bin
    // sequence descend; drop them before the explode. The runaway guard
    // lives INSIDE the __hi_bin expression the explode consumes — a
    // standalone guard column would be unreferenced and column pruning
    // would silently eliminate the raise_error with it.
    val r = ranges.filter(col(hiCol) > col(loCol))
      .withColumn("__lo_bin", bin(s"`$loCol`", binWidth))
      .withColumn("__hi_bin",
        guarded(bin(s"`$hiCol` - 1L", binWidth), col("__lo_bin"),
          binWidth, maxBinsPerRange))
      .withColumn("__bin", explode(sequence(col("__lo_bin"), col("__hi_bin"))))
      .drop("__lo_bin", "__hi_bin")
    p.join(r, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Inner join of two interval sets on half-open overlap
    * (`lLo < rHi AND rLo < lHi`) without an equi key. Both sides explode
    * across covered bins; the `__bin == bin(max(lLo, rLo))` guard keeps
    * each overlapping pair exactly once (every overlapping pair shares the
    * bin containing the later start, and only that bin passes). */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Long, maxBinsPerRange: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column name collision: $overlap")
    def explodeBins(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(hi) > col(lo))
        .withColumn("__lo_bin", bin(s"`$lo`", binWidth))
        .withColumn("__hi_bin",
          guarded(bin(s"`$hi` - 1L", binWidth), col("__lo_bin"),
            binWidth, maxBinsPerRange))
        .withColumn("__bin",
          explode(sequence(col("__lo_bin"), col("__hi_bin"))))
        .drop("__lo_bin", "__hi_bin")
    val l = explodeBins(left, lLo, lHi).withColumnRenamed("__bin", "__bin_l")
    val r = explodeBins(right, rLo, rHi).withColumnRenamed("__bin", "__bin_r")
    l.join(r, col("__bin_l") === col("__bin_r"))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(col("__bin_l") === bin(s"greatest(`$lLo`, `$rLo`)", binWidth))
      .drop("__bin_l", "__bin_r")
  }
}
