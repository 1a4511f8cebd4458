package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weight-aware selection over grouped data — the two primitives a
  * data-mixing stage leans on once rows stop being equally important
  * (token-weighted stats, mass-bounded head selection).
  *
  * Both are ONE hash exchange on the group key + an in-partition sort,
  * with O(1) running state per row (a cumulative sum) — the same cost
  * class as any window aggregate, nothing quadratic, no collect. Both
  * demand INTEGER weights (token counts, byte sizes, char counts): the
  * keep/report decision is a threshold on cumulative sums, and float
  * cumsums are association-order-dependent — in ℤ the boundary row is
  * the same row on every engine and every re-run (ts1's argument).
  */
object Weighted {

  /** Weighted median of `valueCol` per group: the smallest value v such
    * that the rows with value ≤ v hold at least half the group's total
    * weight (lower weighted median; ties broken by `tieCol` for a total
    * order). Returns one row per group: keys ++ (wmedian = that value).
    * The classic use: token-weighted median document length — the
    * unweighted median answers "the typical document", this answers
    * "the typical TOKEN's document". */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: String,
      weightCol: String, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*)
    val cum = byKey.orderBy(col(valueCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cumw", sum(col(weightCol)).over(cum))
      .withColumn("__totw", sum(col(weightCol)).over(byKey))
      .filter(col("__cumw") * 2 >= col("__totw"))
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as("wmedian"))
  }

  /** Nucleus (top-p) selection per group: order rows by `weightCol`
    * DESCENDING (ties broken by `tieCol`) and keep the shortest prefix
    * whose cumulative weight reaches `pPpm`/10⁶ of the group total — a
    * row is kept iff the mass BEFORE it is still short of the target,
    * so exactly one row straddles the boundary (standard nucleus rule).
    * Keeps all input columns. The data-mixing use: "retain the head of
    * each domain that carries 90% of its token mass" — a mass bound,
    * where a row-count bound (top-k) would keep wildly different mass
    * per group. */
  def nucleusSelect(df: DataFrame, keys: Seq[String], weightCol: String,
      tieCol: String, pPpm: Long): DataFrame = {
    require(pPpm >= 0 && pPpm <= 1000000L, s"pPpm out of [0,1e6]: $pPpm")
    val byKey = Window.partitionBy(keys.map(col): _*)
    val cum = byKey.orderBy(col(weightCol).desc, col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cumw", sum(col(weightCol)).over(cum))
      .withColumn("__totw", sum(col(weightCol)).over(byKey))
      // mass strictly before this row < target mass  ⇔  keep
      .filter((col("__cumw") - col(weightCol)) * 1000000L <
        lit(pPpm) * col("__totw"))
      .drop("__cumw", "__totw")
  }

  /** Neyman (optimal) allocation of a sampling `budget` across strata:
    * n_h ∝ N_h·S_h, the allocation that minimizes estimator variance at
    * fixed budget — uniform and size-proportional allocation both
    * over-sample homogeneous strata. With the weight computed from the
    * stratum's own rows, N_h·S_h = √(n·Σx² − (Σx)²) — ONE exact bigint
    * per stratum (needs n·Σx² < 2⁶³; at fixed-point scale that bounds
    * the stratum around 10⁵–10⁶ rows per unit² — pre-aggregate or drop
    * the unit for more). The only float op is IEEE sqrt (correctly
    * rounded, so cross-engine identical on identical inputs),
    * micro-rounded straight back to ℤ; shares then use integer
    * largest-remainder rounding, so Σ allocations == budget EXACTLY
    * and the result is bit-stable. Two hash aggregates (per-stratum
    * moments, then the |strata|-row total broadcast back) — nothing
    * scales with row count but the first scan. */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val v = col(valueCol).cast("long")
    val m = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(v).as("n"), sum(v).as("s1"), sum(v * v).as("s2"))
      .withColumn("w",
        expr("CAST(floor(sqrt(CAST(n*s2 - s1*s1 AS DOUBLE)) * 1000000) AS BIGINT)"))
    val tot = m.agg(sum(col("w")).as("wtot"), count(lit(1)).as("k"))
    val fl = m.crossJoin(broadcast(tot))
      // all-constant strata everywhere → no variance signal to allocate
      // on; fail loudly rather than divide by zero
      .withColumn("wtot", when(col("wtot") <= 0,
        raise_error(lit("neymanAllocation: total weight is 0 — every " +
          "stratum is constant"))).otherwise(col("wtot")))
      .withColumn("alloc_fl", expr(s"${budget}L * w div wtot"))
      .withColumn("rem", expr(s"${budget}L * w - alloc_fl * wtot"))
    // |strata| rows — constant-partition window, bounded post-aggregate
    val deficit = Window.partitionBy(lit(1))
      .orderBy(col("rem").desc, col("stratum"))
    fl.withColumn("used", sum(col("alloc_fl"))
        .over(Window.partitionBy(lit(1))))
      .withColumn("rn", row_number().over(deficit))
      .withColumn("alloc",
        col("alloc_fl") + when(col("rn") <= lit(budget) - col("used"), 1L)
          .otherwise(0L))
      .select(col("stratum").as(stratumCol), col("n"), col("w"), col("alloc"))
  }
}
