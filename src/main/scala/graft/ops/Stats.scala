package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Relational statistics operators — the model-diagnostics layer a data
  * pipeline runs BEFORE training: trend fits, dependence tests, tradeoff
  * frontiers, leakage-safe categorical encodings.
  *
  * Cross-engine determinism discipline (the repo-wide rule, see
  * QueryDef's scaladoc): every statistic is assembled from exact integer
  * sufficient statistics (BIGINT inputs summed in DECIMAL(38,0), which
  * DuckDB mirrors as HUGEINT), and the only float op allowed is IEEE
  * correctly-rounded sqrt, micro-rounded straight back to ℤ. Integer
  * division is `div` (truncate toward zero) — DuckDB's `//` matches
  * Spark's `div` on negatives (both give −7 div 2 = −3).
  */
object Stats {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Per-group simple linear regression (y = a + b·x) from ONE exact
    * aggregate pass: n, Σx, Σy, Σxy, Σx², Σy² in DECIMAL(38,0), then
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy·den − num·Σx) / (n·den)
    *   r² = num² / (den·deny),  deny = nΣy² − (Σy)²
    * all emitted as ppm by integral division — bit-identical on any
    * engine with exact 128-bit sums. Inputs must be BIGINT-coded
    * (fixed-point scale chosen by the caller). r² is computed as the
    * TWO-STEP division (slope_ppm·num) div deny rather than the single
    * num²·10⁶ div (den·deny): squaring the ~10¹⁹ numerator would burst
    * 38 digits at sf≳1, while the staged form peaks near 10²⁹ and stays
    * exact-integer (both truncations are identical on both engines, and
    * a perfect fit still lands exactly on 10⁶). This is one
    * map-side-combined hash aggregate — no window, no join, no second
    * pass: the cheapest possible shape for a 100 TB trend census.
    *
    * Degenerate groups (constant x or constant y) emit NULL for the
    * ratios rather than dividing by zero.
    */
  def linearFit(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val x = dec(col(xCol))
    val y = dec(col(yCol))
    val agg = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).cast("decimal(38,0)").as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
      sum(y * y).as("__syy"))
      .withColumn("__num", expr("__n*__sxy - __sx*__sy"))
      .withColumn("__den", expr("__n*__sxx - __sx*__sx"))
      .withColumn("__deny", expr("__n*__syy - __sy*__sy"))
    agg.select(
      keys.map(col) ++ Seq(
        col("__n").cast("long").as("n"),
        col("__sx").cast("long").as("sum_x"),
        col("__sy").cast("long").as("sum_y"),
        when(col("__den") =!= 0,
          expr("(1000000 * __num) div __den").cast("long")).as("slope_ppm"),
        when(col("__den") =!= 0,
          expr("(1000000 * (__sy*__den - __num*__sx)) div (__n*__den)")
            .cast("long")).as("intercept_ppm"),
        when(col("__den") =!= 0 && col("__deny") =!= 0,
          expr("""(((1000000 * __num) div __den) * __num) div __deny""")
            .cast("long")).as("r2_ppm")): _*)
  }

  /** χ² test of independence between two categorical columns, plus
    * Cramér's V — "is the event mix actually different across user
    * cohorts?". One contingency hash aggregate over the rows
    * (|A|·|B| cells come out), margins computed over the CELLS (never a
    * second row scan), then
    *   χ²_ppm = Σ_cells (10⁶·(n·O − rₐ·c_b)²) div (n·rₐ·c_b)
    * — per-cell exact rational, scaled and truncated identically on any
    * exact-integer engine. V = √(χ²/(n·min(|A|−1,|B|−1))) is the one
    * IEEE op (sqrt), micro-rounded back to ℤ. Returns one row:
    * (n, cells, chi2_ppm, cramers_v_ppm). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val observed = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__o"))
    // complete the grid: structurally-ZERO cells still contribute E to
    // χ² ((0−E)²/E = E); a grouped count never emits them, so rebuild
    // |A|·|B| from the two tiny distinct sides (broadcast nested loop
    // over |A|·|B| CELLS, never rows) and left-join the counts back.
    val grid = observed.select("__a").distinct()
      .crossJoin(broadcast(observed.select("__b").distinct()))
    val cells = grid.join(observed, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0).cast("decimal(38,0)")))
    val withMargins = cells
      .withColumn("__ra", sum(col("__o")).over(Window.partitionBy(col("__a"))))
      .withColumn("__cb", sum(col("__o")).over(Window.partitionBy(col("__b"))))
      .withColumn("__n", sum(col("__o")).over(Window.partitionBy()))
    val contrib = withMargins.select(
      col("__n"), col("__a"), col("__b"),
      expr("""(1000000 * (__n*__o - __ra*__cb) * (__n*__o - __ra*__cb))
             div (__n * __ra * __cb)""").cast("decimal(38,0)").as("__cell"))
    contrib.agg(
      max(col("__n")).as("__nn"),
      countDistinct(col("__a")).as("__da"),
      countDistinct(col("__b")).as("__db"),
      count(lit(1)).as("__cells"),
      sum(col("__cell")).as("__chi2ppm"))
      .select(
        col("__nn").cast("long").as("n"),
        col("__cells").cast("long").as("cells"),
        col("__chi2ppm").cast("long").as("chi2_ppm"),
        floor(sqrt(
          expr("(__chi2ppm * 1000000) div (cast(__nn as decimal(38,0)) * least(__da - 1, __db - 1))")
            .cast("double"))).cast("long").as("cramers_v_ppm"))
  }

  /** 2-D Pareto frontier (skyline), both dimensions MAXIMIZED: the rows
    * no other row beats on both axes. Ties: equal-(x,y) duplicates are
    * mutually non-dominating and ALL kept; a row sharing x with a
    * strictly-higher-y row is dominated. The canonical curation use:
    * "which documents sit on the quality-vs-length tradeoff curve".
    *
    * Distributed shape — NOT the single-partition ORDER-BY-everything
    * window the naive SQL gives:
    *  1. candidates = per-distinct-x max y (hash aggregate; frontier
    *     membership only depends on these);
    *  2. range-exchange candidates on x DESC, sort within partitions,
    *     one linear scan per partition emitting each candidate's
    *     in-partition strict-prefix max;
    *  3. the P per-partition maxima (P rows, not n) fold on the driver
    *     into "max y of every partition strictly before mine", rejoined
    *     by broadcast; a candidate survives iff its y strictly beats
    *     both prefix maxima;
    *  4. broadcast-join survivors back to the input on (x, y=ymax) to
    *     recover full rows.
    * Every exchange moves (x,y) pairs only; step 3 is O(P). At 100 TB
    * the frontier filter is two narrow shuffles + a broadcast — the
    * O(n²) dominance join never materializes. */
  def paretoFrontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 2)
    val cands = df.groupBy(col(xCol).cast("long").as("__x"))
      .agg(max(col(yCol).cast("long")).as("__ymax"))
      .repartitionByRange(parts, col("__x").desc)
      .sortWithinPartitions(col("__x").desc)
    val scanSchema = StructType(Seq(
      StructField("__x", LongType, nullable = false),
      StructField("__ymax", LongType, nullable = false),
      StructField("__prefbefore", LongType, nullable = false),
      StructField("__pid", IntegerType, nullable = false)))
    // localCheckpoint: scanned is |distinct x| narrow rows and feeds
    // THREE consumers (the P-row fold, the frontier broadcast, and —
    // via lineage — the verify join); without it each action replays
    // the aggregate + range exchange + sort from the source.
    val scanned = cands.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var prefix = Long.MinValue
      it.map { r =>
        val x = r.getLong(0); val y = r.getLong(1)
        val before = prefix
        if (y > prefix) prefix = y
        Row(x, y, before, pid)
      }
    }(Encoders.row(scanSchema)).localCheckpoint()
    // P-row fold: cumulative max of the partitions strictly before each
    // pid (the range partitioner emits pids in x-desc order, so
    // "before" = larger x). Bounded by partition count, not data.
    val pmax = scanned.groupBy("__pid").agg(max("__ymax").as("__pm"))
      .collect().sortBy(_.getInt(0))
    var run = Long.MinValue
    val cumRows = pmax.map { r =>
      val v = run; if (r.getLong(1) > run) run = r.getLong(1)
      Row(r.getInt(0), v)
    }
    val cumDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cumRows.toSeq, 1),
      StructType(Seq(StructField("__pid", IntegerType, nullable = false),
        StructField("__cumbefore", LongType, nullable = false))))
    val frontier = scanned.join(broadcast(cumDf), "__pid")
      .filter(col("__ymax") > greatest(col("__prefbefore"), col("__cumbefore")))
      .select(col("__x"), col("__ymax"))
    df.join(broadcast(frontier),
      col(xCol).cast("long") === col("__x") &&
        col(yCol).cast("long") === col("__ymax"))
      .drop("__x", "__ymax")
  }

  /** Leave-one-out mean target encoding of a categorical key — the
    * leakage-safe way to turn a high-cardinality category into a model
    * feature (plain group-mean encoding leaks each row's own label into
    * its feature; LOO subtracts it first). Singleton groups fall back to
    * the global mean. Target must be BIGINT-coded; the encoding is exact
    * integral division at the target's own scale:
    *   loo = (Σy_g − y_i) div (n_g − 1),  fallback  Σy div n.
    * Cost: one window over the key (hash exchange + in-partition sums)
    * plus a 1-row global aggregate joined by broadcast — no per-category
    * driver state, so 10⁸ categories cost the same shape as 10. */
  def targetEncodeLoo(df: DataFrame, keyCol: String, yCol: String,
      outCol: String = "loo"): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val prior = df.agg(
      sum(dec(col(yCol))).as("__gs"),
      count(lit(1)).cast("decimal(38,0)").as("__gn"))
    df.withColumn("__sg", sum(dec(col(yCol))).over(byKey))
      .withColumn("__ng", count(lit(1)).over(byKey).cast("decimal(38,0)"))
      .crossJoin(broadcast(prior))
      .withColumn(outCol,
        when(col("__ng") > 1,
          expr(s"(__sg - cast($yCol as decimal(38,0))) div (__ng - 1)"))
          .otherwise(expr("__gs div __gn")).cast("long"))
      .drop("__sg", "__ng", "__gs", "__gn")
  }
}
