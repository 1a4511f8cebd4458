package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.5 / brief: "salting for
  * skew"). When one join key carries a disproportionate share of the
  * large side, the single reducer owning it becomes the straggler. The
  * salt splits each key's rows across `salts` reducers; the small side
  * is replicated `salts`× so every (key, salt) pair still meets.
  *
  * Use when AQE's skew-join splitting isn't applicable (e.g. the skew is
  * in a stream, or the join is feeding a stateful op that pins
  * partitioning). Cost: small side inflates ×salts — keep it broadcast-
  * sized per salt. Result is identical to the unsalted join (spec-pinned).
  */
object SkewJoin {

  /** Inner equi-join of `large` and `small` on `key`, with the large
    * side's rows of any single key spread over `salts` partitions. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1)
    // Row-content hash spreads same-key rows across salts deterministically
    // (a key-derived salt would put the whole hot key in one bucket again).
    val largeS = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    val joined = largeS.join(smallS,
      largeS("__salt") === smallS("__salt") && largeS(key) === smallS(key))
    val outCols = large.columns.map(largeS(_)) ++
      small.columns.filterNot(_ == key).map(smallS(_))
    joined.select(outCols.toSeq: _*)
  }

  /** Key-skew census BEFORE a join — the measurement that decides
    * between a plain shuffle join, [[saltedJoin]], and a broadcast: the
    * `topK` heaviest keys with their row share and the salt factor each
    * would need so its heaviest reducer holds ~1/`parts` of the table
    * (`ceil(cnt·parts/total)`, clamped to [1, parts]).
    *
    * Scale shape: ONE hash aggregate to |keys| rows (map-side combine
    * absorbs the hot keys — that's the aggregation's own skew defense),
    * a broadcast single-row total, then TakeOrderedAndProject for the
    * head. The fact table is scanned once and never re-shuffled; share
    * and salt are exact integer arithmetic (round-half-up ppm), so the
    * report is engine-independent. */
  def profileKeys(df: DataFrame, key: String, topK: Int,
      parts: Int): DataFrame = {
    require(topK >= 1, s"profileKeys: need topK >= 1, got $topK")
    require(parts >= 1, s"profileKeys: need parts >= 1, got $parts")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("total"))
    // `div` (integer division), not `/` (double): at 100 TB cnt·2e6
    // overflows a double's 2^53 exact-integer range before it overflows
    // BIGINT, and a truncated double would silently misreport the share.
    counts.crossJoin(broadcast(total))
      .select(col(key), col("cnt"), col("total"),
        expr("(cnt * 2000000 + total) div (total * 2)").as("share_ppm"),
        least(greatest(
            expr(s"(cnt * $parts + total - 1) div total"),
            lit(1L)), lit(parts.toLong)).as("recommended_salt"))
      .orderBy(col("cnt").desc, col(key))
      .limit(topK)
  }
}
