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
}
