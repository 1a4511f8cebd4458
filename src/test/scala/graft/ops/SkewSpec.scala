package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Skew handling at scale, pinned as executable facts rather than
  * folklore:
  *
  *  1. AQE's runtime re-plan splits a skewed sort-merge-join partition
  *     into subpartitions (the `isSkew` flag on the join) — the engine's
  *     first line of defense when one join key dominates, with NO query
  *     rewrite. This is what a 100 TB run leans on when a hot domain /
  *     null-ish default key concentrates rows.
  *  2. Manual salting remains semantics-preserving for the case AQE
  *     cannot touch (hash AGGREGATION of a non-combinable aggregate over
  *     a hot key): spreading a hot group over `salt` subkeys and
  *     re-merging yields identical results while multiplying the
  *     parallelism of the hot group.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime (isSkew on SMJ)") {
    // key 0 carries 99% of all rows (59400 of 60000): under static
    // planning all of them land in ONE reduce task
    val skewed = spark.range(0, 60000).select(
      when(col("id") % 100 === 0, lit(1L) + col("id") % 99)
        .otherwise(0L).as("k"),
      col("id").as("payload"))
    val dim = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("name-"), col("id")).as("name"))
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", true)
      // force a shuffled SMJ (no broadcast), and thresholds low enough
      // that the test-sized hot partition registers as skew
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", true)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", 2)
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", false)

      val joined = skewed.join(dim, "k")
      // drive THIS queryExecution's adaptive plan (a separate action
      // like joined.count() plans and finalizes its own copy)
      val adaptive = joined.queryExecution.executedPlan
        .asInstanceOf[AdaptiveSparkPlanExec]
      assert(adaptive.execute().count() == 60000L)
      val finalPlan = adaptive.executedPlan.toString
      assert(finalPlan.contains("isSkew=true") ||
        finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("salting a hot aggregation key preserves the aggregate exactly") {
    // collect-style aggregates have no map-side combine: every row of
    // the hot key crosses the exchange into one task. Salting spreads
    // the hot group over `salt` subkeys, aggregates partials, and
    // re-merges — same result, `salt`-way parallel hot group.
    val salt = 8
    val rows = spark.range(0, 20000).select(
      when(col("id") % 50 =!= 0, col("id") % 50).otherwise(0L).as("k"),
      (col("id") % 997).as("v"))
    val direct = rows.groupBy("k")
      .agg(sort_array(collect_list("v")).as("vs"),
        count(lit(1)).as("n"))
    val salted = rows
      .withColumn("__salt", pmod(hash(col("v")), lit(salt)))
      .groupBy("k", "__salt")
      .agg(collect_list("v").as("partial"), count(lit(1)).as("pn"))
      .groupBy("k")
      .agg(sort_array(flatten(collect_list("partial"))).as("vs"),
        sum("pn").as("n"))
    assert(salted.orderBy("k").collect().toSeq ==
      direct.orderBy("k").collect().toSeq)
  }
}
