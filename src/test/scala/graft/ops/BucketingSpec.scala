package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-partitioning both sides on the join key
  * at write time eliminates the per-query shuffle entirely — the
  * "reuse a partitioning across stages" lever for repeated 100 TB joins
  * (brief: "repartition()/bucketing for co-located joins"). */
class BucketingSpec extends SparkSpec {

  test("join of same-bucketed tables runs without any Exchange") {
    // AQE off for a stable plan-shape assertion; bucketed join elision
    // itself is independent of AQE.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sf = "/root/testdata/sf0.001"
      graft.Tables.load(spark, sf, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      graft.Tables.load(spark, sf, "customer")
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself is exchange-free (bucket co-location); the only
      // allowed exchange is the final tiny group-by on c_mktsegment
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(o_custkey") &&
        !joinPart.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$plan")
      // and it is correct
      val n = joined.agg(sum("n")).head().getLong(0)
      assert(n == graft.Tables.load(spark, sf, "orders").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
