package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("salted join result is identical to the plain join") {
    val large = graft.Tables.load(spark, sf, "events")
      .select("event_id", "event_type", "user_id")
    val small = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(count(lit(1)).as("type_total"))

    val plain = large.join(small, "event_type")
      .select("event_id", "event_type", "user_id", "type_total")
    val salted = SkewJoin.saltedJoin(large, small, "event_type", 8)
      .select("event_id", "event_type", "user_id", "type_total")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("small side replicates exactly salts times") {
    val small = graft.Tables.load(spark, sf, "region")
    val large = graft.Tables.load(spark, sf, "nation")
      .withColumnRenamed("n_regionkey", "r_regionkey")
    val out = SkewJoin.saltedJoin(large, small, "r_regionkey", 4)
    // every nation matched exactly once despite 4x replication
    assert(out.count() == large.count())
    assert(out.groupBy("n_nationkey").count()
      .filter(col("count") =!= 1).count() == 0)
  }
}
