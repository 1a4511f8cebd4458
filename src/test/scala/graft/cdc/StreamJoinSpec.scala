package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream enrichment join with watermarks — the capability SURVEY
  * §2.2 notes the reference deliberately avoids (it keeps users and
  * user_favorite_colors as separate topics); our engine provides it via
  * Structured Streaming's watermarked interval join, which bounds the
  * join state on both sides (required at 100 TB stream volumes). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def env(lsn: Long, schema: String, table: String,
      row: Map[String, String]): CdcEnvelope =
    CdcEnvelope(lsn, lsn, 1600000000000L + lsn * 1000, "c", "experiment",
      schema, table, Map.empty, row)

  test("users x favorite_colors interval join with bounded state") {
    val users = MemoryStream[CdcEnvelope]
    val colors = MemoryStream[CdcEnvelope]

    val u = Demux.users(users.toDS()).toDF()
      .withColumn("u_ts", timestamp_millis(lit(1600000000000L)))
      .select(col("key").as("u_key"), col("schema").as("u_schema"),
        col("id").as("u_id"), col("fullName"), col("u_ts"))
      .withWatermark("u_ts", "10 seconds")
    val c = Demux.favoriteColors(colors.toDS()).toDF()
      .withColumn("c_ts", timestamp_millis(lit(1600000000000L)))
      .select(col("schema").as("c_schema"), col("userId").as("c_id"),
        col("favoriteColor"), col("c_ts"))
      .withWatermark("c_ts", "10 seconds")

    val joined = u.join(c,
      expr("""u_schema = c_schema AND u_id = c_id AND
             |c_ts BETWEEN u_ts - INTERVAL 5 SECONDS
             |         AND u_ts + INTERVAL 5 SECONDS""".stripMargin))
      .select(col("u_key"), col("fullName"), col("favoriteColor"))

    val q = joined.writeStream
      .outputMode("append")
      .format("memory").queryName("enriched")
      .option("checkpointLocation", tmpDir("ssj"))
      .start()

    users.addData(Seq(
      env(1, "schema1", "users", Map("id" -> "1", "full_name" -> "susan smith")),
      env(2, "schema2", "users", Map("id" -> "1", "full_name" -> "bob smith"))))
    colors.addData(Seq(
      env(3, "schema1", "user_favorite_colors",
        Map("user_id" -> "1", "favorite_color" -> "blue"))))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("enriched")
      .as[(String, String, String)].collect().toSet
    // schema2 user has no color row; schema1 user enriched exactly once
    assert(out == Set(("schema1|1", "susan smith", "blue")))
  }
}
