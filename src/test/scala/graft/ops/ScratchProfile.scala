package graft.ops

// Dev profiling harness (not a spec): time isolated fragments of a query
// under investigation. Run: sbt "Test/runMain graft.ops.ScratchProfile".
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("val"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    // NOTE: .count() lets ColumnPruning skip every derived column — each
    // stage must be CONSUMED by an aggregate to measure its real cost.
    val blk = li.withColumn("__blk", explode(expr("sequence(0, 3)")))
    time("blk explode")(
      blk.agg(sum("__blk")).collect().head.getLong(0))
    val withH = blk.withColumn("__h",
      expr("md5(concat_ws('-', CAST(l_orderkey AS STRING), " +
        "CAST(l_linenumber AS STRING), CAST(__blk AS STRING)))"))
    time("+ md5/blk")(
      withH.agg(sum(length(col("__h")))).collect().head.getLong(0))
    val lanes = withH.withColumn("__lane", explode(expr("sequence(0, 7)")))
    time("+ lane explode")(
      lanes.agg(sum(length(col("__h")))).collect().head.getLong(0))
    val withU = lanes.withColumn("__u", expr(
      "CAST(conv(substring(__h, __lane * 4 + 1, 4), 16, 10) AS BIGINT)"))
    time("+ conv decode")(
      withU.agg(sum("__u")).collect().head.getLong(0))
    val withW = withU.withColumn("__w",
      expr(Stats.poissonLadder16Sql("__u")).cast("long"))
    time("+ ladder16")(
      withW.agg(sum("__w")).collect().head.getLong(0))
    val full = Stats.poissonBootstrap(li,
      Seq("l_orderkey", "l_linenumber"), "val", 32)
    time("full collect")(full.collect().length.toLong)
    spark.stop()
  }
}
