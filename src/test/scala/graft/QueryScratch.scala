package graft

/** Ad-hoc single-query runner for iterating on a QueryDef without the
  * full suite: `Test/runMain graft.QueryScratch tt6_concurrent_append
  * [sfDir]` prints the result head and row count. */
object QueryScratch {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.take(1).foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sf)
      df.show(5, truncate = false)
      val n = df.count()
      println(f"$name: rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
