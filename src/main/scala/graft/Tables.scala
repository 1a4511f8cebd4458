package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central access to the driver-generated parquet tables (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet per table under the sf dir.
  *
  * Scale design note: at 100 TB these reads become partitioned object-store
  * scans; everything downstream only depends on the DataFrame, so the switch
  * is a one-line change here. Filters/projections are declared in query code
  * and reach the scan via Catalyst pushdown (verified via .explain in specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark reads only as a
      // nanos Long (nanosAsLong). Truncate to µs NTZ — exactly what DuckDB
      // does reading the same file, so oracle values line up.
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else df
  }

  private def configure(spark: SparkSession): Unit = {
    // Naive parquet timestamps must read back as NTZ so values round-trip
    // identically to the DuckDB oracle (which is NTZ-only).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  // Last-registered dir per session: view registration re-reads every
  // parquet footer, which is pure overhead when consecutive queries hit
  // the same sf dir (the common case in Verify/Bench).
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every table as a temp view (SQL entry surface, SURVEY §2 E1). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) == dir) return
    configure(spark)
    graft.functions.GraftFunctions.register(spark)
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    registered.put(spark, dir)
  }
}
