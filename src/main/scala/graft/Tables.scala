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

  // One key column per table: enough to catch a renamed/retyped column or a
  // regenerated file the reader can't handle, without over-pinning the
  // generator's full schema (which has legitimately drifted before —
  // round 7's events.ts nanos→µs change took the whole gate down as 145
  // opaque per-query failures because nothing read the tables up front).
  private val keyColumns: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** Environment-drift tripwire for the gate mains (Verify/Bench): load
    * every table, force one row through the full read path (schema decode
    * included — a parquet type the reader mishandles throws HERE, once,
    * with the table named, instead of inside all 145 queries), and check
    * the key column survived. Returns one error string per broken table;
    * empty = safe to run the query inventory.
    */
  def preflight(spark: SparkSession, dir: String): Seq[String] =
    names.flatMap { n =>
      try {
        val df = load(spark, dir, n)
        val key = keyColumns(n)
        if (!df.columns.contains(key))
          Seq(s"$n: key column '$key' missing (schema: ${df.columns.mkString(",")})")
        // head(1) WITHOUT a projection: column pruning would skip decoding
        // the very column whose parquet type drifted; an unpruned head
        // decodes every column of one row.
        else if (df.head(1).isEmpty) Seq(s"$n: table is empty")
        else Nil
      } catch {
        case e: Throwable =>
          Seq(s"$n: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }

  /** Register every table as a temp view (SQL entry surface, SURVEY §2 E1). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) == dir) return
    configure(spark)
    graft.functions.GraftFunctions.register(spark)
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    registered.put(spark, dir)
  }
}
