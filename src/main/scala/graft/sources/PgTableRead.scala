package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Parallel-range batch read of a live PostgreSQL table over the same
  * v3 wire client the JDBC sink uses (no driver jar) — the
  * dimension-hydration path: a CDC pipeline that joins change streams
  * against dimension tables needs to READ the database it otherwise
  * writes (reference topology reads its `users` table back for
  * verification, README.md:107-117; Flink deployments use the JDBC
  * connector's source side for the same purpose).
  *
  * Plan shape is the classic Spark JDBC-source contract: the driver
  * probes min/max of a numeric partition column (one 1-row query),
  * splits the span into `numPartitions` contiguous ranges, and each
  * TASK opens its own connection and SELECTs only its range — read
  * bandwidth scales with executors and no row funnels through the
  * driver. (RDD + mapPartitions is the right seam here: each partition
  * is genuinely imperative socket I/O; everything downstream is a
  * DataFrame.)
  *
  * Values arrive as simple-query text and surface as an all-string
  * DataFrame; callers cast to their schema
  * (`.select(col("id").cast("long"), …)`) so Spark's casts — not a
  * hand-rolled type map — own the conversion. SQL NULL surfaces as a
  * null string. Ranges are [lo, hi] closed; a skewed id space wants a
  * better-chosen partition column, exactly as with the stock JDBC
  * source.
  */
object PgTableRead {

  def table(spark: SparkSession, host: String, port: Int, db: String,
      user: String, table: String, columns: Seq[String],
      partitionColumn: String, numPartitions: Int = 8): DataFrame = {
    require(columns.nonEmpty, "columns must be explicit (no SELECT *)")
    val schema = StructType(
      columns.map(c => StructField(c, StringType, nullable = true)))
    val probe = new PgProto(host, port, db, user, replication = false)
    val bounds = try {
      val r = probe.query(s"SELECT min($partitionColumn), " +
        s"max($partitionColumn) FROM $table").head
      for (lo <- r(0); hi <- r(1)) yield (lo.toLong, hi.toLong)
    } finally probe.close()
    bounds match {
      case None => // empty table (min/max NULL)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some((lo, hi)) =>
        val n = math.max(1, numPartitions)
        val span = hi - lo + 1
        val ranges = (0 until n).map { i =>
          (lo + (span * i) / n, lo + (span * (i + 1)) / n - 1)
        }.filter { case (a, b) => a <= b }
        val colList = columns.mkString(", ")
        val rdd = spark.sparkContext
          .parallelize(ranges, math.max(1, ranges.size))
          .mapPartitions(_.flatMap { case (a, b) =>
            val p = new PgProto(host, port, db, user, replication = false)
            // query() drains the result eagerly, so closing in finally
            // is safe and each range holds its socket only while reading
            try p.query(s"SELECT $colList FROM $table WHERE " +
              s"$partitionColumn >= $a AND $partitionColumn <= $b")
              .map(r => Row.fromSeq(r.map(_.orNull)))
            finally p.close()
          })
        spark.createDataFrame(rdd, schema)
    }
  }
}
