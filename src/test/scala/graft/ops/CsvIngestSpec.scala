package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion edge cases the cv1 round-trip can't exercise on clean
  * generated data: quoting, the null sentinel, and — the part that
  * matters operationally — malformed-row quarantine. A 100 TB CSV drop
  * always contains broken lines; the job must park them for audit, not
  * die (PERMISSIVE + _corrupt_record) and must be able to count them
  * (DROPMALFORMED delta). */
class CsvIngestSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("n", LongType)))

  test("quoted commas, quotes, and the \\N null sentinel round-trip") {
    val dir = tmpDir("csv-rt")
    val rows = Seq(
      (1L, "plain", 10L),
      (2L, "comma, inside", 20L),
      (3L, "a \"quoted\" word", 30L),
      (4L, null.asInstanceOf[String], 40L),
      (5L, "", 50L)) // empty string must NOT come back as null
    rows.toDF("id", "text", "n").repartition(1).write
      .option("header", "true").option("nullValue", "\\N")
      .mode("overwrite").csv(dir)
    val back = spark.read.schema(schema)
      .option("header", "true").option("nullValue", "\\N").csv(dir)
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(back.toSeq == rows.map { case (i, t, n) => (i, t, n) })
  }

  test("PERMISSIVE quarantines malformed rows in _corrupt_record") {
    val dir = tmpDir("csv-bad")
    val lines = Seq(
      "id,text,n",
      "1,ok,10",
      "2,bad-number,not_a_long", // type failure
      "3,fine,30")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val read = spark.read.schema(withCorrupt)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(read.count() == 3)
    val bad = read.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.select("id").as[Long].head() == 2L)
    // DROPMALFORMED = the same data minus the quarantined line. collect(),
    // not count(): CSV column pruning means count() parses ZERO columns,
    // so the type failure is never seen and nothing is dropped — the same
    // trap applies to any count-only validation job on real pipelines.
    val dropped = spark.read.schema(schema)
      .option("header", "true").option("mode", "DROPMALFORMED").csv(dir)
    assert(dropped.collect().length == 2)
    read.unpersist()
  }
}
