package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema drift across parquet drops — the ingestion reality at 100 TB:
  * a corpus lands in batches over months and later batches grow columns.
  * Pins the engine's contract for reading such a mixed directory:
  * an explicit union schema (the production path — no footer scan, new
  * column null-filled for old files) and mergeSchema=true (the
  * discovery path — pays a footer read per file, so it's for exploring,
  * not for the 1000-executor job). */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("old files null-fill columns added by later drops") {
    val dir = tmpDir("drift")
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
      .write.parquet(s"$dir/batch=0")
    Seq((3L, "gamma", "en"), (4L, "delta", "de"))
      .toDF("id", "text", "lang").write.parquet(s"$dir/batch=1")

    val unionSchema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))

    // Production path: explicit schema, zero footer reads for inference.
    val explicit = spark.read.schema(unionSchema)
      .parquet(s"$dir/batch=0", s"$dir/batch=1")
      .orderBy("id").collect()
    assert(explicit.map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)))).toSeq == Seq(
      (1L, "alpha", None), (2L, "beta", None),
      (3L, "gamma", Some("en")), (4L, "delta", Some("de"))))

    // Discovery path: mergeSchema unions the footers to the same shape.
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/batch=0", s"$dir/batch=1")
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("id", "lang", "text"))
    assert(merged.filter(col("lang").isNull).count() == 2)

    // The new column is still filter-able — nulls never match an equality
    // predicate, so old files fall out of lang-filtered scans silently:
    // a pipeline gating on lang must decide the backfill rule explicitly.
    assert(merged.filter(col("lang") === "en").count() == 1)
  }
}
