package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("asset table: opaque binary payload + typed metadata schema") {
    val assets = Multimodal.assetsFromDocuments(spark, sf)
    val schema = assets.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(assets.count() == 500)
    assert(assets.select("modality").distinct().count() == 3)
  }

  test("decode runs per-partition and yields deterministic metadata") {
    val meta = Multimodal.metadataTable(spark, sf)
    assert(meta.count() == 500)
    // deterministic: same input → same metadata on re-run
    val a = meta.orderBy("asset_id").collect().toSeq
    val b = Multimodal.metadataTable(spark, sf).orderBy("asset_id").collect().toSeq
    assert(a == b)
    // dimensions in the stub's documented range
    val bad = meta.filter(col("width") < 64 || col("width") > 575 ||
      col("height") < 64 || col("height") > 575).count()
    assert(bad == 0)
    // images are single-frame
    assert(meta.filter(col("modality") === "image" && col("n_frames") =!= 1)
      .count() == 0)
  }

  test("payloads cannot reach a shuffle: decode output carries no binary column") {
    val decoded = Multimodal.decode(Multimodal.assetsFromDocuments(spark, sf))
    // the structural guarantee: everything downstream of decode (the part
    // that aggregates/shuffles) only sees typed scalar metadata
    assert(!decoded.schema.exists(_.dataType.typeName == "binary"),
      s"decode output leaks binary: ${decoded.schema.treeString}")
    val agg = decoded.toDF().groupBy("modality")
      .agg(count(lit(1)).as("n"), sum("byte_len").as("bytes"))
    assert(agg.collect().map(_.getLong(1)).sum == 500)
  }
}
