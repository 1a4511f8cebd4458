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

  test("parsePngDims reads IHDR geometry; rejects non-PNG bytes") {
    // hand-built 3×2 PNG header per the public spec (big-endian dims)
    val png = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',     // len 13 + tag
      0x00, 0x00, 0x00, 0x03,                          // width 3
      0x00, 0x00, 0x00, 0x02,                          // height 2
      0x08, 0x06, 0x00, 0x00, 0x00,                    // depth/color/etc
      0x00, 0x00, 0x00, 0x00                           // crc
    ).map(_.toByte)
    assert(Multimodal.parsePngDims(png).contains((3, 2)))
    // wrong signature byte, truncated buffer, wrong chunk tag
    val badSig = png.clone(); badSig(0) = 0x88.toByte
    assert(Multimodal.parsePngDims(badSig).isEmpty)
    assert(Multimodal.parsePngDims(png.take(20)).isEmpty)
    val badTag = png.clone(); badTag(12) = 'J'.toByte
    assert(Multimodal.parsePngDims(badTag).isEmpty)
    assert(Multimodal.parsePngDims(Array.empty[Byte]).isEmpty)
  }

  test("image payloads are real PNGs; decode recovers constructed geometry") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), octet_length(col("text")).as("blen"),
        col("n_chars"))
    val meta = Multimodal.metadataTable(spark, sf)
    val joined = meta.join(docs, meta("asset_id") === docs("doc_id"))
    // every image decodes ok with the formula geometry the PNG was
    // built from — recovered by byte parsing, not recomputation
    val badImg = joined.filter(col("modality") === "image" &&
      (!col("ok") || col("width") =!= (col("blen") % 512 + 64) ||
        col("height") =!= (col("n_chars") % 512 + 64) ||
        col("n_frames") =!= 1 ||
        col("byte_len") =!= col("blen") + Multimodal.PngHeaderLen)).count()
    assert(badImg == 0)
    // no codec for audio/video in this container: honestly not decoded
    val badAv = joined.filter(col("modality") =!= "image" &&
      (col("ok") || col("width") =!= 0 || col("n_frames") =!= 0)).count()
    assert(badAv == 0)
    // deterministic across runs
    val a = meta.orderBy("asset_id").collect().toSeq
    val b = Multimodal.metadataTable(spark, sf).orderBy("asset_id").collect().toSeq
    assert(a == b)
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
