package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The decode step is a clearly-marked deterministic STUB (this container
  * has no image/audio codecs); everything around it — the schema, the
  * partition-batched execution shape, the typed output — is the real
  * Spark-side design. On a cluster the stub body is replaced by a JNI/
  * native decoder call; `mapPartitions` is chosen over a per-row UDF so
  * the decoder can amortize model/codec initialization once per partition
  * batch, the same shape `mapInPandas` gives Python pipelines.
  */
object Multimodal {

  /** An asset row: opaque payload + source metadata. */
  final case class Asset(
      asset_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Typed decode output. For images w×h; for audio/video duration frames. */
  final case class DecodedMeta(
      asset_id: Long,
      modality: String,
      byte_len: Long,
      sha16: String,
      width: Int,
      height: Int,
      n_frames: Int,
      ok: Boolean)

  /** Build an asset table from the documents corpus (payload = text bytes;
    * the pipeline treats it as opaque binary from here on). */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        when(col("n_chars") % 3 === 0, "image")
          .when(col("n_chars") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .as[Asset]
  }

  /** ======== DECODE STUB ========
    * Deterministic fake decoder: derives dimensions/frame counts from the
    * payload digest. Replace with a real codec (JNI) in production; the
    * signature — a partition iterator in, typed metadata out — is the
    * production contract. */
  private[ops] def decodeStub(assets: Iterator[Asset]): Iterator[DecodedMeta] = {
    // per-partition init happens HERE, once (codec contexts, model load)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    assets.map { a =>
      digest.reset()
      val sha = digest.digest(a.payload)
      val sha16 = sha.take(8).map(b => f"$b%02x").mkString
      val h = java.nio.ByteBuffer.wrap(sha, 0, 8).getLong
      DecodedMeta(
        asset_id = a.asset_id,
        modality = a.modality,
        byte_len = a.payload.length.toLong,
        sha16 = sha16,
        width = 64 + (Math.floorMod(h, 512L)).toInt,
        height = 64 + (Math.floorMod(h >>> 16, 512L)).toInt,
        n_frames = if (a.modality == "image") 1
          else 1 + (Math.floorMod(h >>> 32, 240L)).toInt,
        ok = a.payload.nonEmpty)
    }
  }

  /** Decode/feature-extract over partition batches. Partition count is
    * preserved from the input (at scale: repartition upstream so each
    * batch fits decoder memory; payloads never shuffle here). */
  def decode(assets: Dataset[Asset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(decodeStub _)
  }

  /** Typed metadata frame joined back to asset identity — the table a
    * training-data pipeline filters/groups on (no payload column: metadata
    * queries must never drag binary blobs through a shuffle). */
  def metadataTable(spark: SparkSession, dir: String): DataFrame =
    decode(assetsFromDocuments(spark, dir)).toDF()

  /** Frame sampling: one row per sampled frame index (stride `stride`)
    * per multi-frame asset, plus thumbnail resize targets preserving
    * aspect ratio. Runs on metadata only — frame extraction itself would
    * consume (asset_id, frame_idx) work units against the binary store,
    * so the expensive decode fan-out is planned relationally first. */
  def frameSample(meta: DataFrame, stride: Int, thumbWidth: Int): DataFrame =
    meta.select(col("asset_id"), col("modality"), col("width"), col("height"),
        explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_idx"))
      .withColumn("thumb_w", lit(thumbWidth))
      .withColumn("thumb_h", expr(s"(height * $thumbWidth) div width"))
}
