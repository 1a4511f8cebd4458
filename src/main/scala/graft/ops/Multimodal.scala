package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * Image decode is REAL in two formats: the synthetic image payloads
  * are well-formed PNG prefixes (signature + IHDR chunk, per RFC 2083 /
  * W3C PNG) and JPEG prefixes (SOI + APP0 + SOF0 marker stream, per ITU
  * T.81/JFIF), and [[decode]] parses width/height back out of the bytes
  * — for JPEG by walking the marker segments — with the m1 oracle
  * grading the parsed geometry against the construction formula
  * computed independently by DuckDB. Audio decode is real for
  * canonical WAV (RIFF chunk walk, little-endian PCM fmt — the
  * uncompressed format's metadata needs no codec). Compressed audio
  * and all video have no codec in this container, so decode reports
  * them honestly as not-decoded (`ok = false`, zero dims); on a
  * cluster the same partition-batched seam hosts the real codec call.
  * `mapPartitions` is chosen over a per-row UDF so a decoder can
  * amortize codec/model initialization once per partition batch, the
  * same shape `mapInPandas` gives Python pipelines.
  */
object Multimodal {

  /** An asset row: opaque payload + source metadata. */
  final case class Asset(
      asset_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Typed decode output, flattened across modalities: for images
    * width×height with n_frames = 1; for audio `width` carries the
    * sample rate (Hz), `height` the channel count, and `n_frames` the
    * PCM frame count. `ok = false` marks payloads no available codec
    * could decode (dims/frames zeroed). */
  final case class DecodedMeta(
      asset_id: Long,
      modality: String,
      byte_len: Long,
      sha16: String,
      width: Int,
      height: Int,
      n_frames: Int,
      ok: Boolean)

  /** PNG signature + IHDR layout (public spec): 8 signature bytes, then
    * the IHDR chunk = 4-byte length (13), "IHDR", 4-byte big-endian
    * width, 4-byte big-endian height, bit depth 8, color type 6 (RGBA),
    * compression/filter/interlace 0, 4-byte CRC. 33 bytes total. */
  private val PngSignature = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A,
    0x1A, 0x0A).map(_.toByte)
  private[ops] val PngHeaderLen = 33

  /** JPEG header layout (public JPEG/JFIF spec, ITU T.81 §B): SOI
    * (FFD8), an APP0 JFIF segment (FFE0, length 16), then SOF0 (FFC0,
    * length 17 for 3 components: precision 8, HEIGHT then WIDTH —
    * height-first, the reverse of PNG — 3 component specs). 39 bytes
    * total before the entropy stream stand-in. */
  private[ops] val JpegHeaderLen = 39

  /** Canonical WAV header (public RIFF/WAVE spec): "RIFF" + size +
    * "WAVE", a 16-byte PCM "fmt " chunk (format 1, channels, sample
    * rate, byte rate, block align, 16 bits), then the "data" chunk
    * header. 44 bytes; all integer fields LITTLE-endian (RIFF), the
    * reverse of PNG/JPEG network order. */
  private[ops] val WavHeaderLen = 44

  /** Minimal-but-complete MP4 (ISO BMFF, the public ISO/IEC 14496-12
    * layout): `ftyp`(16) + `moov` { `mvhd` v0 (108: timescale 25,
    * duration = frame ticks) + `trak` { `tkhd` v0 (92: width/height as
    * 16.16 fixed point) + `mdia` { `mdhd`(32) + `minf` { `stbl` — a
    * REAL sample table: `stsd`(16) + `stts`(24: n samples × delta 1) +
    * `stsc`(28: one chunk holds all samples) + `stsz`(20 + 4n:
    * per-sample sizes — the text bytes split into n near-equal runs,
    * base = len div n plus one extra byte for the first len mod n
    * samples) + `stco`(20: the absolute payload offset) } } } } + the
    * 8-byte `mdat` header. Header length is therefore VARIABLE:
    * [[mp4HeaderLen]](frames) = 404 + 4·frames bytes before the sample
    * stream (mdat header included, like the old fixed 240); box
    * sizes/fields big-endian. */
  private[ops] def mp4HeaderLen(frames: Long): Long = 404L + 4L * frames

  /** Build an asset table from the documents corpus. Image payloads are
    * REAL bytes in two formats — even doc_ids get PNG (signature +
    * IHDR), odd doc_ids get JPEG (SOI + APP0 JFIF + SOF0) — with
    * width = 64 + byte_len % 512, height = 64 + n_chars % 512 encoded
    * per each spec (PNG width-first 4-byte, JPEG height-first 2-byte),
    * followed by the text bytes standing in for the compressed stream —
    * so decoding the header is genuine byte-level parsing (for JPEG, a
    * marker-stream walk past APP0) whose result an oracle can predict
    * from the document columns. Audio payloads are REAL canonical WAV
    * bytes (RIFF/WAVE + PCM fmt chunk, little-endian, sample rate
    * 8000·(1 + doc_id%3), channels 1 + doc_id%2, text bytes as the PCM
    * body); video stays opaque text bytes. Construction is a pure
    * codegen projection (hex/unhex). */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    val w = (lit(64) + octet_length(col("text")) % 512).cast("int")
    val h = (lit(64) + col("n_chars") % 512).cast("int")
    val png = concat(
      // signature ++ IHDR length (13) ++ "IHDR"
      unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      unhex(lpad(hex(w), 8, "0")),
      unhex(lpad(hex(h), 8, "0")),
      // bit depth 8, RGBA, compression 0, filter 0, interlace 0 + CRC
      // (zeroed: header consumers parse, they don't checksum)
      unhex(lit("0806000000" + "00000000")),
      col("text").cast("binary"))
    val jpeg = concat(
      // SOI ++ APP0 (len 16, "JFIF\0", v1.1, no units/thumbnail) — a
      // segment the decoder must WALK PAST to find SOF0
      unhex(lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" +
        "00" + "0001" + "0001" + "0000")),
      // SOF0: len 17, precision 8, then HEIGHT before WIDTH (T.81 §B.2.2)
      unhex(lit("FFC0" + "0011" + "08")),
      unhex(lpad(hex(h), 4, "0")),
      unhex(lpad(hex(w), 4, "0")),
      // 3 components: id, 1x1 sampling, quant table 0/1/1
      unhex(lit("03" + "011100" + "021101" + "031101")),
      col("text").cast("binary"))
    // n-byte LITTLE-endian hex of a (non-negative) integer column —
    // RIFF integer fields are LE, so hex() output is byte-reversed
    def leHex(v: Column, nBytes: Int): Column =
      concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(v.cast("long"), 8 * i) % 256), 2, "0")): _*)
    val dataLen = octet_length(col("text")).cast("long")
    val sr = (lit(8000L) * (lit(1) + col("doc_id") % 3)).cast("long")
    val ch = (lit(1L) + col("doc_id") % 2).cast("long")
    val wav = unhex(concat(
      lit("52494646"), leHex(dataLen + 36L, 4), lit("57415645"), // RIFF/WAVE
      lit("666D7420"), leHex(lit(16L), 4), leHex(lit(1L), 2),    // fmt, PCM
      leHex(ch, 2), leHex(sr, 4),
      leHex(sr * ch * 2L, 4), leHex(ch * 2L, 2), leHex(lit(16L), 2),
      lit("64617461"), leHex(dataLen, 4),                        // data hdr
      hex(col("text").cast("binary"))))
    // n-byte BIG-endian hex (ISO BMFF box fields)
    def beHex(v: Column, nBytes: Int): Column =
      lpad(hex(v.cast("long")), 2 * nBytes, "0")
    val frames = (lit(1L) + col("n_chars") % 240).cast("long")
    val unityMatrix = "00010000" + "00000000" * 3 + "00010000" +
      "00000000" * 3 + "40000000"
    // per-sample sizes: text bytes split into `frames` near-equal runs
    // (base = len div n, first len mod n samples get one extra byte) —
    // the rule the m5 oracle re-derives in SQL
    val stszEntries = expr(
      "array_join(transform(sequence(0L, CAST(n_chars % 240 AS BIGINT)), " +
        "i -> lpad(hex((CAST(octet_length(text) AS BIGINT) div " +
        "(1 + n_chars % 240)) + (CASE WHEN i < " +
        "CAST(octet_length(text) AS BIGINT) % (1 + n_chars % 240) " +
        "THEN 1 ELSE 0 END)), 8, '0')), '')")
    val mp4 = unhex(concat(
      lit("00000010" + "66747970" + "69736F6D" + "00000000"), // ftyp isom
      beHex(frames * 4L + 380L, 4), lit("6D6F6F76"),          // moov
      lit("0000006C" + "6D766864" + "00000000" +              // mvhd v0
        "00000000" * 2 + "00000019"),                         // timescale 25
      beHex(frames, 4),                                       // duration
      lit("00010000" + "0100" + "0000" + "00000000" * 2 +
        unityMatrix + "00000000" * 6 + "00000002"),
      beHex(frames * 4L + 264L, 4), lit("7472616B"),          // trak
      lit("0000005C" + "746B6864" + "00000007" +              // tkhd v0
        "00000000" * 2 + "00000001" + "00000000"),            // track 1
      beHex(frames, 4),                                       // duration
      lit("00000000" * 2 + "0000" * 4 + unityMatrix),
      beHex(w, 2), lit("0000"), beHex(h, 2), lit("0000"),     // 16.16 dims
      beHex(frames * 4L + 164L, 4), lit("6D646961"),          // mdia
      lit("00000020" + "6D646864" + "00000000" +              // mdhd v0
        "00000000" * 2 + "00000019"),                         // timescale 25
      beHex(frames, 4), lit("55C40000"),                      // dur, 'und'
      beHex(frames * 4L + 124L, 4), lit("6D696E66"),          // minf
      beHex(frames * 4L + 116L, 4), lit("7374626C"),          // stbl
      lit("00000010" + "73747364" + "00000000" + "00000000"), // stsd, 0
      lit("00000018" + "73747473" + "00000000" + "00000001"), // stts, 1
      beHex(frames, 4), lit("00000001"),                      // n × delta 1
      lit("0000001C" + "73747363" + "00000000" + "00000001" + // stsc, 1
        "00000001"),                                          // first chunk
      beHex(frames, 4), lit("00000001"),                      // all samples
      beHex(frames * 4L + 20L, 4),                            // stsz
      lit("7374737A" + "00000000" + "00000000"),              // per-entry
      beHex(frames, 4), stszEntries,
      lit("00000014" + "7374636F" + "00000000" + "00000001"), // stco, 1
      beHex(frames * 4L + 404L, 4),                           // payload off
      beHex(dataLen + 8L, 4), lit("6D646174"),                // mdat
      hex(col("text").cast("binary"))))
    graft.Tables.load(spark, dir, "documents")
      .withColumn("modality",
        when(col("n_chars") % 3 === 0, "image")
          .when(col("n_chars") % 3 === 1, "audio")
          .otherwise("video"))
      .select(col("doc_id").as("asset_id"), col("modality"),
        when(col("modality") === "image",
          when(col("doc_id") % 2 === 0, png).otherwise(jpeg))
          .when(col("modality") === "audio", wav)
          .otherwise(mp4).as("payload"),
        col("source"))
      .as[Asset]
  }

  /** PPM (P6) payloads for the image-modality docs — the UNCOMPRESSED
    * image format whose pixel data needs no codec, so the decode seam
    * reaches actual pixels (the image twin of the WAV-PCM path, m3).
    * Header is ASCII per the public Netpbm spec: "P6", whitespace,
    * width, height, maxval (255), one whitespace, then raw RGB byte
    * triples row-major. Width varies by doc (4 + 2·(doc_id % 5), so the
    * ASCII parse sees multi-digit dims), height = as many full rows as
    * the text bytes fill; the pixel body is the first 3·w·h bytes of
    * the UTF-8 text — a pure codegen projection the oracle reproduces
    * byte-for-byte from the documents table. Docs too short for one
    * full row carry no decodable image and are excluded (the oracle
    * applies the same floor). */
  def ppmAssetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    val w = (lit(4) + (col("doc_id") % 5) * 2).cast("int")
    val h = (octet_length(col("text")) / (lit(3) * w)).cast("int")
    graft.Tables.load(spark, dir, "documents")
      .filter(col("n_chars") % 3 === 0)
      .withColumn("w", w).withColumn("h", h)
      .filter(col("h") >= 1)
      .select(col("doc_id").as("asset_id"), lit("image").as("modality"),
        concat(
          concat(lit("P6\n"), col("w").cast("string"), lit(" "),
            col("h").cast("string"), lit("\n255\n")).cast("binary"),
          col("text").cast("binary")
            .substr(lit(1), lit(3) * col("w") * col("h"))).as("payload"),
        col("source"))
      .as[Asset]
  }

  /** Parses a P6 PPM header per the public Netpbm spec: magic "P6",
    * then three whitespace-separated ASCII integers (width, height,
    * maxval) — `#` comment lines allowed anywhere whitespace is — and
    * exactly ONE whitespace byte before the raster. Returns
    * (width, height, maxval, rasterOffset). */
  private[ops] def parsePpmHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p.length < 2 || p(0) != 'P' || p(1) != '6') return None
    var i = 2
    def skipWs(): Boolean = {
      var saw = false
      var more = true
      while (more && i < p.length) {
        val c = p(i)
        if (c == ' ' || c == '\n' || c == '\r' || c == '\t') { i += 1; saw = true }
        else if (c == '#') { // comment runs to end of line
          while (i < p.length && p(i) != '\n') i += 1
          saw = true
        } else more = false
      }
      saw
    }
    def int(): Option[Int] = {
      var v = 0L; var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      _ <- if (skipWs()) Some(()) else None
      w <- int(); _ <- if (skipWs()) Some(()) else None
      h <- int(); _ <- if (skipWs()) Some(()) else None
      m <- int()
      // exactly one whitespace byte separates maxval from the raster
      _ <- if (i < p.length && (p(i) == '\n' || p(i) == ' ' ||
        p(i) == '\r' || p(i) == '\t')) Some(()) else None
    } yield { i += 1; (w, h, m, i) }
  }

  /** Parses PNG dimensions from raw bytes: signature check, IHDR tag
    * check, big-endian width/height at offsets 16/20. Pure public-spec
    * parsing — no codec library involved. */
  private[ops] def parsePngDims(p: Array[Byte]): Option[(Int, Int)] =
    if (p.length >= 24 &&
        java.util.Arrays.equals(p, 0, 8, PngSignature, 0, 8) &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      val bb = java.nio.ByteBuffer.wrap(p, 16, 8)
      Some((bb.getInt, bb.getInt))
    } else None

  /** Parses canonical-WAV audio metadata by walking RIFF chunks: "RIFF"
    * + "WAVE" magic, then [id(4)][size(4 LE)] chunks — "fmt " yields
    * channels / sample rate / block align, "data" yields the PCM body.
    * All integers LITTLE-endian per the RIFF spec. Returns
    * (sampleRate, channels, pcmFrames, dataOffset). */
  private[ops] def parseWavMeta(p: Array[Byte]): Option[(Int, Int, Long, Int)] = {
    def u16(i: Int): Int = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long = (0 until 4).map(k => (p(i + k) & 0xFFL) << (8 * k)).sum
    def tag(i: Int, t: String): Boolean =
      t.zipWithIndex.forall { case (c, k) => p(i + k) == c.toByte }
    if (p.length < WavHeaderLen || !tag(0, "RIFF") || !tag(8, "WAVE"))
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, blockAlign
    var data: Option[(Int, Long)] = None    // offset, size
    while (i + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val size = u32(i + 4)
      if (tag(i, "fmt ") && i + 8 + 16 <= p.length)
        fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 20)))
      else if (tag(i, "data"))
        data = Some((i + 8, math.min(size, (p.length - i - 8).toLong)))
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    for ((ch, rate, ba) <- fmt; (off, len) <- data if ba > 0)
      yield (rate, ch, len / ba, off)
  }

  /** Parses JPEG dimensions by walking the marker stream (ITU T.81
    * §B.1.1.2): SOI, then segments skipped by their 2-byte big-endian
    * lengths until a start-of-frame marker (FFC0-FFCF minus the
    * non-frame C4/C8/CC), whose payload is [len][precision][height]
    * [width] — height FIRST. Pure public-spec parsing; returns
    * (width, height, offset of the first post-SOF byte) so the caller
    * can digest the content body. */
  private[ops] def parseJpegDims(p: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    var i = 2
    while (i + 3 < p.length && u8(i) == 0xFF) {
      val marker = u8(i + 1)
      val isSof = marker >= 0xC0 && marker <= 0xCF &&
        marker != 0xC4 && marker != 0xC8 && marker != 0xCC
      if (isSof) {
        // [FF Cn][len][precision][height][width]
        return if (i + 8 < p.length)
          Some((u16(i + 7), u16(i + 5), i + 2 + u16(i + 2)))
        else None
      }
      i += 2 + u16(i + 2) // skip this segment by its declared length
    }
    None
  }

  /** Parses MP4 video metadata by walking the ISO BMFF box tree
    * (public ISO/IEC 14496-12 layout): big-endian [size][type] boxes,
    * `moov` > `mvhd` for the duration in timescale ticks (constructed
    * at 1 tick = 1 frame), `moov` > `trak` > `tkhd` for width/height
    * as 16.16 fixed point, `mdat` for the sample body. Returns
    * (width, height, frames, dataOffset). */
  private[ops] def parseMp4Meta(p: Array[Byte]): Option[(Int, Int, Long, Int)] = {
    def u32(i: Int): Long =
      (0 until 4).map(k => (p(i + k) & 0xFFL) << (8 * (3 - k))).sum
    def tag(i: Int, t: String): Boolean =
      t.zipWithIndex.forall { case (c, k) => p(i + k) == c.toByte }
    if (p.length < 16 || !tag(4, "ftyp")) return None
    // first box named `name` in [from, to): (payload offset, box end)
    def findBox(from: Int, to: Int, name: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= to) {
        val size = u32(i)
        if (size < 8) return None // malformed: would loop forever
        if (tag(i + 4, name))
          return Some((i + 8, math.min(i + size, to.toLong).toInt))
        i += size.toInt
      }
      None
    }
    for {
      (moov, moovEnd) <- findBox(0, p.length, "moov")
      (mvhd, mvhdEnd) <- findBox(moov, moovEnd, "mvhd")
      (trak, trakEnd) <- findBox(moov, moovEnd, "trak")
      (tkhd, tkhdEnd) <- findBox(trak, trakEnd, "tkhd")
      (mdat, _) <- findBox(0, p.length, "mdat")
      if mvhdEnd >= mvhd + 20 && tkhdEnd >= tkhd + 84
    } yield ((u32(tkhd + 76) >> 16).toInt, (u32(tkhd + 80) >> 16).toInt,
      u32(mvhd + 16), mdat)
  }

  /** Per-partition decoder: PNG and JPEG headers parse for real;
    * payloads with no available codec return `ok = false` with zero
    * dims. `sha16` is the digest of the content body (the bytes after
    * the parsed header — where a production decoder would read IDAT /
    * the entropy stream; for undecoded payloads, the whole payload). Codec/digest state initializes once
    * per partition batch. */
  private[ops] def decodePartition(
      assets: Iterator[Asset]): Iterator[DecodedMeta] = {
    // per-partition init happens HERE, once (codec contexts, model load)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    def sha16(bytes: Array[Byte], from: Int): String = {
      digest.reset()
      digest.update(bytes, from, bytes.length - from)
      digest.digest().take(8).map(b => f"$b%02x").mkString
    }
    assets.map { a =>
      val parsed = parsePngDims(a.payload)
        .map { case (w, h) => (w, h, 1L, PngHeaderLen) }
        .orElse(parseJpegDims(a.payload)
          .map { case (w, h, off) => (w, h, 1L, off) })
        .orElse(parsePpmHeader(a.payload)
          .map { case (w, h, _, off) => (w, h, 1L, off) })
        .orElse(parseWavMeta(a.payload)
          // audio flattening: width carries the sample rate (Hz),
          // height the channel count, n_frames the PCM frame count
          .map { case (rate, ch, frames, off) => (rate, ch, frames, off) })
        .orElse(parseMp4Meta(a.payload))
      parsed match {
        case Some((w, h, frames, bodyFrom)) =>
          DecodedMeta(a.asset_id, a.modality, a.payload.length.toLong,
            sha16(a.payload, bodyFrom), w, h, frames.toInt, ok = true)
        case None =>
          DecodedMeta(a.asset_id, a.modality, a.payload.length.toLong,
            sha16(a.payload, 0), width = 0, height = 0, n_frames = 0,
            ok = false)
      }
    }
  }

  /** Decode/feature-extract over partition batches. Partition count is
    * preserved from the input (at scale: repartition upstream so each
    * batch fits decoder memory; payloads never shuffle here). */
  def decode(assets: Dataset[Asset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(decodePartition _)
  }

  /** Per-asset statistics over DECODED audio content — not container
    * geometry: every 16-bit little-endian PCM sample in the WAV data
    * chunk is read and folded. */
  final case class PcmStats(
      asset_id: Long,
      n_samples: Long,
      sum_abs: Long,
      sum_sq: Long,
      peak: Long)

  /** Decode actual PCM samples (WAV, 16-bit LE — pure public RIFF spec)
    * and reduce each asset to exact integer statistics: sample count,
    * Σ|s|, Σs² (the RMS numerator, kept integral so an oracle can match
    * it bit-for-bit) and peak |s|. This is the second layer of the
    * decode seam: [[parseWavMeta]] walks the container, THIS walks the
    * samples — same mapPartitions placement (per-partition decoder
    * state, payloads never shuffle, output is |assets| tiny rows).
    * Assets that are not parseable WAV, or whose data chunk holds less
    * than one full frame, are skipped (they have no decodable content).
    */
  def decodePcm(assets: Dataset[Asset]): Dataset[PcmStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      parseWavMeta(a.payload).flatMap { case (_, ch, frames, off) =>
        val n = (frames * ch).toInt // samples across all channels
        if (n <= 0) None
        else {
          var j = 0; var sumAbs = 0L; var sumSq = 0L; var peak = 0L
          while (j < n) {
            val lo = a.payload(off + 2 * j) & 0xFF
            val hi = a.payload(off + 2 * j + 1) & 0xFF
            val s = ((hi << 8) | lo).toShort.toLong // signed 16-bit
            val abs = math.abs(s)
            sumAbs += abs; sumSq += s * s
            if (abs > peak) peak = abs
            j += 1
          }
          Some(PcmStats(a.asset_id, n.toLong, sumAbs, sumSq, peak))
        }
      }
    })
  }

  /** One fixed-length PCM analysis frame: `sum_abs` is the frame's
    * integer energy (Σ|s| over `frameLen` samples). */
  final case class PcmFrame(
      asset_id: Long,
      frame_idx: Long,
      sum_abs: Long)

  /** Decode PCM and reduce to per-FRAME energies (frames of `frameLen`
    * samples; the trailing partial frame is dropped — every emitted
    * frame is exactly `frameLen` samples, so frame statistics compare
    * across assets). Same mapPartitions decode seam as [[decodePcm]]:
    * payloads never shuffle, ~samples/frameLen tiny rows come out per
    * asset — the granularity a VAD / diarization stage consumes. */
  def pcmFrameEnergy(assets: Dataset[Asset], frameLen: Int): Dataset[PcmFrame] = {
    import assets.sparkSession.implicits._
    require(frameLen > 0, "pcmFrameEnergy: frameLen must be positive")
    assets.mapPartitions(_.flatMap { a =>
      parseWavMeta(a.payload).toSeq.flatMap { case (_, ch, frames, off) =>
        val n = (frames * ch).toInt // raw sample stream, channels interleaved
        val full = if (n > 0) n / frameLen else 0
        (0 until full).map { f =>
          var j = f * frameLen
          val end = j + frameLen
          var s = 0L
          while (j < end) {
            val lo = a.payload(off + 2 * j) & 0xFF
            val hi = a.payload(off + 2 * j + 1) & 0xFF
            s += math.abs(((hi << 8) | lo).toShort.toLong)
            j += 1
          }
          PcmFrame(a.asset_id, f.toLong, s)
        }
      }
    })
  }

  /** Energy-threshold activity segmentation over [[pcmFrameEnergy]]
    * frames — the VAD step that turns raw audio into trainable speech
    * segments. A frame is ACTIVE iff its energy strictly exceeds the
    * asset mean (`e·n_frames > Σe` — exact-integer form, no division);
    * consecutive active frames merge into segments via the
    * gaps-and-islands identity (frame_idx − active_rank is constant
    * within a run). Emits one row per asset: frame/energy totals plus
    * segment count, active-frame count and longest run (0s when no
    * frame clears the mean, e.g. constant energy).
    *
    * Scale shape: everything is keyed by asset_id — ONE hash exchange,
    * then windows and aggregates run inside it (frames per asset are
    * bounded by payload size / frameLen, so per-key state is small);
    * the left join back is |assets|-vs-|assets| on the same key. */
  def vadSegments(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byAsset = Window.partitionBy(col("asset_id"))
    val wf = frames
      .withColumn("__nf", count(lit(1)).over(byAsset))
      .withColumn("__tot", sum(col("sum_abs")).over(byAsset))
    val segs = wf
      .filter(col("sum_abs") * col("__nf") > col("__tot"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("asset_id"))
          .orderBy(col("frame_idx"))))
      .withColumn("__sid", col("frame_idx") - col("__rn"))
      .groupBy("asset_id", "__sid")
      .agg(count(lit(1)).as("len"))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("__nseg"), sum("len").as("__nact"),
        max("len").as("__longest"))
    wf.groupBy("asset_id")
      .agg(max("__nf").as("n_frames"), max("__tot").as("sum_abs"))
      .join(segs, Seq("asset_id"), "left")
      .select(col("asset_id"), col("n_frames"), col("sum_abs"),
        coalesce(col("__nact"), lit(0L)).as("n_active"),
        coalesce(col("__nseg"), lit(0L)).as("n_segments"),
        coalesce(col("__longest"), lit(0L)).as("longest_seg"))
  }

  /** One full p×p patch of the decoded raster with its exact integer
    * BT.601 luma sum (scaled ×1000, like [[PixelStats.sum_luma]]). */
  final case class PixelPatch(
      asset_id: Long,
      px: Int,
      py: Int,
      sum_luma: Long)

  /** Decode pixels and reduce to a ViT-style patch grid: the raster is
    * cut into non-overlapping p×p patches (partial edge patches
    * dropped — a patch embedder needs constant shape) and each patch
    * reduces to its exact integer luma mass. Same decode-seam
    * placement as [[decodePixels]]; output is (w/p)·(h/p) tiny rows
    * per asset — the tensor-shaped metadata a patchifying trainer
    * consumes, with the payload left where it is. */
  def patchLuma(assets: Dataset[Asset], p: Int): Dataset[PixelPatch] = {
    import assets.sparkSession.implicits._
    require(p > 0, "patchLuma: patch size must be positive")
    assets.mapPartitions(_.flatMap { a =>
      parsePpmHeader(a.payload).toSeq.flatMap { case (w, h, _, off) =>
        if (w < p || h < p || a.payload.length - off < 3 * w * h) Seq.empty
        else for (py <- 0 until h / p; px <- 0 until w / p) yield {
          var s = 0L
          var y = py * p
          while (y < (py + 1) * p) {
            var x = px * p
            while (x < (px + 1) * p) {
              val j = y * w + x
              s += 299L * (a.payload(off + 3 * j) & 0xFF) +
                587L * (a.payload(off + 3 * j + 1) & 0xFF) +
                114L * (a.payload(off + 3 * j + 2) & 0xFF)
              x += 1
            }
            y += 1
          }
          PixelPatch(a.asset_id, px, py, s)
        }
      }
    })
  }

  /** Parses the MP4 sample table (`moov` > `trak` > `mdia` > `minf` >
    * `stbl`): per-sample byte sizes from `stsz`, the chunk's absolute
    * payload offset from `stco`, and the declared sample count from
    * `stts` — returning (sizes, chunkOffset) only when the three boxes
    * agree and the samples fit inside the payload. This is the layer a
    * real frame extractor needs: tkhd tells you WHAT the video looks
    * like, the sample table tells you WHERE each frame's bytes are. */
  private[ops] def parseMp4Samples(p: Array[Byte]): Option[(Array[Long], Long)] = {
    def u32(i: Int): Long =
      (0 until 4).map(k => (p(i + k) & 0xFFL) << (8 * (3 - k))).sum
    def tag(i: Int, t: String): Boolean =
      t.zipWithIndex.forall { case (c, k) => p(i + k) == c.toByte }
    if (p.length < 16 || !tag(4, "ftyp")) return None
    def findBox(from: Int, to: Int, name: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= to) {
        val size = u32(i)
        if (size < 8) return None
        if (tag(i + 4, name))
          return Some((i + 8, math.min(i + size, to.toLong).toInt))
        i += size.toInt
      }
      None
    }
    for {
      (moov, moovEnd) <- findBox(0, p.length, "moov")
      (trak, trakEnd) <- findBox(moov, moovEnd, "trak")
      (mdia, mdiaEnd) <- findBox(trak, trakEnd, "mdia")
      (minf, minfEnd) <- findBox(mdia, mdiaEnd, "minf")
      (stbl, stblEnd) <- findBox(minf, minfEnd, "stbl")
      (stts, sttsEnd) <- findBox(stbl, stblEnd, "stts")
      (stsz, stszEnd) <- findBox(stbl, stblEnd, "stsz")
      (stco, stcoEnd) <- findBox(stbl, stblEnd, "stco")
      if sttsEnd >= stts + 12 && stszEnd >= stsz + 12 && stcoEnd >= stco + 12
      n = u32(stsz + 8)
      // stsz sample_size must be 0 (per-entry sizes), entries must fit,
      // stts must declare the same sample count, stco exactly one chunk
      if u32(stsz + 4) == 0 && stszEnd >= stsz + 12 + 4 * n &&
        u32(stts + 4) == 1 && u32(stts + 8) == n && u32(stco + 4) == 1
      sizes = Array.tabulate(n.toInt)(i => u32(stsz + 12 + 4 * i))
      off = u32(stco + 8)
      if off + sizes.sum <= p.length
    } yield (sizes, off)
  }

  /** Per-asset facts read back from the MP4 SAMPLE TABLE — the third
    * layer of the decode seam for video: container geometry (m1),
    * frame-index arithmetic (m2), and now the actual per-frame byte
    * map. `mid_md5` digests the bytes of the middle sample located
    * purely through stsz/stco — a wrong size or offset anywhere in the
    * table shifts the byte window and breaks the hash. */
  final case class SampleStats(
      asset_id: Long,
      n_samples: Long,
      sum_bytes: Long,
      chunk_offset: Long,
      max_sample: Long,
      mid_md5: String)

  /** Walk each video asset's sample table and reduce it to exact
    * integers plus the middle sample's digest. Same mapPartitions
    * placement as [[decodePcm]]/[[decodePixels]] (per-partition digest
    * state, payloads never shuffle, |assets| tiny rows out). Assets
    * whose sample table is absent or inconsistent are skipped. */
  def videoSampleStats(assets: Dataset[Asset]): Dataset[SampleStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { a =>
        parseMp4Samples(a.payload).map { case (sizes, off) =>
          val mid = sizes.length / 2
          val mstart = off + sizes.take(mid).sum
          md.reset()
          md.update(a.payload, mstart.toInt, sizes(mid).toInt)
          val hex = md.digest().map("%02x".format(_)).mkString
          SampleStats(a.asset_id, sizes.length.toLong, sizes.sum,
            off, if (sizes.isEmpty) 0L else sizes.max, hex)
        }
      }
    }
  }

  /** Per-asset statistics over DECODED image content — actual RGB
    * pixels, not container geometry. All sums are exact integers so an
    * oracle matches bit-for-bit; `sum_luma` uses the integer ITU-R
    * BT.601 weights (299·R + 587·G + 114·B, i.e. luma·1000). */
  final case class PixelStats(
      asset_id: Long,
      width: Long,
      height: Long,
      n_pixels: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      sum_luma: Long)

  /** Decode actual pixels (P6 PPM — pure public Netpbm spec) and reduce
    * each asset to exact integer channel statistics. The image twin of
    * [[decodePcm]]: [[parsePpmHeader]] walks the ASCII header, THIS
    * walks the RGB raster — same mapPartitions placement (per-partition
    * decoder state, payloads never shuffle, output is |assets| tiny
    * rows). Assets that are not parseable P6, or whose raster holds
    * less than the declared w·h triples, are skipped (no fully
    * decodable image). */
  def decodePixels(assets: Dataset[Asset]): Dataset[PixelStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      parsePpmHeader(a.payload).flatMap { case (w, h, _, off) =>
        val n = w * h
        if (n <= 0 || a.payload.length - off < 3 * n) None
        else {
          var j = 0; var sr = 0L; var sg = 0L; var sb = 0L
          while (j < n) {
            sr += a.payload(off + 3 * j) & 0xFF
            sg += a.payload(off + 3 * j + 1) & 0xFF
            sb += a.payload(off + 3 * j + 2) & 0xFF
            j += 1
          }
          Some(PixelStats(a.asset_id, w.toLong, h.toLong, n.toLong,
            sr, sg, sb, 299L * sr + 587L * sg + 114L * sb))
        }
      }
    })
  }

  /** Perceptual image hash output: 64-bit dHash split into two
    * non-negative 32-bit halves (bit 63 would wrap a single BIGINT
    * negative and complicate every oracle comparison). */
  final case class ImageHash(
      asset_id: Long,
      width: Long,
      height: Long,
      dhash_hi: Long,
      dhash_lo: Long)

  /** Difference hash (dHash) over DECODED pixels — perceptual near-dup
    * detection for the image modality, the content-space analog of
    * simhash for text: resize to a 9×8 grid by nearest-neighbor
    * (source pixel (r·h div 8, c·w div 9) — pure integer index math,
    * no filtering kernel, so an oracle replays it exactly), take the
    * integer BT.601 luma of each cell, and emit one bit per
    * horizontally adjacent pair (left brighter than right). Identical
    * rasters collide exactly; small edits flip few bits, so banded
    * near-dup joins (the simhash machinery) apply unchanged to the
    * (hi, lo) halves. Same mapPartitions seam as the other decoders;
    * assets without a full declared raster are skipped. */
  def imageDHash(assets: Dataset[Asset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      parsePpmHeader(a.payload).flatMap { case (w, h, _, off) =>
        if (w <= 0 || h <= 0 || a.payload.length - off < 3 * w * h) None
        else {
          def gray(r: Int, c: Int): Long = {
            val p = off + 3 * ((r * h / 8) * w + (c * w / 9))
            299L * (a.payload(p) & 0xFF) +
              587L * (a.payload(p + 1) & 0xFF) +
              114L * (a.payload(p + 2) & 0xFF)
          }
          var hi = 0L; var lo = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (gray(r, c) > gray(r, c + 1)) {
                val k = r * 8 + c
                if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
              }
              c += 1
            }
            r += 1
          }
          Some(ImageHash(a.asset_id, w.toLong, h.toLong, hi, lo))
        }
      }
    })
  }

  /** Acoustic fingerprint over DECODED PCM — the audio member of the
    * perceptual family (text simhash / image dHash / THIS): the sample
    * stream folds into 64 energy bins (Σ|s| per contiguous time slice,
    * slice of sample j = j·64 div n — integer index math an oracle
    * replays exactly), and each of the 63 adjacent bin pairs emits one
    * sign-of-delta bit — the energy-envelope shape, robust to volume
    * scaling direction and croppable into the banded near-dup
    * machinery like the other two. Same mapPartitions seam as
    * [[decodePcm]]; assets without a full frame are skipped. */
  final case class AudioFingerprint(
      asset_id: Long,
      n_samples: Long,
      fp_hi: Long,
      fp_lo: Long)

  def audioFingerprint(assets: Dataset[Asset]): Dataset[AudioFingerprint] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      parseWavMeta(a.payload).flatMap { case (_, ch, frames, off) =>
        val n = (frames * ch).toInt
        if (n <= 0) None
        else {
          val bins = new Array[Long](64)
          var j = 0
          while (j < n) {
            val b0 = a.payload(off + 2 * j) & 0xFF
            val b1 = a.payload(off + 2 * j + 1) & 0xFF
            val s = ((b1 << 8) | b0).toShort.toLong
            bins((j.toLong * 64 / n).toInt) += math.abs(s)
            j += 1
          }
          var hi = 0L; var lo = 0L
          var k = 0
          while (k < 63) {
            if (bins(k) > bins(k + 1)) {
              if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
            }
            k += 1
          }
          Some(AudioFingerprint(a.asset_id, n.toLong, hi, lo))
        }
      }
    })
  }

  /** Perceptual near-dup candidate pairs over [[imageDHash]] output —
    * the banded join, d3's machinery applied to pixels: the 64-bit
    * hash splits into 8 bands of 8 bits, any two hashes within
    * Hamming distance ≤ 7 share at least one band UNCHANGED
    * (pigeonhole: 8 differing bits cannot touch all 8 bands when only
    * ≤ 7 differ), so candidates come from an EQUI-join on (band,
    * value) and the exact bit_count verify runs on candidates only.
    * Returns distinct (a, b, hamming) pairs, a < b. Scale shape:
    * hashes are 3 longs/asset — the join input is narrow regardless
    * of raster sizes, and band buckets bound the candidate volume the
    * way simhash bands do for text. */
  def imageDHashPairs(hashes: Dataset[ImageHash],
      maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"imageDHashPairs: 8 bands are pigeonhole-complete only to " +
        s"Hamming 7, got $maxHamming")
    val df = hashes.toDF()
    val banded = df.select(col("asset_id"), col("dhash_hi"),
      col("dhash_lo"), posexplode(array((0 until 8).map { k =>
        val src = if (k < 4) col("dhash_hi") else col("dhash_lo")
        shiftright(src, 8 * (k % 4)).bitwiseAND(lit(255L))
      }: _*)).as(Seq("band", "bval")))
    val l = banded.select(col("asset_id").as("a"),
      col("dhash_hi").as("ah"), col("dhash_lo").as("al"),
      col("band"), col("bval"))
    val r = banded.select(col("asset_id").as("b"),
      col("dhash_hi").as("bh"), col("dhash_lo").as("bl"),
      col("band"), col("bval"))
    l.join(r, Seq("band", "bval"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (expr("bit_count(ah ^ bh)") + expr("bit_count(al ^ bl)"))
          .cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
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
    meta.filter(col("n_frames") >= 1) // undecoded assets have no frames
      .select(col("asset_id"), col("modality"), col("width"), col("height"),
        explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_idx"))
      .withColumn("thumb_w", lit(thumbWidth))
      .withColumn("thumb_h", expr(s"(height * $thumbWidth) div width"))
}
