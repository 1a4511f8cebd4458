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

  test("parseJpegDims walks the marker stream to SOF; rejects damage") {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xFF).toByte) ++ payload
    val sof0 = seg(0xC0, Array[Byte](8, 0x01, 0x00, 0x02, 0x58, 3) ++
      Array[Byte](1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)) // h=256, w=600
    val soi = Array(0xFF.toByte, 0xD8.toByte)
    // SOF directly after SOI
    assert(Multimodal.parseJpegDims(soi ++ sof0).map(t => (t._1, t._2))
      .contains((600, 256)))
    // two segments to walk past (APP0 + a comment), then progressive SOF2
    val app0 = seg(0xE0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val com = seg(0xFE, "not a frame header".getBytes)
    val sof2 = seg(0xC2, Array[Byte](8, 0x00, 0x40, 0x00, 0x50, 1, 1, 0x11, 0))
    assert(Multimodal.parseJpegDims(soi ++ app0 ++ com ++ sof2)
      .map(t => (t._1, t._2)).contains((80, 64)))
    // DHT (C4) must NOT be mistaken for a frame header
    val dht = seg(0xC4, Array.fill[Byte](5)(0))
    assert(Multimodal.parseJpegDims(soi ++ dht ++ sof0)
      .map(t => (t._1, t._2)).contains((600, 256)))
    // damage: no SOI, truncated before SOF payload, no SOF at all
    assert(Multimodal.parseJpegDims(sof0).isEmpty)
    assert(Multimodal.parseJpegDims((soi ++ sof0).take(8)).isEmpty)
    assert(Multimodal.parseJpegDims(soi ++ app0 ++ com).isEmpty)
    assert(Multimodal.parseJpegDims(Array.empty[Byte]).isEmpty)
  }

  test("parseWavMeta walks RIFF chunks little-endian; rejects damage") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes ++ le(payload.length, 4) ++ payload
    val fmt = chunk("fmt ", le(1, 2) ++ le(2, 2) ++ le(16000, 4) ++
      le(64000, 4) ++ le(4, 2) ++ le(16, 2)) // stereo 16 kHz, align 4
    val data = chunk("data", Array.fill[Byte](25)(7)) // 25 bytes -> 6 frames
    def wav(chunks: Array[Byte]*): Array[Byte] = {
      val body = "WAVE".getBytes ++ chunks.flatten
      "RIFF".getBytes ++ le(body.length, 4) ++ body
    }
    assert(Multimodal.parseWavMeta(wav(fmt, data))
      .contains((16000, 2, 6L, 44)))
    // an unknown chunk before fmt must be skipped by its length
    // (odd-sized: exercises word-alignment padding)
    val junk = chunk("LIST", Array.fill[Byte](7)(1)) ++ Array[Byte](0)
    assert(Multimodal.parseWavMeta(wav(junk, fmt, data))
      .map(t => (t._1, t._2, t._3)).contains((16000, 2, 6L)))
    // damage: wrong magic, truncated, missing data chunk
    val bad = wav(fmt, data); bad(0) = 'X'.toByte
    assert(Multimodal.parseWavMeta(bad).isEmpty)
    assert(Multimodal.parseWavMeta(wav(fmt, data).take(30)).isEmpty)
    assert(Multimodal.parseWavMeta(wav(fmt)).isEmpty)
  }

  test("parseMp4Meta walks the box tree big-endian; rejects damage") {
    def be(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte).toArray
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be(payload.length + 8, 4) ++ name.getBytes ++ payload
    val mvhd = box("mvhd", be(0, 4) ++ be(0, 8) ++ be(25, 4) ++ be(75, 4) ++
      Array.fill[Byte](76)(0)) // timescale 25, duration 75 ticks
    val tkhd = box("tkhd", be(7, 4) ++ be(0, 8) ++ be(1, 4) ++ be(0, 4) ++
      be(75, 4) ++ Array.fill[Byte](52)(0) ++
      be(320L << 16, 4) ++ be(180L << 16, 4)) // 320x180 in 16.16
    val ftyp = box("ftyp", "isom".getBytes ++ be(0, 4))
    val mdat = box("mdat", Array.fill[Byte](9)(3))
    // an extra leading box inside moov and an extra trak-level box must
    // be walked past by size
    val free = box("free", Array.fill[Byte](5)(0))
    val good = ftyp ++ box("moov", free ++ mvhd ++ box("trak", free ++ tkhd)) ++ mdat
    val got = Multimodal.parseMp4Meta(good)
    assert(got.map(t => (t._1, t._2, t._3)).contains((320, 180, 75L)))
    // dataOffset points at the mdat payload
    assert(got.exists { case (_, _, _, off) => good(off) == 3.toByte })
    // damage: no ftyp, truncated tkhd, zero-size box (malformed loop)
    assert(Multimodal.parseMp4Meta(mdat).isEmpty)
    val short = ftyp ++ box("moov", mvhd ++ box("trak",
      box("tkhd", be(7, 4)))) ++ mdat
    assert(Multimodal.parseMp4Meta(short).isEmpty)
    val zeroBox = ftyp ++ box("moov", be(0, 4) ++ "free".getBytes) ++ mdat
    assert(Multimodal.parseMp4Meta(zeroBox).isEmpty)
  }

  test("image payloads are real PNGs; decode recovers constructed geometry") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), octet_length(col("text")).as("blen"),
        col("n_chars"))
    val meta = Multimodal.metadataTable(spark, sf)
    val joined = meta.join(docs, meta("asset_id") === docs("doc_id"))
    // every image decodes ok with the formula geometry the header was
    // built from — recovered by byte parsing, not recomputation; even
    // ids are PNG (33-byte header), odd ids JPEG (39-byte marker stream)
    val hdrLen = when(col("doc_id") % 2 === 0,
      Multimodal.PngHeaderLen).otherwise(Multimodal.JpegHeaderLen)
    val badImg = joined.filter(col("modality") === "image" &&
      (!col("ok") || col("width") =!= (col("blen") % 512 + 64) ||
        col("height") =!= (col("n_chars") % 512 + 64) ||
        col("n_frames") =!= 1 ||
        col("byte_len") =!= col("blen") + hdrLen)).count()
    assert(badImg == 0)
    // audio is canonical WAV: sample rate / channels / PCM frames all
    // recovered from the little-endian RIFF walk
    val badAudio = joined.filter(col("modality") === "audio" &&
      (!col("ok") ||
        col("width") =!= lit(8000) * (lit(1) + col("doc_id") % 3) ||
        col("height") =!= lit(1) + col("doc_id") % 2 ||
        col("n_frames") =!=
          expr("blen div ((1 + doc_id % 2) * 2)") ||
        col("byte_len") =!= col("blen") + Multimodal.WavHeaderLen)).count()
    assert(badAudio == 0)
    // video is minimal MP4: dims from tkhd 16.16, frames from mvhd ticks
    val badVideo = joined.filter(col("modality") === "video" &&
      (!col("ok") || col("width") =!= (col("blen") % 512 + 64) ||
        col("height") =!= (col("n_chars") % 512 + 64) ||
        col("n_frames") =!= lit(1) + col("n_chars") % 240 ||
        col("byte_len") =!= col("blen") + lit(404L) +
          lit(4L) * (lit(1L) + col("n_chars") % 240))).count()
    assert(badVideo == 0)
    // unknown bytes still come back honestly undecoded
    assert(Multimodal.decodePartition(Iterator(Multimodal.Asset(
      1L, "video", "no known container here".getBytes, "s")))
      .next() == Multimodal.DecodedMeta(1L, "video", 23L,
        // sha16 of the whole payload
        java.security.MessageDigest.getInstance("SHA-256")
          .digest("no known container here".getBytes)
          .take(8).map(b => f"$b%02x").mkString,
        0, 0, 0, ok = false))
    // deterministic across runs
    val a = meta.orderBy("asset_id").collect().toSeq
    val b = Multimodal.metadataTable(spark, sf).orderBy("asset_id").collect().toSeq
    assert(a == b)
  }

  test("parsePpmHeader reads ASCII dims incl. comments; rejects damage") {
    val plain = "P6\n3 2\n255\n".getBytes ++ Array.fill[Byte](18)(9)
    assert(Multimodal.parsePpmHeader(plain).contains((3, 2, 255, 11)))
    // comments anywhere whitespace is legal; multi-digit dims; CRLF/tab
    val commented = "P6 # netpbm\n# another\n 12\t20 # w h\n65535 ".getBytes
    assert(Multimodal.parsePpmHeader(commented)
      .contains((12, 20, 65535, commented.length)))
    // damage: wrong magic, missing separator, non-numeric dim, truncated
    assert(Multimodal.parsePpmHeader("P5\n3 2\n255\n".getBytes).isEmpty)
    assert(Multimodal.parsePpmHeader("P63 2\n255\n".getBytes).isEmpty)
    assert(Multimodal.parsePpmHeader("P6\nx 2\n255\n".getBytes).isEmpty)
    assert(Multimodal.parsePpmHeader("P6\n3 2\n255".getBytes).isEmpty)
    assert(Multimodal.parsePpmHeader(Array.empty[Byte]).isEmpty)
  }

  test("PPM pixel decode recovers exact channel sums from real rasters") {
    import spark.implicits._
    // hand raster: 2×1, pixels (1,2,3) and (250, 0, 100)
    val ppm = "P6\n2 1\n255\n".getBytes ++
      Array[Byte](1, 2, 3, 250.toByte, 0, 100)
    val st = Multimodal.decodePixels(
      Seq(Multimodal.Asset(7L, "image", ppm, "s")).toDS()).collect()
    assert(st.toSeq == Seq(Multimodal.PixelStats(7L, 2L, 1L, 2L,
      251L, 2L, 103L, 299L * 251 + 587L * 2 + 114L * 103)))
    // a short raster (declared 2×1 but one pixel of bytes) is skipped
    val short = "P6\n2 1\n255\n".getBytes ++ Array[Byte](1, 2, 3)
    assert(Multimodal.decodePixels(
      Seq(Multimodal.Asset(8L, "image", short, "s")).toDS()).isEmpty)
    // end-to-end over the corpus: every synthesized asset decodes, and
    // the sums match an independent in-engine recomputation from the
    // raw text bytes (the oracle does the same cross-engine)
    val assets = Multimodal.ppmAssetsFromDocuments(spark, sf)
    val stats = Multimodal.decodePixels(assets).toDF()
    val expected = graft.Tables.load(spark, sf, "documents")
      .filter(col("n_chars") % 3 === 0)
      .withColumn("w", (lit(4) + (col("doc_id") % 5) * 2).cast("int"))
      .withColumn("h", (octet_length(col("text")) / (lit(3) * col("w"))).cast("int"))
      .filter(col("h") >= 1)
      .select(col("doc_id").as("asset_id"), col("w"), col("h"),
        expr("transform(sequence(1, w*h*3), " +
          "i -> cast(unhex(substring(hex(cast(text as binary)), 2*i-1, 2)) as binary))")
          .as("bytes"))
    // cross-check row counts and one aggregate invariant: total byte sum
    // per asset equals sum_r + sum_g + sum_b
    val got = stats.select(col("asset_id"),
      (col("sum_r") + col("sum_g") + col("sum_b")).as("tot"))
    val want = expected.select(col("asset_id"),
      expr("aggregate(bytes, 0L, (a, x) -> a + cast(conv(hex(x), 16, 10) as long))")
        .as("tot"))
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.join(want, "asset_id")
      .filter(got("tot") =!= want("tot")).count() == 0)
  }

  test("imageDHash: gradients, duplicate collision, edit sensitivity") {
    import spark.implicits._
    def ppm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes
      val body = Array.tabulate(3 * w * h) { i =>
        px((i / 3) / w, (i / 3) % w).toByte }
      header ++ body
    }
    def hash(id: Long, p: Array[Byte]) =
      Multimodal.imageDHash(
        Seq(Multimodal.Asset(id, "image", p, "s")).toDS()).collect()
    // brightness strictly rising left->right: every left < right -> 0
    val rising = hash(1L, ppm(16, 16, (_, c) => c * 10))
    assert(rising.head.dhash_hi == 0L && rising.head.dhash_lo == 0L)
    // strictly falling: every comparison true -> all 32 bits per half
    val falling = hash(2L, ppm(16, 16, (_, c) => 255 - c * 10))
    assert(falling.head.dhash_hi == 0xFFFFFFFFL &&
      falling.head.dhash_lo == 0xFFFFFFFFL)
    // identical rasters collide regardless of asset id
    val a = hash(3L, ppm(12, 10, (r, c) => (r * 31 + c * 17) % 256)).head
    val b = hash(4L, ppm(12, 10, (r, c) => (r * 31 + c * 17) % 256)).head
    assert((a.dhash_hi, a.dhash_lo) == ((b.dhash_hi, b.dhash_lo)))
    // a one-pixel edit flips few bits (perceptual locality)
    val edited = hash(5L, ppm(12, 10, (r, c) =>
      if (r == 0 && c == 0) 255 else (r * 31 + c * 17) % 256)).head
    val flips = java.lang.Long.bitCount(a.dhash_hi ^ edited.dhash_hi) +
      java.lang.Long.bitCount(a.dhash_lo ^ edited.dhash_lo)
    assert(flips >= 1 && flips <= 4, s"flips=$flips")
    // undeclared raster bytes -> skipped, not hashed
    assert(hash(6L, "P6\n4 4\n255\n".getBytes ++
      Array.fill[Byte](10)(1)).isEmpty)
  }

  test("audioFingerprint: envelope shape, duplicate collision, skip") {
    import spark.implicits._
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    def wav(samples: Seq[Int]): Array[Byte] = {
      val data = samples.flatMap(s => le(s.toLong & 0xFFFF, 2)).toArray
      val fmt = "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(1, 2) ++
        le(8000, 4) ++ le(16000, 4) ++ le(2, 2) ++ le(16, 2)
      val dc = "data".getBytes ++ le(data.length, 4) ++ data
      val body = "WAVE".getBytes ++ fmt ++ dc
      "RIFF".getBytes ++ le(body.length, 4) ++ body
    }
    def fp(id: Long, p: Array[Byte]) =
      Multimodal.audioFingerprint(
        Seq(Multimodal.Asset(id, "audio", p, "s")).toDS()).collect()
    // constant amplitude: every bin equal -> no bit set
    val flat = fp(1L, wav(Seq.fill(256)(1000))).head
    assert(flat.fp_hi == 0L && flat.fp_lo == 0L &&
      flat.n_samples == 256L)
    // monotonically DECAYING envelope: every adjacent pair fires
    val decay = fp(2L, wav((0 until 256).map(j => 20000 - j * 70))).head
    assert(decay.fp_hi == 0x7FFFFFFFL && decay.fp_lo == 0xFFFFFFFFL)
    // identical streams collide; a local loudness spike flips few bits
    val base = (0 until 256).map(j => (j * 37) % 4000)
    val a = fp(3L, wav(base)).head
    val b = fp(4L, wav(base)).head
    assert((a.fp_hi, a.fp_lo) == ((b.fp_hi, b.fp_lo)))
    val spiked = fp(5L, wav(base.updated(10, 30000))).head
    val flips = java.lang.Long.bitCount(a.fp_hi ^ spiked.fp_hi) +
      java.lang.Long.bitCount(a.fp_lo ^ spiked.fp_lo)
    assert(flips >= 1 && flips <= 4, s"flips=$flips")
    // sub-frame payload is skipped
    assert(fp(6L, wav(Seq.empty)).isEmpty)
  }

  test("pcmFrameEnergy + vadSegments: frames, threshold, islands") {
    import spark.implicits._
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    def wav(samples: Seq[Int]): Array[Byte] = {
      val data = samples.flatMap(s => le(s.toLong & 0xFFFF, 2)).toArray
      val fmt = "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(1, 2) ++
        le(8000, 4) ++ le(16000, 4) ++ le(2, 2) ++ le(16, 2)
      val dc = "data".getBytes ++ le(data.length, 4) ++ data
      val body = "WAVE".getBytes ++ fmt ++ dc
      "RIFF".getBytes ++ le(body.length, 4) ++ body
    }
    // 10 frames of 4 samples; frames 2,3 and 7 loud (runs of 2 and 1),
    // plus a trailing partial frame (3 samples) that must be dropped
    val quiet = Seq.fill(4)(10)
    val loud = Seq.fill(4)(1000)
    val samples = quiet ++ quiet ++ loud ++ loud ++ quiet ++ quiet ++
      quiet ++ loud ++ quiet ++ quiet ++ Seq(9, 9, 9)
    val assets = Seq(Multimodal.Asset(7L, "audio", wav(samples), "s")).toDS()
    val frames = Multimodal.pcmFrameEnergy(assets, 4)
    assert(frames.count() == 10) // partial frame dropped
    val r = Multimodal.vadSegments(frames.toDF()).collect().head
    assert(r.getAs[Long]("n_frames") == 10L)
    assert(r.getAs[Long]("n_active") == 3L)
    assert(r.getAs[Long]("n_segments") == 2L)
    assert(r.getAs[Long]("longest_seg") == 2L)
    // constant energy: nothing strictly beats the mean -> zeros
    val flat = Seq(Multimodal.Asset(8L, "audio",
      wav(Seq.fill(16)(500)), "s")).toDS()
    val fr = Multimodal.vadSegments(
      Multimodal.pcmFrameEnergy(flat, 4).toDF()).collect().head
    assert(fr.getAs[Long]("n_segments") == 0L &&
      fr.getAs[Long]("n_active") == 0L)
  }

  test("patchLuma: full patches only, exact luma sums") {
    import spark.implicits._
    // 8x6 raster: left half dark (0), right half bright (200 gray)
    def ppm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val head = s"P6\n$w $h\n255\n".getBytes
      val body = (0 until h).flatMap(y => (0 until w).flatMap { x =>
        val v = px(x, y).toByte; Seq(v, v, v) }).toArray
      head ++ body
    }
    val assets = Seq(Multimodal.Asset(1L, "image",
      ppm(8, 6, (x, _) => if (x < 4) 0 else 200), "s")).toDS()
    val got = Multimodal.patchLuma(assets, 4).collect()
      .map(p => (p.px, p.py) -> p.sum_luma).toMap
    // h=6 -> one full patch row; 2 patches; luma(200 gray)=200*1000/px
    assert(got == Map((0, 0) -> 0L, (1, 0) -> 16L * 200L * 1000L))
    // raster smaller than the patch in either axis -> no patches
    val tiny = Seq(Multimodal.Asset(2L, "image",
      ppm(3, 8, (_, _) => 10), "s")).toDS()
    assert(Multimodal.patchLuma(tiny, 4).count() == 0L)
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
