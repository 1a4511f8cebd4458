package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 typed data-skipping stats: STRING columns (UUIDs, URLs —
  * the most common real merge keys) get Iceberg-style truncated
  * min/max bounds in the manifest, so string-keyed merges prune to
  * touched files and string-range scans skip files, where before they
  * were full-rewrite / full-scan. The safety property throughout:
  * bounds are CONSERVATIVE (lo = truncated prefix sorts <= min, hi =
  * incremented prefix sorts >= max, or unbounded), and every
  * comparison — driver planning, Spark row filters, stored bounds —
  * uses CODE POINT order, never UTF-16. */
class LayoutStringStatsSpec extends SparkSpec {
  import spark.implicits._
  import Layout.{ColRange, StrRange, LongRange}

  test("truncMin/truncMax are conservative bounds; the truncation " +
      "edge never prunes a covered value") {
    val a16 = "a" * 16
    // short values: exact
    assert(ColRange.truncMin("abc") == "abc")
    assert(ColRange.truncMax("abc").contains("abc"))
    // long values: min truncates DOWN, max truncates UP
    val long = a16 + "zzz"
    assert(ColRange.truncMin(long) == a16)
    assert(ColRange.cpCompare(ColRange.truncMin(long), long) <= 0)
    val up = ColRange.truncMax(long).get
    assert(ColRange.cpCompare(up, long) >= 0,
      s"truncated max '$up' sorts below the value it bounds")
    assert(up == "a" * 15 + "b")
    // carry across the surrogate gap: U+D7FF + 1 must become U+E000
    val nearGap = ("퟿" * 17)
    val gapUp = ColRange.truncMax(nearGap).get
    assert(ColRange.cpCompare(gapUp, nearGap) >= 0)
    assert(gapUp.codePointAt(gapUp.offsetByCodePoints(0,
      gapUp.codePointCount(0, gapUp.length) - 1)) == 0xE000)
    // all-max run: unbounded above (None), never a wrong bound
    val maxRun = new String(Array.fill(17)(0x10FFFF), 0, 17)
    assert(ColRange.truncMax(maxRun).isEmpty)
    // overlap check with the truncated range keeps the covered value
    val r = ColRange.ofStrings(long, long)
    assert(ColRange.overlaps(r, StrRange(long, Some(long))))
  }

  test("cpCompare is code-point (Spark) order, not UTF-16 order") {
    val bmp = ""         // BMP private-use char
    val supp = "𐀀"  // U+10000 (supplementary)
    // UTF-16 unit order says supp < bmp; code point order says supp > bmp
    assert(bmp.compareTo(supp) > 0, "JVM check")
    assert(ColRange.cpCompare(bmp, supp) < 0)
    // and Spark agrees with cpCompare
    val got = Seq(bmp, supp).toDF("s").agg(max("s")).head().getString(0)
    assert(got == supp)
  }

  test("strOrd is monotone in code-point order and strOrdSql agrees") {
    val vals = Seq("", "a", "aa", "ab", "b", "ba", "zzzzzzzzz",
      "abcdefgh", "abcdefg", "éclair", "𐀀x", "")
    val sorted = vals.sortWith((a, b) => ColRange.cpCompare(a, b) < 0)
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(ColRange.strOrd(a) <= ColRange.strOrd(b),
        s"ord('$a') > ord('$b')")
    }
    val viaSpark = vals.toDF("s")
      .select(col("s"), expr(ColRange.strOrdSql("s")).as("o"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(viaSpark(v) == ColRange.strOrd(v),
      s"Spark ordinal of '$v' disagrees with the driver's"))
  }

  test("manifest field round-trip: long, string, unbounded") {
    def rt(r: ColRange): Option[ColRange] = {
      val Seq(lo, hi) = ColRange.fields(r)
      ColRange.parse(lo, hi)
    }
    assert(rt(LongRange(-5L, 42L)).contains(LongRange(-5L, 42L)))
    val s = StrRange("url|with|pipes\nand newline", Some("z"))
    assert(rt(s).contains(s))
    assert(rt(StrRange("a", None)).contains(StrRange("a", None)))
    assert(ColRange.parse("", "") .isEmpty)
  }

  test("string-keyed merge prunes to the touched file (both the " +
      "broadcast and the binned candidate paths)") {
    for (nlj <- Seq(256, 1)) {
      val t = tmpDir(s"graft-strmerge-$nlj")
      def mk(lo: Int, hi: Int) = (lo until hi)
        .map(i => (f"doc-$i%06d", i.toLong)).toDF("key", "v")
      Layout.appendSnapshot(mk(0, 100).coalesce(1), t, statsCol = "key")
      Layout.appendSnapshot(mk(100, 200).coalesce(1), t, statsCol = "key")
      Layout.appendSnapshot(mk(200, 300).coalesce(1), t, statsCol = "key")
      val delta = Seq(
        ("doc-000007", 0L, "d"),
        ("doc-000011", 1011L, "u"),
        ("doc-999999", 999L, "c")).toDF("key", "v", "op")
      val baseFiles = Layout.snapshotInfo(spark, t).get.files.toSet
      // exercise the requested candidate path via the package seam
      val entries = Layout.snapshotInfo(spark, t).get.statLines
        .map(Layout.statsOfFull)
      val touched = Layout.overlappingFiles(
        delta.select("key").distinct(), "key",
        entries.map { case (n, rs) => (n,
          rs.headOption.getOrElse(Layout.ColStat(None, None))) },
        nljThreshold = nlj)
      assert(touched.size == 1,
        s"nlj=$nlj: expected 1 touched file, got $touched")
      Layout.mergeSnapshot(spark, t, delta, "key", "op")
      val headFiles = Layout.snapshotInfo(spark, t).get.files.toSet
      assert((baseFiles -- headFiles).size == 1, "rewrote more than 1 file")
      assert((baseFiles & headFiles).size == 2, "carried fewer than 2")
      val out = Layout.readSnapshot(spark, t)
      assert(out.count() == 300) // -1 delete +1 insert
      assert(out.filter(col("key") === "doc-000007").count() == 0)
      assert(out.filter(col("key") === "doc-000011")
        .head().getLong(1) == 1011L)
      assert(out.filter(col("key") === "doc-999999").count() == 1)
    }
  }

  test("readSnapshotPrunedStr skips files by truncated bounds and " +
      "answers exactly; scan pushdown plans only overlapping files") {
    val t = tmpDir("graft-strscan")
    def mk(lo: Int, hi: Int) = (lo until hi)
      .map(i => (f"u-$i%06d", i.toLong)).toDF("key", "v")
    // through the DSv2 sink so its string stat tracking is exercised
    mk(0, 100).coalesce(1).write.format("graft-snapshot")
      .option("statsCol", "key").mode("append").save(t)
    mk(100, 200).coalesce(1).write.format("graft-snapshot")
      .option("statsCol", "key").mode("append").save(t)
    mk(200, 300).coalesce(1).write.format("graft-snapshot")
      .option("statsCol", "key").mode("append").save(t)
    val pruned = Layout.readSnapshotPrunedStr(spark, t, "key",
      "u-000110", "u-000150")
    assert(pruned.count() == 41)
    assert(pruned.select(input_file_name()).distinct().count() == 1,
      "string-range read did not prune to the one covering file")
    // DSv2 pushdown: equality on the string index plans 1 partition
    val scan = spark.read.format("graft-snapshot").load(t)
      .filter(col("key") === "u-000250")
    assert(scan.rdd.getNumPartitions == 1,
      "string equality pushdown did not skip files")
    assert(scan.count() == 1)
    // range predicate: >= keeps only the last file
    val ge = spark.read.format("graft-snapshot").load(t)
      .filter(col("key") >= "u-000290")
    assert(ge.rdd.getNumPartitions == 1)
    assert(ge.count() == 10)
  }

  test("long-prefix keys (past the 16-cp truncation) stay correct: " +
      "covered values are never pruned away") {
    val t = tmpDir("graft-strtrunc")
    val p = "prefixprefixprefix-" // 19 chars > 16
    val rows = (0 until 50).map(i => (p + f"$i%04d", i.toLong))
      .toDF("key", "v")
    Layout.appendSnapshot(rows.coalesce(1), t, statsCol = "key")
    // every key shares the stored truncated range; exact reads survive
    val one = Layout.readSnapshotPrunedStr(spark, t, "key",
      p + "0049", p + "0049")
    assert(one.count() == 1)
    // a merge keyed past the truncated max still touches the file
    val delta = Seq((p + "0049", 9000L, "u")).toDF("key", "v", "op")
    Layout.mergeSnapshot(spark, t, delta, "key", "op")
    assert(Layout.readSnapshot(spark, t)
      .filter(col("key") === p + "0049").head().getLong(1) == 9000L)
  }

  test("huge string keys (footer stats omitted by parquet-mr) append " +
      "as RANGELESS files instead of aborting; reads stay exact") {
    val t = tmpDir("graft-strhuge")
    // parquet-mr drops binary chunk statistics when min+max exceed its
    // max-stats size (~4KB) — 5KB values guarantee the omission
    val huge = (0 until 4).map(i =>
      (("k" + i.toString) * 2500, i.toLong)).toDF("key", "v")
    Layout.appendSnapshot(huge.coalesce(1), t, statsCol = "key")
    val (_, ranges) = Layout.statsOf(
      Layout.snapshotInfo(spark, t).get.statLines.head)
    assert(ranges.forall(_.isEmpty), // bare name = all-None
      s"expected a rangeless entry for omitted footer stats: $ranges")
    // rangeless = always read: exact reads and merges still work
    assert(Layout.readSnapshot(spark, t).count() == 4)
    assert(Layout.readSnapshotPrunedStr(spark, t, "key",
      "k0" * 2500, "k0" * 2500).count() == 1)
    // an ALL-NULL indexed column degrades the same way (valueless
    // stats), for strings and integrals alike
    val t2 = tmpDir("graft-nullstats")
    import org.apache.spark.sql.types._
    val rows = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(null, 1L),
          org.apache.spark.sql.Row(null, 2L))),
      StructType(Seq(StructField("key", LongType, nullable = true),
        StructField("v", LongType, nullable = false))))
    Layout.appendSnapshot(rows.coalesce(1), t2, statsCol = "key")
    assert(Layout.readSnapshot(spark, t2).count() == 2)
  }
}
