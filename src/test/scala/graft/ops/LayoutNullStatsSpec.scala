package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 per-file NULL COUNTS in the data-skipping index: a third
  * `n<count>` field per indexed column (old two-field lines parse
  * unchanged). What they buy, each pinned here:
  *  - IS NULL scans skip files proven null-free (nulls = 0);
  *  - IS NOT NULL scans skip files proven ALL-null (range absent +
  *    nulls > 0 — the statLine writer invariant);
  *  - merges skip provably all-null-key files instead of rewriting
  *    them on every delta forever;
  *  - count(col) is answered from the manifest (rows − Σ nulls),
  *    zero data files touched. */
class LayoutNullStatsSpec extends SparkSpec {
  import spark.implicits._
  import Layout.{ColStat, LongRange}

  private def rowsDf(vals: Seq[(java.lang.Long, Long)]) =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(vals.map { case (k, v) =>
          org.apache.spark.sql.Row(k, v) }: _*)),
      StructType(Seq(StructField("k", LongType, nullable = true),
        StructField("v", LongType, nullable = false))))

  test("statsOfFull parses old two-field lines (count unknown), new " +
      "three-field lines, empty pairs and bare names") {
    // old format: no null counts
    assert(Layout.statsOfFull("f1|10|20") ==
      ("f1", Seq(ColStat(Some(LongRange(10L, 20L)), None))))
    // new format: range + count
    assert(Layout.statsOfFull("f2|10|20|n3") ==
      ("f2", Seq(ColStat(Some(LongRange(10L, 20L)), Some(3L)))))
    // all-null column: empty pair + count
    assert(Layout.statsOfFull("f3|||n7") ==
      ("f3", Seq(ColStat(None, Some(7L)))))
    // two columns, second without a count
    assert(Layout.statsOfFull("f4|1|2|n0|3|4") ==
      ("f4", Seq(ColStat(Some(LongRange(1L, 2L)), Some(0L)),
        ColStat(Some(LongRange(3L, 4L)), None))))
    // bare name: no stats at all
    assert(Layout.statsOfFull("f5") == ("f5", Seq()))
    // round-trip through statLineFull
    val line = Layout.statLineFull("f6",
      Seq(ColStat(Some(LongRange(-5L, 5L)), Some(2L)),
        ColStat(None, Some(9L))))
    assert(Layout.statsOfFull(line) ==
      ("f6", Seq(ColStat(Some(LongRange(-5L, 5L)), Some(2L)),
        ColStat(None, Some(9L)))))
  }

  test("both write paths record null counts; a chunk with nulls " +
      "keeps its range over the NON-null values") {
    val t = tmpDir("graft-nullrec")
    // Layout path: 10 rows, 3 null keys — footer-derived count
    val mixed = rowsDf((0 until 10).map(i =>
      (if (i % 3 == 0) null else java.lang.Long.valueOf(i.toLong),
        i.toLong)))
    Layout.appendSnapshot(mixed.coalesce(1), t, statsCol = "k")
    val st = Layout.statsOfFull(
      Layout.snapshotInfo(spark, t).get.statLines.head)._2.head
    assert(st.nulls.contains(4L), s"expected 4 nulls recorded: $st")
    assert(st.range.contains(LongRange(1L, 8L)),
      s"range must cover the non-null values: $st")
    // DSv2 sink path
    val t2 = tmpDir("graft-nullsink")
    mixed.coalesce(1).write.format("graft-snapshot")
      .option("statsCol", "k").mode("append").save(t2)
    val st2 = Layout.statsOfFull(
      Layout.snapshotInfo(spark, t2).get.statLines.head)._2.head
    assert(st2 == ColStat(Some(LongRange(1L, 8L)), Some(4L)))
  }

  test("IS NULL scans plan only files that may hold nulls; IS NOT " +
      "NULL skips proven all-null files; answers never change") {
    val t = tmpDir("graft-nullscan")
    // file 1: null-free; file 2: null-free; file 3: ALL null
    Layout.appendSnapshot(
      rowsDf((0 until 20).map(i =>
        (java.lang.Long.valueOf(i.toLong), i.toLong))).coalesce(1),
      t, statsCol = "k")
    Layout.appendSnapshot(
      rowsDf((20 until 40).map(i =>
        (java.lang.Long.valueOf(i.toLong), i.toLong))).coalesce(1),
      t, statsCol = "k")
    Layout.appendSnapshot(
      rowsDf((40 until 50).map(i =>
        (null: java.lang.Long, i.toLong))).coalesce(1),
      t, statsCol = "k")
    val base = spark.read.format("graft-snapshot").load(t)
    val isNull = base.filter(col("k").isNull)
    assert(isNull.rdd.getNumPartitions == 1,
      "IS NULL did not skip the null-free files")
    assert(isNull.count() == 10)
    val notNull = base.filter(col("k").isNotNull)
    assert(notNull.rdd.getNumPartitions == 2,
      "IS NOT NULL did not skip the all-null file")
    assert(notNull.count() == 40)
  }

  test("a provably all-null-key file is never a merge candidate; " +
      "count(col) answers from the manifest with zero files read") {
    val t = tmpDir("graft-nullmerge")
    Layout.appendSnapshot(
      rowsDf((0 until 20).map(i =>
        (java.lang.Long.valueOf(i.toLong), i.toLong))).coalesce(1),
      t, statsCol = "k")
    Layout.appendSnapshot(
      rowsDf((40 until 50).map(i =>
        (null: java.lang.Long, i.toLong))).coalesce(1),
      t, statsCol = "k")
    val delta = Seq((7L, 777L, "u")).toDF("k", "v", "op")
    val before = Layout.snapshotInfo(spark, t).get.files.toSet
    Layout.mergeSnapshot(spark, t, delta, "k", "op")
    val after = Layout.snapshotInfo(spark, t).get.files.toSet
    assert((before -- after).size == 1,
      "merge rewrote the all-null file too")
    assert((before & after).size == 1)
    val img = Layout.readSnapshot(spark, t)
    assert(img.count() == 30)
    assert(img.filter(col("k") === 7L).head().getLong(1) == 777L)
    assert(img.filter(col("k").isNull).count() == 10,
      "null-key rows lost by the merge")
    // count(col) from metadata: delete every data file; the pushed
    // aggregate must still answer (and counts only non-null keys)
    val t2 = tmpDir("graft-nullcount")
    Layout.appendSnapshot(
      rowsDf((0 until 10).map(i =>
        (if (i % 2 == 0) null else java.lang.Long.valueOf(i.toLong),
          i.toLong))).coalesce(1),
      t2, statsCol = "k")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    val dataDir = new org.apache.hadoop.fs.Path(t2, "data")
    fs.listStatus(dataDir).foreach(s => fs.delete(s.getPath, false))
    val c1 = spark.read.format("graft-snapshot").load(t2)
      .agg(count(col("k"))).head().getLong(0)
    assert(c1 == 5L, "count(col) not served by metadata")
    assert(spark.read.format("graft-snapshot").load(t2).count() == 10L)
  }
}
