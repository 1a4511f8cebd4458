package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 maintenance-safety specs: vacuum must sweep PARTITIONED
  * tables (recursive, dataDir-relative paths), must spare the files of
  * a write still in flight (the live-token registry — otherwise a
  * graceMs=0 vacuum beside a streaming sink can eat fully-staged or
  * just-renamed, not-yet-referenced files), change-feed planning must
  * treat rewrite commits by their semantics (optimize = zero rows =
  * nothing; replace = old image retracted + new image added), and a
  * restore must keep the target's recorded partition layout. */
class LayoutMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs3() = Seq(
    (1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L),
    (4L, "de", 40L), (5L, "fr", 50L)).toDF("id", "lang", "v")

  test("vacuum sweeps partitioned tables: unreferenced files under " +
      "col=value/ subdirectories are reclaimed, referenced ones kept") {
    val t = tmpDir("graft-vac-part")
    docs3().write.format("graft-snapshot").partitionBy("lang")
      .mode("append").save(t)                       // snapshot 1
    // full replace: snapshot 1's partitioned files become unreferenced
    // once history is vacuumed to the head only
    Layout.commitSnapshot(
      docs3().withColumn("v", col("v") + 1L), t)    // snapshot 2
    val (dropped, removed) = Layout.vacuum(spark, t, keepLast = 1)
    assert(dropped == 1)
    // the non-recursive sweep this pins against reclaimed NOTHING on a
    // partitioned table; the recursive one must reclaim one file per
    // lang directory (3 distinct langs → 3 files)
    assert(removed == 3, s"expected 3 reclaimed partitioned files, got $removed")
    // the kept snapshot stays byte-identical readable
    assert(Layout.readSnapshot(spark, t).agg(sum("v")).head().getLong(0)
      == docs3().agg(sum(col("v") + 1L)).head().getLong(0))
  }

  test("vacuum spares files and stage dirs of a LIVE write token " +
      "even at graceMs=0; sweeps them once released") {
    val t = tmpDir("graft-vac-live")
    Layout.commitSnapshot(docs3(), t)
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(
      spark.sessionState.newHadoopConf())
    // simulate an in-flight write: a stage dir + a published-but-not-
    // yet-referenced data file, both under a registered token
    val tok = "deadbee1"
    val stage = new org.apache.hadoop.fs.Path(root, s".stage-$tok")
    fs.mkdirs(stage)
    fs.create(new org.apache.hadoop.fs.Path(stage, "f0.parquet")).close()
    val orphan = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(root, "data"), s"c$tok-f0.parquet")
    fs.create(orphan).close()
    Layout.registerTok(tok)
    try {
      val (_, removedLive) = Layout.vacuum(spark, t, keepLast = 1)
      assert(removedLive == 0, "vacuum ate a live write's files")
      assert(fs.exists(stage) && fs.exists(orphan))
    } finally Layout.releaseTok(tok)
    // released: the same sweep now reclaims both
    val (_, removedAfter) = Layout.vacuum(spark, t, keepLast = 1)
    assert(removedAfter == 1 && !fs.exists(stage) && !fs.exists(orphan))
  }

  test("changeFeedPlan: optimize emits NOTHING; a full replace emits " +
      "the old image as removed plus the new as added; appends only add") {
    val t = tmpDir("graft-cfp")
    Layout.appendSnapshot(docs3().repartition(4), t)          // 1: append
    Layout.optimizeSnapshot(spark, t, targetRowsPerFile = 10) // 2: compact
    Layout.commitSnapshot(
      docs3().filter(col("id") <= 2L), t)                     // 3: replace
    Layout.appendSnapshot(
      Seq((9L, "it", 90L)).toDF("id", "lang", "v"), t)        // 4: append
    // commit 2 (optimize): content identical → nothing
    assert(Layout.changeFeedPlan(spark, t, 1, 2).isEmpty,
      "optimize must be invisible to change-feed consumers")
    // commit 3 (replace): retraction of the whole snapshot-2 image plus
    // the new image — both sides present with the right ops
    val p3 = Layout.changeFeedPlan(spark, t, 2, 3)
    assert(p3.exists(_._2.contains("added")) &&
      p3.exists(_._2.contains("removed")))
    // commit 4 (append): added only
    val p4 = Layout.changeFeedPlan(spark, t, 3, 4)
    assert(p4.nonEmpty && p4.forall(_._2.contains("added")))
    // row-level: the replace window's removed rows are snapshot 2's
    val feed = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingSnapshot", "2").option("endingSnapshot", "3")
      .load(t)
    assert(feed.filter(col("_op") === "removed").count() == 5)
    assert(feed.filter(col("_op") === "added").count() == 2)
  }

  test("endingSnapshot bounds the batch change-feed window (and is " +
      "rejected beyond the pinned head)") {
    val t = tmpDir("graft-cfe")
    Layout.appendSnapshot(docs3(), t)                          // 1
    Layout.appendSnapshot(
      Seq((6L, "it", 60L)).toDF("id", "lang", "v"), t)         // 2
    Layout.appendSnapshot(
      Seq((7L, "pt", 70L)).toDF("id", "lang", "v"), t)         // 3
    val w = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingSnapshot", "1").option("endingSnapshot", "2")
      .load(t)
    assert(w.select("id").as[Long].collect().toSet == Set(6L))
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot")
        .option("readChangeFeed", "true")
        .option("endingSnapshot", "99").load(t).collect()
    }
  }

  test("restoreSnapshot keeps the target's recorded partition layout " +
      "(directory pruning survives a rollback)") {
    val t = tmpDir("graft-restore-part")
    docs3().write.format("graft-snapshot").partitionBy("lang")
      .mode("append").save(t)                                  // 1
    Seq((8L, "nl", 80L)).toDF("id", "lang", "v")
      .write.format("graft-snapshot").mode("append").save(t)   // 2
    Layout.restoreSnapshot(spark, t, 1)                        // 3
    assert(Layout.snapshotPartCols(spark, t) == Seq("lang"),
      "restore dropped the partcols line — sticky layout broken")
    // and a post-restore append still follows the Hive-style layout
    Seq((9L, "sv", 90L)).toDF("id", "lang", "v")
      .write.format("graft-snapshot").mode("append").save(t)   // 4
    val files = Layout.snapshotInfo(spark, t).get.files
    assert(files.exists(_.startsWith("lang=sv/")),
      s"post-restore append ignored the partition layout: $files")
  }
}
