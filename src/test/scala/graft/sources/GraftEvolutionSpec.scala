package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Schema evolution via COLUMN MAPPING (round 13): RENAME / DROP /
  * WIDEN are metadata-only — data files keep their physical column
  * names and narrow types; `colmap:` manifest lines connect logical to
  * physical, readers alias and upcast. The invariant: after any
  * sequence of ALTERs, every file ever written reads correctly under
  * the CURRENT logical schema, and new writes interleave with old
  * files transparently. */
class GraftEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = tmpDir("graft-evo-wh")
  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.gevo",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gevo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gevo.db")
  }

  test("RENAME COLUMN is metadata-only: old and new files read under " +
      "the new name; n_files unchanged across the ALTER") {
    init()
    spark.sql("""CREATE TABLE gevo.db.r (id BIGINT, v BIGINT)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'id')""")
    spark.sql("INSERT INTO gevo.db.r SELECT id, id * 2 FROM range(10)")
    val filesBefore = Layout.snapshotInfo(spark, s"$wh/db/r").get.files
    spark.sql("ALTER TABLE gevo.db.r RENAME COLUMN v TO val")
    val info = Layout.snapshotInfo(spark, s"$wh/db/r").get
    assert(info.files == filesBefore, "rename rewrote data files")
    assert(info.colMap == Map("val" -> "v"))
    // old file reads under the new name — catalog AND Layout paths
    assert(spark.sql("SELECT sum(val) FROM gevo.db.r")
      .head().getLong(0) == 90L)
    assert(Layout.readSnapshot(spark, s"$wh/db/r")
      .agg(sum("val")).head().getLong(0) == 90L)
    // a post-rename INSERT writes the PHYSICAL name; both generations
    // read together
    spark.sql(
      "INSERT INTO gevo.db.r SELECT id, id * 2 FROM range(100, 110)")
    assert(spark.sql("SELECT count(*), sum(val) FROM gevo.db.r")
      .head().toSeq == Seq(20L, 90L + (100 until 110).map(_ * 2L).sum))
    // chained rename keeps pointing at the original physical column
    spark.sql("ALTER TABLE gevo.db.r RENAME COLUMN val TO val2")
    assert(Layout.snapshotInfo(spark, s"$wh/db/r").get.colMap ==
      Map("val2" -> "v"))
    assert(spark.sql("SELECT sum(val2) FROM gevo.db.r")
      .head().getLong(0) == 90L + (100 until 110).map(_ * 2L).sum)
    // renaming the INDEXED column renames the statscols identity too,
    // and the index still prunes on the new name
    spark.sql("ALTER TABLE gevo.db.r RENAME COLUMN id TO docid")
    assert(Layout.snapshotInfo(spark, s"$wh/db/r").get.statsCols ==
      Seq("docid"))
    val pruned = spark.read.format("graft-snapshot").load(s"$wh/db/r")
      .filter(col("docid") >= 100L)
    assert(pruned.rdd.getNumPartitions == 1, "index lost on rename")
    assert(pruned.count() == 10)
  }

  test("DROP COLUMN hides the physical column; re-ADDING the same " +
      "name gets a FRESH physical column (old values never leak)") {
    init()
    spark.sql("""CREATE TABLE gevo.db.d (id BIGINT, junk BIGINT)
      USING `graft-snapshot`""")
    spark.sql("INSERT INTO gevo.db.d SELECT id, 999 FROM range(5)")
    spark.sql("ALTER TABLE gevo.db.d DROP COLUMN junk")
    assert(spark.table("gevo.db.d").columns.toSeq == Seq("id"))
    val info = Layout.snapshotInfo(spark, s"$wh/db/d").get
    assert(info.droppedPhys == Seq("junk"))
    // re-ADD the name: maps to a fresh physical — the old files' 999s
    // must NOT resurface
    spark.sql("ALTER TABLE gevo.db.d ADD COLUMN junk BIGINT")
    assert(spark.sql(
      "SELECT count(*) FROM gevo.db.d WHERE junk IS NOT NULL")
      .head().getLong(0) == 0L, "dropped values leaked into the re-add")
    spark.sql("INSERT INTO gevo.db.d SELECT id, 1 FROM range(10, 12)")
    assert(spark.sql("SELECT sum(junk) FROM gevo.db.d")
      .head().getLong(0) == 2L)
    // dropping an indexed or partition column refuses
    spark.sql("""CREATE TABLE gevo.db.d2 (id BIGINT, v BIGINT)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'id')""")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gevo.db.d2 DROP COLUMN id"))
    assert(e.getMessage.contains("indexed"))
  }

  test("ALTER COLUMN TYPE widens metadata-only (INT->BIGINT, " +
      "FLOAT->DOUBLE); non-widening changes refuse") {
    init()
    spark.sql("""CREATE TABLE gevo.db.w (id BIGINT, n INT, x FLOAT)
      USING `graft-snapshot`""")
    spark.sql("""INSERT INTO gevo.db.w
      SELECT id, CAST(id AS INT), CAST(id AS FLOAT) FROM range(10)""")
    val filesBefore = Layout.snapshotInfo(spark, s"$wh/db/w").get.files
    spark.sql("ALTER TABLE gevo.db.w ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE gevo.db.w ALTER COLUMN x TYPE DOUBLE")
    assert(Layout.snapshotInfo(spark, s"$wh/db/w").get.files
      == filesBefore, "widening rewrote data files")
    // old INT32/FLOAT files decode as BIGINT/DOUBLE — catalog reader
    val r = spark.sql("SELECT sum(n), sum(x) FROM gevo.db.w").head()
    assert(r.getLong(0) == 45L && r.getDouble(1) == 45.0)
    // and the Layout path (Spark's own widened parquet read)
    val l = Layout.readSnapshot(spark, s"$wh/db/w")
      .agg(sum("n"), sum("x")).head()
    assert(l.getLong(0) == 45L && l.getDouble(1) == 45.0)
    // post-widen inserts write the wide type; both generations union
    spark.sql(
      "INSERT INTO gevo.db.w SELECT id, id, CAST(id AS DOUBLE) " +
        "FROM range(100, 102)")
    assert(spark.sql("SELECT sum(n) FROM gevo.db.w")
      .head().getLong(0) == 45L + 201L)
    // narrowing refuses — Spark's analyzer rejects it before the
    // catalog (either layer's refusal keeps the files safe)
    intercept[Exception](
      spark.sql("ALTER TABLE gevo.db.w ALTER COLUMN n TYPE INT"))
    assert(spark.table("gevo.db.w").schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("RESTORE keeps the column-mapping state: a rename survives a " +
      "rollback (renamed columns stay readable, retired physical " +
      "names stay retired)") {
    init()
    spark.sql("""CREATE TABLE gevo.db.rs (id BIGINT, v BIGINT)
      USING `graft-snapshot`""")
    spark.sql("INSERT INTO gevo.db.rs SELECT id, id * 3 FROM range(10)")
    spark.sql("ALTER TABLE gevo.db.rs RENAME COLUMN v TO val")
    val t = s"$wh/db/rs"
    // an unwanted commit to roll back, PAST the rename
    spark.sql("INSERT INTO gevo.db.rs SELECT id, 0 FROM range(50, 60)")
    val target = Layout.headId(spark, t) - 1
    Layout.restoreSnapshot(spark, t, target)
    val info = Layout.snapshotInfo(spark, t).get
    // the restored manifest must carry the colmap: lines — without
    // them 'val' resolves by logical name against files storing the
    // physical 'v' and reads NULL on every pre-existing file
    assert(info.colMap == Map("val" -> "v"),
      s"restore dropped the column mapping: ${info.colMap}")
    assert(spark.sql("SELECT sum(val) FROM gevo.db.rs")
      .head().getLong(0) == (0 until 10).map(_ * 3L).sum)
    // droppedphys: survives a restore too — a post-restore re-ADD of
    // a dropped name must still get a fresh physical column
    spark.sql("ALTER TABLE gevo.db.rs DROP COLUMN val")
    spark.sql("INSERT INTO gevo.db.rs SELECT id FROM range(90, 92)")
    Layout.restoreSnapshot(spark, t, Layout.headId(spark, t) - 1)
    assert(Layout.snapshotInfo(spark, t).get.droppedPhys == Seq("v"))
    spark.sql("ALTER TABLE gevo.db.rs ADD COLUMN val BIGINT")
    assert(spark.sql(
      "SELECT count(*) FROM gevo.db.rs WHERE val IS NOT NULL")
      .head().getLong(0) == 0L,
      "restore lost droppedphys: — dropped values resurfaced")
  }

  test("DROP COLUMN refuses while live deletion sidecars key on it " +
      "(OPTIMIZE materializes them, then the drop succeeds)") {
    init()
    spark.sql("""CREATE TABLE gevo.db.dk (id BIGINT, v BIGINT)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'v')""")
    spark.sql("INSERT INTO gevo.db.dk SELECT id, id FROM range(100)")
    val t = s"$wh/db/dk"
    // merge keyed on id (NOT the indexed column) with a DV threshold:
    // the sidecar masks by 'id'
    val delta = Seq((7L, 0L, "d")).toDF("id", "v", "op")
    Layout.mergeSnapshot(spark, t, delta, "id", "op", dvThreshold = 0.5)
    assert(Layout.snapshotInfo(spark, t).get.dv.nonEmpty)
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gevo.db.dk DROP COLUMN id"))
    assert(e.getMessage.contains("deletion sidecars"), e.getMessage)
    // the table stayed readable through both paths
    assert(spark.table("gevo.db.dk").count() == 99)
    Layout.optimizeSnapshot(spark, t, targetRowsPerFile = 1000L)
    assert(Layout.snapshotInfo(spark, t).get.dv.isEmpty)
    spark.sql("ALTER TABLE gevo.db.dk DROP COLUMN id")
    assert(spark.table("gevo.db.dk").columns.toSeq == Seq("v"))
    assert(Layout.readSnapshot(spark, t).count() == 99)
  }

  test("a RENAME (or DROP) of a streamed column fails the running " +
      "query LOUDLY with a restart instruction; ADD COLUMN stays " +
      "transparent; the restarted stream resumes under the new name") {
    init()
    spark.sql("""CREATE TABLE gevo.db.s (id BIGINT, v BIGINT)
      USING `graft-snapshot`""")
    spark.sql("INSERT INTO gevo.db.s SELECT id, id FROM range(10)")
    val ckpt = tmpDir("gevo-stream-ckpt")
    val out = tmpDir("gevo-stream-out")
    // foreachBatch: the memory sink cannot recover from a checkpoint
    def start() = spark.readStream
      .option("startingSnapshot", "1")
      .option("maxSnapshotsPerTrigger", "1")
      .table("gevo.db.s")
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.toDF("id", "v").write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    q1.processAllAvailable()
    // ADD COLUMN mid-stream: transparent (the stream just doesn't
    // emit the new column)
    spark.sql("ALTER TABLE gevo.db.s ADD COLUMN extra BIGINT")
    spark.sql(
      "INSERT INTO gevo.db.s SELECT id, id, 0 FROM range(10, 20)")
    q1.processAllAvailable()
    assert(spark.read.parquet(out).count() == 20)
    // RENAME mid-stream: the next batch fails by column name
    spark.sql("ALTER TABLE gevo.db.s RENAME COLUMN v TO val")
    spark.sql(
      "INSERT INTO gevo.db.s SELECT id, id, 0 FROM range(20, 30)")
    val e = intercept[Throwable] { q1.processAllAvailable() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("renamed or dropped mid-stream")),
      s"wrong failure: ${msgs(e).mkString(" | ")}")
    try q1.stop() catch { case _: Throwable => () }
    // restart resumes from the checkpoint under the NEW schema (the
    // stream's df resolves fresh from the catalog: columns id, val,
    // extra)
    val q2 = spark.readStream
      .option("startingSnapshot", "1")
      .option("maxSnapshotsPerTrigger", "1")
      .table("gevo.db.s")
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          assert(b.columns.contains("val"),
            s"restart kept old names: ${b.columns.mkString(",")}")
          b.select(col("id"), col("val").as("v"))
            .write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt).start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 30)
    assert(got.agg(sum("v")).head().getLong(0) == (0L until 30L).sum)
  }

  test("evolution composes with merge-on-read: a DV merge on a " +
      "renamed key masks through the physical sidecar name") {
    init()
    spark.sql("""CREATE TABLE gevo.db.m (id BIGINT, v BIGINT)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'id')""")
    spark.sql("INSERT INTO gevo.db.m SELECT id, id FROM range(100)")
    spark.sql("ALTER TABLE gevo.db.m RENAME COLUMN id TO key")
    val t = s"$wh/db/m"
    val delta = Seq((7L, 0L, "d"), (11L, 1111L, "u"))
      .toDF("key", "v", "op")
    Layout.mergeSnapshot(spark, t, delta, "key", "op",
      dvThreshold = 0.5)
    assert(Layout.snapshotInfo(spark, t).get.dv.nonEmpty)
    // the sidecar stores the PHYSICAL key name; both read paths mask
    assert(spark.sql("SELECT count(*) FROM gevo.db.m WHERE key = 7")
      .head().getLong(0) == 0L)
    assert(Layout.readSnapshot(spark, t)
      .filter(col("key") === 11L).head().getLong(1) == 1111L)
    assert(spark.table("gevo.db.m").count() == 99)
  }
}
