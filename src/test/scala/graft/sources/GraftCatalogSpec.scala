package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.ops.Layout

/** SQL catalog over the snapshot-table warehouse: the full DDL/DML
  * round trip — CREATE NAMESPACE / CREATE TABLE (zero-file schema
  * commit) / INSERT INTO (manifest append, stats recorded) / INSERT
  * OVERWRITE (full replace) / VERSION AS OF / DROP / RENAME — plus
  * interop: the SQL surface and the Layout API see the same table. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = tmpDir("graft-cat-wh")
  private def initCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.gcat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)
  }

  test("DDL round trip: create, insert, time travel, overwrite, " +
      "rename, drop — all through pure SQL") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    spark.sql("""CREATE TABLE gcat.db.t (id BIGINT, v STRING)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'id')""")
    // snapshot 1 = the zero-file schema commit: readable, empty
    assert(spark.sql("SELECT * FROM gcat.db.t").count() == 0)
    assert(spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql(
      "INSERT INTO gcat.db.t SELECT id, concat('v', id) FROM range(10)")
    spark.sql(
      "INSERT INTO gcat.db.t SELECT id, concat('v', id) " +
        "FROM range(10, 20)")
    assert(spark.sql("SELECT count(*) AS c FROM gcat.db.t")
      .head().getLong(0) == 20)
    // VERSION AS OF: 1 empty, 2 first insert, 3 both
    assert(spark.sql("SELECT * FROM gcat.db.t VERSION AS OF 1")
      .count() == 0)
    assert(spark.sql("SELECT sum(id) FROM gcat.db.t VERSION AS OF 2")
      .head().getLong(0) == (0L until 10L).sum)
    // the statsCol table property made SQL INSERTs record the index:
    // a pruned filter must push its bound (file skipping live)
    assert(Layout.snapshotStatsCol(spark, s"$wh/db/t").contains("id"))
    // INSERT OVERWRITE = full-replace commit; history stays linear
    spark.sql(
      "INSERT OVERWRITE gcat.db.t SELECT id, 'x' FROM range(5)")
    assert(spark.sql("SELECT count(*) FROM gcat.db.t")
      .head().getLong(0) == 5)
    assert(spark.sql("SELECT count(*) FROM gcat.db.t VERSION AS OF 3")
      .head().getLong(0) == 20)
    // interop: the Layout API reads the catalog's table directly
    assert(Layout.readSnapshot(spark, s"$wh/db/t").count() == 5)
    // rename and drop
    spark.sql("ALTER TABLE gcat.db.t RENAME TO gcat.db.t2")
    assert(spark.sql("SELECT count(*) FROM gcat.db.t2")
      .head().getLong(0) == 5)
    spark.sql("DROP TABLE gcat.db.t2")
    assert(!spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("t2"))
  }

  test("CREATE TABLE AS SELECT, duplicate-create aborts, and a " +
      "Layout-API write is visible to SQL immediately") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db2")
    spark.sql(
      "CREATE TABLE gcat.db2.c USING `graft-snapshot` AS " +
        "SELECT id, id * 2 AS d FROM range(7)")
    assert(spark.sql("SELECT sum(d) FROM gcat.db2.c")
      .head().getLong(0) == (0L until 7L).map(_ * 2).sum)
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gcat.db2.c (id BIGINT) USING `graft-snapshot`"))
    assert(e.getMessage.toLowerCase.contains("already exists"))
    // a Layout append lands in the SAME table the SQL surface reads —
    // one commit protocol, no metastore to go stale
    Layout.appendSnapshot(
      Seq((100L, 200L)).toDF("id", "d").coalesce(1), s"$wh/db2/c")
    assert(spark.sql("SELECT count(*) FROM gcat.db2.c")
      .head().getLong(0) == 8)
  }

  test("ALTER TABLE ADD COLUMN commits metadata-only; TIMESTAMP AS " +
      "OF resolves by commit time; unsupported changes stay loud") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db4")
    spark.sql(
      "CREATE TABLE gcat.db4.a (id BIGINT) USING `graft-snapshot`")
    spark.sql("INSERT INTO gcat.db4.a SELECT id FROM range(5)")
    val preAlter = System.currentTimeMillis()
    Thread.sleep(1100) // local-FS mtime can be second-granular
    spark.sql("ALTER TABLE gcat.db4.a ADD COLUMN v BIGINT")
    // metadata-only: snapshot 3 references snapshot 2's files verbatim
    val hist = Layout.snapshots(spark, s"$wh/db4/a")
      .orderBy("snapshot_id").collect()
    assert(hist.length == 3)
    assert(hist(1).getLong(1) == hist(2).getLong(1)) // n_files equal
    spark.sql(
      "INSERT INTO gcat.db4.a SELECT id, id * 2 FROM range(10, 12)")
    val rows = spark.sql("SELECT id, v FROM gcat.db4.a ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(rows == ((0L until 5L).map(_ -> -1L) ++
      Seq(10L -> 20L, 11L -> 22L)))
    // TIMESTAMP AS OF a pre-alter instant: two-column world not yet
    // visible — schema has only id, count is the first insert's
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(preAlter))
    val asOf = spark.sql(
      s"SELECT * FROM gcat.db4.a TIMESTAMP AS OF '$ts'")
    assert(asOf.schema.fieldNames.toSeq == Seq("id"))
    assert(asOf.count() == 5)
    // round 13: DROP COLUMN is now metadata-only via column mapping
    // (GraftEvolutionSpec owns the full surface); narrowing still
    // refuses and the table keeps its schema
    spark.sql("ALTER TABLE gcat.db4.a DROP COLUMN v")
    assert(spark.table("gcat.db4.a").columns.toSeq == Seq("id"))
    intercept[Exception](
      spark.sql("ALTER TABLE gcat.db4.a ALTER COLUMN id TYPE INT"))
    assert(spark.table("gcat.db4.a").schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("metadata tables: <table>.history and <table>.files answer " +
      "from manifest metadata through pure SQL") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db5")
    spark.sql("""CREATE TABLE gcat.db5.m (id BIGINT)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'id')""")
    spark.sql("INSERT INTO gcat.db5.m SELECT /*+ REPARTITION(1) */ id FROM range(10)")
    spark.sql(
      "INSERT INTO gcat.db5.m SELECT /*+ REPARTITION(1) */ id FROM range(100, 105)")
    val hist = spark.sql(
      "SELECT snapshot_id, n_files, n_rows FROM gcat.db5.m.history " +
        "ORDER BY snapshot_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(hist == Seq((1L, 0L, 0L), (2L, 1L, 10L), (3L, 2L, 15L)))
    val files = spark.sql(
      "SELECT file, min_primary, max_primary FROM gcat.db5.m.files " +
        "ORDER BY min_primary").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(files == Seq((0L, 9L), (100L, 104L)))
    // a bogus metadata name still fails loudly
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gcat.db5.m.nope").collect())
    assert(e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("CALL graft.system.{optimize,vacuum,restore}: the maintenance " +
      "loop through pure SQL, results returned as rows") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db6")
    spark.sql("""CREATE TABLE gcat.db6.p (id BIGINT)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'id')""")
    (0 until 3).foreach { k =>
      // no hints (round 13): the sink's required ordering + AQE lands
      // each small INSERT as one range-clustered file
      spark.sql("INSERT INTO gcat.db6.p" +
        s" SELECT id FROM range(${k * 10}, ${k * 10 + 10})")
    }
    // optimize: 3 files bin-pack into 1; the new id comes back as a row
    val opt = spark.sql(
      "CALL gcat.system.optimize('db6.p', 100)").head()
    assert(opt.getLong(0) == 5L)
    assert(spark.sql("SELECT count(*) FROM gcat.db6.p.files")
      .head().getLong(0) == 1L)
    // restore to the pre-optimize image: same ROWS but a different
    // FILE SET (3 small files vs the packed 1), so it is a real
    // rollback commit, not the idempotent no-op
    assert(spark.sql("CALL gcat.system.restore('db6.p', 4)")
      .head().getLong(0) == 6L)
    // restore to snapshot 2 (first insert only)
    assert(spark.sql("CALL gcat.system.restore('db6.p', 2)")
      .head().getLong(0) == 7L)
    assert(spark.sql("SELECT count(*) FROM gcat.db6.p")
      .head().getLong(0) == 10L)
    // vacuum to the head: dropped manifests + deleted files reported
    val vac = spark.sql(
      "CALL gcat.system.vacuum('db6.p', 1)").head()
    assert(vac.getLong(0) == 6L) // manifests 1-6 dropped
    // 4 distinct files ever (3 inserts + 1 optimize); the restored
    // head keeps insert 1's file -> exactly 3 reclaimed
    assert(vac.getLong(1) == 3L, vac.toString)
    assert(spark.sql("SELECT count(*) FROM gcat.db6.p")
      .head().getLong(0) == 10L)
    // unknown procedure stays loud
    val e = intercept[Exception](
      spark.sql("CALL gcat.system.nope('db6.p')"))
    assert(e.getMessage.contains("unknown procedure") ||
      e.getMessage.toLowerCase.contains("failed to load routine"),
      e.getMessage)
  }

  test("CREATE TABLE ... PARTITIONED BY: SQL inserts land value " +
      "directories and equality queries prune to one partition") {
    initCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db3")
    spark.sql("""CREATE TABLE gcat.db3.p (id BIGINT, grp STRING)
      USING `graft-snapshot` PARTITIONED BY (grp)
      TBLPROPERTIES ('statsCol' = 'id')""")
    spark.sql("INSERT INTO gcat.db3.p " +
      "SELECT id, concat('g', id % 3) FROM range(30)")
    val files = Layout.snapshotInfo(spark, s"$wh/db3/p").get.files
    assert(files.size == 3 &&
      files.forall(_.matches("grp=g[0-2]/.*")), files)
    val pruned = spark.sql(
      "SELECT id FROM gcat.db3.p WHERE grp = 'g2'")
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 10)
    // MERGE on the partitioned table keeps the layout (replacement
    // files land back under their value dirs)
    Seq((2L, "g2")).toDF("id", "grp").createOrReplaceTempView("pdel")
    spark.sql("""MERGE INTO gcat.db3.p t USING pdel s ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM gcat.db3.p")
      .head().getLong(0) == 29)
    val after = Layout.snapshotInfo(spark, s"$wh/db3/p").get.files
    assert(after.forall(_.startsWith("grp=")), after)
    assert(spark.sql("SELECT id FROM gcat.db3.p WHERE grp = 'g0'")
      .rdd.getNumPartitions == 1)
  }
}
