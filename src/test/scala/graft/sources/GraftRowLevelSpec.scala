package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.ops.Layout

/** SQL MERGE INTO / UPDATE / DELETE on catalog snapshot tables — the
  * group-based row-level-operation protocol: results must be exact AND
  * file-pruned (runtime `_file` group filtering means files holding no
  * matched row survive by name, never rewritten). */
class GraftRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = tmpDir("graft-rl-wh")
  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.grl",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grl.db")
  }

  private def files(table: String): Set[String] =
    Layout.snapshotInfo(spark, s"$wh/db/$table").get.files.toSet

  test("MERGE INTO: delete/update/insert arms apply exactly; files " +
      "with no matched row are carried by name (file-pruned CoW)") {
    init()
    spark.sql("""CREATE TABLE grl.db.m (id BIGINT, v BIGINT)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'id')""")
    spark.sql("INSERT INTO grl.db.m SELECT id, id FROM range(10)")
    spark.sql("INSERT INTO grl.db.m SELECT id, id FROM range(100, 110)")
    val before = files("m")
    // round 13: the sink's RequiresDistributionAndOrdering (ordered on
    // the stats column, AQE-coalesced) lands each small INSERT as ONE
    // range-clustered file — the geometry is now table-governed
    assert(before.size == 2, s"expected one file per insert: $before")
    Seq((3L, 333L, "u"), (5L, 0L, "d"), (500L, 1L, "c"))
      .toDF("id", "v", "op").createOrReplaceTempView("rl_src")
    spark.sql("""MERGE INTO grl.db.m t USING rl_src s ON t.id = s.id
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    val after = files("m")
    // matched ids 3 and 5 live in the first insert's single file;
    // the second insert's file (ids 100-109, no matches) must survive
    // by name
    assert((before & after).size == before.size - 1,
      s"rewrote too many files: before=$before after=$after")
    val got = spark.sql("SELECT id, v FROM grl.db.m ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val want = ((0L until 10L).filter(_ != 5).map(i =>
        i -> (if (i == 3) 333L else i)) ++
      (100L until 110L).map(i => i -> i) :+ (500L -> 1L)).sortBy(_._1)
    assert(got == want)
    // row-count bookkeeping survived the partial rewrite
    assert(Layout.snapshotInfo(spark, s"$wh/db/m").get.rows == 20L)
  }

  test("UPDATE and DELETE through SQL: exact, pruned, history linear") {
    init()
    spark.sql("""CREATE TABLE grl.db.u (id BIGINT, v BIGINT)
      USING `graft-snapshot` TBLPROPERTIES ('statsCol' = 'id')""")
    spark.sql("INSERT INTO grl.db.u SELECT id, id FROM range(10)")
    spark.sql("INSERT INTO grl.db.u SELECT id, id FROM range(100, 110)")
    val before = files("u")
    spark.sql("UPDATE grl.db.u SET v = -1 WHERE id = 101")
    val afterU = files("u")
    assert((before & afterU).size >= before.size - 2,
      s"UPDATE rewrote too many files: $before -> $afterU")
    assert(spark.sql("SELECT v FROM grl.db.u WHERE id = 101")
      .head().getLong(0) == -1L)
    spark.sql("DELETE FROM grl.db.u WHERE id < 2")
    assert(spark.sql("SELECT count(*) FROM grl.db.u")
      .head().getLong(0) == 18)
    assert(spark.sql("SELECT min(id) FROM grl.db.u")
      .head().getLong(0) == 2)
    // history: create + 2 inserts + update + delete = 5 linear commits
    assert(Layout.snapshots(spark, s"$wh/db/u").count() == 5)
    // time travel still reaches the pre-update image
    assert(spark.sql("SELECT v FROM grl.db.u VERSION AS OF 3 " +
      "WHERE id = 101").head().getLong(0) == 101L)
  }
}
