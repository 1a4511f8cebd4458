package graft.cdc

import graft.SparkSpec

/** SCD Type-2 history materialization ([[Changelog.scd2]]) — interval
  * semantics the oracle entries (sc1/sc2) grade at corpus scale, pinned
  * here on the small cases that make the contract visible: every c/u
  * opens a version, ANY next change closes it (deletes included), a
  * delete opens nothing, and a never-live key leaves no history. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def env(lsn: Long, op: String, id: String,
      attrs: Map[String, String] = Map.empty): CdcEnvelope = {
    val img = Map("id" -> id) ++ attrs
    CdcEnvelope(lsn, lsn, lsn * 1000, op, "db", "s1", "users",
      before = if (op == "d") img else Map.empty,
      after = if (op == "d") Map.empty else img)
  }

  test("create/update chains close at the next change; tail is current") {
    val hist = Changelog.scd2(Seq(
        env(1, "c", "7", Map("v" -> "a")),
        env(5, "u", "7", Map("v" -> "b")),
        env(9, "u", "7", Map("v" -> "c"))).toDS())
      .orderBy("valid_from_lsn")
      .select("valid_from_lsn", "valid_to_lsn", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(hist == Seq((1L, Some(5L), false), (5L, Some(9L), false),
      (9L, None, true)))
  }

  test("a delete closes the open version and opens none") {
    val hist = Changelog.scd2(Seq(
        env(1, "c", "7"), env(4, "d", "7")).toDS())
      .select("valid_from_lsn", "valid_to_lsn", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(hist == Seq((1L, Some(4L), false))) // closed; nothing current
  }

  test("a never-live key (lone delete) leaves no history") {
    assert(Changelog.scd2(Seq(env(3, "d", "9")).toDS()).count() == 0)
  }

  test("keys and schemas partition independently") {
    val hist = Changelog.scd2(Seq(
        env(1, "c", "7"), env(2, "c", "8"), env(6, "u", "7")).toDS())
      .select("key_id", "valid_from_lsn", "valid_to_lsn")
      .as[(String, Long, Option[Long])].collect().toSet
    // key 8's version is NOT closed by key 7's later update
    assert(hist == Set(("7", 1L, Some(6L)), ("7", 6L, None),
      ("8", 2L, None)))
  }
}
