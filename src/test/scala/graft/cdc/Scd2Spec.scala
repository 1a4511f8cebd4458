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

  test("streaming transition: closure crosses the batch boundary") {
    val (st1, out1) = Changelog.transitionScd2(None, Seq(env(1, "c", "7")))
    assert(out1.map(r => (r.validFrom, r.validTo)) == Seq((1L, None)))
    val (st2, out2) = Changelog.transitionScd2(st1, Seq(env(5, "u", "7")))
    // batch 2 closes batch 1's version and opens its own
    assert(out2.map(r => (r.validFrom, r.validTo)) ==
      Seq((1L, Some(5L)), (5L, None)))
    assert(st2.exists(_.open.exists(_.lsn == 5L)))
  }

  test("streaming transition: stale replay is dropped, even after delete") {
    val (st1, _) = Changelog.transitionScd2(None,
      Seq(env(1, "c", "7"), env(4, "d", "7")))
    assert(st1.exists(s => s.lastLsn == 4L && s.open.isEmpty)) // tombstone
    // a replayed pre-delete event must NOT resurrect the key
    val (st2, out2) = Changelog.transitionScd2(st1, Seq(env(3, "u", "7")))
    assert(out2.isEmpty && st2 == st1)
  }

  test("streaming transition: open and close within one batch") {
    val (_, out) = Changelog.transitionScd2(None,
      Seq(env(2, "c", "7"), env(6, "u", "7")))
    // version 2 appears twice (open, then closed) — the sink's
    // max(validTo) pre-aggregate makes the pair order-independent
    assert(out.map(r => (r.validFrom, r.validTo)) ==
      Seq((2L, None), (2L, Some(6L)), (6L, None)))
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

  private def txEnv(lsn: Long, txId: Long, op: String, id: String,
      et: String): CdcEnvelope = {
    val img = Map("id" -> id, "event_type" -> et)
    CdcEnvelope(lsn, txId, lsn * 1000, op, "db", "s1", "users",
      before = if (op == "d") img else Map.empty,
      after = if (op == "d") Map.empty else img)
  }

  test("txConsistentSnapshot: a straddling transaction is ALL excluded") {
    // tx 1 = lsns 1,2 (committed ≤ W=4); tx 2 = lsns 3,5 — lsn 3 sits
    // below the watermark but the tx's last lsn (5) does not, so BOTH
    // rows are invisible: key 9 keeps tx 1's image, key 8 never exists
    val env = Seq(
      txEnv(1, 1, "c", "9", "signup"),
      txEnv(2, 1, "u", "9", "click"),
      txEnv(3, 2, "u", "9", "error"), // below W, but tx 2 straddles
      txEnv(5, 2, "c", "8", "signup"))
    val got = Changelog.txConsistentSnapshot(env.toDS(), watermarkLsn = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set((9L, 2L, "click")))
    // a naive lsn <= W filter would have returned key 9 @ lsn 3 "error"
    val torn = Changelog.txConsistentSnapshot(env.toDS(), watermarkLsn = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(torn == Set((9L, 3L, "error"), (8L, 5L, "signup")))
  }

  test("txConsistentSnapshot: deletes inside visible transactions drop keys") {
    val env = Seq(
      txEnv(1, 1, "c", "7", "signup"),
      txEnv(2, 2, "d", "7", "gone"))
    val got = Changelog.txConsistentSnapshot(env.toDS(), watermarkLsn = 9)
      .collect()
    assert(got.isEmpty)
  }
}
