package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[Changelog.compactValue]] — IVM beyond counts: per-group SUM/COUNT
  * maintenance deltas under updates (value change), group moves
  * (retract+add pair), deletes (retract the STATE's value, not the
  * envelope's), and stale replays (no-op). */
class ValueCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def env(lsn: Long, op: String, id: Long, group: String,
      v: Long): CdcEnvelope =
    CdcEnvelope(lsn, lsn, lsn * 1000, op, "experiment", "public", "users",
      before = if (op == "d") Map("id" -> id.toString) else Map.empty,
      after = if (op == "d") Map.empty
        else Map("id" -> id.toString, "grp" -> group, "v" -> v.toString))

  private val grp = (e: CdcEnvelope) => e.image.getOrElse("grp", "")
  private val vOf = (e: CdcEnvelope) => e.image.getOrElse("v", "0").toLong

  private def step(prior: Option[Changelog.ValueState], es: CdcEnvelope*) =
    Changelog.transitionValue(prior, es, grp, vOf)

  test("insert, same-group update, group move, delete") {
    // insert: +1/+v
    val (s1, d1) = step(None, env(1, "c", 7, "a", 100))
    assert(d1 == Seq(ValueDelta("public|7", "a", 1, alive = true, 1, 100)))
    // update in place: 0 count, value telescopes
    val (s2, d2) = step(s1, env(2, "u", 7, "a", 130))
    assert(d2 == Seq(ValueDelta("public|7", "a", 2, alive = true, 0, 30)))
    // group move: retract old, add new
    val (s3, d3) = step(s2, env(3, "u", 7, "b", 50))
    assert(d3 == Seq(
      ValueDelta("public|7", "a", 3, alive = false, -1, -130),
      ValueDelta("public|7", "b", 3, alive = true, 1, 50)))
    // delete: retracts the tracked (group, value) — the envelope has none
    val (s4, d4) = step(s3, env(4, "d", 7, "", 0))
    assert(d4 == Seq(ValueDelta("public|7", "b", 4, alive = false, -1, -50)))
    assert(s4.exists(st => !st.alive && st.lsn == 4))
  }

  test("stale replay and delete-of-unseen are no-ops (bar the tombstone)") {
    val (s1, _) = step(None, env(5, "c", 8, "a", 10))
    val (s2, d2) = step(s1, env(3, "u", 8, "a", 999)) // stale
    assert(d2.isEmpty && s2 == s1)
    val (s3, d3) = step(None, env(6, "d", 9, "", 0)) // never-live key
    assert(d3.isEmpty && s3.exists(st => !st.alive && st.lsn == 6))
    // a pre-delete event replayed late must not resurrect the key
    val (_, d4) = step(s3, env(2, "c", 9, "a", 42))
    assert(d4.isEmpty)
  }

  test("batch telescoping: only the latest event of a burst matters") {
    val (st, ds) = step(None,
      env(1, "c", 5, "a", 10), env(2, "u", 5, "b", 20), env(3, "u", 5, "a", 30))
    assert(ds == Seq(ValueDelta("public|5", "a", 3, alive = true, 1, 30)))
    assert(st.exists(s => s.group == "a" && s.valueMicro == 30))
  }

  test("streaming deltas sum to the latest-image aggregate across batches") {
    val input = MemoryStream[CdcEnvelope]
    val sums = scala.collection.mutable.Map[String, (Long, Long)]()
    val q = Changelog.compactValue(input.toDS(), grp, vOf).writeStream
      .outputMode("update")
      .option("checkpointLocation", tmpDir("vc-ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[ValueDelta], _: Long) =>
        b.groupBy("group")
          .agg(sum("dCount").as("n"), sum("dValueMicro").as("sv"))
          .collect().foreach { r =>
            val (n0, v0) = sums.getOrElse(r.getString(0), (0L, 0L))
            sums(r.getString(0)) = (n0 + r.getLong(1), v0 + r.getLong(2))
          }
      }.start()
    input.addData(Seq(
      env(1, "c", 1, "a", 100), env(2, "c", 2, "a", 200),
      env(3, "c", 3, "b", 300)))
    q.processAllAvailable()
    input.addData(Seq(
      env(4, "u", 1, "a", 150), // value change within group
      env(5, "u", 2, "b", 250), // group move a -> b
      env(6, "d", 3, "", 0))) // delete from b
    q.processAllAvailable()
    q.stop()
    // latest images: 1 -> (a, 150), 2 -> (b, 250), 3 deleted
    assert(sums.filter(_._2._1 != 0) ==
      Map("a" -> ((1L, 150L)), "b" -> ((1L, 250L))))
  }
}
