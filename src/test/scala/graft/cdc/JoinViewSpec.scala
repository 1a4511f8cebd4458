package graft.cdc

import graft.SparkSpec

/** [[Changelog.transitionJoin]] — streaming JOIN-view maintenance: fact
  * mass follows the dim's current cohort, dim updates move it, dim
  * deletes retract it, fact churn is LSN-guarded, and the summed
  * emissions are invariant to how envelopes split across batches. */
class JoinViewSpec extends SparkSpec {

  private def fact(lsn: Long, op: String, id: Long, u: Long,
      v: Long): CdcEnvelope =
    CdcEnvelope(lsn, lsn, lsn * 1000, op, "x", "public", "facts",
      before = if (op == "d")
        Map("id" -> id.toString, "user_ref" -> u.toString) else Map.empty,
      after = if (op == "d") Map.empty
        else Map("id" -> id.toString, "user_ref" -> u.toString,
          "amount" -> v.toString))

  private def dim(lsn: Long, op: String, u: Long, cohort: String): CdcEnvelope =
    CdcEnvelope(lsn, lsn, lsn * 1000, op, "x", "public", "dims",
      before = if (op == "d") Map("id" -> u.toString) else Map.empty,
      after = if (op == "d") Map.empty
        else Map("id" -> u.toString, "cohort" -> cohort))

  private def step(prior: Option[Changelog.JoinViewState], es: CdcEnvelope*) =
    Changelog.transitionJoin(prior, es, "dims", "cohort", "amount")

  private def net(ds: Seq[ValueDelta]): Map[String, (Long, Long)] =
    ds.groupBy(_.group).map { case (g, xs) =>
      g -> (xs.map(_.dCount).sum, xs.map(_.dValueMicro).sum) }
      .filter { case (_, (n, v)) => n != 0 || v != 0 }

  test("facts before dim are silent; dim arrival emits the mass") {
    val (s1, d1) = step(None, fact(1, "c", 10, 5, 100), fact(3, "c", 11, 5, 40))
    assert(d1.isEmpty && s1.n == 2 && s1.sumMicro == 140)
    val (s2, d2) = step(Some(s1), dim(5, "u", 5, "a"))
    assert(net(d2) == Map("a" -> (2L, 140L)))
    assert(s2.dimAlive && s2.cohort == "a")
  }

  test("dim move carries the mass; delete retracts; fact ops attribute live") {
    val (s1, _) = step(None,
      fact(1, "c", 10, 5, 100), dim(2, "u", 5, "a"), fact(3, "c", 11, 5, 40))
    // move a -> b: retract 2/140 from a, add to b
    val (s2, d2) = step(Some(s1), dim(4, "u", 5, "b"))
    assert(net(d2) == Map("a" -> (-2L, -140L), "b" -> (2L, 140L)))
    // amount revision while in b: value telescopes, count unchanged
    val (s3, d3) = step(Some(s2), fact(5, "u", 10, 5, 130))
    assert(net(d3) == Map("b" -> (0L, 30L)))
    // fact delete while in b
    val (s4, d4) = step(Some(s3), fact(6, "d", 11, 5, 0))
    assert(net(d4) == Map("b" -> (-1L, -40L)))
    // dim delete retracts what remains
    val (s5, d5) = step(Some(s4), dim(7, "d", 5, ""))
    assert(net(d5) == Map("b" -> (-1L, -130L)))
    assert(!s5.dimAlive && s5.n == 1 && s5.sumMicro == 130)
    // fact churn while dim dead: state moves, nothing emits
    val (s6, d6) = step(Some(s5), fact(8, "c", 12, 5, 7))
    assert(d6.isEmpty && s6.n == 2)
    // dim resurrect: the whole live mass lands in the new cohort
    val (_, d7) = step(Some(s6), dim(9, "u", 5, "c"))
    assert(net(d7) == Map("c" -> (2L, 137L)))
  }

  test("stale replays are no-ops; per-fact LSN guard holds") {
    val (s1, _) = step(None, dim(5, "u", 5, "a"), fact(6, "c", 10, 5, 100))
    val (s2, d2) = step(Some(s1),
      dim(4, "u", 5, "zzz"), fact(6, "c", 10, 5, 100), fact(2, "u", 10, 5, 9))
    assert(d2.isEmpty)
    assert(s2.cohort == "a" && s2.n == 1 && s2.sumMicro == 100)
  }

  test("net emissions are invariant to the batch split") {
    val events = Seq(
      fact(1, "c", 10, 5, 100), dim(2, "u", 5, "a"),
      fact(3, "c", 11, 5, 40), dim(4, "u", 5, "b"),
      fact(5, "u", 10, 5, 130), fact(6, "d", 11, 5, 0), dim(7, "u", 5, "a"))
    def run(splits: Seq[Seq[CdcEnvelope]]): Map[String, (Long, Long)] = {
      var st: Option[Changelog.JoinViewState] = None
      val out = splits.flatMap { b =>
        val (n, ds) = step(st, b: _*); st = Some(n); ds
      }
      net(out)
    }
    val oneShot = run(Seq(events))
    val perEvent = run(events.map(Seq(_)))
    val lopsided = run(Seq(events.take(2), events.slice(2, 3), events.drop(3)))
    // the final view: fact 10 alive at 130 in cohort a
    assert(oneShot == Map("a" -> (1L, 130L)))
    assert(perEvent == oneShot && lopsided == oneShot)
  }
}
