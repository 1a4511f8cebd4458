package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests (SURVEY §5.3): random c/u/d interleavings per key ⇒
  * compaction equals last-write-wins; per-schema live count equals the
  * number of live keys. Pure-logic properties run on `compactBatch` (the
  * transition function shared with the streaming operator). Seeded random
  * generation (no scalatestplus bridge in the offline cache). */
class ChangelogPropsSpec extends AnyFunSuite {

  private def randomEnvelopes(rnd: Random, n: Int): Seq[CdcEnvelope] =
    (1 to n).map { i =>
      val schema = s"schema${rnd.nextInt(3) + 1}"
      val id = rnd.nextInt(5) + 1
      val op = rnd.nextInt(10) match {
        case x if x < 3 => "c"
        case x if x < 7 => "u"
        case x if x < 9 => "d"
        case _ => "r"
      }
      val row = Map("id" -> id.toString, "full_name" -> s"name$i")
      CdcEnvelope(lsn = i.toLong, txId = i.toLong, tsMs = i.toLong, op = op,
        db = "db", schema = schema, table = "users",
        before = if (op == "c" || op == "r") Map.empty else row,
        after = if (op == "d") Map.empty else row)
    }

  test("compaction = last-write-wins; live count = live keys per schema") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val envelopes = randomEnvelopes(rnd, 60)
      val deltas = Changelog.compactBatch(envelopes)

      // Oracle: last op per key decides liveness.
      val lastOp = envelopes.groupBy(e =>
        CdcEnvelope.keyOf(e.schema, e.image("id"))).view
        .mapValues(_.maxBy(_.lsn)).toMap
      val expectedAlive = lastOp.collect {
        case (k, e) if !e.isDelete => k
      }.toSet

      val gotAlive = deltas.collect { case (k, d) if d.alive => k }.toSet
      assert(gotAlive == expectedAlive)

      // Delta sum per schema == live keys per schema.
      val deltaCount = deltas.values.groupBy(_.schema).view
        .mapValues(_.map(_.delta).sum).toMap.filter(_._2 != 0)
      val expectedCount = expectedAlive.groupBy(_.split('|')(0)).view
        .mapValues(_.size).toMap.filter(_._2 != 0)
      assert(deltaCount == expectedCount)
    }
  }

  test("transition is idempotent under replay (state LSN guard)") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val envelopes = randomEnvelopes(rnd, 20)
      envelopes.groupBy(e => CdcEnvelope.keyOf(e.schema, e.image("id")))
        .foreach { case (_, keyEvs) =>
          val (st1, d1) = Changelog.transition(None, keyEvs)
          // Replaying the same events against the resulting state is a no-op.
          val (st2, d2) = Changelog.transition(st1, keyEvs)
          assert(st2 == st1)
          assert(d2.isEmpty)
          assert(d1.nonEmpty)
        }
    }
  }
}
