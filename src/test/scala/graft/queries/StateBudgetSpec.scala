package graft.queries

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.{SparkSpec, SparkEntry}

/** Streaming-state regression guard (VERDICT r9/r10 item: the streaming
  * analog of ShuffleBudgetSpec). A stateful streaming operator whose
  * state is NOT bounded — a dedup without watermark eviction, a
  * stream-stream join keeping both sides forever — looks identical to a
  * bounded one at spec scale until the state store eats an executor at
  * 100×. The observable is the engine's own progress reports: each
  * QueryProgressEvent carries `stateOperators.numRowsTotal`, the exact
  * row count the state store holds after that micro-batch. Per query:
  * run the entry (its streams run real micro-batches inside), take the
  * LAST progress per stream, sum state rows across its operators, and
  * assert the total under a per-query ceiling.
  *
  * Ceilings are ~3× the rows measured at spec config (local[4], 4
  * shuffle partitions, sf0.01) — far above micro-batch choreography
  * wobble (state rows per plan are deterministic to within trigger
  * boundaries), far below the unbounded-retention blowup this guards
  * against (which grows with the INPUT, 10×+ at the next sf). Measured
  * at calibration (2026-08, round 11): st4 446, st5 722, st9 502,
  * iv2 2 (post-watermark cleanup — its ceiling is held at an absolute
  * 200, far above trigger-boundary wobble on a near-zero end state),
  * sc3 150.
  */
class StateBudgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private val budgets: Seq[(String, Long)] = Seq(
    "st4_stream_dedup" -> 1_400L,
    "st5_stream_near_dedup" -> 2_200L,
    "st9_stream_dedup_window" -> 1_600L,
    "iv2_stream_interval_join" -> 200L,
    "sc3_stream_scd2" -> 500L)

  test("streaming entries keep bounded state (progress-report rows)") {
    budgets.foreach { case (name, ceiling) =>
      // last progress per stream id — entries may run several streams
      // (fixture replays, recovery re-runs); the END state is the
      // boundedness claim
      val last = TrieMap.empty[java.util.UUID, Long]
      val listener = new StreamingQueryListener {
        import StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          last.put(e.progress.id,
            e.progress.stateOperators.map(_.numRowsTotal).sum)
      }
      spark.streams.addListener(listener)
      try {
        SparkEntry.queries(name)(spark, sf).count()
        Thread.sleep(500) // async listener bus drains
        val total = last.values.sum
        assert(last.nonEmpty && total > 0,
          s"$name: no stateful streaming progress observed — the entry " +
            "stopped running real micro-batches?")
        assert(total <= ceiling,
          s"$name holds $total state rows at end of run, ceiling " +
            s"$ceiling — an eviction/watermark path regressed")
        info(s"$name: $total state rows (ceiling $ceiling)")
      } finally spark.streams.removeListener(listener)
    }
  }
}
