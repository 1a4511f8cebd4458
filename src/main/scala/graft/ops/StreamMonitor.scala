package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Continuous curation monitoring on the Spark 4 arbitrary-state API
  * (`transformWithState` / `StatefulProcessor` — the successor of
  * `mapGroupsWithState`, RocksDB-backed): per-stratum running totals of
  * docs seen vs kept by a quality gate, emitted as updated rows each
  * micro-batch. The state is one (seen, kept) pair per stratum —
  * O(strata), never O(docs) — and the optional TTL expires idle strata,
  * so a long-running monitor over an unbounded source mix holds bounded
  * state.
  *
  * Input rows are (stratum, keptFlag); output rows are
  * (stratum, seen, kept, kept_pml) with the running per-mille keep rate
  * (exact integer arithmetic).
  */
object StreamMonitor {

  final case class GateEvent(stratum: String, kept: Boolean)
  final case class GateStats(stratum: String, seen: Long, kept: Long,
      kept_pml: Long)

  private final class RateProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, GateEvent, GateStats] {
    @transient private var state
        : org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), ttl)

    override def handleInputRows(key: String, rows: Iterator[GateEvent],
        timers: TimerValues): Iterator[GateStats] = {
      var (seen, kept) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { e => seen += 1; if (e.kept) kept += 1 }
      state.update((seen, kept))
      Iterator.single(GateStats(key, seen, kept, kept * 1000L / seen))
    }
  }

  /** Lifts a stream of (stratum, keptFlag) gate decisions into running
    * per-stratum keep-rate stats. `ttl` bounds state for strata that go
    * quiet (TTLConfig.NONE keeps them forever).
    *
    * TTL RESET SEMANTICS: with a TTL configured, an idle stratum's
    * (seen, kept) state expires, and when events resume the running
    * totals RESTART FROM ZERO — downstream consumers see a
    * discontinuity (counts smaller than previously emitted) that is
    * indistinguishable from a brand-new stratum. That is the deliberate
    * trade: bounded state for unbounded stratum cardinality. Consumers
    * needing lifetime totals must either run TTLConfig.NONE (state is
    * O(strata) — fine when the stratum domain is bounded, the design
    * point here) or treat emitted rows as deltas-since-reset and
    * re-accumulate (sum of max-per-epoch) downstream; a monotonicity
    * break in (seen, kept) IS the reset marker. */
  def keepRate(events: Dataset[GateEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[GateStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.stratum)
      .transformWithState(new RateProcessor(ttl), TimeMode.None(),
        OutputMode.Update())
  }
}
