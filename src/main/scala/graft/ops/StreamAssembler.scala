package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues}

/** CONTINUOUS packed-sequence assembly: the streaming form of
  * [[TextOps.assembleSequences]], producing fixed-`budget` training
  * rows from an unbounded tokenized document stream (the "tokenize the
  * crawl as it lands, emit ready batches" end of a live pipeline).
  *
  * Per shard, state is ONE partial window — the ≤`budget` leftover
  * tokens and their contributing doc ids, plus the next window id:
  * O(shards × budget), independent of stream length (RocksDB-backed
  * like every graft streaming op). Each micro-batch appends its docs
  * (id-ordered within the batch for determinism), emits every window
  * it fills, and carries the remainder.
  *
  * Ordering contract: batch assembly lays docs in global id order;
  * a stream can only be arrival-ordered across micro-batches, so the
  * two agree exactly when ids arrive monotonically (the CDC/crawl
  * ingest case) — StreamingCurationSpec pins that equivalence and the
  * carry/conservation invariants.
  */
object StreamAssembler {

  final case class TokDoc(doc_id: Long, shard: Long, tokens: Seq[String])
  final case class PackedSeq(shard: Long, window_id: Long,
      tokens: Seq[String], doc_ids: Seq[Long], n_tokens: Long)

  /** Next window id + the carried partial window (tokens and their
    * contributing doc ids). */
  final case class Carry(nextWin: Long, toks: Seq[String], ids: Seq[Long])

  private final class AssembleProcessor(budget: Int)
      extends StatefulProcessor[Long, TokDoc, PackedSeq] {
    @transient private var state
        : org.apache.spark.sql.streaming.ValueState[Carry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Carry]("carry",
        Encoders.product[Carry],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TokDoc],
        timers: TimerValues): Iterator[PackedSeq] = {
      val Carry(nextWin0, carryToks, carryIds) =
        if (state.exists()) state.get() else Carry(0L, Nil, Nil)
      var nextWin = nextWin0
      val buf = scala.collection.mutable.ArrayBuffer[String](carryToks: _*)
      val ids = scala.collection.mutable.ArrayBuffer[Long](carryIds: _*)
      val out = scala.collection.mutable.ArrayBuffer.empty[PackedSeq]
      // id-order within the batch = the batch form's layout order
      rows.toArray.sortBy(_.doc_id).foreach { d =>
        if (d.tokens.nonEmpty) {
          buf ++= d.tokens
          ids += d.doc_id
          while (buf.length >= budget) {
            val win = buf.take(budget)
            out += PackedSeq(key, nextWin, win.toSeq, ids.toSeq, budget.toLong)
            nextWin += 1
            buf.remove(0, budget)
            // the doc spanning the cut stays a contributor of the carry
            if (buf.isEmpty) ids.clear() else { ids.clear(); ids += d.doc_id }
          }
        }
      }
      state.update(Carry(nextWin, buf.toSeq, ids.toSeq))
      out.iterator
    }
  }

  /** Lifts a tokenized doc stream into full packed windows; the final
    * partial window per shard stays in state until filled. */
  def assemble(docs: Dataset[TokDoc], budget: Int): Dataset[PackedSeq] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard)
      .transformWithState(new AssembleProcessor(budget), TimeMode.None(),
        OutputMode.Append())
  }
}
