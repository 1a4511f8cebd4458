package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeEncoder

/** Byte-pair-encoding tokenizer, Spark-first.
  *
  * TRAIN — the only corpus-scale stage is a word-frequency aggregate
  * (explode → partial+final hash count) reduced to the top
  * `maxWordTypes` types by a TakeOrdered head (no full sort, no full
  * collect). The BPE merge loop then runs DRIVER-LOCAL on that compact
  * weighted lexicon — the standard scalable formulation: Sennrich's
  * algorithm is defined over word types × frequencies, not over the
  * corpus, so 100 TB of text trains from ONE aggregate whose output is
  * bounded by vocabulary, not data size. Zipf coverage: a 20k-type cap
  * covers the overwhelming mass of running words; words beyond the cap
  * still tokenize (down to characters) — BPE is open-vocabulary.
  *
  * APPLY — a scan-local codegen expression
  * ([[graft.functions.BpeEncode]]) with the merge table shipped once
  * per executor as a codegen reference object: zero shuffle, zero
  * join, per-word-type memoization. Tokenizing the corpus touches it
  * exactly once.
  *
  * Determinism: the type head is totally ordered (freq desc, word asc
  * — word is unique), the merge loop breaks pair-count ties
  * lexicographically, and the apply kernel is a pure function of
  * (text, merges) — the same corpus trains the same model on any
  * cluster layout, and tk1x grades the lossless-roundtrip invariant
  * against DuckDB.
  */
object Tokenizer {

  /** A trained merge table (learn order = rank) plus the base symbols
    * (single characters of the training lexicon + the `</w>` marker). */
  final case class BpeModel(merges: IndexedSeq[(String, String)],
      baseSymbols: IndexedSeq[String]) {
    /** Learned multi-char symbols, in rank order. */
    def mergedSymbols: IndexedSeq[String] = merges.map(p => p._1 + p._2)

    /** Token vocabulary with deterministic ids: 0 is reserved for OOV
      * (`<unk>` — a character the training lexicon never saw), base
      * symbols follow in lexicographic order, then learned merges in
      * rank order — the conventional BPE vocab layout, reproducible
      * from the merge table alone. */
    def vocab: IndexedSeq[String] =
      (baseSymbols.sorted ++ mergedSymbols).distinct
  }

  /** Distributed word-frequency table — the corpus-scale stage of
    * training (and a useful census by itself). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(lower(col(textCol)),
        lit(BpeEncoder.WordPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learns `numMerges` BPE merges from the corpus (capped at the
    * `maxWordTypes` most frequent word types; stops early when no
    * adjacent pair repeats). */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int = 200,
      maxWordTypes: Int = 20000): BpeModel = {
    val top = wordCounts(df, textCol)
      .orderBy(desc("freq"), asc("word")) // + limit = TakeOrdered head
      .limit(maxWordTypes)
      .collect()
    val seqs: Array[Array[String]] = top.map { r =>
      r.getString(0).map(String.valueOf(_)).toArray :+ BpeEncoder.EndOfWord
    }
    val freqs: Array[Long] = top.map(_.getLong(1))
    val base = (seqs.iterator.flatten.toSet + BpeEncoder.EndOfWord)
      .toIndexedSeq.sorted
    BpeModel(mergeLoop(seqs, freqs, numMerges), base)
  }

  /** The driver-local merge loop, INCREMENTAL (Sennrich's trick): pair
    * counts and a pair→words occurrence index are built once; each
    * merge then re-counts only the words that actually contain the
    * merged pair, so a merge costs O(affected words), not O(lexicon) —
    * the difference between a 200-merge toy vocab and a realistic
    * 32k–100k-merge vocab on the same driver. The argmax rides a lazy
    * max-heap (stale entries skipped on pop, deterministic
    * (count desc, pair asc) order).
    *
    * Semantics are EXACTLY the naive recount-every-step loop
    * (TokenizerSpec pins equality against a reference implementation):
    * adjacent pairs counted with overlap, merges applied left-to-right
    * non-overlapping, ties to the lexicographically smallest pair,
    * stop below weighted count 2. */
  private def mergeLoop(seqs: Array[Array[String]], freqs: Array[Long],
      numMerges: Int): IndexedSeq[(String, String)] = {
    type Pair = (String, String)
    val stats = mutable.HashMap.empty[Pair, Long]
    val where = mutable.HashMap.empty[Pair, mutable.Set[Int]]
    // max-heap: highest count first, ties → smallest pair
    val heapOrd: Ordering[(Long, Pair)] = (x, y) => {
      val c = java.lang.Long.compare(x._1, y._1)
      if (c != 0) c else implicitly[Ordering[Pair]].compare(y._2, x._2)
    }
    val heap = mutable.PriorityQueue.empty[(Long, Pair)](heapOrd)

    def touch(i: Int, sign: Long): Unit = {
      val s = seqs(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = stats.getOrElse(p, 0L) + sign * freqs(i)
        if (c <= 0L) stats.remove(p)
        else {
          stats.update(p, c)
          // every live count needs a heap snapshot — including counts
          // LOWERED by a retract, whose old (higher) entries are now
          // stale and will be skipped at pop
          heap.enqueue((c, p))
          if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += i
        }
        j += 1
      }
    }
    seqs.indices.foreach(touch(_, 1L))

    val merges = IndexedSeq.newBuilder[Pair]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      // pop stale entries until the top reflects a live count
      var best: Option[(Long, Pair)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val (c, p) = heap.dequeue()
        if (stats.get(p).contains(c)) best = Some((c, p))
      }
      best match {
        case Some((c, p @ (a, b))) if c >= 2L =>
          merges += p
          // only words indexed under p can contain it; entries may be
          // stale (pair gone after earlier merges) — touch() recounts
          // them away harmlessly since the adjacency test re-checks
          val candidates = where.remove(p).getOrElse(mutable.Set.empty)
          candidates.toArray.sorted.foreach { i =>
            val s = seqs(i)
            var has = false
            var j = 0
            while (!has && j < s.length - 1) {
              has = s(j) == a && s(j + 1) == b
              j += 1
            }
            if (has) {
              touch(i, -1L) // retract the word's old pair counts
              val next = new mutable.ArrayBuffer[String](s.length)
              var k = 0
              while (k < s.length) {
                if (k < s.length - 1 && s(k) == a && s(k + 1) == b) {
                  next += a + b; k += 2 // L→R non-overlapping
                } else { next += s(k); k += 1 }
              }
              seqs(i) = next.toArray
              touch(i, 1L) // add the merged word's pair counts
            }
          }
        case _ => exhausted = true // no pair worth a vocab slot
      }
      step += 1
    }
    merges.result()
  }

  /** `tokens` = BPE token array of `textCol` under `model`: lowercases
    * with Spark's own `lower` (engine-parity with the SQL oracle) and
    * applies the scan-local codegen kernel. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // idempotent
    df.select(col(idCol),
      call_function("bpe_encode", lower(col(textCol)),
        typedlit(model.merges.map(p => Seq(p._1, p._2)))).as("tokens"))
  }

  /** `token_ids` = integer ids of a `tokens` column under the model's
    * deterministic vocab (OOV → 0). The vocab map rides as a literal
    * (O(vocab), like the classifier weights in qc1) — scan-local, no
    * join against a vocab table. */
  def encodeIds(df: DataFrame, idCol: String, tokensCol: String,
      model: BpeModel): DataFrame = {
    val idMap = typedlit(model.vocab.zipWithIndex
      .map { case (t, i) => t -> (i + 1) }.toMap)
    df.withColumn("token_ids",
      transform(col(tokensCol),
        t => coalesce(try_element_at(idMap, t), lit(0))))
  }

  /** Inverse of [[encodeIds]]: `tokens` from `token_ids` (id 0 →
    * literal `<unk>`). `get()` is the 0-based ANSI-safe indexing.
    * Other columns pass through (both codecs are projections). */
  def decodeIds(df: DataFrame, idCol: String, idsCol: String,
      model: BpeModel): DataFrame = {
    val vocabArr = typedlit("<unk>" +: model.vocab)
    df.withColumn("tokens", transform(col(idsCol), i => get(vocabArr, i)))
  }

  /** A trained unigram-LM (SentencePiece-family) vocabulary: pieces
    * with micro-nat integer log-probs (exactly reproducible literals)
    * plus the out-of-vocabulary character floor. */
  final case class UnigramModel(pieces: IndexedSeq[(String, Long)],
      unkMicro: Long)

  /** Learns a unigram-LM vocabulary of `vocabSize` pieces by EM over
    * the segmentation lattice — the SAME scalable shape as
    * [[trainBpe]]: the corpus contributes one word-frequency
    * aggregate, the EM loop runs driver-local on the bounded type
    * lexicon (forward–backward per word TYPE, weighted by frequency).
    * Single characters are never pruned, so segmentation is total and
    * lossless (the ug1x-graded invariant). All normalizations sum in
    * sorted piece order — bit-deterministic on any cluster layout. */
  def trainUnigram(df: DataFrame, textCol: String, vocabSize: Int = 8000,
      maxPieceLen: Int = 8, seedSize: Int = 100000, emEpochs: Int = 4,
      maxWordTypes: Int = 20000): UnigramModel = {
    val top = wordCounts(df, textCol)
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWordTypes)
      .collect()
    val words: Array[(String, Long)] =
      top.map(r => (r.getString(0), r.getLong(1)))

    // seed: frequency-weighted substring candidates (chars protected)
    val candCounts = mutable.HashMap.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i)) {
      val s = w.substring(i, i + l)
      candCounts.update(s, candCounts.getOrElse(s, 0L) + f)
    }
    val chars = candCounts.keysIterator.filter(_.length == 1).toIndexedSeq.sorted
    val multi = candCounts.iterator.filter(_._1.length > 1).toIndexedSeq
      .sortBy { case (s, c) => (-c, s) }
      .take(math.max(0, seedSize - chars.length)).map(_._1)
    var vocab: IndexedSeq[String] = (chars ++ multi).sorted
    // init probs ∝ seed counts, normalized in sorted order
    var probs: Map[String, Double] = {
      val tot = vocab.iterator.map(candCounts(_).toDouble).sum
      vocab.iterator.map(s => s -> candCounts(s) / tot).toMap
    }

    def emEpoch(prune: Boolean): Unit = {
      val pieceSet = probs
      val maxLen = vocab.iterator.map(_.length).max
      val expected = mutable.HashMap.empty[String, Double]
      for ((w, f) <- words) {
        val n = w.length
        val alpha = new Array[Double](n + 1)
        val beta = new Array[Double](n + 1)
        alpha(0) = 1.0; beta(n) = 1.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxLen)
          var acc = 0.0
          while (j < i) {
            val p = pieceSet.getOrElse(w.substring(j, i), 0.0)
            if (p > 0) acc += alpha(j) * p
            j += 1
          }
          alpha(i) = acc
          i += 1
        }
        i = n - 1
        while (i >= 0) {
          var j = math.min(n, i + maxLen)
          var acc = 0.0
          while (j > i) {
            val p = pieceSet.getOrElse(w.substring(i, j), 0.0)
            if (p > 0) acc += p * beta(j)
            j -= 1
          }
          beta(i) = acc
          i -= 1
        }
        val z = alpha(n)
        if (z > 0) {
          var a = 0
          while (a < n) {
            var b = a + 1
            while (b <= math.min(n, a + maxLen)) {
              val s = w.substring(a, b)
              val p = pieceSet.getOrElse(s, 0.0)
              if (p > 0) {
                val e = f * alpha(a) * p * beta(b) / z
                if (e > 0) expected.update(s, expected.getOrElse(s, 0.0) + e)
                }
              b += 1
            }
            a += 1
          }
        }
      }
      // prune to vocabSize (chars protected), ties lexicographic
      if (prune && vocab.length > vocabSize) {
        val keepMulti = expected.iterator.filter(_._1.length > 1).toIndexedSeq
          .sortBy { case (s, e) => (-e, s) }
          .take(math.max(0, vocabSize - chars.length)).map(_._1)
        vocab = (chars ++ keepMulti).sorted
      }
      // M-step over the (possibly pruned) vocab, sorted-order sums;
      // a piece EM zeroed out keeps an epsilon floor so the lattice
      // stays total until pruning removes it
      val tot = vocab.iterator
        .map(s => math.max(expected.getOrElse(s, 0.0), 1e-12)).sum
      probs = vocab.iterator
        .map(s => s -> math.max(expected.getOrElse(s, 0.0), 1e-12) / tot)
        .toMap
    }
    var epoch = 0
    while (epoch < emEpochs) {
      emEpoch(prune = epoch >= 1)
      epoch += 1
    }
    val pieces = vocab.map(s =>
      (s, math.round(math.log(probs(s)) * 1e6))).toIndexedSeq
    UnigramModel(pieces, unkMicro = -23000000L)
  }

  /** `tokens` = unigram-LM Viterbi pieces of `textCol` — scan-local
    * codegen kernel, drop-in alternative to BPE [[tokenize]]. */
  def tokenizeUnigram(df: DataFrame, idCol: String, textCol: String,
      model: UnigramModel): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // idempotent
    df.select(col(idCol),
      call_function("unigram_encode", lower(col(textCol)),
        typedlit(model.pieces.map(_._1)),
        typedlit(model.pieces.map(_._2)),
        lit(model.unkMicro)).as("tokens"))
  }

  /** Persists a model as a tiny parquet table (rank, a, b; base symbols
    * as rank −1 rows) — train once on the 100 TB corpus, apply from any
    * later job. */
  def saveModel(model: BpeModel, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    val rows = model.baseSymbols.map(s => (-1, s, "")) ++
      model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
    rows.toDF("rank", "a", "b").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Persists a unigram model as a tiny parquet table (piece +
    * micro-nat log-prob; the OOV floor as a piece='' row). */
  def saveUnigramModel(model: UnigramModel,
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    (model.pieces :+ ("", model.unkMicro))
      .toDF("piece", "logp_micro").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Reloads a [[saveUnigramModel]] table. */
  def loadUnigramModel(spark: org.apache.spark.sql.SparkSession,
      path: String): UnigramModel = {
    val rows = spark.read.parquet(path).select("piece", "logp_micro")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (unk, pieces) = rows.partition(_._1.isEmpty)
    UnigramModel(pieces.sortBy(_._1).toIndexedSeq, unk.head._2)
  }

  /** Reloads a [[saveModel]] table. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): BpeModel = {
    val rows = spark.read.parquet(path)
      .select("rank", "a", "b").collect()
    val base = rows.filter(_.getInt(0) < 0).map(_.getString(1))
      .toIndexedSeq.sorted
    val merges = rows.filter(_.getInt(0) >= 0).sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    BpeModel(merges, base)
  }
}
