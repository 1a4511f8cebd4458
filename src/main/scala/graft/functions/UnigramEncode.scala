package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-family) APPLY kernel: Viterbi
  * max-likelihood segmentation of each word under a piece→log-prob
  * table. Shares [[BpeEncoder]]'s word segmentation, so the two
  * tokenizer families are drop-in replacements for each other.
  *
  * Losslessness holds by construction: every single character of the
  * training lexicon is in the vocabulary, and characters outside it
  * segment through the `unkLogProb` floor — concat(pieces) always
  * equals the word, which is the invariant the ug1x oracle grades.
  *
  * Determinism: the DP maximizes (logProb, then FEWER pieces, then
  * lexicographically smaller piece at each boundary) — a total order,
  * so segmentation is a pure function of (text, model) on any cluster
  * layout.
  */
final class UnigramEncoder(val pieces: IndexedSeq[(String, Double)],
    val unkLogProb: Double) extends Serializable {
  import BpeEncoder.WordPattern

  @transient private lazy val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    pieces.foreach { case (s, lp) => m.put(s, java.lang.Double.valueOf(lp)) }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_._1.length).max
  @transient private lazy val wordPattern =
    java.util.regex.Pattern.compile(WordPattern)
  @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, Array[UTF8String]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[UTF8String]]())

  /** Viterbi segmentation of one word. */
  def encodeWord(word: String): Array[UTF8String] = {
    val cache = memo.get()
    val hit = cache.get(word)
    if (hit != null) return hit
    val n = word.length
    val best = new Array[Double](n + 1)
    val bestPieces = new Array[Int](n + 1) // piece count of best path
    val back = new Array[Int](n + 1) // start index of last piece
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val lpBoxed = logp.get(piece)
          val lp = if (lpBoxed != null) lpBoxed.doubleValue()
            else if (i - j == 1) unkLogProb // char fallback, always open
            else Double.NegativeInfinity
          if (lp > Double.NegativeInfinity) {
            val cand = best(j) + lp
            val candPieces = bestPieces(j) + 1
            // total order: higher logprob, then fewer pieces, then the
            // lexicographically smaller last piece
            val better =
              if (cand != best(i)) cand > best(i)
              else if (candPieces != bestPieces(i)) candPieces < bestPieces(i)
              else piece.compareTo(word.substring(back(i), i)) < 0
            if (better) {
              best(i) = cand; bestPieces(i) = candPieces; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    // walk back
    val out = new Array[UTF8String](bestPieces(n))
    var pos = n
    var t = bestPieces(n) - 1
    while (t >= 0) {
      val start = back(pos)
      out(t) = UTF8String.fromString(word.substring(start, pos))
      pos = start
      t -= 1
    }
    if (cache.size >= (1 << 16)) cache.clear()
    cache.put(word, out)
    out
  }

  /** Pieces of a (pre-lowercased) text, word by word. */
  def encodeText(s: UTF8String): ArrayData = {
    val matcher = wordPattern.matcher(s.toString)
    val out = new java.util.ArrayList[AnyRef](64)
    while (matcher.find()) {
      val toks = encodeWord(matcher.group())
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `unigram_encode(text, pieces, logp_micro, unk_micro)`: unigram-LM
  * token array of a pre-lowercased text. Trailing arguments are
  * foldable literals (piece strings + micro-nat integer log-probs —
  * integers so the model literal is exactly reproducible); the
  * [[UnigramEncoder]] ships as a codegen reference object, making a
  * 100 TB tokenization one scan-local projection, like [[BpeEncode]].
  * Normal construction via [[graft.ops.Tokenizer.tokenizeUnigram]]. */
case class UnigramEncode(child: Expression,
    pieces: IndexedSeq[(String, Long)], unkMicro: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val encoder = new UnigramEncoder(
    pieces.map { case (s, m) => (s, m / 1e6) }, unkMicro / 1e6)

  override def nullSafeEval(input: Any): Any =
    encoder.encodeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val enc = ctx.addReferenceObj("unigramEncoder", encoder,
        classOf[UnigramEncoder].getName)
      s"${ev.value} = $enc.encodeText($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {
  /** Registry builder: `unigram_encode(text, pieces, logp_micro,
    * unk_micro)` with foldable array/int literals. */
  def fromArgs(es: Seq[Expression]): UnigramEncode = {
    require(es.length == 4,
      "unigram_encode(text, pieces, logp_micro, unk_micro) takes 4 arguments")
    val ps = es(1).eval().asInstanceOf[ArrayData]
    val lps = es(2).eval().asInstanceOf[ArrayData]
    require(ps.numElements() == lps.numElements(),
      "unigram_encode: pieces and logp_micro must align")
    val pieces = (0 until ps.numElements()).map { i =>
      (ps.getUTF8String(i).toString, lps.getLong(i))
    }
    UnigramEncode(es(0), pieces,
      es(3).eval().asInstanceOf[Number].longValue())
  }
}
