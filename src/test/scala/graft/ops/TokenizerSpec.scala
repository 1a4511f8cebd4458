package graft.ops

import graft.SparkSpec
import graft.functions.BpeEncoder
import org.apache.spark.sql.functions._

/** BPE tokenizer semantics: hand-computed merge order on a fixture
  * lexicon, lossless roundtrip as a generative property, the
  * open-vocabulary fallback, and the scan-local plan shape of the
  * apply stage. Corpus-scale oracle parity is graded by the driver
  * (tk1 rows / tk1x roundtrip vs DuckDB). */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("trainBpe learns the hand-computed merge order") {
    // one word type "aaab" (freq 5): pairs (a,a)x2, (a,b), (b,</w>)
    // rank0 = (a,a) [count 10]; after L→R merge: [aa, a, b, </w>]
    // rank1: (aa,a), (a,b), (b,</w>) all 5 → lexicographic → (a,b)
    val df = Seq.fill(5)("aaab").toDF("text")
    val m = Tokenizer.trainBpe(df, "text", numMerges = 2).merges
    assert(m == IndexedSeq(("a", "a"), ("a", "b")))
  }

  test("tokenize fully merges a single-type corpus; plan is scan-local") {
    val df = Seq.tabulate(5)(i => (i.toLong, "aaab")).toDF("doc_id", "text")
    val model = Tokenizer.trainBpe(df, "text", numMerges = 10)
    val out = Tokenizer.tokenize(df, "doc_id", "text", model)
    // enough merges collapse the only word type into one token
    assert(out.orderBy("doc_id").collect()
      .forall(_.getSeq[String](1) == Seq("aaab</w>")))
    // apply is a pure projection: no exchange anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenize shuffled:\n$plan")
  }

  test("open vocabulary: unseen words fall through to characters") {
    val train = Seq.fill(3)("aa aa").toDF("text")
    val model = Tokenizer.trainBpe(train, "text", numMerges = 5)
    val out = Tokenizer.tokenize(
      Seq((0L, "aa xy")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()(0).getSeq[String](1)
    // "aa" merged to one token; "xy" has no learned merges → chars
    assert(out == Seq("aa</w>", "x", "y", "</w>"))
  }

  test("roundtrip is lossless over generated ASCII text (incl. literal </w>)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordish = Gen.oneOf("the", "of", "and", "data", "spark", "bpe",
      "aaab", "x1", "</w>", "a.b,c!", "don't", " ", "  ", "\t")
    val textGen = Gen.listOf(wordish).map(_.mkString(" "))
    val texts = Gen.listOfN(200, textGen)
      .apply(Gen.Parameters.default, Seed(7L)).get
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Tokenizer.trainBpe(df, "text", numMerges = 60)
    val got = Tokenizer.tokenize(df, "doc_id", "text", model)
      .select($"doc_id",
        expr("replace(concat_ws('', tokens), '</w>', '')").as("detok"),
        size(filter($"tokens", t => t.endsWith(lit("</w>"))))
          .as("n_words"))
      .orderBy("doc_id").collect()
    val re = BpeEncoder.WordPattern.r
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = re.findAllIn(t.toLowerCase).toSeq
      assert(got(i).getString(1) == words.mkString(""),
        s"roundtrip broke on ${t.take(40)}")
      assert(got(i).getInt(2) == words.size)
    }
  }

  test("id codec is a bijection on the vocab; OOV maps to 0/<unk>") {
    val df = Seq.fill(4)("ab ab ba").toDF("text")
    val model = Tokenizer.trainBpe(df, "text", numMerges = 8)
    // every vocab token id-roundtrips; ids are 1..|vocab| densely
    val vocabDf = model.vocab.zipWithIndex
      .map { case (t, i) => (i.toLong, Seq(t)) }.toDF("doc_id", "tokens")
    val round = Tokenizer.decodeIds(
      Tokenizer.encodeIds(vocabDf, "doc_id", "tokens", model)
        .withColumnRenamed("tokens", "orig"),
      "doc_id", "token_ids", model)
      .select($"doc_id", $"orig" (0).as("before"), $"tokens" (0).as("after"),
        $"token_ids" (0).as("id"))
      .collect()
    round.foreach { r =>
      assert(r.getString(1) == r.getString(2))
      assert(r.getInt(3) == r.getLong(0) + 1)
    }
    // a token the lexicon never saw → id 0 → <unk>
    val oov = Tokenizer.decodeIds(
      Tokenizer.encodeIds(Seq((0L, Seq("zq"))).toDF("doc_id", "tokens"),
        "doc_id", "tokens", model), "doc_id", "token_ids", model)
      .collect()(0)
    assert(oov.getSeq[String](1) == Seq("<unk>") && oov.getSeq[Int](2) == Seq(0))
  }

  test("saveModel/loadModel roundtrips the model exactly") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val model = Tokenizer.trainBpe(docs, "text", numMerges = 50)
    val dir = tmpDir("graft_bpe_model")
    Tokenizer.saveModel(model, spark, dir)
    assert(Tokenizer.loadModel(spark, dir) == model)
    val um = Tokenizer.trainUnigram(docs, "text", vocabSize = 300)
    val udir = tmpDir("graft_ug_model")
    Tokenizer.saveUnigramModel(um, spark, udir)
    assert(Tokenizer.loadUnigramModel(spark, udir) == um)
  }

  test("assembleSequences packs BPE ids into full windows, conserving tokens") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val model = Tokenizer.trainBpe(docs, "text", numMerges = 60)
    val ids = Tokenizer.encodeIds(
      Tokenizer.tokenize(docs, "doc_id", "text", model),
      "doc_id", "tokens", model)
    val budget = 128L
    val packed = TextOps.assembleSequences(ids, "doc_id", "token_ids",
      budget = budget, shards = 4)
    // conservation: every token lands in exactly one window
    val totalIn = ids.select(sum(size($"token_ids"))).collect()(0).getLong(0)
    val totalOut = packed.select(sum($"n_tokens")).collect()(0).getLong(0)
    assert(totalIn == totalOut)
    // every window is exactly `budget` tokens except each shard's tail
    val tails = packed.groupBy("shard")
      .agg(max("window_id").as("tail")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    packed.collect().foreach { r =>
      val (sh, win, n) = (r.getLong(0), r.getLong(1), r.getLong(4))
      if (win < tails(sh)) assert(n == budget, s"short window $sh/$win: $n")
      else assert(n <= budget)
    }
  }

  test("unigram: frequent multi-char pieces win Viterbi over chars") {
    // 'ab' dominates the corpus → EM gives it high mass → one piece
    val df = Seq.fill(20)("ab abc").toDF("text")
    val model = Tokenizer.trainUnigram(df, "text", vocabSize = 50)
    val out = Tokenizer.tokenizeUnigram(
      Seq((0L, "ab abc")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()(0).getSeq[String](1)
    assert(out.head == "ab", s"got $out")
    assert(out.mkString("") == "ababc")
    // plan is scan-local
    val plan = Tokenizer.tokenizeUnigram(
      Seq((0L, "x")).toDF("doc_id", "text"), "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("unigram: OOV characters segment through the floor, losslessly") {
    val model = Tokenizer.trainUnigram(
      Seq.fill(3)("aa bb").toDF("text"), "text", vocabSize = 20)
    val out = Tokenizer.tokenizeUnigram(
      Seq((0L, "aa zq!")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()(0).getSeq[String](1)
    assert(out.mkString("") == "aazq!")
  }

  test("unigram roundtrip is lossless over generated ASCII text") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordish = Gen.oneOf("the", "of", "and", "data", "spark", "unigram",
      "aaab", "x1", "a.b,c!", "don't", " ", "\t")
    val texts = Gen.listOfN(120, Gen.listOf(wordish).map(_.mkString(" ")))
      .apply(Gen.Parameters.default, Seed(11L)).get
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Tokenizer.trainUnigram(df, "text", vocabSize = 200)
    val got = Tokenizer.tokenizeUnigram(df, "doc_id", "text", model)
      .select($"doc_id", expr("concat_ws('', tokens)").as("detok"))
      .orderBy("doc_id").collect()
    val re = graft.functions.BpeEncoder.WordPattern.r
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i).getString(1) == re.findAllIn(t.toLowerCase).mkString(""))
    }
  }

  test("unigram training is invariant to corpus partitioning") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val m1 = Tokenizer.trainUnigram(docs, "text", vocabSize = 300)
    val m2 = Tokenizer.trainUnigram(docs.repartition(13), "text",
      vocabSize = 300)
    assert(m1 == m2)
  }

  /** Naive recount-every-merge BPE reference (the textbook loop): the
    * incremental production trainer must reproduce it exactly. */
  private def naiveMerges(words: Seq[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    var seqs: Array[(Array[String], Long)] = words.toArray.map { case (w, f) =>
      (w.map(String.valueOf(_)).toArray :+ graft.functions.BpeEncoder.EndOfWord, f)
    }
    val out = IndexedSeq.newBuilder[(String, String)]
    var step = 0
    var go = true
    while (step < numMerges && go) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((s, f) <- seqs; j <- 0 until s.length - 1)
        counts.update((s(j), s(j + 1)), counts.getOrElse((s(j), s(j + 1)), 0L) + f)
      val live = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
      if (live.isEmpty || live.head._2 < 2) go = false
      else {
        val (a, b) = live.head._1
        out += ((a, b))
        seqs = seqs.map { case (s, f) =>
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var k = 0
          while (k < s.length) {
            if (k < s.length - 1 && s(k) == a && s(k + 1) == b) {
              next += a + b; k += 2
            } else { next += s(k); k += 1 }
          }
          (next.toArray, f)
        }
      }
      step += 1
    }
    out.result()
  }

  test("incremental trainer equals the naive reference loop") {
    // the real corpus lexicon…
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val lex = Tokenizer.wordCounts(docs, "text")
      .orderBy(desc("freq"), asc("word")).limit(20000).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val fast = Tokenizer.trainBpe(docs, "text", numMerges = 120).merges
    assert(fast == naiveMerges(lex, 120))
    // …and adversarial tie/overlap shapes (runs, palindromic pairs)
    val tricky = Seq("aaaa" -> 3L, "aaab" -> 3L, "abab" -> 2L,
      "bbba" -> 2L, "zz" -> 5L, "z" -> 7L)
    val df = tricky.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .toDF("text")
    assert(Tokenizer.trainBpe(df, "text", numMerges = 30).merges ==
      naiveMerges(tricky, 30))
  }

  test("training is invariant to corpus partitioning") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val m1 = Tokenizer.trainBpe(docs, "text", numMerges = 40)
    val m2 = Tokenizer.trainBpe(docs.repartition(13), "text", numMerges = 40)
    assert(m1 == m2)
  }
}
