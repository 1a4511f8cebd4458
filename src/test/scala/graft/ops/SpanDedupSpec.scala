package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-dedup semantics: first occurrence by (doc_id, span_idx) wins
  * corpus-wide; tail partial spans are spans; empty docs survive with
  * zero counts and the empty-content digest. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val md5empty = "d41d8cd98f00b204e9800998ecf8427e"

  test("first occurrence wins; later copies are dropped") {
    // span=2: doc0 = [a b][c d]; doc1 = [a b][x y]; doc2 = [c d]
    val df = Seq(
      (0L, "a b c d"), (1L, "a b x y"), (2L, "c d")
    ).toDF("doc_id", "text")
    val got = TextOps.spanDedup(df, "doc_id", "text", span = 2)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 1L, 0L)))
    // doc1's kept content is its second span only
    val doc1 = got(1).getString(3)
    val exp = df.sparkSession.range(1)
      .select(md5(lit("x y"))).head().getString(0)
    assert(doc1 == exp)
    // doc2 lost everything -> empty digest
    assert(got(2).getString(3) == md5empty)
  }

  test("tail partial span participates in dedup") {
    // span=3: doc0 = [a b c][d]; doc1 = [d] -> doc1's only span is a dup
    val df = Seq((0L, "a b c d"), (1L, "d")).toDF("doc_id", "text")
    val got = TextOps.spanDedup(df, "doc_id", "text", span = 3)
      .orderBy("doc_id").collect()
    assert(got(0).getLong(2) == 2L)
    assert(got(1).getLong(2) == 0L)
  }

  test("first-occurrence pass is a hash aggregation; text never shuffles") {
    // The de-skew contract: no WindowExec anywhere (a window partitioned
    // by span text lands every occurrence of a corpus-hot span in one
    // task), the global first-occurrence pass runs as partial+final
    // aggregation on the 128-bit span key, and no Exchange carries a
    // span_text/string span column — only hashes, indexes, and the one
    // doc_id-keyed corpus join.
    val df = Seq((0L, "a b c d"), (1L, "a b x y")).toDF("doc_id", "text")
    val plan = TextOps.spanDedup(df, "doc_id", "text", span = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"spanDedup plan has a window:\n$plan")
    assert(plan.contains("partial_min"),
      s"first-occurrence pass is not a partial aggregation:\n$plan")
    assert(!plan.contains("span_text"),
      s"span text appears in the physical plan:\n$plan")
  }

  test("empty and whitespace-only docs emit zero rows with empty digest") {
    val df = Seq((0L, ""), (1L, "   "), (2L, "w")).toDF("doc_id", "text")
    val got = TextOps.spanDedup(df, "doc_id", "text", span = 4)
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 0L && got(0).getString(3) == md5empty)
    assert(got(1).getLong(1) == 0L && got(1).getString(3) == md5empty)
    assert(got(2).getLong(1) == 1L && got(2).getLong(2) == 1L)
  }

  test("boilerplateStrip drops EVERY occurrence at the minDocs boundary") {
    // span=2, minDocs=3: [a b] occurs in docs 0,1,2 (hot — stripped
    // everywhere, including the first occurrence spanDedup would keep);
    // [c d] occurs in docs 0,1 only (document frequency 2 < 3 — kept in
    // both, unlike spanDedup which would drop doc1's copy). Within-doc
    // repeats must not inflate document frequency: doc 3 repeats [x y]
    // twice but it still counts once toward minDocs.
    val df = Seq(
      (0L, "a b c d"), (1L, "a b c d"), (2L, "a b"), (3L, "x y x y")
    ).toDF("doc_id", "text")
    val got = TextOps.boilerplateStrip(df, "doc_id", "text",
      span = 2, minDocs = 3).orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L, 1L), (1L, 2L, 1L), (2L, 1L, 0L), (3L, 2L, 2L)))
    val cd = df.sparkSession.range(1)
      .select(md5(lit("c d"))).head().getString(0)
    assert(got(0).getString(3) == cd && got(1).getString(3) == cd)
    assert(got(2).getString(3) == md5empty)
  }

  test("boilerplateStrip plan: hash-agg frequency, anti join, no text exchange") {
    val df = Seq((0L, "a b c d"), (1L, "a b x y")).toDF("doc_id", "text")
    val plan = TextOps.boilerplateStrip(df, "doc_id", "text", span = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"boilerplateStrip plan has a window:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"hot-span removal is not an anti join:\n$plan")
    assert(!plan.contains("span_text"),
      s"span text appears in the physical plan:\n$plan")
  }
}
