package graft.ops

import graft.SparkSpec

/** Multi-query BM25 retrieval: hand-checkable ranking on a tiny corpus
  * and the scale contracts — postings filtered before aggregation,
  * head selected by the mergeable heap, never a window. */
class Bm25RetrieveSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private val docs = Seq(
    (0L, "cat cat cat dog"),   // heavy on cat
    (1L, "cat dog dog"),       // balanced
    (2L, "dog dog dog dog"),   // heavy on dog
    (3L, "bird bird"),         // matches neither query term set
    (4L, "cat")                // short pure-cat doc
  ).toDF("doc_id", "text")

  test("ranking follows tf/length; non-matching docs never appear") {
    val out = TextOps.bm25Retrieve(docs, "doc_id", "text",
      Seq(0 -> Seq("cat"), 1 -> Seq("dog", "bird")), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val q0 = out.filter(_._1 == 0L).map(_._3)
    // query 0 = {cat}: doc 4 (tf 1, dl 1) and doc 0 (tf 3, dl 4) beat
    // doc 1 (tf 1, dl 3); docs 2 and 3 have no cat at all
    assert(q0.toSet.subsetOf(Set(0L, 1L, 4L)) && q0.size == 3)
    assert(q0.indexOf(1L) == 2, s"doc 1 must rank last for {cat}: $q0")
    val q1 = out.filter(_._1 == 1L).map(_._3)
    // query 1 = {dog, bird}: doc 4 matches neither term
    assert(q1.size == 3, s"expected 3 hits for {dog,bird}: $q1")
    assert(!q1.contains(4L), s"pure-cat doc retrieved for {dog,bird}: $q1")
  }

  test("k bounds each query's hits; ranks are contiguous from 1") {
    val out = TextOps.bm25Retrieve(docs, "doc_id", "text",
      Seq(0 -> Seq("cat"), 1 -> Seq("dog")), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.groupBy(_._1).forall { case (_, hits) =>
      hits.map(_._2).sorted == (1L to hits.size.toLong) && hits.size <= 2
    })
  }

  test("plan: no window head, heap aggregate present, term filter pre-agg") {
    val plan = TextOps.bm25Retrieve(docs, "doc_id", "text",
      Seq(0 -> Seq("cat")), k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"retrieval head uses a window:\n$plan")
    assert(plan.contains("topk_pairs"),
      s"head selection is not the mergeable heap:\n$plan")
  }
}
