package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Bloom-accelerated decontamination must be RESULT-IDENTICAL to the
  * exact operator (no false negatives by bloom construction; false
  * positives die in the exact confirm join) — including under a
  * deliberately undersized filter where nearly every gram is a false
  * positive. Also pins that the probe really is Spark's runtime-filter
  * expression evaluated pre-shuffle (BloomFilterMightContain in the
  * plan). */
class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    GraftFunctions.register(spark)
    // 40 docs over a tiny vocabulary => plenty of shared 3-grams
    (0L until 40L).map { i =>
      val words = (0 until 12).map(j => s"w${(i * 7 + j * j) % 9}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def split(pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    (docs.filter(pred(col("doc_id") % 5) === false),
      docs.filter(pred(col("doc_id") % 5) === true))

  test("bloom path is result-identical to the exact operator") {
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val exact = TextOps.decontaminate(train, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().toSeq
    val bloom = TextOps.decontaminateBloom(train, eval, "doc_id", "text",
        n = 3).orderBy("doc_id").collect().toSeq
    assert(exact.nonEmpty && exact.exists(!_.getBoolean(2)),
      "fixture must actually flag contaminated docs")
    assert(bloom == exact)
  }

  test("an undersized (high-fpp) bloom still yields exact results") {
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val exact = TextOps.decontaminate(train, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().toSeq
    // 2 expected items x 1 bit/item: almost everything is a positive —
    // the confirm join must absorb every false one
    val bloom = TextOps.decontaminateBloom(train, eval, "doc_id", "text",
        n = 3, expectedGrams = 2L, bitsPerGram = 1)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
  }

  test("the probe is Spark's BloomFilterMightContain, pre-shuffle") {
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val plan = TextOps.decontaminateBloom(train, eval, "doc_id", "text",
      n = 3).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom probe in the plan:\n$plan")
  }
}
