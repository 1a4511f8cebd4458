package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll

/** The HOF-dot-product rewrite: fires only on the exact double-array
  * fold it can reproduce bit-identically, and the guarded form keeps
  * the builtin's null semantics for unequal lengths. */
class RewriteHofDotProductSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations ++= Seq(RewriteHofDotProduct)
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RewriteHofDotProduct)
    super.afterAll()
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // literal rows collapse to a LocalRelation before user rules run
  // (ConvertToLocalRelation evaluates the projection at optimize time),
  // so build inputs through an RDD to keep the attributes live — the
  // shape any real scan has
  private def pairs(rows: Seq[(Seq[Double], Seq[Double])]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2))
      .toDF("a", "b")

  test("double-array HOF fold rewrites to vec_dot with the same result") {
    val df = pairs(Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))))
      .selectExpr(s"$hof AS dot")
    assert(optimized(df).contains("vec_dot"),
      s"rewrite did not fire:\n${optimized(df)}")
    assert(df.head().getDouble(0) == 32.0)
  }

  test("unequal lengths stay null through the size guard") {
    val df = pairs(Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))))
      .selectExpr(s"$hof AS dot")
    assert(optimized(df).contains("vec_dot"))
    assert(df.head().isNullAt(0), "guard must preserve the builtin's null")
  }

  test("float arrays are NOT rewritten (the HOF rounds products to float)") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
        Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))), 2)).toDF("a", "b")
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x * y AS DOUBLE)), 0.0D, (acc, v) -> acc + v) AS dot")
    assert(!optimized(df).contains("vec_dot"))
  }

  test("a different fold is NOT rewritten") {
    val df = pairs(Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))))
    val sum2 = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v + v) AS s")
    assert(!optimized(sum2).contains("vec_dot"))
    val zero1 = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1.0D, (acc, v) -> acc + v) AS s")
    assert(!optimized(zero1).contains("vec_dot"))
    val maxmul = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x + y), 0.0D, (acc, v) -> acc + v) AS s")
    assert(!optimized(maxmul).contains("vec_dot"))
  }

  test("rewritten and unrewritten results agree on a corpus of vectors") {
    val vecs = (0 until 64).map { i =>
      (Seq.tabulate(8)(j => (i * 31 + j * 7 % 13).toDouble / 7.0),
        Seq.tabulate(8)(j => (i * 17 + j * 11 % 19).toDouble / 11.0))
    }
    val df = pairs(vecs)
    val withRule = df.selectExpr(s"$hof AS dot").collect().map(_.getDouble(0))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RewriteHofDotProduct)
    try {
      val without = df.selectExpr(s"$hof AS dot").collect().map(_.getDouble(0))
      // bit-identical, not approximately equal: both are the same
      // ascending-index double chain
      assert(withRule.toSeq == without.toSeq)
    } finally
      spark.experimental.extraOptimizations ++= Seq(RewriteHofDotProduct)
  }
}
