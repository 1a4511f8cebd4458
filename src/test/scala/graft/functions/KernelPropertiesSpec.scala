package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style checks over the codegen/aggregate kernels: generated
  * (seeded, deterministic) inputs, reference semantics computed in
  * plain Scala, compared in ONE Spark pass per property (a case-id
  * column batches every generated case into a single job — the
  * forAll-of-jobs alternative is minutes of scheduler overhead). */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def registered = { GraftFunctions.register(spark); spark }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("sorted_intersect_count equals set intersection on generated sets") {
    val arrGen = Gen.listOf(Gen.chooseNum(-50L, 50L))
      .map(_.distinct.sorted.toArray)
    val cases = sample(Gen.listOfN(80, Gen.zip(arrGen, arrGen)), 11L)
      .zipWithIndex.map { case ((a, b), i) => (i, a, b) }
    val got = registered.createDataset(cases).toDF("id", "a", "b")
      .selectExpr("id", "sorted_intersect_count(a, b) AS n")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.foreach { case (i, a, b) =>
      assert(got(i) == a.toSet.intersect(b.toSet).size.toLong,
        s"case $i: ${a.toSeq} ∩ ${b.toSeq}")
    }
  }

  test("vec_dot equals the sequential double fold on generated vectors") {
    val vecGen = Gen.listOfN(24,
      Gen.chooseNum(-1000, 1000).map(_ / 64.0)).map(_.toArray)
    val cases = sample(Gen.listOfN(50, Gen.zip(vecGen, vecGen)), 13L)
      .zipWithIndex.map { case ((a, b), i) => (i, a, b) }
    val got = registered.createDataset(cases).toDF("id", "a", "b")
      .selectExpr("id", "vec_dot(a, b) AS d")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    cases.foreach { case (i, a, b) =>
      var acc = 0.0
      var j = 0
      while (j < a.length) { acc += a(j) * b(j); j += 1 }
      assert(got(i) == acc, s"case $i") // bit-equal, not approximate
    }
  }

  test("kmv sketches re-aggregate associatively: day->month->total") {
    val rows = sample(Gen.listOfN(4000,
      Gen.zip(Gen.chooseNum(0, 900), Gen.chooseNum(0, 11))), 17L)
      .map { case (u, m) => (s"u$u", m, m / 4) }
    val df = registered.createDataset(rows).toDF("u", "month", "quarter")
    val direct = df.selectExpr("kmv_distinct(u, 128) AS d").head().getLong(0)
    // one level: merge monthly sketches
    val monthly = df.groupBy("month").agg(expr("kmv_sketch(u, 128)").as("sk"))
    val viaMonth = monthly.selectExpr("kmv_value(kmv_merge(sk)) AS d")
      .head().getLong(0)
    // two levels: monthly -> quarterly merged sketches -> total
    val viaQuarter = monthly
      .withColumn("quarter", col("month") / 4)
      .groupBy("quarter").agg(expr("kmv_merge(sk)").as("sk"))
      .selectExpr("kmv_value(kmv_merge(sk)) AS d").head().getLong(0)
    assert(direct == viaMonth && viaMonth == viaQuarter)
  }

  test("cms estimates dominate true counts for every generated item") {
    val rows = sample(Gen.listOfN(5000,
      Gen.frequency(5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
        2 -> Gen.chooseNum(0, 400).map(i => s"w$i"))), 19L)
      .map(Tuple1(_))
    val df = registered.createDataset(rows).toDF("w").repartition(8)
    val sk = df.selectExpr("cms_sketch(w, 4, 4096) AS sk")
    val checked = df.groupBy("w").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(sk))
      .selectExpr("w", "c", "cms_estimate(sk, w) AS est")
      .collect()
    checked.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"${r.getString(0)} underestimated")
      // generous upper bound: eps*n with eps = 2e/width ≈ 0.00133
      assert(r.getLong(2) <= r.getLong(1) + 7, s"${r.getString(0)} way over")
    }
  }

  test("mg_topk never misses a generated heavy hitter, any partitioning") {
    val rows = sample(Gen.listOfN(6000,
      Gen.frequency(4 -> Gen.const("alpha"), 3 -> Gen.const("beta"),
        5 -> Gen.chooseNum(0, 800).map(i => s"t$i"))), 23L)
      .map(Tuple1(_))
    for (parts <- Seq(1, 7, 32)) {
      val df = registered.createDataset(rows).toDF("w").repartition(parts)
      val kept = df.selectExpr("mg_topk(w, 8) AS s")
        .selectExpr("transform(s, e -> e.item) AS items")
        .head().getSeq[String](0).toSet
      val counts = rows.groupBy(_._1).view.mapValues(_.size)
      val n = rows.size
      counts.filter(_._2 > n / 9).keys.foreach(hh =>
        assert(kept.contains(hh), s"heavy hitter $hh missing at $parts parts"))
    }
  }
}
