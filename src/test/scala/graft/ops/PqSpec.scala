package graft.ops

import graft.SparkSpec
import graft.functions.{GraftFunctions, PqEncode}
import org.apache.spark.sql.functions._

/** Product-quantization specs: encoder kernel parity (eval vs codegen vs
  * a Scala reference argmin), the ADC gather kernel, and end-to-end
  * search recall on constructed geometry. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def registered = {
    GraftFunctions.register(spark)
    spark
  }

  /** Scala reference encoder: per subspace, global id of the L2-nearest
    * codebook entry, ties to the smaller code. */
  private def refEncode(v: Array[Double], cb: Array[Double],
      m: Int, k: Int): Seq[Int] = {
    val subDims = cb.length / (m * k)
    (0 until m).map { s =>
      var best = Double.MaxValue; var bestJ = 0
      for (j <- 0 until k) {
        val off = (s * k + j) * subDims
        var acc = 0.0
        for (i <- 0 until subDims) {
          val d = v(s * subDims + i) - cb(off + i)
          acc += d * d
        }
        if (acc < best) { best = acc; bestJ = j }
      }
      s * k + bestJ
    }
  }

  test("pq_encode matches the reference argmin, eval and codegen") {
    val m = 4; val k = 3; val subDims = 2
    // deterministic pseudo-random codebook + vectors (no RNG state)
    val cb = Array.tabulate(m * k * subDims)(i => math.sin(i * 1.7) * 3)
    val vecs = (0 until 20).map(r => Array.tabulate(m * subDims)(i =>
      math.cos(r * 2.3 + i * 0.9) * 3))
    val cbLit = cb.map(d => java.lang.Double.toString(d) + "D").mkString(",")
    val df = registered.createDataset(vecs.map(v => Tuple1(v))).toDF("v")
    val got = df.select(expr(s"pq_encode(v, array($cbLit), $m, $k)"))
      .collect().map(_.getSeq[Int](0))
    vecs.zip(got).foreach { case (v, g) =>
      assert(g == refEncode(v, cb, m, k), s"vec ${v.toSeq}")
    }
    // interpreted eval agrees with the codegen path above
    val viaEval = PqEncode(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head.toSeq, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      cb.toIndexedSeq, m, k).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    assert(viaEval == got.head.toSeq)
  }

  test("pq_encode reads float vectors and breaks ties to the smaller code") {
    // two identical codebook entries per subspace -> argmin must pick
    // the smaller global id
    val cb = Array(1.0, 1.0, 1.0, 1.0) // m=1, k=2, subDims=2, identical
    val df = registered.createDataset(Seq(Tuple1(Array(1.0f, 1.0f))))
      .toDF("v")
    val got = df.select(expr(
      "pq_encode(v, array(1.0D, 1.0D, 1.0D, 1.0D), 1, 2)"))
      .head().getSeq[Int](0)
    assert(got == Seq(0), s"got $got; cb=${cb.toSeq}")
  }

  test("gather_sum folds lut values at code positions; ignores out-of-range") {
    val df = registered.createDataset(Seq(
      (Array(0, 3, 2), Array(10.0, 20.0, 30.0, 40.0)),
      (Array(1, 99, -1), Array(10.0, 20.0, 30.0, 40.0)),
      (Array.empty[Int], Array(1.0))))
      .toDF("idx", "vals")
    val got = df.select(expr("gather_sum(idx, vals)"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(10.0 + 40.0 + 30.0, 20.0, 0.0))
  }

  test("pqSearch finds cluster neighbors on separated geometry") {
    // 4 well-separated direction clusters of 8 vectors each, 16 dims:
    // e_{c} + small deterministic jitter. True NN of any vector is a
    // cluster-mate; PQ/ADC + rerank must return only cluster-mates.
    val dims = 16
    val data = for (c <- 0 until 4; r <- 0 until 8) yield {
      val v = Array.tabulate(dims)(i =>
        (if (i == c * 4) 10.0 else 0.0) + math.sin(c * 31 + r * 7 + i) * 0.3)
      (c.toLong * 8 + r, v.map(_.toFloat), c)
    }
    val df = registered.createDataset(data).toDF("vec_id", "embedding", "cluster")
    val idx = Similarity.pqIndex(df, "vec_id", "embedding", m = 4, k = 8,
      iters = 2)
    // encoded corpus carries m ints per vector
    assert(idx.encoded.select("codes").head().getSeq[Int](0).length == 4)
    assert(idx.codebook.length == 4 * 8 * (dims / 4))
    val got = Similarity.pqSearch(idx, col("vec_id") < 8, k = 3)
      .join(df.select(col("vec_id").as("nn_id"), col("cluster")), "nn_id")
    assert(got.count() == 8 * 3)
    assert(got.filter(col("cluster") =!= 0).count() == 0,
      "a top-3 neighbor of a cluster-0 query fell outside cluster 0")
  }

  test("ivfPqSearch (IVFADC) finds cluster neighbors through the probe tier") {
    val dims = 16
    val data = for (c <- 0 until 4; r <- 0 until 8) yield {
      val v = Array.tabulate(dims)(i =>
        (if (i == c * 4) 10.0 else 0.0) + math.sin(c * 31 + r * 7 + i) * 0.3)
      (c.toLong * 8 + r, v.map(_.toFloat), c)
    }
    val df = registered.createDataset(data).toDF("vec_id", "embedding", "cluster")
    val idx = Similarity.ivfPqIndex(df, "vec_id", "embedding",
      clusters = 4, m = 4, codes = 8)
    val got = Similarity.ivfPqSearch(idx, col("vec_id") < 8, k = 3, nprobe = 2)
      .join(df.select(col("vec_id").as("nn_id"), col("cluster")), "nn_id")
    assert(got.count() == 8 * 3)
    assert(got.filter(col("cluster") =!= 0).count() == 0,
      "a top-3 IVFADC neighbor of a cluster-0 query fell outside cluster 0")
  }

  test("pq_encode and gather_sum stay inside whole-stage codegen") {
    val data = (0L until 40L).map(r =>
      (r, Array.tabulate(8)(i => math.sin(r * 3.1 + i).toFloat)))
    // through parquet, not a local relation: ConvertToLocalRelation
    // would pre-evaluate deterministic projections interpreted at
    // optimization time, leaving no codegen subtree to inspect
    val dir = tmpDir("pq-codegen")
    registered.createDataset(data).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val idx = Similarity.pqIndex(df, "vec_id", "embedding", m = 2, k = 4)
    // the embedded codebook rides as a codegen reference object; its
    // absence from the generated source means a silent interpreted
    // fallback (the failure mode the native kernels exist to avoid).
    // idx.encoded itself is a pinned LogicalRDD since r14 (the encode
    // ran codegen'd inside the checkpoint job), so inspect the same
    // encode projection the index build runs:
    val encPlan = df
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS u")
      .withColumn("codes", call_function("pq_encode", col("u"),
        typedlit(idx.codebook.toArray), lit(idx.m), lit(idx.k)))
    val encCg = org.apache.spark.sql.execution.debug.codegenString(
      encPlan.queryExecution.executedPlan)
    assert(encCg.contains("codebook"), "pq_encode not codegen'd")
    val scored = idx.encoded.selectExpr(
      "gather_sum(codes, array(1.0D, 2.0D, 3.0D, 4.0D, 5.0D, 6.0D, 7.0D, 8.0D)) AS s")
    val adcCg = org.apache.spark.sql.execution.debug.codegenString(
      scored.queryExecution.executedPlan)
    assert(adcCg.contains("numElements"), "gather_sum not codegen'd")
    assert(scored.filter(col("s") <= 0).count() == 0)
  }

  test("IVFADC index persists partitioned by cluster; probe prunes the scan") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir("ivfpq-index")
    val built = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      clusters = 8, m = 4, codes = 8)
    Similarity.savePqIndex(built, dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    assert(loaded.m == built.m && loaded.k == built.k &&
      loaded.codebook == built.codebook &&
      loaded.centroids.toSet == built.centroids.toSet)
    val a = Similarity.ivfPqSearch(built, col("vec_id") < 10, k = 3)
    val b = Similarity.ivfPqSearch(loaded, col("vec_id") < 10, k = 3)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // the at-scale property: the ADC scan over the cluster-partitioned
    // layout is dynamically pruned to the probed cells
    val plan = b.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
  }

  test("ADC head selection is a bounded aggregate, not a window") {
    // The at-scale property behind topk_pairs: the |queries| × corpus
    // ADC score set must never funnel through |queries| window
    // partitions. Pin that the physical plan has NO WindowExec at all
    // (the probe tier's small window is pq-free pqSearch; rerank and
    // head are both heap aggregates) and that the selection runs as a
    // partial ObjectHashAggregate before its exchange.
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    graft.functions.GraftFunctions.register(spark)
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", m = 4, k = 8)
    val out = Similarity.pqSearch(idx, col("vec_id") < 5, k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"pqSearch plan still contains a window:\n$plan")
    assert(plan.contains("partial_topk_pairs"),
      s"no partial topk_pairs aggregate in plan:\n$plan")
    assert(out.count() == 15)
  }

  test("pqIndex is deterministic across builds") {
    val data = (0L until 40L).map(r =>
      (r, Array.tabulate(8)(i => math.sin(r * 3.1 + i).toFloat)))
    val df = registered.createDataset(data).toDF("vec_id", "embedding")
    val a = Similarity.pqIndex(df, "vec_id", "embedding", m = 2, k = 4)
    val b = Similarity.pqIndex(df, "vec_id", "embedding", m = 2, k = 4)
    assert(a.codebook == b.codebook)
  }
}
