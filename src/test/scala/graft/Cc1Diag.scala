package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic (Test/runMain graft.Cc1Diag <sfDir>): decomposes cc1's
  * pipeline — candidate volume, verified pair volume, dup-graph size,
  * and label-propagation round count — to attribute scale-curve shuffle
  * growth to a stage. */
object Cc1Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val df = graft.Tables.load(spark, dir, "documents")

    // mirror of jaccardPairs' candidate construction (diagnosis only)
    val t = df.select(col("doc_id"), col("lang").as("lang"),
        expr("array_sort(array_distinct(transform(filter(split(text, ' '), " +
          "x -> length(x) > 0), x -> xxhash64(x))))").as("w"))
      .withColumn("nw", size(col("w")).cast("bigint"))
      .withColumn("bucket", floor(col("nw") / 8).cast("bigint"))
    val tokens = t.select(col("doc_id"), col("lang"), col("bucket"),
      col("nw"), explode(col("w")).as("word"))
    val freq = tokens.groupBy("word").agg(count(lit(1)).as("df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("word"))
    val prefixes = tokens.join(freq, "word")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= col("nw") - ceil(col("nw") * 9 / lit(10.0)) + 1)
      .select("doc_id", "lang", "bucket", "word")
    println(s"[diag] prefix rows: ${prefixes.count()}")
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
          col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"))
    println(s"[diag] candidates (pre-distinct): ${cand.count()}")
    println(s"[diag] candidates (distinct): ${cand.distinct().count()}")
    val pairs = graft.ops.Dedup.jaccardPairs(df, "doc_id", "lang", "text")
      .localCheckpoint()
    println(s"[diag] verified pairs: ${pairs.count()}")
    val nodes = pairs.select(col("doc_id_a").as("n"))
      .union(pairs.select(col("doc_id_b").as("n"))).distinct().count()
    println(s"[diag] dup-graph nodes: $nodes")
    val t0 = System.nanoTime()
    val labels = graft.ops.Dedup.dupClusters(pairs, "doc_id_a", "doc_id_b")
    println(s"[diag] clusters rows: ${labels.count()} " +
      f"(dupClusters wall ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
