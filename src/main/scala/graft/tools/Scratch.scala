package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.registerAll(spark, sfDir)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $tag%-28s ${(System.nanoTime()-t0)/1e9}%7.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.table("documents")
    for (p <- 1 to 3) {
      val t = docs.select(col("doc_id"), col("lang"),
          expr(s"array_sort(array_distinct(transform(filter(split(text, ' '), " +
            "x -> length(x) > 0), x -> xxhash64(x))))").as("w"))
        .withColumn("nw", size(col("w")).cast("bigint"))
        .withColumn("bucket", floor(col("nw") / 8).cast("bigint"))
        .localCheckpoint()
      val tokens = t.select(col("doc_id"), col("lang"), col("bucket"),
        col("nw"), explode(col("w")).as("word"))
      val freq = tokens.groupBy("word").agg(count(lit(1)).as("df"))
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("word"))
      val prefixes = tokens.join(freq, "word")
        .withColumn("rn", row_number().over(byRarity))
        .filter(col("rn") <= col("nw") - ceil(col("nw") * 9 / lit(10.0)) + 1)
        .select("doc_id", "lang", "bucket", "word")
      val cand = prefixes.as("a").join(prefixes.as("b"),
          col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
            col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"))
        .distinct()
      time("tokens+freq") { noop(freq) }
      time("prefixes") { noop(prefixes) }
      time("cand") { noop(cand) }
      time("full jaccardPairs") { noop(graft.ops.Dedup.jaccardPairs(docs, "doc_id", "lang", "text")) }
    }
    spark.stop()
  }
}
