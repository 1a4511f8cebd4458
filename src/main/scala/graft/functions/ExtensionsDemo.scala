package graft.functions

import org.apache.spark.sql.SparkSession

/** Proves the cluster-deploy registration path: a fresh session built
  * with `withExtensions(new GraftExtensions)` (equivalently
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`) can
  * call every graft function from plain SQL without per-session
  * registration. Usage: `sbt "runMain graft.functions.ExtensionsDemo"`. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-demo")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |       mask_intersect(array(7L), array(5L)) AS inter,
        |       simhash64(array(xxhash64('alpha'))) AS sh,
        |       size(minhash_shingle(array('a','b','c'), 2, 16)) AS sig_len,
        |       word_ngrams(array('a','b','c'), 2) AS bigrams""".stripMargin)
      .head()
    println(s"vec_dot=${row.getDouble(0)} mask_intersect=${row.getLong(1)} " +
      s"simhash=${row.getLong(2)} sig_len=${row.getInt(3)} " +
      s"bigrams=${row.getSeq[String](4).mkString(",")}")
    assert(row.getDouble(0) == 11.0 && row.getLong(1) == 2L &&
      row.getInt(3) == 16)
    println("extensions OK")
    spark.stop()
  }
}
