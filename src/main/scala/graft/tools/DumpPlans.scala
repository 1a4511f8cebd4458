package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-artifact dumper for the optimization rounds: writes
  * `.explain("formatted")` for each named query to `<outDir>/<name>.txt`
  * so before/after plan claims in OPTIMIZATION_r*.md are checkable
  * without running Spark.
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <name>[,<name>...]
  * Names match by substring, like SPARK_GRAFT_ONLY. Building a query
  * executes any driver-side preparation its closure performs (streaming
  * entries run their micro-batches), exactly as Bench does before its
  * noop write — the dumped plan is the plan of the returned DataFrame,
  * the thing the bench times.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpPlans <outDir> <names-csv>")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val wanted = args(1).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }
    picked.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(new java.io.File(outDir, s"$name.txt"))
        try w.println(txt) finally w.close()
        println(s"[plans] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED — ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
