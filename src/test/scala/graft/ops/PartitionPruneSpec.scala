package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Pins what pt1_partition_pruning claims about hive-style layout: a
  * filter on the partition column is resolved against the directory
  * listing (partitionFilters), scans exactly the matching partition
  * directories, and never becomes a row-level data filter — the
  * mechanism that makes a lang='en' read of a 100 TB corpus cost only
  * the en bytes. */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = tmpDir("prune")
    Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"), (4L, "fr", "d"))
      .toDF("id", "lang", "payload")
      .write.mode("overwrite").partitionBy("lang").parquet(d)
    d
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case s: QueryStageExec => find(s.plan)
      case other => other.children.flatMap(find)
    }
    find(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("no FileSourceScanExec in plan"))
  }

  test("partition filter prunes to exactly the matching directory") {
    val df = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = scanOf(df)
    assert(scan.partitionFilters.nonEmpty,
      "lang = 'en' must resolve as a partition filter")
    assert(scan.dataFilters.isEmpty,
      "partition-only predicate must not also run per row")
    // listing-level pruning: one of three lang= directories survives
    // (df.inputFiles would NOT show this — it reads the unfiltered
    // logical relation; the executed scan's listing is the truth)
    assert(scan.selectedPartitions.partitionCount == 1)
    val files = scan.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      files.toSeq)
    assert(df.count() == 2L)
  }

  test("mixed predicate splits: partition part prunes, data part filters") {
    val df = spark.read.parquet(dir)
      .filter(col("lang") === "de" && col("id") > 0L)
    val scan = scanOf(df)
    assert(scan.partitionFilters.nonEmpty && scan.dataFilters.nonEmpty)
    assert(scan.selectedPartitions.partitionCount == 1)
    assert(df.count() == 1L)
  }

  test("dynamic partition pruning: a dim-side filter prunes the fact " +
      "scan at runtime") {
    val d = tmpDir("dpp")
    (1L to 40L).map(i => (i, i % 4, s"p$i")).toDF("id", "part", "payload")
      .write.mode("overwrite").partitionBy("part").parquet(s"$d/fact")
    Seq((0L, "keep"), (1L, "keep"), (2L, "drop"), (3L, "drop"))
      .toDF("part", "tag")
      .write.mode("overwrite").parquet(s"$d/dim")
    val fact = spark.read.parquet(s"$d/fact")
    val dim = spark.read.parquet(s"$d/dim").filter(col("tag") === "keep")
    val joined = fact.join(dim, "part")
    // the fact scan's partition filter is a runtime subquery on the
    // dim's broadcast result — invisible to static pruning
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"), planStr)
    assert(joined.count() == 20L)
    // after execution, the scan reports the pruned listing
    val scan = scanOf(joined)
    assert(scan.partitionFilters.nonEmpty)
  }

  test("partition column is reconstructed from the path on read-back") {
    val back = spark.read.parquet(dir).orderBy("id")
      .select("id", "lang", "payload").as[(Long, String, String)]
      .collect().toSeq
    assert(back == Seq((1L, "en", "a"), (2L, "en", "b"),
      (3L, "de", "c"), (4L, "fr", "d")))
  }
}
