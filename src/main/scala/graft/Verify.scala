package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure contract (round 7's lesson — a regenerated parquet type broke
  * every query and the gate graded an empty `{}` because this main printed
  * to stderr and exited 0): a schema-drift preflight runs FIRST and turns
  * environment breakage into one loud named error; per-query failures are
  * collected into `outDir/failures.json`; any failure → exit code != 0.
  * The dump still writes everything that succeeded plus oracle_sql.json
  * before exiting, so a partial run still grades partially.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def writeJsonMap(path: String, m: Seq[(String, String)]): Unit =
      Files.writeString(Paths.get(path),
        m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))

    // Preflight: all ten tables must load end-to-end before any query runs.
    // One changed parquet type = ONE named error here, not 145 opaque ones.
    val drift = Tables.preflight(spark, sfDir)
    if (drift.nonEmpty) {
      drift.foreach(e => System.err.println(s"[verify] PREFLIGHT FAILED — $e"))
      writeJsonMap(s"$outDir/failures.json",
        drift.map(e => e.takeWhile(_ != ':') -> s"preflight: $e"))
      spark.stop()
      sys.exit(2)
    }

    // Dev loop (mirrors Bench): SPARK_GRAFT_ONLY=<substr,substr> restricts
    // the dump; the driver sets nothing and dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name FAILED — $msg")
        failures += name -> msg
      }
    }
    writeJsonMap(s"$outDir/oracle_sql.json", SparkEntry.oracleSql.toSeq)
    if (failures.nonEmpty) {
      writeJsonMap(s"$outDir/failures.json", failures.toSeq)
      System.err.println(s"[verify] ${failures.size} quer${if (failures.size == 1) "y" else "ies"} failed — see $outDir/failures.json")
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
