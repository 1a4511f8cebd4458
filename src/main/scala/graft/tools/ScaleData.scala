package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve data generator: replicate an sf dir N× into a larger,
  * self-similar corpus, so the heavy queries can be measured at 10× the
  * bench scale (VERDICT r7 "what's missing" #4 — turn the 100 TB design
  * story into an empirical curve).
  *
  * This is NOT the driver's generator (TESTDATA.md's data is read-only
  * and its generator is not ours to rerun); it is a replication scheme
  * chosen so that "10×" means 10× MORE OF THE SAME WORK, not a workload
  * shape change:
  *
  *  - every copy shifts its keys by copy-specific offsets that preserve
  *    FK structure (orders↔lineitem, customer, part, supplier) and the
  *    arithmetic the queries derive semantics from (event_id % 7 and
  *    parity for the CDC op derivation — the events offset is a multiple
  *    of 14; doc/vec ids shift by even offsets for the %2 format splits);
  *  - document text goes through a per-copy alphabet substitution
  *    cipher (affine, injective across 312 copies — NOT a plain
  *    rotation, which collides past 26 copies):
  *    within-copy token/shingle structure (distinct counts, Jaccard,
  *    byte lengths, n_chars) is preserved EXACTLY, while cross-copy
  *    token overlap collapses — so near-dup candidate volume scales
  *    linearly with copies instead of quadratically (10 identical
  *    copies would manufacture 100× the pair work and grade a
  *    different algorithm);
  *  - embeddings flip signs per (copy, dimension): within-copy cosine
  *    geometry is exactly preserved (both sides of every pair flip the
  *    same dims), cross-copy cosines decorrelate;
  *  - events shift time by a copy-specific whole multiple of the data's
  *    span: per-window densities and per-user interval structure are
  *    unchanged, the timeline just extends 10×.
  *
  * Usage: ScaleData <srcSfDir> <outDir> <copies>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Even (parity-safe) id offset, far above any base id.
    val OFF = 1L << 20
    // Events offset: multiple of 14 preserves event_id % 7 and % 2,
    // which the CDC envelope derivation maps to op c/u/d.
    val OFF_E = 14L * (1L << 20)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }
    def replicate(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = graft.Tables.load(spark, srcDir, name)
      write(name, (0 until copies).map(k => f(base, k)).reduce(_ unionAll _))
    }

    // Dimensions stay as-is: at any scale they remain broadcast-side.
    Seq("region", "nation").foreach { n =>
      write(n, graft.Tables.load(spark, srcDir, n))
    }

    replicate("customer") { (df, k) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(k * OFF))
    }
    replicate("supplier") { (df, k) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(k * OFF))
    }
    replicate("part") { (df, k) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(k * OFF))
    }
    replicate("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * OFF))
        .withColumn("o_custkey", col("o_custkey") + lit(k * OFF))
    }
    replicate("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * OFF))
        .withColumn("l_partkey", col("l_partkey") + lit(k * OFF))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * OFF))
    }

    val ev = graft.Tables.load(spark, srcDir, "events")
    val spanDays = ev.agg(
        (datediff(max(col("ts")), min(col("ts"))) + 2).as("d"))
      .head().getInt(0)
    replicate("events") { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * OFF_E))
        .withColumn("user_id", col("user_id") + lit(k * OFF))
        .withColumn("ts",
          col("ts") + make_dt_interval(lit(k * spanDays), lit(0), lit(0), lit(0)))
    }

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    // Per-copy AFFINE substitution x -> a·x + b (mod 26), a coprime to
    // 26 — a pure rotation (x -> x + k mod 26) has only 26 distinct
    // values, so a >26-copy replica silently reused ciphers and
    // manufactured cross-copy EXACT duplicates (round 9's first sf3 run:
    // copies 26-29 byte-identical to 0-3 put 8 copies' worth of docs
    // into the dup graph and cc1's shuffle went 10× for 3× data — the
    // exact artifact the design notes above forbid). Distinct (a, b)
    // per copy for 12·26 = 312 copies; two distinct affine maps agree
    // on at most gcd-many letters, so cross-copy token images stay
    // disjoint for real tokens. k = 0 is the identity (a=1, b=0).
    def affine(k: Int): String = {
      val as = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      val a = as(k % as.length)
      val b = (k / as.length) % 26
      require(k < as.length * 26,
        s"ScaleData: affine cipher family exhausted at $k copies")
      lower.indices.map(x => lower((a * x + b) % 26)).mkString
    }
    replicate("documents") { (df, k) =>
      df.withColumn("doc_id", col("doc_id") + lit(k * OFF))
        .withColumn("text",
          if (k == 0) col("text")
          else translate(col("text"), lower + upper,
            affine(k) + affine(k).toUpperCase))
    }

    replicate("embeddings") { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + lit(k * OFF))
        .withColumn("embedding",
          if (k == 0) col("embedding")
          else expr(s"transform(embedding, (x, d) -> " +
            s"x * CAST(1 - 2 * (abs(xxhash64($k, d)) % 2) AS FLOAT))"))
    }

    spark.stop()
  }
}
