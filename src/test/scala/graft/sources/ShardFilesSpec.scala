package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft-shards binary format: the write must be a real two-phase
  * commit (only committed attempts become visible, temp dirs vanish),
  * the read must recover every record bit-for-bit with one partition
  * per file, and corruption must fail loudly instead of yielding rows. */
class ShardFilesSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (0L, 0L, Seq(1, 2, 3)),
    (0L, 1L, Seq(42)),
    (1L, 0L, Seq.empty[Int]),
    (1L, 1L, (0 until 257).toSeq) // larger than one IO buffer line
  ).toDF("shard", "window_id", "token_ids")

  test("roundtrip: every record and id survives; one partition per file") {
    val dir = tmpDir("shards-rt")
    ShardFiles.write(sample.repartition(2, col("shard")), dir)
    assert(Files.exists(Paths.get(dir, "_SUCCESS")))
    assert(ShardFiles.listCommitted(Paths.get(dir)).size == 2)
    assert(!Files.list(Paths.get(dir)).iterator().asScala.exists(
      _.getFileName.toString.startsWith("_tmp")), "temp dir leaked")
    val back = ShardFiles.read(spark, dir)
    assert(back.rdd.getNumPartitions == 2, "want one read partition per file")
    val got = back.as[(Long, Long, Seq[Int])].collect().toSet
    val want = sample.as[(Long, Long, Seq[Int])].collect().toSet
    assert(got == want, s"roundtrip mismatch: $got")
  }

  test("append accumulates; job id keeps files from colliding") {
    val dir = tmpDir("shards-app")
    ShardFiles.write(sample.limit(2).coalesce(1), dir)
    ShardFiles.write(sample.limit(2).coalesce(1), dir)
    assert(ShardFiles.listCommitted(Paths.get(dir)).size == 2)
    assert(ShardFiles.read(spark, dir).count() == 4)
  }

  test("bad magic fails the read instead of yielding rows") {
    val dir = tmpDir("shards-bad")
    ShardFiles.write(sample.coalesce(1), dir)
    val f = ShardFiles.listCommitted(Paths.get(dir)).head
    val bytes = Files.readAllBytes(f)
    bytes(0) = 'X'.toByte
    Files.write(f, bytes)
    val e = intercept[Exception] {
      ShardFiles.read(spark, dir).count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("bad magic")), e)
  }

  test("write rejects frames that are not in shard schema") {
    intercept[IllegalArgumentException] {
      ShardFiles.write(Seq((1L, "x")).toDF("shard", "text"), tmpDir("shards-bs"))
    }
  }
}
