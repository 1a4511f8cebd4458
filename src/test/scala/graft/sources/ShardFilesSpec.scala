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

  test("streaming sink: micro-batches land in files; epochs are exactly-once-visible") {
    val dir = tmpDir("shards-stream")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long, Seq[Int])]
    val q = mem.toDF().toDF("shard", "window_id", "token_ids")
      .writeStream.format("graft-shards")
      .option("checkpointLocation", tmpDir("shards-stream-ck"))
      .outputMode("append")
      .start(dir)
    try {
      mem.addData((0L, 0L, Seq(1, 2)), (1L, 0L, Seq(3)))
      q.processAllAvailable()
      mem.addData((0L, 1L, Seq(4, 5, 6)))
      q.processAllAvailable()
    } finally q.stop()
    val got = ShardFiles.read(spark, dir)
      .as[(Long, Long, Seq[Int])].collect().toSet
    assert(got == Set((0L, 0L, Seq(1, 2)), (1L, 0L, Seq(3)),
      (0L, 1L, Seq(4, 5, 6))), got)
    // a replayed epoch must not duplicate: its marker blocks re-commit
    val before = ShardFiles.listCommitted(Paths.get(dir)).size
    val sw = new ShardStreamingWrite(dir, "replay-q")
    val w = sw.createStreamingWriterFactory(null).createWriter(0, 7L, 42L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(9L, 9L,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(9))))
    val msg = w.commit()
    sw.commit(42L, Array(msg))
    val after = ShardFiles.listCommitted(Paths.get(dir)).size
    assert(after == before + 1)
    // same epoch again: marker exists, nothing renamed, nothing leaks
    val w2 = sw.createStreamingWriterFactory(null).createWriter(0, 8L, 42L)
    w2.write(org.apache.spark.sql.catalyst.InternalRow(8L, 8L,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(8))))
    sw.commit(42L, Array(w2.commit()))
    assert(ShardFiles.listCommitted(Paths.get(dir)).size == after)
    assert(ShardFiles.read(spark, dir).filter(col("shard") === 8L).count() == 0)
  }
}
