package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evaluation leg of the classifier triangle ([[TextOps.classifierAuc]],
  * [[TextOps.calibrationTable]]): exact Mann–Whitney AUC on floor-
  * bucketed scores and the integer reliability table. The au1/au2 gate
  * entries grade the full corpus against DuckDB; this spec pins the
  * arithmetic on hand-computable fixtures, including the negative-score
  * bucketing that a truncating division would get wrong. */
class ClassifierEvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Long)], bucket: Long = 1L): Option[Long] = {
    val df = rows.toDF("s", "y")
    val r = TextOps.classifierAuc(df, "s", "y", bucket).head()
    if (r.isNullAt(3)) None else Some(r.getLong(3))
  }

  test("perfect separation scores 1e6; reversed scores 0") {
    val sep = Seq((10L, 1L), (20L, 1L), (1L, 0L), (2L, 0L))
    assert(auc(sep) == Some(1000000L))
    assert(auc(sep.map { case (s, y) => (-s, y) }) == Some(0L))
  }

  test("ties count half: all-equal scores give exactly 1/2") {
    assert(auc(Seq((7L, 1L), (7L, 0L), (7L, 1L), (7L, 0L))) ==
      Some(500000L))
  }

  test("hand-computed mixed case") {
    // scores: pos {3, 1}, neg {2, 1}. Pairs: (3>2)+(3>1)+(1>2=0)+
    // (1=1 half) = 2.5 of 4 → 0.625
    assert(auc(Seq((3L, 1L), (1L, 1L), (2L, 0L), (1L, 0L))) ==
      Some(625000L))
  }

  test("AUC is undefined (null) when a class is empty") {
    assert(auc(Seq((1L, 1L), (2L, 1L))) == None)
    assert(auc(Seq((1L, 0L))) == None)
  }

  test("negative scores floor-bucket monotonically (no (-b,b) merge)") {
    // With truncating division -500 and 500 would share bucket 0 and
    // the pos/neg order information across zero would vanish: these
    // four scores are perfectly separating, and must STAY perfectly
    // separating at bucket width 1000.
    val sep = Seq((500L, 1L), (1500L, 1L), (-1500L, 0L), (-500L, 0L))
    assert(auc(sep, bucket = 1000L) == Some(1000000L))
    // sanity: buckets really are -2, -1, 0, 1 — four distinct
    val b = TextOps.classifierAuc(sep.toDF("s", "y"), "s", "y", 1000L)
      .head().getLong(2)
    assert(b == 4L)
  }

  test("bucketed AUC equals exact AUC of the quantized scores") {
    val rows = Seq((1201L, 1L), (1249L, 0L), (900L, 1L), (850L, 0L),
      (-120L, 1L), (-80L, 0L), (300L, 1L))
    val quantized = rows.map { case (s, y) =>
      (Math.floorDiv(s, 100L), y) }
    assert(auc(rows, bucket = 100L) == auc(quantized))
  }

  test("confusion at threshold: hand-computed counts and ppm metrics") {
    // threshold 10: scores {12+,11+,9+,8-,13-} → tp=2 fn=1 fp=1 tn=1
    val df = Seq((12L, 1L), (11L, 1L), (9L, 1L), (8L, 0L), (13L, 0L))
      .toDF("s", "y")
    val r = TextOps.confusionAtThreshold(df, "s", "y", 10L).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 1L)))
    assert(r.getLong(4) == 666666L) // precision 2/3
    assert(r.getLong(5) == 666666L) // recall 2/3
    assert(r.getLong(6) == 666666L) // f1 of equal p/r
  }

  test("confusion metrics are null when undefined, not zero") {
    // nothing predicted positive → precision undefined, recall 0
    val r = TextOps.confusionAtThreshold(
      Seq((1L, 1L), (2L, 0L)).toDF("s", "y"), "s", "y", 100L).head()
    assert(r.isNullAt(4) && r.getLong(5) == 0L && r.isNullAt(6))
  }

  test("calibration table: counts, per-mille rate, truncated mean") {
    val df = Seq((250000L, 1L), (260000L, 0L), (270000L, 1L),
      (-150000L, 0L), (-250000L, 1L)).toDF("s", "y")
    val rows = TextOps.calibrationTable(df, "s", "y", 100000L)
      .orderBy("bucket").collect()
    // buckets: floor(-250000/1e5) = -3 (one row), -2 (one), 2 (three)
    assert(rows.map(_.getLong(0)).toSeq == Seq(-3L, -2L, 2L))
    val b2 = rows(2)
    assert(b2.getLong(1) == 3L && b2.getLong(2) == 2L)
    assert(b2.getLong(3) == 666L) // (2*1000) div 3
    assert(b2.getLong(4) == 260000L)
    // negative mean truncates toward zero, matching DuckDB //
    assert(rows(0).getLong(4) == -250000L)
  }
}
