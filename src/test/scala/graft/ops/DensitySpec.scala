package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed DBSCAN fixtures (the sf-data run is graded by db1's
  * brute-force recursive oracle): core/border/noise roles, min-label
  * cluster canonicalization, and the grid-join plan shape. */
class DensitySpec extends SparkSpec {
  import spark.implicits._

  // cluster A: 4 points within eps=10 of each other near origin;
  // border: point 4 within eps of A's cores but with only 2 neighbors;
  // noise: point 5 far away.
  private val pts = Seq(
    (0L, 0L, 0L), (1L, 5L, 0L), (2L, 0L, 5L), (3L, 5L, 5L),
    (4L, 14L, 0L),   // within 10 of points 1 (9,0 dist) only + itself
    (5L, 500L, 500L) // isolated
  ).toDF("id", "x", "y")

  test("cores, border, noise with min-label clusters") {
    val got = Density.dbscan2D(pts, "id", "x", "y", eps = 10L,
      minPts = 4).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("is_core"),
        r.getAs[Long]("cluster")))
    // points 0-3: each has 4 neighbors (itself + 3 others within 10)
    // → all core, one cluster labeled 0 (min id)
    assert(got.take(4).toSeq == Seq((0L, true, 0L), (1L, true, 0L),
      (2L, true, 0L), (3L, true, 0L)))
    // point 4: 3 neighbors (self, 1, 3→dist sqrt(81+25)>10 no... self,
    // 1 at dist 9, 3 at dist ~10.3) → not core; neighbor 1 is core →
    // border of cluster 0
    assert(got(4) == ((4L, false, 0L)))
    // point 5: alone → noise
    assert(got(5) == ((5L, false, -1L)))
  }

  test("singleton core labels itself") {
    // 4 coincident points: all core; plus a far noise point
    val df = Seq((7L, 0L, 0L), (8L, 0L, 0L), (9L, 0L, 0L),
      (10L, 1L, 1L), (99L, 900L, 900L)).toDF("id", "x", "y")
    val got = Density.dbscan2D(df, "id", "x", "y", eps = 5L, minPts = 4)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("is_core"),
        r.getAs[Long]("cluster")))
    assert(got.take(4).forall { case (_, core, c) => core && c == 7L })
    assert(got.last == ((99L, false, -1L)))
  }

  test("two separated clusters get distinct min-id labels") {
    val a = Seq.tabulate(4)(i => (i.toLong, i.toLong, 0L))
    val b = Seq.tabulate(4)(i => (100L + i, 1000L + i, 0L))
    val got = Density.dbscan2D((a ++ b).toDF("id", "x", "y"),
      "id", "x", "y", eps = 10L, minPts = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster"))
      .toMap
    assert((0L to 3L).forall(got(_) == 0L))
    assert((100L to 103L).forall(got(_) == 100L))
  }

  test("plan: candidates come from the cell equi-join, no cartesian") {
    val plan = Density.dbscan2D(pts, "id", "x", "y", eps = 10L,
      minPts = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"dbscan2D plan has a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"dbscan2D plan has a nested-loop join:\n$plan")
  }
}
