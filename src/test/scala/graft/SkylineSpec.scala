package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Skyline operator: exact dominance semantics vs driver-side brute force,
  * bucketWidth-invariance, tie handling, and the grid-prune soundness on
  * the adversarial single-bucket staircase. */
class SkylineSpec extends SparkTestBase {

  /** Brute-force skyline: rows not strictly dominated by any other. */
  private def brute(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, dx, dy) =>
        dx <= x && dy >= y && (dx < x || dy > y)
      }
    }.map(_._1).toSet

  private def deterministic(n: Int): Seq[(Long, Double, Double)] =
    (0 until n).map { i =>
      val x = ((i * 9973 + 17) % 1000).toDouble / 3.0
      val y = ((i * 31337 + 5) % 500).toDouble / 7.0
      (i.toLong, x, y)
    }

  test("skyline2d equals brute-force dominance on a deterministic cloud") {
    import spark.implicits._
    val pts = deterministic(2000)
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, "id", "x", "y", bucketWidth = 25.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == brute(pts))
  }

  test("result is independent of bucketWidth, including one-bucket degeneracy") {
    import spark.implicits._
    val pts = deterministic(500)
    val df = pts.toDF("id", "x", "y")
    val widths = Seq(1.0, 7.3, 100.0, 1e9) // 1e9 => everything in one bucket
    val results = widths.map(w =>
      Skyline.skyline2d(df, "id", "x", "y", w).select("id")
        .collect().map(_.getLong(0)).toSet)
    assert(results.distinct.size == 1, "bucketWidth changed the skyline")
    assert(results.head == brute(pts))
  }

  test("ties are kept and anti-correlated staircases survive intact") {
    import spark.implicits._
    // a perfect staircase (y strictly improves as x worsens): every point
    // is Pareto-optimal
    val stairs = (0 until 100).map(i => (i.toLong, i.toDouble, i.toDouble))
    // plus an exact duplicate of one step, and one dominated point
    val pts = stairs ++ Seq((1000L, 50.0, 50.0), (2000L, 50.0, 49.0))
    val got = Skyline.skyline2d(pts.toDF("id", "x", "y"), "id", "x", "y", 10.0)
      .collect().map(_.getLong(0)).toSet
    assert(got == (stairs.map(_._1).toSet + 1000L), s"got $got")
    assert(got == brute(pts))
  }

  test("null coordinates are excluded, not propagated") {
    import spark.implicits._
    val df = Seq((1L, Some(1.0), Some(1.0)), (2L, None, Some(9.0)),
      (3L, Some(0.5), None)).toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, "id", "x", "y", 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }
}
