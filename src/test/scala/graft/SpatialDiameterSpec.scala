package graft

import org.apache.spark.sql.functions._

import graft.operators.Trajectories
import graft.operators.Trajectories.IntHull

/** Exact per-entity squared diameter: hull unit cases, the buffer
  * compaction path, and brute-force equality on fixture events. */
class SpatialDiameterSpec extends SparkTestBase {

  test("IntHull: square with interior points, collinear line, degenerate sizes") {
    val sq = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L), (5L, 5L), (3L, 7L))
    assert(IntHull.hull(sq).toSet === Set((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L)))
    assert(IntHull.diamSq(IntHull.hull(sq)) === 200L)
    // collinear: hull keeps the two endpoints only
    val line = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L))
    assert(IntHull.hull(line).toSet === Set((0L, 0L), (3L, 3L)))
    assert(IntHull.diamSq(IntHull.hull(line)) === 18L)
    assert(IntHull.hull(Seq((5L, 5L))) === Seq((5L, 5L)))
    assert(IntHull.diamSq(Seq((5L, 5L))) === 0L)
    assert(IntHull.diamSq(Nil) === 0L)
    // duplicates collapse
    assert(IntHull.hull(Seq((1L, 1L), (1L, 1L))) === Seq((1L, 1L)))
  }

  test("spatialDiameter: hand case, single point, and the compaction path") {
    import spark.implicits._
    // entity 1: unit square + center -> diam_sq 2; entity 2: single point -> 0
    val small = Seq((1L, 0L, 0L), (1L, 1L, 0L), (1L, 0L, 1L), (1L, 1L, 1L),
      (2L, 9L, 9L)).toDF("user_id", "x", "y")
    val got = Trajectories.spatialDiameter(small, "user_id", "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 0L))

    // one entity with 5000 points on a circle-ish lattice: forces the
    // >512 buffer compaction repeatedly; answer checked by brute force
    val pts = (0 until 5000).map { i =>
      val a = 2 * math.Pi * i / 5000.0
      (7L, math.round(10000 * math.cos(a)), math.round(10000 * math.sin(a)))
    }
    val gotBig = Trajectories.spatialDiameter(pts.toDF("user_id", "x", "y"),
      "user_id", "x", "y").head().getLong(1)
    val brute = (for (a <- pts; b <- pts) yield {
      val dx = a._2 - b._2; val dy = a._3 - b._3; dx * dx + dy * dy
    }).max
    assert(gotBig === brute)
  }

  test("spatialDiameter == O(n²) brute force on fixture events") {
    val pts = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("x", expr("(event_id * 9973 + 12345) % 18000"))
      .withColumn("y", expr("(event_id * 31337 + 54321) % 36000"))
    val got = Trajectories.spatialDiameter(pts, "user_id", "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = pts.select("user_id", "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (u, rows) =>
        u -> (for (a <- rows; b <- rows) yield {
          val dx = a._2 - b._2; val dy = a._3 - b._3; dx * dx + dy * dy
        }).max
      }
    assert(got === brute)
    assert(got.values.exists(_ > 0))
  }

  test("spatialDiameter raises loudly on out-of-range coordinates") {
    import spark.implicits._
    val bad = Seq((1L, 5L, 3L), (1L, 2000000000L, 0L)).toDF("user_id", "x", "y")
    val ex = intercept[Exception] {
      Trajectories.spatialDiameter(bad, "user_id", "x", "y").collect()
    }
    assert(ex.getMessage.contains("spatialDiameter"))
  }
}
