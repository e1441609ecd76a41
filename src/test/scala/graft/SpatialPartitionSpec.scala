package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialPartition

/** STR partitioner: scalar-replay equality, the equi-depth balance
  * guarantee under heavy coordinate skew, and determinism across
  * parallelism (partition-boundary independence of the grouped rank). */
class SpatialPartitionSpec extends SparkTestBase {

  private def cloud(n: Int): Seq[(Long, Double, Double)] =
    (0 until n).map { i =>
      // heavy skew: 80% of points inside one degree square
      val dense = i % 5 != 0
      val lat = if (dense) 48.0 + (i % 97) / 100.0 else -80.0 + (i % 160)
      val lon = if (dense) 11.0 + (i % 89) / 100.0 else -170.0 + (i % 340)
      (i.toLong, lat, lon)
    }

  /** Driver-side replay of the two-level floor-rank rule. */
  private def scalar(pts: Seq[(Long, Double, Double)], sx: Int, sy: Int)
      : Map[Long, (Long, Long)] = {
    val n = pts.size
    val byLon = pts.sortBy(p => (p._3, p._1)).zipWithIndex
      .map { case (p, r) => (p, r.toLong * sx / n) }
    byLon.groupBy(_._2).flatMap { case (tx, slice) =>
      val m = slice.size
      slice.map(_._1).sortBy(p => (p._2, p._1)).zipWithIndex
        .map { case (p, r) => p._1 -> (tx, r.toLong * sy / m) }
    }
  }

  test("strAssign equals the scalar floor-rank replay on a skewed cloud") {
    import spark.implicits._
    val pts = cloud(3000)
    val got = SpatialPartition.strAssign(pts.toDF("id", "lat", "lon"),
        "id", "lon", "lat", sx = 8, sy = 4)
      .select("id", "tx", "ty").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == scalar(pts, 8, 4))
  }

  test("equi-depth balance: tile sizes differ by at most sy even under 80% skew") {
    import spark.implicits._
    val pts = cloud(3217) // deliberately not divisible by 32
    val sizes = SpatialPartition.strAssign(pts.toDF("id", "lat", "lon"),
        "id", "lon", "lat", sx = 8, sy = 4)
      .groupBy("tx", "ty").count().collect().map(_.getLong(2))
    assert(sizes.length == 32, s"expected all 32 tiles used, got ${sizes.length}")
    // slices differ by <= 1 row; each slice's tiles differ by <= 1 row
    assert(sizes.max - sizes.min <= 2, s"sizes ${sizes.min}..${sizes.max}")
  }

  test("assignment is independent of input partitioning") {
    import spark.implicits._
    val pts = cloud(500)
    def run(parts: Int) = SpatialPartition.strAssign(
        pts.toDF("id", "lat", "lon").repartition(parts), "id", "lon", "lat", 4, 4)
      .select("id", "tx", "ty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(13))
  }
}
