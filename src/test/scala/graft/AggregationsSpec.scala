package graft

import org.apache.spark.sql.functions._

import graft.functions.S2Aggregations
import graft.functions.s2functions._
import graft.s2._

/** Typed Aggregator specs: distributed area/centroid sums equal the
  * kernel's sequential computation. */
class AggregationsSpec extends SparkTestBase {

  test("cellAreaCentroid aggregator == sequential kernel sums over a covering") {
    val spark0 = spark
    import spark0.implicits._
    val cap = S2Cap.fromAxisAngle(S2LatLng.fromDegrees(40, -100).toPoint, 0.1)
    val covering = new S2RegionCoverer().setMaxCells(100).getCovering(cap)
    assert(covering.length > 10)

    val result = covering.toDS()
      .select(S2Aggregations.cellAreaCentroid.toColumn)
      .collect()(0)

    // sequential reference computation
    var areaSum = 0.0
    var cx = 0.0; var cy = 0.0; var cz = 0.0
    for (id <- covering) {
      val a = S2Cell(id).approxArea
      val p = S2Point.normalize(S2CellId.toPoint(id)) * a
      areaSum += a; cx += p.x; cy += p.y; cz += p.z
    }
    val centroid = S2LatLng.fromPoint(S2Point.normalize(S2Point(cx, cy, cz)))

    assert(math.abs(result.areaSteradians - areaSum) < 1e-12)
    assert(math.abs(result.latDeg - centroid.latDegrees) < 1e-9)
    assert(math.abs(result.lonDeg - centroid.lngDegrees) < 1e-9)
    // centroid of a cap covering lands near the cap axis
    assert(math.abs(result.latDeg - 40) < 1.0)
    assert(math.abs(result.lonDeg + 100) < 1.5)
  }

  test("leafCellsCovered aggregator == S2CellUnion.leafCellsCovered") {
    val spark0 = spark
    import spark0.implicits._
    val cap = S2Cap.fromAxisAngle(S2LatLng.fromDegrees(-20, 130).toPoint, 0.05)
    val union = new S2RegionCoverer().setMaxCells(30).getCoveringUnion(cap)
    val total = union.cellIds.toDS()
      .select(S2Aggregations.leafCellsCovered.toColumn)
      .collect()(0)
    assert(total == union.leafCellsCovered)
  }

  test("per-tile area stats over points via the aggregator") {
    val spark0 = spark
    import spark0.implicits._
    val pts = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
      .withColumn("lat", expr("CAST((o_orderkey * 9973 + 12345) % 18000 AS DOUBLE) / CAST(100 AS DOUBLE) - CAST(90 AS DOUBLE)"))
      .withColumn("lon", expr("CAST((o_orderkey * 31337 + 54321) % 36000 AS DOUBLE) / CAST(100 AS DOUBLE) - CAST(180 AS DOUBLE)"))
      .withColumn("tile", s2_parent(s2_cell_id(col("lat"), col("lon")), 4))
    val stats = pts.select(col("tile")).as[Long]
      .groupByKey(t => S2CellId.parentForLevel(t, 2))
      .agg(S2Aggregations.cellAreaCentroid.toColumn)
      .collect()
    assert(stats.nonEmpty)
    assert(stats.forall(_._2.areaSteradians > 0))
  }
}
