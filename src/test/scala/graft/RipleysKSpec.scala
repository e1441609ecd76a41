package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.S2LatLng

/** Ripley's K: brute-force equality (counts AND the k_est doubles, bit for
  * bit) against a driver-side replay, plus the half-meter rounding-margin
  * precondition that makes the integer pair-membership test engine/oracle
  * exact. */
class RipleysKSpec extends SparkTestBase {

  private val Radii = Seq(125000L, 250000L, 500000L, 1000000L)

  private def custPts(sfName: String) =
    spark.read.parquet(s"${sf(sfName)}/customer.parquet")
      .select(col("c_custkey"), expr(SparkEntry.latSqlFor("c_custkey")).as("lat"),
        expr(SparkEntry.lonSqlFor("c_custkey")).as("lon"))

  test("ripleysK == brute force at sf0.001: counts and k_est bit-exact") {
    val pts = custPts("sf0.001")
    val got = SpatialJoin.ripleysK(pts, "lat", "lon", "c_custkey", Radii)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rows = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val n = rows.length.toLong
    val dms = for {
      i <- rows.indices; j <- (i + 1) until rows.length
    } yield math.round(S2LatLng.fromDegrees(rows(i)._2, rows(i)._3)
      .getEarthDistance(S2LatLng.fromDegrees(rows(j)._2, rows(j)._3)))
    val want = Radii.map { r =>
      val np = dms.count(_ <= r).toLong
      // the engine's exact IEEE order: (A·2·np) / (n·(n−1))
      r -> ((np, SpatialJoin.SphereAreaM2 * 2.0 * np.toDouble /
        (n.toDouble * (n.toDouble - 1.0))))
    }.toMap
    assert(got === want)
    assert(got(Radii.max)._1 > got(Radii.min)._1, "K must grow with radius on this fixture")
  }

  test("rounding margin at sf0.01: no pair distance near a half-meter boundary") {
    // same precondition class as the trajStats margin: engine and oracle
    // compute the haversine with different fp op order (~ulp divergence),
    // so the integer round_m(d) <= r membership is exact iff no distance
    // sits that close to a x.5 m boundary (this also covers the
    // rMax + 0.5 prefilter cut). One extra guard: no ROUNDED distance may
    // equal a radius boundary exactly while its raw distance disagrees —
    // subsumed by the same margin.
    val pts = custPts("sf0.01")
    val margin = pts.select(col("c_custkey").as("id_a"), col("lat").as("la"), col("lon").as("oa"))
      .crossJoin(pts.select(col("c_custkey").as("id_b"), col("lat").as("lb"), col("lon").as("ob")))
      .where(col("id_a") < col("id_b"))
      .select(graft.functions.s2functions.s2_distance_m(col("la"), col("oa"), col("lb"), col("ob")).as("m"))
      .where(col("m") <= Radii.max + 10L)
      .select(abs(col("m") - floor(col("m")) - 0.5).as("margin"))
      .agg(min("margin")).head().getDouble(0)
    info(f"min distance to a half-meter boundary = $margin%.3e m")
    assert(margin > 1e-7, f"pair within $margin%.3e m of a rounding boundary")
  }
}
