package graft

import org.apache.spark.sql.functions._

import graft.operators.Tiling

/** H3-style hex binning: bit-exact driver replay, the floor-tie margin
  * precondition of the q_hex_bin oracle, and the nearest-hex-center
  * property cube-rounding is supposed to guarantee. */
class HexBinSpec extends SparkTestBase {

  private val S = 2.5

  private def hexRef(lat: Double, lon: Double): (Long, Long) = {
    val qf = (Tiling.HexC1 * lon - Tiling.HexC2 * lat) / S
    val rf = (Tiling.HexC3 * lat) / S
    val yf = -qf - rf
    val rx = math.floor(qf + 0.5).toLong
    val ry = math.floor(yf + 0.5).toLong
    val rz = math.floor(rf + 0.5).toLong
    val dx = math.abs(rx.toDouble - qf)
    val dy = math.abs(ry.toDouble - yf)
    val dz = math.abs(rz.toDouble - rf)
    if (dx > dy && dx > dz) (-ry - rz, rz)
    else if (dy > dz) (rx, rz)
    else (rx, -rx - ry)
  }

  test("hexBin == driver replay bit for bit; floor-tie margin holds (sf0.001)") {
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("lat", "lon")
    val got = Tiling.hexBin(pts, "lat", "lon", S)
      .select("lat", "lon", "hex_q", "hex_r").collect()
    assert(got.nonEmpty)
    var margin = Double.MaxValue
    for (r <- got) {
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert((r.getLong(2), r.getLong(3)) == hexRef(lat, lon),
        s"($lat, $lon): got (${r.getLong(2)}, ${r.getLong(3)}) want ${hexRef(lat, lon)}")
      val qf = (Tiling.HexC1 * lon - Tiling.HexC2 * lat) / S
      val rf = (Tiling.HexC3 * lat) / S
      for (v <- Seq(qf + 0.5, -qf - rf + 0.5, rf + 0.5)) {
        val d = math.abs(v - math.rint(v))
        if (d > 0) margin = math.min(margin, d)
      }
    }
    info(f"min floor-tie margin over ${got.length} points = $margin%.3e")
    assert(margin > 1e-9)
  }

  test("hexRingCounts == driver-side 7-cell rollup") {
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("lat", "lon")
    val got = Tiling.hexRingCounts(pts, "lat", "lon", S)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (r <- pts.collect()) {
      val k = hexRef(r.getDouble(0), r.getDouble(1))
      counts(k) = counts.getOrElse(k, 0L) + 1L
    }
    val offs = Seq((0L, 0L), (1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L), (1L, -1L), (-1L, 1L))
    val want = counts.map { case ((q, r), n) =>
      (q, r) -> (n, offs.map { case (dq, dr) => counts.getOrElse((q + dq, r + dr), 0L) }.sum)
    }.toMap
    assert(got == want)
    assert(want.values.exists(v => v._2 > v._1), "no hex has an occupied neighbor")
  }

  test("assigned hex center is the nearest center among itself and its 6 neighbors") {
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("lat", "lon").limit(2000)
    val rows = Tiling.hexBin(pts, "lat", "lon", S)
      .select("lat", "lon", "hex_q", "hex_r").collect()
    val neighbors = Seq((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L), (1L, -1L), (-1L, 1L))
    for (r <- rows) {
      val (lat, lon, q, hr) = (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3))
      def dist(cq: Long, cr: Long): Double = {
        val (clat, clon) = Tiling.hexCenter(cq, cr, S)
        val dlat = lat - clat; val dlon = lon - clon
        math.sqrt(dlat * dlat + dlon * dlon)
      }
      val own = dist(q, hr)
      for ((dq, dr) <- neighbors)
        assert(own <= dist(q + dq, hr + dr) + 1e-9,
          s"($lat, $lon) assigned ($q, $hr) but (${q + dq}, ${hr + dr}) is nearer")
    }
  }
}
