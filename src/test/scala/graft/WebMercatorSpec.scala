package graft

import org.apache.spark.sql.functions._

import graft.operators.Tiling

/** Web-mercator (slippy z/x/y + quadkey) tiling: brute-force equality
  * against a driver-side replay of the same IEEE sequence, the
  * floor-margin precondition of the q_zxy_tiles oracle, and the clamp
  * behavior at the mercator cut / tile-range edges. */
class WebMercatorSpec extends SparkTestBase {

  private val Cut = 85.05112878

  /** The zxyAssign arithmetic, replayed on the driver with the same
    * java.lang.Math calls the codegen'd expressions compile to. */
  private def zxyRef(lat: Double, lon: Double, z: Int): (Long, Long, String) = {
    val n = (1L << z).toDouble
    val maxIdx = (1L << z) - 1L
    val latc = math.min(Cut, math.max(-Cut, lat))
    val phi = latc * math.Pi / 180.0
    val xf = (lon + 180.0) / 360.0 * n
    val yf = (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.Pi) / 2.0 * n
    val x = math.min(maxIdx, math.max(0L, math.floor(xf).toLong))
    val y = math.min(maxIdx, math.max(0L, math.floor(yf).toLong))
    val qk = (z - 1 to 0 by -1).map(i =>
      (((x >> i) & 1L) + ((y >> i) & 1L) * 2L).toString).mkString
    (x, y, qk)
  }

  test("zxyAssign == driver replay over the sf0.001 grid (zooms 3, 6, 11)") {
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("o_orderkey", "lat", "lon")
    for (z <- Seq(3, 6, 11)) {
      val got = Tiling.zxyAssign(pts, "lat", "lon", z)
        .select("lat", "lon", "zx", "zy", "quadkey").collect()
      assert(got.nonEmpty)
      for (r <- got) {
        val (x, y, qk) = zxyRef(r.getDouble(0), r.getDouble(1), z)
        assert(r.getLong(2) == x && r.getLong(3) == y && r.getString(4) == qk,
          s"z=$z (${r.getDouble(0)}, ${r.getDouble(1)}): " +
            s"got (${r.getLong(2)}, ${r.getLong(3)}, ${r.getString(4)}) want ($x, $y, $qk)")
      }
    }
  }

  test("oracle floor margin: no sf0.01 zy fraction within 1e-9 of an in-range boundary (z=6)") {
    // engine (Java Math) and DuckDB (libm) tan/ln can differ by ~1 ulp; a
    // floor flip needs the pre-floor value within ~1e-13 of an integer in
    // [1, 63] (boundaries 0 and 64 are clamp-safe: both outcomes clamp to
    // the same edge tile). xf needs no margin — its arithmetic is
    // transcendental-free and op-for-op identical.
    // exception: lat == 0.0 exactly (the grid is hundredths of degrees, so
    // equator rows exist) gives yf = 32.0 through an ALL-EXACT chain in any
    // IEEE engine — 0*pi/180 = 0, tan(0) = 0, cos(0) = 1, 1/1 = 1,
    // 0+1 = 1, ln(1) = 0, (1-0)/2*64 = 32, every step exact — so both
    // engines floor the identical 32.0 and no divergence is possible.
    val latLons = SparkEntry.points(spark, sf("sf0.01")).select("lat").collect()
    var minMargin = Double.MaxValue
    var inRange = 0
    var equator = 0
    for (r <- latLons) {
      val lat = r.getDouble(0)
      val latc = math.min(Cut, math.max(-Cut, lat))
      val phi = latc * math.Pi / 180.0
      val yf = (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.Pi) / 2.0 * 64.0
      val nearest = math.rint(yf)
      if (lat == 0.0) {
        equator += 1
        assert(yf == 32.0, s"equator row did not hit the exact midline: yf=$yf")
      } else if (nearest >= 1.0 && nearest <= 63.0) {
        inRange += 1
        val m = math.abs(yf - nearest)
        if (m < minMargin) minMargin = m
      }
    }
    info(f"min |yf - rint(yf)| over $inRange in-range points ($equator exact-equator rows) = $minMargin%.3e")
    assert(minMargin > 1e-9)
  }

  test("clamps: poles land on edge rows, lon extremes stay in range, z=0 is the root") {
    import spark.implicits._
    val df = Seq((90.0, 0.0), (-90.0, 0.0), (0.0, -180.0), (0.0, 179.999), (Cut, 5.0), (-Cut, 5.0))
      .toDF("lat", "lon")
    val rows = Tiling.zxyAssign(df, "lat", "lon", 4)
      .select("zx", "zy").as[(Long, Long)].collect()
    assert(rows.forall { case (x, y) => x >= 0 && x <= 15 && y >= 0 && y <= 15 })
    assert(rows(0)._2 == 0L && rows(1)._2 == 15L)  // poles -> top / bottom row
    assert(rows(2)._1 == 0L && rows(3)._1 == 15L)  // lon extremes -> first / last col
    val root = Tiling.zxyAssign(df, "lat", "lon", 0)
      .select("zx", "zy", "quadkey").as[(Long, Long, String)].collect()
    assert(root.forall(r => r._1 == 0L && r._2 == 0L && r._3 == ""))
  }

  test("zxyNeighborhoodCounts == driver-side 3x3 rollup with x-wrap and y-clamp (z=4)") {
    // z=4 so the sf0.001 grid densely occupies the 16x16 tile space and the
    // antimeridian wrap column actually carries contributions
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("lat", "lon")
    val got = Tiling.zxyNeighborhoodCounts(pts, "lat", "lon", 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (r <- pts.collect()) {
      val (x, y, _) = zxyRef(r.getDouble(0), r.getDouble(1), 4)
      counts((x, y)) = counts.getOrElse((x, y), 0L) + 1L
    }
    val want = counts.map { case ((x, y), n) =>
      val hood = (for { dx <- -1L to 1L; dy <- -1L to 1L } yield {
        val nx = (x + dx + 16L) % 16L
        val ny = y + dy
        if (ny >= 0 && ny < 16) counts.getOrElse((nx, ny), 0L) else 0L
      }).sum
      (x, y) -> (n, hood)
    }.toMap
    assert(got == want)
    // the wrap actually fired: some column-0 tile's neighborhood exceeds
    // the sum of columns 0 and 1 alone only if column 15 contributed
    assert(got.keys.exists(_._1 == 0L) && got.keys.exists(_._1 == 15L),
      "fixture did not populate both wrap columns")
  }

  test("hotspotScores == driver-side Gi* replay, bit for bit (z=4)") {
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("lat", "lon")
    val got = Tiling.hotspotScores(pts, "lat", "lon", 4)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (r <- pts.collect()) {
      val (x, y, _) = zxyRef(r.getDouble(0), r.getDouble(1), 4)
      counts((x, y)) = counts.getOrElse((x, y), 0L) + 1L
    }
    val tt = counts.size.toLong
    val sn = counts.values.sum
    val snn = counts.values.map(n => n * n).sum
    val mu = sn.toDouble / tt.toDouble
    val sigma = math.sqrt(snn.toDouble / tt.toDouble - mu * mu)
    val want = counts.map { case ((x, y), n) =>
      val hood = (for { dx <- -1L to 1L; dy <- -1L to 1L } yield {
        val ny = y + dy
        if (ny >= 0 && ny < 16) counts.getOrElse(((x + dx + 16L) % 16L, ny), 0L) else 0L
      }).sum
      val z = if (sigma == 0.0) None
        else Some((hood.toDouble - mu * 9.0) / (sigma * 3.0))
      (x, y) -> (n, hood, z)
    }.toMap
    // bit-exact: same integer inputs, same IEEE expression — no tolerance
    assert(got == want)
    assert(got.values.exists(_._3.exists(_ > 1.0)), "fixture produced no hotspot")
  }

  test("moransI == driver-side replay, bit for bit (z=4)") {
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("lat", "lon")
    val row = Tiling.moransI(pts, "lat", "lon", 4).head()
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (r <- pts.collect()) {
      val (x, y, _) = zxyRef(r.getDouble(0), r.getDouble(1), 4)
      counts((x, y)) = counts.getOrElse((x, y), 0L) + 1L
    }
    val nt = counts.size.toLong
    val sn = counts.values.sum
    val snn = counts.values.map(n => n * n).sum
    var we = 0L; var cc = 0L; var d = 0L
    for (((x, y), n) <- counts; dx <- -1L to 1L; dy <- -1L to 1L
         if dx != 0L || dy != 0L) {
      val ny = y + dy
      if (ny >= 0 && ny < 16) counts.get(((x + dx + 16L) % 16L, ny)).foreach { nb =>
        we += 1L; cc += n * nb; d += n
      }
    }
    // the engine's exact IEEE order: I = nt·(cc − 2mD + m²W) / (W·(S2 − nt·m²))
    val mu = sn.toDouble / nt.toDouble
    val num = cc.toDouble - 2.0 * mu * d.toDouble + mu * mu * we.toDouble
    val den = snn.toDouble - nt.toDouble * mu * mu
    val want = (nt.toDouble * num) / (we.toDouble * den)
    assert(row.getLong(0) == nt && row.getLong(1) == we)
    assert(!row.isNullAt(2) && row.getDouble(2) == want, // bit-exact, no tolerance
      s"got ${row.getDouble(2)}, want $want")
  }

  test("moransI signs: stripes < 0 < clustered (planted z=2 grids)") {
    import spark.implicits._
    // deterministic representatives of all 16 zoom-2 tiles
    val lats = Seq(70.0, 30.0, -30.0, -70.0) // rows y=0..3
    val lons = Seq(-135.0, -45.0, 45.0, 135.0) // cols x=0..3
    def grid(weight: (Int, Int) => Int) = (for {
      xi <- 0 until 4; yi <- 0 until 4
      _ <- 0 until weight(xi, yi)
    } yield (lats(yi), lons(xi))).toDF("lat", "lon")

    // vertical stripes: under queen adjacency each interior cell has 6
    // opposite-value and only 2 same-value neighbors (a checkerboard would
    // tie 4-4 via the diagonals — sign not guaranteed), so I < 0
    val stripes = Tiling.moransI(
      grid((x, _) => if (x % 2 == 0) 10 else 1), "lat", "lon", 2).head()
    assert(stripes.getLong(0) == 16 && !stripes.isNullAt(2))
    assert(stripes.getDouble(2) < 0.0, s"stripes I = ${stripes.getDouble(2)}")

    val clustered = Tiling.moransI(
      grid((x, y) => if (x < 2 && y < 2) 10 else 1), "lat", "lon", 2).head()
    assert(clustered.getDouble(2) > 0.0, s"clustered I = ${clustered.getDouble(2)}")

    // zero variance -> null statistic, counts still reported
    val flat = Tiling.moransI(grid((_, _) => 3), "lat", "lon", 2).head()
    assert(flat.getLong(0) == 16 && flat.isNullAt(2))
  }

  test("gearysC == driver-side replay, bit for bit (z=4); textbook signs on planted grids") {
    import spark.implicits._
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("lat", "lon")
    val row = Tiling.gearysC(pts, "lat", "lon", 4).head()
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (r <- pts.collect()) {
      val (x, y, _) = zxyRef(r.getDouble(0), r.getDouble(1), 4)
      counts((x, y)) = counts.getOrElse((x, y), 0L) + 1L
    }
    val nt = counts.size.toLong
    val sn = counts.values.sum
    val snn = counts.values.map(n => n * n).sum
    var we = 0L; var cc = 0L; var d2 = 0L
    for (((x, y), n) <- counts; dx <- -1L to 1L; dy <- -1L to 1L
         if dx != 0L || dy != 0L) {
      val ny = y + dy
      if (ny >= 0 && ny < 16) counts.get(((x + dx + 16L) % 16L, ny)).foreach { nb =>
        we += 1L; cc += n * nb; d2 += n * n
      }
    }
    val mu = sn.toDouble / nt.toDouble
    val num = (nt.toDouble - 1.0) * (2.0 * d2.toDouble - 2.0 * cc.toDouble)
    val den = 2.0 * we.toDouble * (snn.toDouble - nt.toDouble * mu * mu)
    assert(row.getLong(0) == nt && row.getLong(1) == we)
    assert(!row.isNullAt(2) && row.getDouble(2) == num / den, // bit-exact
      s"got ${row.getDouble(2)}, want ${num / den}")

    // planted z=2 grids, same fixtures as the Moran's I sign test:
    // stripes disperse (C > 1), a block clusters (C < 1), flat is null
    val lats = Seq(70.0, 30.0, -30.0, -70.0)
    val lons = Seq(-135.0, -45.0, 45.0, 135.0)
    def grid(weight: (Int, Int) => Int) = (for {
      xi <- 0 until 4; yi <- 0 until 4
      _ <- 0 until weight(xi, yi)
    } yield (lats(yi), lons(xi))).toDF("lat", "lon")
    val stripes = Tiling.gearysC(
      grid((x, _) => if (x % 2 == 0) 10 else 1), "lat", "lon", 2).head()
    assert(stripes.getDouble(2) > 1.0, s"stripes C = ${stripes.getDouble(2)}")
    val clustered = Tiling.gearysC(
      grid((x, y) => if (x < 2 && y < 2) 10 else 1), "lat", "lon", 2).head()
    assert(clustered.getDouble(2) < 1.0, s"clustered C = ${clustered.getDouble(2)}")
    assert(Tiling.gearysC(grid((_, _) => 3), "lat", "lon", 2).head().isNullAt(2))
  }

  test("quadkey has z digits and nests: the zoom-5 quadkey prefixes the zoom-8 one") {
    val pts = SparkEntry.points(spark, sf("sf0.001")).select("lat", "lon").limit(500)
    val joined = Tiling.zxyAssign(pts, "lat", "lon", 5)
      .withColumnRenamed("quadkey", "qk5").drop("zx", "zy")
    val rows = Tiling.zxyAssign(joined, "lat", "lon", 8)
      .select("qk5", "quadkey").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getString(0).length == 5 && r.getString(1).length == 8)
      assert(r.getString(1).startsWith(r.getString(0)),
        s"zoom-8 quadkey ${r.getString(1)} does not nest under zoom-5 ${r.getString(0)}")
    }
  }
}
