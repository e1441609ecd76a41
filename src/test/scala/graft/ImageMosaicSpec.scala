package graft

import org.apache.spark.sql.functions._

import graft.operators.ImagePayload

/** Per-tile image mosaic: the decoded average colors replayed bit for bit
  * from the raster FORMULA (no decoding on the reference side — agreement
  * proves the decode path reproduces the synthesized pixels exactly), plus
  * the floor-margin precondition of the q_image_mosaic oracle. */
class ImageMosaicSpec extends SparkTestBase {

  private val Cut = 85.05112878

  private def zxyRef(lat: Double, lon: Double, z: Int): (Long, Long) = {
    val n = (1L << z).toDouble
    val maxIdx = (1L << z) - 1L
    val latc = math.min(Cut, math.max(-Cut, lat))
    val phi = latc * math.Pi / 180.0
    val xf = (lon + 180.0) / 360.0 * n
    val yf = (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.Pi) / 2.0 * n
    (math.min(maxIdx, math.max(0L, math.floor(xf).toLong)),
      math.min(maxIdx, math.max(0L, math.floor(yf).toLong)))
  }

  /** Expected per-image channel means straight from the pixel formula —
    * integer sums over 256 pixels, /256 (exact in float). */
  private def formulaMeans(key: Long, w: Int, h: Int): (Float, Float, Float) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ImagePayload.pixel(key, x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    val n = (w.toLong * h).toDouble
    ((sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat)
  }

  test("tileMosaic == formula replay: counts, decode totals, and colors bit for bit (z=5)") {
    val keysDf = spark.read.parquet(s"${sf("sf0.001")}/part.parquet").select("p_partkey")
    val images = ImagePayload.synthesize(keysDf, "p_partkey")
    val got = ImagePayload.tileMosaic(images, "lat", "lon", 5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val keys = keysDf.collect().map(_.getLong(0))
    assert(keys.nonEmpty)
    val byTile = keys.groupBy { k =>
      // the synthesize lat/lon formula, integer-exact
      val lat = ((k * 9973 + 12345) % 18000).toDouble / 100.0 - 90.0
      val lon = ((k * 31337 + 54321) % 36000).toDouble / 100.0 - 180.0
      zxyRef(lat, lon, 5)
    }
    val want = byTile.map { case (tile, ks) =>
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      for (k <- ks) {
        val (r, g, b) = formulaMeans(k, 16, 16)
        sr += r; sg += g; sb += b
      }
      val n = ks.length.toDouble
      tile -> (ks.length.toLong, ks.length.toLong, sr / n, sg / n, sb / n)
    }
    // bit-exact: per-image means are multiples of 2^-8, so the tile sums
    // are order-independent IEEE-exact and the final division is one op
    assert(got == want)
  }

  test("tileMosaicPyramid: rollup identity + per-level bit-equality with tileMosaic") {
    val keysDf = spark.read.parquet(s"${sf("sf0.001")}/part.parquet").select("p_partkey")
    val images = ImagePayload.synthesize(keysDf, "p_partkey")
    val pyr = ImagePayload.tileMosaicPyramid(images, "lat", "lon", 2, 5)
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    // each level must equal tileMosaic run independently at that zoom —
    // same counts AND bit-identical means (the pyramid's shifted rollup
    // sums the identical 2^-8-multiple operands, so no tolerance)
    for (z <- 2 to 5) {
      val direct = ImagePayload.tileMosaic(images, "lat", "lon", z)
        .collect()
        .map(r => ((z, r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
        .toMap
      val atZ = pyr.filter(_._1._1 == z)
      assert(atZ == direct, s"pyramid level $z != independent tileMosaic")
    }
    // the pyramid identity: a parent's counts are the sum of its children's
    for (((z, zx, zy), (n, nd, _, _, _)) <- pyr if z > 2) {
      val (pn, pnd, _, _, _) = pyr((z - 1, zx >> 1, zy >> 1))
      assert(pn >= n && pnd >= nd)
    }
    for (((z, zx, zy), (n, nd, _, _, _)) <- pyr if z < 5) {
      val kids = (for { dx <- 0 to 1; dy <- 0 to 1 }
        yield pyr.get((z + 1, zx * 2 + dx, zy * 2 + dy))).flatten
      assert(kids.map(_._1).sum == n && kids.map(_._2).sum == nd,
        s"level-$z tile ($zx,$zy) != sum of its children")
    }
  }

  test("oracle floor margin: no part-key zy fraction within 1e-9 of an in-range boundary (z=5)") {
    val pts = spark.read.parquet(s"${sf("sf0.01")}/part.parquet")
      .select(col("p_partkey"))
      .withColumn("lat", expr(SparkEntry.latSqlFor("p_partkey")))
      .collect().map(_.getDouble(1))
    var worst = Double.MaxValue
    for (lat <- pts) {
      val latc = math.min(Cut, math.max(-Cut, lat))
      val phi = latc * math.Pi / 180.0
      val yf = (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.Pi) / 2.0 * 32.0
      if (yf > 0 && yf < 32) {
        val d = math.abs(yf - math.rint(yf))
        if (d > 0) worst = math.min(worst, d)
      }
    }
    info(f"min |yf - rint(yf)| over ${pts.length} part keys = $worst%.3e")
    assert(worst > 1e-9, s"a part-key zy sits $worst from a tile boundary")
  }
}
