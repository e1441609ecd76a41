package graft

import org.apache.spark.sql.functions._

import graft.operators.{SpatialJoin, Vectorize}
import graft.s2.{S2Cell, S2LatLng, S2Loop, S2Predicates, S2RegionCoverer}

/** The polygon-TABLE PIP join: oracle preconditions on the hexagon fixture
  * (convexity, orientation, edge-plane margin), the executor-side covering
  * vs the driver kernel, the interior fast path, and brute-force equality
  * of the full composition. */
class PolygonTableJoinSpec extends SparkTestBase {

  private def loopOf(verts: Seq[(Double, Double)]): S2Loop =
    new S2Loop(verts.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq)

  test("every fixture hexagon is spherically convex, CCW, and contains its center") {
    for ((k, verts, (clat, clon)) <- SparkEntry.HexPolys) {
      val pts = verts.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }
      val n = pts.size
      val turns = pts.indices.map(i =>
        S2Predicates.robustCcw(pts(i), pts((i + 1) % n), pts((i + 2) % n)))
      assert(turns.forall(_ == 1), s"hexagon $k is not convex-CCW: turns=$turns")
      val loop = loopOf(verts)
      assert(loop.contains(S2LatLng.fromDegrees(clat, clon).toPoint),
        s"hexagon $k does not contain its center — orientation broken")
      assert(verts.forall { case (la, lo) => math.abs(la) < 89.0 && math.abs(lo) < 179.0 },
        s"hexagon $k vertices stray toward pole/antimeridian: $verts")
    }
  }

  test("oracle margin: no sf0.01 point within 1e-9 of any hexagon edge plane") {
    val normals = SparkEntry.HexPolys.flatMap { case (_, verts, _) =>
      val pts = verts.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }
      pts.indices.map(i => pts(i).cross(pts((i + 1) % pts.size)))
    }
    val latLons = SparkEntry.points(spark, sf("sf0.01")).select("lat", "lon").collect()
    var minMargin = Double.MaxValue
    for (r <- latLons) {
      val p = S2LatLng.fromDegrees(r.getDouble(0), r.getDouble(1)).toPoint
      for (nrm <- normals) {
        val m = math.abs(p.dot(nrm)) / nrm.norm
        if (m < minMargin) minMargin = m
      }
    }
    info(f"min |p . n_hat| over ${latLons.length} points x ${normals.size} planes = $minMargin%.3e")
    assert(minMargin > 1e-9)
  }

  test("rasterizePolygons == driver kernel covering + containsCell per row") {
    import spark.implicits._
    val hexes = SparkEntry.HexPolys.take(5)
    val df = hexes.map { case (k, vs, _) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("region_id", "lats", "lons").repartition(3)
    val got = Vectorize.rasterizePolygons(df, "lats", "lons", level = 6)
      .select("region_id", "cell", "interior").as[(Long, Long, Boolean)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    for ((k, verts, _) <- hexes) {
      val loop = loopOf(verts)
      val cells = S2RegionCoverer.getSimpleCovering(loop, loop.vertex(0), 6)
      val expected = cells.map(c => c -> loop.containsCell(S2Cell(c))).toMap
      assert(got(k) == expected, s"hexagon $k raster diverged from kernel")
      assert(expected.valuesIterator.exists(identity),
        s"hexagon $k has no interior cells at level 6 — fast path untested")
      assert(expected.valuesIterator.exists(!_),
        s"hexagon $k has no boundary cells at level 6 — refine path untested")
    }
  }

  test("polygonPipJoin equals brute-force loop containment (sf0.001)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val got = SpatialJoin.polygonPipJoin(SparkEntry.points(spark, dir), "lat", "lon",
        SparkEntry.hexPolyTable(spark, dir), "region_id", "lats", "lons", level = 6)
      .select("region_id", "o_orderkey").as[(Long, Long)].collect().toSet
    val loops = SparkEntry.HexPolys.map { case (k, vs, _) => k -> loopOf(vs) }
    val pts = SparkEntry.points(spark, dir)
      .select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect()
    val want = (for {
      (id, la, lo) <- pts.iterator
      p = S2LatLng.fromDegrees(la, lo).toPoint
      (k, loop) <- loops
      if loop.contains(p)
    } yield (k, id)).toSet
    assert(want.nonEmpty, "fixture produced an empty join — hexagons miss every point")
    assert(got == want,
      s"join diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("every holed fixture polygon: convex loops, annulus in / hole out / outside out") {
    import graft.s2.S2Polygon
    for ((k, loops, (clat, clon)) <- SparkEntry.HoledPolys) {
      for (loop <- loops) {
        val pts = loop.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }
        val n = pts.size
        val turns = pts.indices.map(i =>
          S2Predicates.robustCcw(pts(i), pts((i + 1) % n), pts((i + 2) % n)))
        assert(turns.forall(_ == 1), s"region $k loop not convex-CCW: $turns")
      }
      val poly = new S2Polygon(loops.map(loopOf))
      val r = loops(0)(1)._1 - clat // shell north radius
      assert(poly.contains(S2LatLng.fromDegrees(clat + 2 * r / 3, clon).toPoint),
        s"region $k: annulus point not contained")
      assert(!poly.contains(S2LatLng.fromDegrees(clat, clon).toPoint),
        s"region $k: hole center contained — parity broken")
      assert(!poly.contains(S2LatLng.fromDegrees(clat + 2 * r, clon).toPoint),
        s"region $k: far-outside point contained")
    }
  }

  test("holed oracle margin: no sf0.01 point within 1e-9 of any diamond edge plane") {
    val normals = SparkEntry.HoledPolys.flatMap { case (_, loops, _) =>
      loops.flatMap { loop =>
        val pts = loop.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }
        pts.indices.map(i => pts(i).cross(pts((i + 1) % pts.size)))
      }
    }
    val latLons = SparkEntry.points(spark, sf("sf0.01")).select("lat", "lon").collect()
    var minMargin = Double.MaxValue
    for (r <- latLons) {
      val p = S2LatLng.fromDegrees(r.getDouble(0), r.getDouble(1)).toPoint
      for (nrm <- normals) {
        val m = math.abs(p.dot(nrm)) / nrm.norm
        if (m < minMargin) minMargin = m
      }
    }
    info(f"min |p . n_hat| over ${latLons.length} points x ${normals.size} planes = $minMargin%.3e")
    assert(minMargin > 1e-9)
  }

  test("multipolygon covering at a fine level excludes hole-interior cells") {
    import spark.implicits._
    import graft.s2.{S2Cell, S2CellId, S2Polygon}
    val (k, loops, (clat, clon)) = SparkEntry.HoledPolys.head
    val df = Seq((k,
      loops.map(_.map(_._1).toArray).toArray,
      loops.map(_.map(_._2).toArray).toArray)).toDF("region_id", "loop_lats", "loop_lons")
    val got = df.select(explode(graft.functions.s2functions.s2_multipolygon_covering(
        col("loop_lats"), col("loop_lons"), 8)).as("rc"))
      .select(col("rc.cell"), col("rc.interior")).as[(Long, Boolean)].collect().toMap
    // kernel equality
    val poly = new S2Polygon(loops.map(loopOf))
    val cells = graft.s2.S2RegionCoverer.getSimpleCovering(poly, poly.loop(0).vertex(0), 8)
    assert(got == cells.map(c => c -> poly.containsCell(S2Cell(c))).toMap,
      s"region $k covering diverged from kernel")
    // the hole-center cell is fully inside the hole at level 8 -> absent
    val holeCell = S2CellId.parentForLevel(
      S2CellId.fromLatLngDegrees(clat, clon), 8)
    assert(!got.contains(holeCell), "hole-interior cell leaked into the covering")
    assert(got.valuesIterator.exists(identity), "no interior cells — fast path untested")
  }

  test("multiPolygonPipJoin equals brute-force XOR-parity containment (sf0.001)") {
    import spark.implicits._
    import graft.s2.S2Polygon
    val dir = sf("sf0.001")
    val got = SpatialJoin.multiPolygonPipJoin(SparkEntry.points(spark, dir), "lat", "lon",
        SparkEntry.holedPolyTable(spark, dir), "region_id", "loop_lats", "loop_lons",
        level = 6)
      .select("region_id", "o_orderkey").as[(Long, Long)].collect().toSet
    val polys = SparkEntry.HoledPolys.map { case (k, loops, _) =>
      k -> new S2Polygon(loops.map(loopOf)) }
    val pts = SparkEntry.points(spark, dir)
      .select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect()
    val want = (for {
      (id, la, lo) <- pts.iterator
      p = S2LatLng.fromDegrees(la, lo).toPoint
      (k, poly) <- polys
      if poly.contains(p)
    } yield (k, id)).toSet
    assert(want.nonEmpty, "fixture produced an empty join")
    assert(got == want,
      s"join diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("variable-size fixture: convex, CCW, contains center; margin holds") {
    for ((k, verts, (clat, clon)) <- SparkEntry.HexPolysVar) {
      val pts = verts.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }
      val n = pts.size
      val turns = pts.indices.map(i =>
        S2Predicates.robustCcw(pts(i), pts((i + 1) % n), pts((i + 2) % n)))
      assert(turns.forall(_ == 1), s"var-hexagon $k not convex-CCW: $turns")
      assert(loopOf(verts).contains(S2LatLng.fromDegrees(clat, clon).toPoint))
    }
    val normals = SparkEntry.HexPolysVar.flatMap { case (_, verts, _) =>
      val pts = verts.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }
      pts.indices.map(i => pts(i).cross(pts((i + 1) % pts.size)))
    }
    val latLons = SparkEntry.points(spark, sf("sf0.01")).select("lat", "lon").collect()
    var minMargin = Double.MaxValue
    for (r <- latLons) {
      val p = S2LatLng.fromDegrees(r.getDouble(0), r.getDouble(1)).toPoint
      for (nrm <- normals) {
        val m = math.abs(p.dot(nrm)) / nrm.norm
        if (m < minMargin) minMargin = m
      }
    }
    info(f"min margin over ${latLons.length} points x ${normals.size} planes = $minMargin%.3e")
    assert(minMargin > 1e-9)
  }

  test("adaptive covering: per-row level varies with size and respects the target") {
    import spark.implicits._
    import graft.functions.s2functions._
    import graft.s2.S2CellId
    val df = SparkEntry.HexPolysVar
      .map { case (k, vs, _) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("region_id", "lats", "lons")
    val rows = df.select(col("region_id"),
        explode(s2_polygon_covering_adaptive(col("lats"), col("lons"), 32, Seq(4, 6, 8)))
          .as("rc"))
      .select(col("region_id"), col("rc.cell")).as[(Long, Long)].collect()
    val byRegion = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val levelsUsed = byRegion.map { case (k, cells) =>
      val ls = cells.map(S2CellId.level).distinct
      assert(ls.size == 1, s"region $k mixes covering levels: $ls")
      assert(cells.length <= 4 * 32,
        s"region $k covering blew past the target: ${cells.length} cells")
      ls.head
    }.toSet
    assert(levelsUsed.size > 1,
      s"fixture failed to exercise adaptivity — every region chose $levelsUsed")
  }

  test("polygonPipJoinAdaptive equals brute-force loop containment (sf0.001)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val got = SpatialJoin.polygonPipJoinAdaptive(SparkEntry.points(spark, dir), "lat", "lon",
        SparkEntry.hexPolyVarTable(spark, dir), "region_id", "lats", "lons",
        targetCells = 32, quantizeLevels = Seq(4, 6, 8))
      .select("region_id", "o_orderkey").as[(Long, Long)].collect().toSet
    val loops = SparkEntry.HexPolysVar.map { case (k, vs, _) => k -> loopOf(vs) }
    val pts = SparkEntry.points(spark, dir)
      .select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect()
    val want = (for {
      (id, la, lo) <- pts.iterator
      p = S2LatLng.fromDegrees(la, lo).toPoint
      (k, loop) <- loops
      if loop.contains(p)
    } yield (k, id)).toSet
    assert(want.nonEmpty, "fixture produced an empty join")
    assert(got == want,
      s"adaptive join diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("reserved-name collision fails loudly") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val polysBad = SparkEntry.hexPolyTable(spark, dir).withColumn("__cell", lit(1L))
    val e = intercept[IllegalArgumentException] {
      SpatialJoin.polygonPipJoin(SparkEntry.points(spark, dir), "lat", "lon",
        polysBad, "region_id", "lats", "lons")
    }
    assert(e.getMessage.contains("__cell"))
  }
}
