package graft.s2

import org.scalatest.funsuite.AnyFunSuite

/** Edge-index conformance vs brute force (`S2EdgeIndexTest.cs`). */
class S2EdgeIndexSpec extends AnyFunSuite {

  private final class ArrayEdgeIndex(pts: Array[(S2Point, S2Point)]) extends S2EdgeIndex {
    protected def numEdges: Int = pts.length
    protected def edgeFrom(i: Int): S2Point = pts(i)._1
    protected def edgeTo(i: Int): S2Point = pts(i)._2
  }

  private def randomPoint(rnd: scala.util.Random): S2Point =
    S2Point.normalize(S2Point(
      2 * rnd.nextDouble() - 1, 2 * rnd.nextDouble() - 1, 2 * rnd.nextDouble() - 1))

  private def perturbed(rnd: scala.util.Random, p: S2Point, scale: Double): S2Point =
    S2Point.normalize(p + randomPoint(rnd) * scale)

  test("candidate crossings are a superset of true crossings (S2EdgeIndexTest.cs)") {
    val rnd = new scala.util.Random(123456)
    val center = randomPoint(rnd)
    val edges = Array.fill(300) {
      val a = perturbed(rnd, center, 0.1)
      (a, perturbed(rnd, a, 0.02))
    }
    val index = new ArrayEdgeIndex(edges)
    index.computeIndex()

    for (_ <- 0 until 100) {
      val qa = perturbed(rnd, center, 0.1)
      val qb = perturbed(rnd, qa, 0.05)
      val candidates = index.findCandidateCrossings(qa, qb).toSet
      edges.zipWithIndex.foreach { case ((ea, eb), i) =>
        val crossing = S2EdgeUtil.robustCrossing(qa, qb, ea, eb)
        if (crossing >= 0) {
          assert(candidates.contains(i),
            s"edge $i crosses (status $crossing) but was not a candidate")
        }
      }
    }
  }

  test("cost model: index only builds past m>100 edges and >30 queries") {
    val rnd = new scala.util.Random(1)
    val few = new ArrayEdgeIndex(Array.fill(50)((randomPoint(rnd), randomPoint(rnd))))
    for (_ <- 0 until 100) few.candidates(randomPoint(rnd), randomPoint(rnd))
    assert(!few.isIndexComputed, "50-edge index should stay brute force")

    val many = new ArrayEdgeIndex(Array.fill(200)((randomPoint(rnd), randomPoint(rnd))))
    for (_ <- 0 until 10) many.candidates(randomPoint(rnd), randomPoint(rnd))
    assert(!many.isIndexComputed)
    for (_ <- 0 until 25) many.candidates(randomPoint(rnd), randomPoint(rnd))
    assert(many.isIndexComputed, "200-edge index should switch after >30 queries")
  }

  test("large-loop contains uses the index and agrees with brute-force parity") {
    // regular 2400-gon around a small cap: indexed path (>= 2000 vertices)
    val n = 2400
    val center = S2LatLng.fromDegrees(10, 20)
    val radius = math.toRadians(5)
    val verts = (0 until n).map { i =>
      val theta = 2 * math.Pi * i / n
      // sin/cos order gives CCW orientation: the loop interior is the disc
      val lat = center.latRadians + radius * math.sin(theta)
      val lng = center.lngRadians + radius * math.cos(theta) / math.cos(center.latRadians)
      S2LatLng(lat, lng).toPoint
    }
    val bigLoop = new S2Loop(verts)
    val rnd = new scala.util.Random(7)
    def bruteParity(p: S2Point): Boolean = {
      var inside = false
      val crosser = new EdgeCrosser(S2Const.Origin, p, verts(n - 1))
      var i = 0
      while (i < n) { inside ^= crosser.edgeOrVertexCrossing(verts(i)); i += 1 }
      inside
    }
    // reference parity at a point clearly outside the loop (its antipode):
    // contains(p) == parity(p) XOR parity(outside)
    val outsideParity = bruteParity(-center.toPoint)
    var hits = 0
    for (_ <- 0 until 200) {
      val lat = 10 + (rnd.nextDouble() * 16 - 8)
      val lng = 20 + (rnd.nextDouble() * 16 - 8)
      val p = S2LatLng.fromDegrees(lat, lng).toPoint
      val expected = bruteParity(p) != outsideParity
      assert(bigLoop.contains(p) == expected, s"mismatch at ($lat, $lng)")
      if (expected) hits += 1
    }
    assert(hits > 20 && hits < 180, s"degenerate test coverage: $hits inside")
  }
}
