package graft.s2

import org.scalatest.funsuite.AnyFunSuite
import TestFixtures._

/** Builder conformance (`S2PolygonBuilderTest.cs`): loop assembly,
  * directed/undirected x xor/union options, vertex merging, validation. */
class S2PolygonBuilderSpec extends AnyFunSuite {

  test("assemble a single loop from its shuffled edges (DirectedXor)") {
    val loop = makeLoop(Near1)
    val builder = new S2PolygonBuilder(S2PolygonBuilderOptions.DirectedXor)
    val edges = (0 until loop.numVertices).map(i => (loop.vertex(i), loop.vertex(i + 1)))
    for ((a, b) <- new scala.util.Random(5).shuffle(edges)) builder.addEdge(a, b)
    val (loops, unused) = builder.assembleLoops()
    assert(unused.isEmpty)
    assert(loops.length == 1)
    assert(loops.head.boundaryApproxEquals(loop))
  }

  test("xor cancels duplicate reverse edges: two squares sharing an edge union into one ring") {
    // two adjacent unit squares; the shared edge appears in both directions
    val left = makeLoop("0:0, 0:1, 1:1, 1:0")
    val right = makeLoop("0:1, 0:2, 1:2, 1:1")
    val builder = new S2PolygonBuilder(S2PolygonBuilderOptions.DirectedXor)
    builder.addLoop(left)
    builder.addLoop(right)
    val (polygon, unused) = builder.assemblePolygon()
    assert(unused.isEmpty)
    assert(polygon.numLoops == 1)
    // the merged ring covers both squares
    assert(polygon.contains(S2LatLng.fromDegrees(0.5, 0.5).toPoint))
    assert(polygon.contains(S2LatLng.fromDegrees(0.5, 1.5).toPoint))
    assert(!polygon.contains(S2LatLng.fromDegrees(0.5, 2.5).toPoint))
    // area ~ union of the two squares
    val expected = left.area + right.area
    assert(math.abs(polygon.area - expected) < 1e-6)
  }

  test("undirected union assembles CCW loops regardless of input orientation") {
    val loop = makeLoop(Near2)
    val builder = new S2PolygonBuilder(S2PolygonBuilderOptions.UndirectedUnion)
    // add edges reversed
    for (i <- 0 until loop.numVertices) builder.addEdge(loop.vertex(i + 1), loop.vertex(i))
    val (loops, unused) = builder.assembleLoops()
    assert(unused.isEmpty)
    assert(loops.length == 1)
    assert(loops.head.isNormalized)
    val expected = makeLoop(Near2)
    expected.normalize()
    assert(loops.head.boundaryApproxEquals(expected))
  }

  test("vertex merging snaps perturbed endpoints (mergeDistance)") {
    val loop = makeLoop(Near3)
    val eps = 1e-10
    val builder = new S2PolygonBuilder(
      S2PolygonBuilderOptions.DirectedXor.copy(mergeDistance = 1e-8))
    for (i <- 0 until loop.numVertices) {
      // perturb each edge's endpoints slightly so endpoints no longer match
      val a = S2Point.normalize(loop.vertex(i) + S2Point(eps, -eps, eps))
      val b = S2Point.normalize(loop.vertex(i + 1) + S2Point(-eps, eps, -eps))
      builder.addEdge(a, b)
    }
    val (loops, unused) = builder.assembleLoops()
    assert(unused.isEmpty, s"unused: ${unused.length}")
    assert(loops.length == 1)
    assert(loops.head.numVertices == loop.numVertices)
  }

  test("stray edges that close no loop are reported unused") {
    val builder = new S2PolygonBuilder(S2PolygonBuilderOptions.DirectedXor)
    val loop = makeLoop(Near0)
    builder.addLoop(loop)
    builder.addEdge(
      S2LatLng.fromDegrees(50, 50).toPoint, S2LatLng.fromDegrees(51, 51).toPoint)
    val (loops, unused) = builder.assembleLoops()
    assert(loops.length == 1)
    assert(unused.nonEmpty)
  }

  test("loop and polygon validation") {
    assert(makeLoop(Near1).isValid)
    assert(makeLoop(SouthHemi).isValid)
    // bowtie: self-crossing
    val bowtie = new S2Loop(parseVertices("0:0, 2:2, 0:2, 2:0"))
    assert(!bowtie.isValid)
    // duplicate vertex
    val dup = new S2Loop(parseVertices("0:0, 1:1, 0:2, 1:1, 0:4"))
    assert(!dup.isValid)

    val shell = makeLoop(Near1)
    val hole = makeLoop(Near0)
    assert(S2Polygon.isValidPolygon(Seq(shell, hole)))
  }
}
