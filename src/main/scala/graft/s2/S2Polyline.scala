package graft.s2

/** An open chain of vertices on the sphere
  * (`OpenSky.S2Geometry/S2Polyline.cs:19-327`). */
final class S2Polyline(vertexSeq: IndexedSeq[S2Point]) extends S2Region with Serializable {
  private val vertices: Array[S2Point] = vertexSeq.toArray
  val numVertices: Int = vertices.length

  def vertex(k: Int): S2Point = vertices(k)

  def arcLengthAngle: Double = {
    var lengthSum = 0.0
    var i = 1
    while (i < numVertices) { lengthSum += vertex(i - 1).angle(vertex(i)); i += 1 }
    lengthSum
  }

  def rectBound: S2LatLngRect = {
    val bounder = new RectBounder
    var i = 0
    while (i < numVertices) { bounder.addPoint(vertex(i)); i += 1 }
    bounder.bound
  }

  def capBound: S2Cap = rectBound.capBound

  def containsCell(cell: S2Cell): Boolean =
    throw new UnsupportedOperationException(
      "'containment' is not numerically well-defined except at the polyline vertices")

  /** Cell x polyline crossing test (`S2Polyline.cs:123-159`). */
  def mayIntersectCell(cell: S2Cell): Boolean = {
    if (numVertices == 0) return false
    var i = 0
    while (i < numVertices) {
      if (cell.contains(vertex(i))) return true
      i += 1
    }
    val cellVertices = Array.tabulate(4)(cell.getVertex)
    var j = 0
    while (j < 4) {
      val crosser = new EdgeCrosser(cellVertices(j), cellVertices((j + 1) & 3), vertex(0))
      var k = 1
      while (k < numVertices) {
        if (crosser.robustCrossing(vertex(k)) >= 0) return true
        k += 1
      }
      j += 1
    }
    false
  }

  /** Arc-length interpolation along the chain (`S2Polyline.cs:245-276`). */
  def interpolate(fraction: Double): S2Point = {
    if (fraction <= 0) return vertex(0)
    var lengthSum = 0.0
    var i = 1
    while (i < numVertices) { lengthSum += vertex(i - 1).angle(vertex(i)); i += 1 }
    var target = fraction * lengthSum
    i = 1
    while (i < numVertices) {
      val length = vertex(i - 1).angle(vertex(i))
      if (target < length) {
        val f = math.sin(target) / math.sin(length)
        return (vertex(i - 1) * (math.cos(target) - f * math.cos(length))) + (vertex(i) * f)
      }
      target -= length
      i += 1
    }
    vertex(numVertices - 1)
  }

  /** Minimum angle from `point` to any point of the chain: the min over
    * edges of `S2EdgeUtil.getDistance` (the same per-edge formula a SQL
    * transcription can inline, unlike the project-then-measure route which
    * rounds differently). */
  def distanceAngle(point: S2Point): Double = {
    require(numVertices >= 2, "distanceAngle needs a polyline with >= 2 vertices")
    var best = Double.MaxValue
    var i = 0
    while (i < numVertices - 1) {
      val d = S2EdgeUtil.getDistance(point, vertices(i), vertices(i + 1))
      if (d < best) best = d
      i += 1
    }
    best
  }

  def getNearestEdgeIndex(point: S2Point): Int = {
    require(numVertices > 0, "Empty polyline")
    if (numVertices == 1) return 0
    var minDistance = 10.0
    var minIndex = -1
    var i = 0
    while (i < numVertices - 1) {
      val d = S2EdgeUtil.getDistance(point, vertex(i), vertex(i + 1))
      if (d < minDistance) { minDistance = d; minIndex = i }
      i += 1
    }
    minIndex
  }

  def projectToEdge(point: S2Point, index: Int): S2Point = {
    require(numVertices > 0, "Empty polyline")
    if (numVertices == 1) return vertex(0)
    S2EdgeUtil.getClosestPoint(point, vertex(index), vertex(index + 1))
  }

  def isValid: Boolean = {
    var i = 0
    while (i < numVertices) {
      if (!S2Predicates.isUnitLength(vertices(i))) return false
      i += 1
    }
    i = 1
    while (i < numVertices) {
      if (vertices(i - 1) == vertices(i) || vertices(i - 1) == -vertices(i)) return false
      i += 1
    }
    true
  }

  /** Spherical Douglas-Peucker simplification: the capability the
    * reference declares but never implements (`initToSimplified()` is
    * named only as a future consumer of the edge-clipping index,
    * `S2Polygon.cs:605-610`; `S2Polyline.cs` has no simplify at all).
    * Returns a polyline over a subsequence of the vertices such that
    * every DROPPED vertex lies within `toleranceRadians` of the edge
    * that replaced it (and hence of the simplified polyline). Endpoints
    * are always kept. */
  def simplify(toleranceRadians: Double): S2Polyline =
    new S2Polyline(S2Polyline.simplifyIndices(vertices, toleranceRadians).map(vertices(_)))
}

object S2Polyline {

  /** Indices kept by spherical Douglas-Peucker, ascending. Iterative
    * explicit stack (a degenerate zigzag must not overflow the JVM
    * stack); the farthest-vertex tie breaks to the LOWEST index so the
    * result is a pure function of the input. */
  def simplifyIndices(vertices: Array[S2Point], toleranceRadians: Double): Array[Int] = {
    require(toleranceRadians >= 0, s"tolerance must be >= 0, got $toleranceRadians")
    val n = vertices.length
    if (n <= 2) return Array.range(0, n)
    val keep = new Array[Boolean](n)
    keep(0) = true
    keep(n - 1) = true
    val stack = scala.collection.mutable.ArrayDeque[(Int, Int)]((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.removeLast()
      if (hi - lo > 1) {
        var worst = -1
        var worstD = toleranceRadians
        var i = lo + 1
        while (i < hi) {
          val d = S2EdgeUtil.getDistance(vertices(i), vertices(lo), vertices(hi))
          if (d > worstD) { worst = i; worstD = d }
          i += 1
        }
        if (worst >= 0) {
          keep(worst) = true
          stack.append((lo, worst))
          stack.append((worst, hi))
        }
      }
    }
    Array.range(0, n).filter(keep)
  }
}
