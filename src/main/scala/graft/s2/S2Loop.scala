package graft.s2

/** Result of an area+centroid computation (`S2AreaCentroid.cs:13-33`). */
final case class S2AreaCentroid(area: Double, centroid: Option[S2Point])

/** A simple spherical polygon ring: a closed chain of vertices with CCW
  * interior on the left (`OpenSky.S2Geometry/S2Loop.cs`).
  *
  * Point containment uses parity counting of edge crossings from the fixed
  * reference origin (0,1,0), seeded by `originInside`; bit-compatible with the
  * reference (`S2Loop.cs:794-833,906-931`). The reference's per-loop edge
  * index (used there for >= 2000-vertex loops) is intentionally absent: at
  * engine scale candidate pruning is done by the distributed covering join
  * instead, and query loops are broadcast-side objects with few vertices.
  */
final class S2Loop private (vertexSeq: IndexedSeq[S2Point], precomputedBound: Option[S2LatLngRect]) extends S2Region with Serializable {
  def this(vertexSeq: IndexedSeq[S2Point]) = this(vertexSeq, scala.None)

  private val vertices: Array[S2Point] = vertexSeq.toArray
  val numVertices: Int = vertices.length

  var depth: Int = 0

  private var originInside: Boolean = false
  private var _bound: S2LatLngRect = precomputedBound.getOrElse(S2LatLngRect.Full)
  private var firstLogicalVertex: Int = 0
  private var vertexToIndex: java.util.HashMap[S2Point, Integer] = _

  // initOrigin() must run before initBound(): the latter calls contains().
  // For cell loops the reference keeps the precomputed cell bound and never
  // derives one (`S2Loop.cs:96-117`).
  initOrigin()
  if (precomputedBound.isEmpty) initBound()
  initFirstLogicalVertex()

  /** vertex(i) for i in [0, 2n): the chain wraps (`S2Loop.cs:404-415`). */
  def vertex(i: Int): S2Point =
    vertices(if (i >= numVertices) i - numVertices else i)

  def isHole: Boolean = (depth & 1) != 0
  def sign: Int = if (isHole) -1 else 1

  def rectBound: S2LatLngRect = _bound
  def capBound: S2Cap = _bound.capBound

  /** Point-in-loop parity test (`S2Loop.cs:794-833`); loops with >= 2000
    * vertices consult the per-loop edge index instead of the full chain. */
  def contains(p: S2Point): Boolean = {
    if (!_bound.contains(p)) return false
    var inside = originInside
    val origin = S2Const.Origin
    val crosser = new EdgeCrosser(origin, p, vertices(numVertices - 1))
    if (numVertices < 2000) {
      var i = 0
      while (i < numVertices) {
        inside ^= crosser.edgeOrVertexCrossing(vertices(i))
        i += 1
      }
    } else {
      val it = edgeIterator(numVertices)
      var previousIndex = -2
      for (ai <- it.candidates(origin, p).sorted) {
        if (previousIndex != ai - 1) crosser.restartAt(vertices(ai))
        previousIndex = ai
        inside ^= crosser.edgeOrVertexCrossing(vertex(ai + 1))
      }
    }
    inside
  }

  @transient private var index: S2LoopEdgeIndex = _

  /** Lazy per-loop edge index with the brute-vs-index cost model
    * (`S2Loop.cs:857-873`). */
  private def edgeIterator(expectedQueries: Int): S2LoopEdgeIndex = {
    if (index == null) index = new S2LoopEdgeIndex(this)
    index.predictAdditionalCalls(expectedQueries)
    index
  }

  /** Shortest angle from p to the loop boundary (`S2Loop.cs:841-854`). */
  def getDistance(p: S2Point): Double = {
    val normalized = S2Point.normalize(p)
    var minDistance = math.Pi
    var i = 0
    while (i < numVertices) {
      minDistance = math.min(minDistance, S2EdgeUtil.getDistance(normalized, vertex(i), vertex(i + 1)))
      i += 1
    }
    minDistance
  }

  def containsCell(cell: S2Cell): Boolean = {
    val cellBound = cell.rectBound
    if (!_bound.contains(cellBound)) return false
    contains(S2Loop.fromCell(cell, cellBound))
  }

  def mayIntersectCell(cell: S2Cell): Boolean = {
    val cellBound = cell.rectBound
    if (!_bound.intersects(cellBound)) return false
    S2Loop.fromCell(cell, cellBound).intersects(this)
  }

  /** Loop x loop containment (`S2Loop.cs:576-626`). */
  def contains(b: S2Loop): Boolean = {
    if (!_bound.contains(b.rectBound)) return false
    if (!contains(b.vertex(0)) && findVertex(b.vertex(0)) < 0) return false
    if (checkEdgeCrossings(b, S2EdgeUtil.wedgeContains) <= 0) return false
    if (_bound.union(b.rectBound).isFull) {
      if (b.contains(vertex(0)) && b.findVertex(vertex(0)) < 0) return false
    }
    true
  }

  /** Loop x loop intersection (`S2Loop.cs:633-682`). */
  def intersects(b: S2Loop): Boolean = {
    if (!_bound.intersects(b.rectBound)) return false
    if (b.rectBound.lng.length > _bound.lng.length) return b.intersects(this)
    if (contains(b.vertex(0)) && findVertex(b.vertex(0)) < 0) return true
    if (checkEdgeCrossings(b, S2EdgeUtil.wedgeIntersects) < 0) return true
    if (b.rectBound.contains(_bound)) {
      if (b.contains(vertex(0)) && b.findVertex(vertex(0)) < 0) return true
    }
    false
  }

  /** Cheap containment for nested polygon loops that share no edges
    * (`S2Loop.cs:688-707`). */
  def containsNested(b: S2Loop): Boolean = {
    if (!_bound.contains(b.rectBound)) return false
    val m = findVertex(b.vertex(1))
    if (m < 0) return contains(b.vertex(1))
    S2EdgeUtil.wedgeContains(vertex(m - 1), vertex(m), vertex(m + 1), b.vertex(0), b.vertex(2)) > 0
  }

  /** +1 if A contains B, -1 if the boundaries cross, 0 otherwise
    * (`S2Loop.cs:716-757`). */
  def containsOrCrosses(b: S2Loop): Int = {
    if (!_bound.intersects(b.rectBound)) return 0
    val result = checkEdgeCrossings(b, S2EdgeUtil.wedgeContainsOrCrosses)
    if (result <= 0) return result
    if (!_bound.contains(b.rectBound)) return 0
    if (!contains(b.vertex(0)) && findVertex(b.vertex(0)) < 0) return 0
    1
  }

  /** Area <= 2*Pi (with slack so exact hemispheres count). */
  def isNormalized: Boolean = area <= 2 * S2Const.Pi + 1e-14

  /** Orient the loop so its area is at most 2*Pi (`S2Loop.cs:455-460`). */
  def normalize(): Unit = if (!isNormalized) invert()

  /** Reverse vertex order, complementing the region (`S2Loop.cs:441-476`). */
  def invert(): Unit = {
    val last = numVertices - 1
    var i = (last - 1) / 2
    while (i >= 0) {
      val t = vertices(i)
      vertices(i) = vertices(last - i)
      vertices(last - i) = t
      i -= 1
    }
    vertexToIndex = null
    index = null
    originInside ^= true
    if (_bound.lat.lo > -S2Const.PiOver2 && _bound.lat.hi < S2Const.PiOver2) {
      _bound = S2LatLngRect.Full
    } else {
      initBound()
    }
    initFirstLogicalVertex()
  }

  /** Area (and optionally true centroid x area) summed from triangles around
    * a slightly-displaced origin for antipodal stability
    * (`S2Loop.cs:482-549`). */
  private def getAreaCentroid(doCentroid: Boolean): S2AreaCentroid = {
    if (numVertices < 3) return S2AreaCentroid(0d, scala.None)

    var origin = vertex(0)
    val axis = (origin.largestAbsComponent + 1) % 3
    val slightlyDisplaced = origin(axis) + math.E * 1e-10
    origin = S2Point(
      if (axis == 0) slightlyDisplaced else origin.x,
      if (axis == 1) slightlyDisplaced else origin.y,
      if (axis == 2) slightlyDisplaced else origin.z)
    origin = S2Point.normalize(origin)

    var areaSum = 0.0
    var centroidSum = S2Point.Zero
    var i = 1
    while (i <= numVertices) {
      areaSum += S2Predicates.signedArea(origin, vertex(i - 1), vertex(i))
      if (doCentroid)
        centroidSum = centroidSum + S2Predicates.trueCentroid(origin, vertex(i - 1), vertex(i))
      i += 1
    }
    if (areaSum < 0) areaSum += 4 * S2Const.Pi
    S2AreaCentroid(areaSum, if (doCentroid) Some(centroidSum) else scala.None)
  }

  def areaAndCentroid: S2AreaCentroid = getAreaCentroid(doCentroid = true)
  def area: Double = getAreaCentroid(doCentroid = false).area
  def centroid: Option[S2Point] = getAreaCentroid(doCentroid = true).centroid

  /** Validity: >= 3 distinct unit-length vertices, no non-adjacent edge
    * crossings (nearly-colinear quadruples excused, `S2Loop.cs:201-305`). */
  def isValid: Boolean = {
    if (numVertices < 3) return false
    var i = 0
    while (i < numVertices) {
      if (!S2Predicates.isUnitLength(vertex(i))) return false
      i += 1
    }
    val vmap = new java.util.HashMap[S2Point, Integer]()
    i = 0
    while (i < numVertices) {
      if (vmap.put(vertex(i), i) != null) return false
      i += 1
    }
    val maxIntersectionError = 1e-15
    val it = edgeIterator(numVertices)
    var a1 = 0
    while (a1 < numVertices) {
      val a2 = (a1 + 1) % numVertices
      val crosser = new EdgeCrosser(vertex(a1), vertex(a2), vertex(0))
      var previousIndex = -2
      for (b1 <- it.candidates(vertex(a1), vertex(a2))) {
        val b2 = (b1 + 1) % numVertices
        if (a1 != b2 && a2 != b1 && a1 != b1) {
          // ignore nearly-colinear quadruples: robustCcw would need
          // arbitrary precision there
          val abc = S2Predicates.angle(vertex(a1), vertex(a2), vertex(b1))
          val abcLinear = math.abs(abc) <= maxIntersectionError ||
            math.abs(abc - S2Const.Pi) <= maxIntersectionError
          val abd = S2Predicates.angle(vertex(a1), vertex(a2), vertex(b2))
          val abdLinear = math.abs(abd) <= maxIntersectionError ||
            math.abs(abd - S2Const.Pi) <= maxIntersectionError
          if (!(abcLinear && abdLinear)) {
            if (previousIndex != b1) crosser.restartAt(vertex(b1))
            val crosses = crosser.robustCrossing(vertex(b2)) > 0
            previousIndex = b2
            if (crosses) return false
          }
        }
      }
      a1 += 1
    }
    true
  }

  /** Total ordering on loops: vertex count, then vertices from each loop's
    * first logical vertex (`S2Loop.cs:307-328,419-430`). */
  def compareTo(other: S2Loop): Int = {
    if (numVertices != other.numVertices) return numVertices - other.numVertices
    var iThis = firstLogicalVertex
    var iOther = other.firstLogicalVertex
    var i = 0
    while (i < numVertices) {
      val a = vertex(iThis)
      val b = other.vertex(iOther)
      val cmp = if (a.lessThan(b)) -1 else if (a == b) 0 else 1
      if (cmp != 0) return cmp
      i += 1; iThis += 1; iOther += 1
    }
    0
  }

  def boundaryApproxEquals(b: S2Loop, maxError: Double = 1e-15): Boolean = {
    if (numVertices != b.numVertices) return false
    var iThis = firstLogicalVertex
    var iOther = b.firstLogicalVertex
    var i = 0
    while (i < numVertices) {
      if (!S2Predicates.approxEquals(vertex(iThis), b.vertex(iOther), maxError)) return false
      i += 1; iThis += 1; iOther += 1
    }
    true
  }

  // ---------------------------------------------------------------------------

  private def initOrigin(): Unit = {
    // Guess the origin is outside; flip if the wedge test at vertex 1
    // disagrees with the parity test (`S2Loop.cs:906-931`).
    require(_bound.contains(vertex(1)))
    originInside = false
    val v1Inside = S2Predicates.orderedCcw(vertex(1).ortho, vertex(0), vertex(2), vertex(1))
    if (v1Inside != contains(vertex(1))) originInside = true
  }

  private def initBound(): Unit = {
    // The loop bound can exceed the vertex bound: it may wrap the sphere or
    // enclose a pole (`S2Loop.cs:936-963`).
    val bounder = new RectBounder
    var i = 0
    while (i <= numVertices) { bounder.addPoint(vertex(i)); i += 1 }
    var b = bounder.bound
    _bound = S2LatLngRect.Full
    if (contains(S2Point(0, 0, 1)))
      b = S2LatLngRect(R1Interval(b.lat.lo, S2Const.PiOver2), S1Interval.Full)
    if (b.lng.isFull && contains(S2Point(0, 0, -1)))
      b = S2LatLngRect(R1Interval(-S2Const.PiOver2, b.lat.hi), b.lng)
    _bound = b
  }

  private def initFirstLogicalVertex(): Unit = {
    var first = 0
    var i = 1
    while (i < numVertices) {
      if (vertex(i).lessThan(vertex(first))) first = i
      i += 1
    }
    firstLogicalVertex = first
  }

  /** Index (1..n) of a vertex equal to p, or -1 (`S2Loop.cs:972-987`). */
  private[s2] def findVertex(p: S2Point): Int = {
    if (vertexToIndex == null) {
      vertexToIndex = new java.util.HashMap[S2Point, Integer]()
      var i = 1
      while (i <= numVertices) { vertexToIndex.put(vertex(i), i); i += 1 }
    }
    val idx = vertexToIndex.get(p)
    if (idx == null) -1 else idx.intValue()
  }

  /** All-pairs edge crossing check, applying the wedge relation at shared
    * vertices (`S2Loop.cs:989-1044`). */
  private def checkEdgeCrossings(
      b: S2Loop,
      relation: (S2Point, S2Point, S2Point, S2Point, S2Point) => Int): Int = {
    // 'this' usually has many more vertices than 'b': index this side and
    // loop over b's edges (`S2Loop.cs:989-1044`).
    val it = edgeIterator(b.numVertices)
    var result = 1
    var j = 0
    while (j < b.numVertices) {
      val crosser = new EdgeCrosser(b.vertex(j), b.vertex(j + 1), vertex(0))
      var previousIndex = -2
      for (i <- it.candidates(b.vertex(j), b.vertex(j + 1)).sorted) {
        if (previousIndex != i - 1) crosser.restartAt(vertex(i))
        previousIndex = i
        val crossing = crosser.robustCrossing(vertex(i + 1))
        if (crossing > 0) return -1
        if (crossing == 0 && vertex(i + 1) == b.vertex(j + 1)) {
          result = math.min(result,
            relation(vertex(i), vertex(i + 1), vertex(i + 2), b.vertex(j), b.vertex(j + 2)))
          if (result < 0) return result
        }
      }
      j += 1
    }
    result
  }

  override def toString: String = s"S2Loop(${vertices.length} vertices)"
}

object S2Loop {
  def apply(vertices: IndexedSeq[S2Point]): S2Loop = new S2Loop(vertices)

  /** Loop from a cell's 4 vertices with a precomputed bound
    * (`S2Loop.cs:96-117`). */
  def fromCell(cell: S2Cell, bound: S2LatLngRect): S2Loop =
    new S2Loop(Array.tabulate(4)(cell.getVertex).toIndexedSeq, Some(bound))

  def fromCell(cell: S2Cell): S2Loop = fromCell(cell, cell.rectBound)
}
