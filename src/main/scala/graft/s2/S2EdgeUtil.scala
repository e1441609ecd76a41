package graft.s2

/** Edge utilities: crossing trichotomy, vertex-sharing rules, point-to-edge
  * distance, intersections, and the incremental chain bounder
  * (`OpenSky.S2Geometry/S2EdgeUtil.cs`). */
object S2EdgeUtil {
  val DefaultIntersectionTolerance: Double = 1.5e-15

  /** Fast non-robust interior crossing test (`S2EdgeUtil.cs:41-62`). */
  def simpleCrossing(a: S2Point, b: S2Point, c: S2Point, d: S2Point): Boolean = {
    val ab = a.cross(b)
    val acb = -ab.dot(c)
    val bda = ab.dot(d)
    if (acb * bda <= 0) return false
    val cd = c.cross(d)
    val cbd = -cd.dot(b)
    val dac = cd.dot(a)
    (acb * cbd > 0) && (acb * dac > 0)
  }

  /** Robust crossing trichotomy: +1 crossing, -1 none, 0 shared vertex
    * (`S2EdgeUtil.cs:81-119`). */
  def robustCrossing(a: S2Point, b: S2Point, c: S2Point, d: S2Point): Int = {
    val aCrossB = a.cross(b)
    val acb = -S2Predicates.robustCcw(a, b, c, aCrossB)
    val bda = S2Predicates.robustCcw(a, b, d, aCrossB)
    if ((bda & acb) == 0) return 0
    if (bda != acb) return -1
    val cCrossD = c.cross(d)
    val cbd = -S2Predicates.robustCcw(c, d, b, cCrossD)
    if (cbd != acb) return -1
    val dac = S2Predicates.robustCcw(c, d, a, cCrossD)
    if (dac == acb) 1 else -1
  }

  /** Crossing rule for edges sharing a vertex, so that counting crossings
    * implements point-in-polygon (`S2EdgeUtil.cs:146-177`). */
  def vertexCrossing(a: S2Point, b: S2Point, c: S2Point, d: S2Point): Boolean = {
    if (a == b || c == d) return false
    if (a == d) return S2Predicates.orderedCcw(a.ortho, c, b, a)
    if (b == c) return S2Predicates.orderedCcw(b.ortho, d, a, b)
    if (a == c) return S2Predicates.orderedCcw(a.ortho, d, b, a)
    if (b == d) return S2Predicates.orderedCcw(b.ortho, c, a, b)
    false
  }

  def edgeOrVertexCrossing(a: S2Point, b: S2Point, c: S2Point, d: S2Point): Boolean = {
    val crossing = robustCrossing(a, b, c, d)
    if (crossing < 0) false
    else if (crossing > 0) true
    else vertexCrossing(a, b, c, d)
  }

  /** Intersection point of two crossing edges, clipped to the segments
    * (`S2EdgeUtil.cs:214-269`). */
  def getIntersection(a0: S2Point, a1: S2Point, b0: S2Point, b1: S2Point): S2Point = {
    require(robustCrossing(a0, a1, b0, b1) > 0,
      "Input edges a0a1 and b0b1 must have a true robustCrossing.")
    val aNorm = S2Point.normalize(S2Predicates.robustCrossProd(a0, a1))
    val bNorm = S2Point.normalize(S2Predicates.robustCrossProd(b0, b1))
    var x = S2Point.normalize(S2Predicates.robustCrossProd(aNorm, bNorm))
    if (x.dot(a0 + a1 + b0 + b1) < 0) x = -x
    if (S2Predicates.orderedCcw(a0, x, a1, aNorm) && S2Predicates.orderedCcw(b0, x, b1, bNorm))
      return x

    var dmin2 = 10.0
    var vmin = x
    def replaceIfCloser(y: S2Point): Unit = {
      val d2 = (x - y).norm2
      if (d2 < dmin2 || (d2 == dmin2 && y.lessThan(vmin))) { dmin2 = d2; vmin = y }
    }
    if (S2Predicates.orderedCcw(b0, a0, b1, bNorm)) replaceIfCloser(a0)
    if (S2Predicates.orderedCcw(b0, a1, b1, bNorm)) replaceIfCloser(a1)
    if (S2Predicates.orderedCcw(a0, b0, a1, aNorm)) replaceIfCloser(b0)
    if (S2Predicates.orderedCcw(a0, b1, a1, aNorm)) replaceIfCloser(b1)
    vmin
  }

  def getDistanceFraction(x: S2Point, a0: S2Point, a1: S2Point): Double = {
    require(a0 != a1)
    val d0 = x.angle(a0)
    val d1 = x.angle(a1)
    d0 / (d0 + d1)
  }

  /** Minimum angle from X to any point of edge AB (`S2EdgeUtil.cs:293-334`). */
  def getDistance(x: S2Point, a: S2Point, b: S2Point): Double =
    getDistance(x, a, b, S2Predicates.robustCrossProd(a, b))

  def getDistance(x: S2Point, a: S2Point, b: S2Point, aCrossB: S2Point): Double = {
    if (S2Predicates.simpleCcw(aCrossB, a, x) && S2Predicates.simpleCcw(x, b, aCrossB)) {
      val sinDist = math.abs(x.dot(aCrossB)) / aCrossB.norm
      math.asin(math.min(1.0, sinDist))
    } else {
      val linearDist2 = math.min((x - a).norm2, (x - b).norm2)
      2 * math.asin(math.min(1.0, 0.5 * math.sqrt(linearDist2)))
    }
  }

  def getClosestPoint(x: S2Point, a: S2Point, b: S2Point): S2Point = {
    val crossProd = S2Predicates.robustCrossProd(a, b)
    val p = x - (crossProd * (x.dot(crossProd) / crossProd.norm2))
    if (S2Predicates.simpleCcw(crossProd, a, p) && S2Predicates.simpleCcw(p, b, crossProd))
      S2Point.normalize(p)
    else if ((x - a).norm2 <= (x - b).norm2) a
    else b
  }

  // --- wedge relations (shared-vertex loop relations, `S2EdgeUtil.cs:502-621`) ---

  /** +1 if wedge A contains wedge B, else 0. */
  def wedgeContains(a0: S2Point, ab1: S2Point, a2: S2Point, b0: S2Point, b2: S2Point): Int =
    if (S2Predicates.orderedCcw(a2, b2, b0, ab1) && S2Predicates.orderedCcw(b0, a0, a2, ab1)) 1 else 0

  /** -1 if the regions left of A and B intersect, else 0. */
  def wedgeIntersects(a0: S2Point, ab1: S2Point, a2: S2Point, b0: S2Point, b2: S2Point): Int =
    if (S2Predicates.orderedCcw(a0, b2, b0, ab1) && S2Predicates.orderedCcw(b0, a2, a0, ab1)) 0 else -1

  /** +1 A contains B; 0 B contains A or disjoint; -1 boundaries cross. */
  def wedgeContainsOrCrosses(a0: S2Point, ab1: S2Point, a2: S2Point, b0: S2Point, b2: S2Point): Int = {
    if (S2Predicates.orderedCcw(a0, a2, b2, ab1)) {
      if (S2Predicates.orderedCcw(b2, b0, a0, ab1)) return 1
      return if (a2 == b2) 0 else -1
    }
    if (S2Predicates.orderedCcw(a0, b0, a2, ab1)) 0 else -1
  }

  /** +1 A contains B; 0 disjoint; -1 intersects but not contains. */
  def wedgeContainsOrIntersects(a0: S2Point, ab1: S2Point, a2: S2Point, b0: S2Point, b2: S2Point): Int = {
    if (S2Predicates.orderedCcw(a0, a2, b2, ab1))
      return if (S2Predicates.orderedCcw(b2, b0, a0, ab1)) 1 else -1
    if (!S2Predicates.orderedCcw(a2, b0, b2, ab1)) return 0
    if (a2 == b0) 0 else -1
  }
}

/** Stateful crossing tester for a fixed edge AB against a vertex chain; saves
  * one orientation test per chain vertex (`S2EdgeUtil.cs:736-864`). */
final class EdgeCrosser(val a: S2Point, val b: S2Point, c0: S2Point) {
  private val aCrossB: S2Point = a.cross(b)
  private var c: S2Point = _
  private var acb: Int = _
  restartAt(c0)

  def restartAt(c: S2Point): Unit = {
    this.c = c
    this.acb = -S2Predicates.robustCcw(a, b, c, aCrossB)
  }

  def robustCrossing(d: S2Point): Int = {
    val bda = S2Predicates.robustCcw(a, b, d, aCrossB)
    val result =
      if (bda == -acb && bda != 0) -1
      else if ((bda & acb) == 0) 0
      else robustCrossingInternal(d)
    c = d
    acb = -bda
    result
  }

  def edgeOrVertexCrossing(d: S2Point): Boolean = {
    val c2 = c
    val crossing = robustCrossing(d)
    if (crossing < 0) false
    else if (crossing > 0) true
    else S2EdgeUtil.vertexCrossing(a, b, c2, d)
  }

  private def robustCrossingInternal(d: S2Point): Int = {
    val cCrossD = c.cross(d)
    val cbd = -S2Predicates.robustCcw(c, d, b, cCrossD)
    if (cbd != acb) return -1
    val dac = S2Predicates.robustCcw(c, d, a, cCrossD)
    if (dac == acb) 1 else -1
  }
}

/** Incremental lat/lng bound of an edge chain, handling latitude extrema in
  * edge interiors (`S2EdgeUtil.cs:623-701`). */
final class RectBounder {
  private var a: S2Point = _
  private var aLatLng: S2LatLng = _
  private var _bound: S2LatLngRect = S2LatLngRect.Empty

  def bound: S2LatLngRect = _bound

  def addPoint(b: S2Point): Unit = {
    val bLatLng = S2LatLng.fromPoint(b)
    if (_bound.isEmpty) {
      _bound = _bound.addPoint(bLatLng)
    } else {
      _bound = _bound.union(S2LatLngRect.fromPointPair(aLatLng, bLatLng))
      val aCrossB = S2Predicates.robustCrossProd(a, b)
      val dir = aCrossB.cross(S2Point(0, 0, 1))
      val da = dir.dot(a)
      val db = dir.dot(b)
      if (da * db < 0) {
        val absLat = math.acos(math.abs(aCrossB.z / aCrossB.norm))
        var lat = _bound.lat
        if (da < 0) lat = R1Interval(lat.lo, math.max(absLat, _bound.lat.hi))
        else lat = R1Interval(math.min(-absLat, _bound.lat.lo), lat.hi)
        _bound = S2LatLngRect(lat, _bound.lng)
      }
    }
    a = b
    aLatLng = bLatLng
  }
}
