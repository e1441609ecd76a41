package graft.s2

/** A latitude-longitude rectangle: lat `R1Interval` x lng `S1Interval` (the
  * lng interval may wrap the antimeridian)
  * (`OpenSky.S2Geometry/S2LatLngRect.cs:11-859`). */
final case class S2LatLngRect(lat: R1Interval, lng: S1Interval) extends S2Region {
  import S2LatLngRect._

  def isValid: Boolean =
    math.abs(lat.lo) <= S2Const.PiOver2 && math.abs(lat.hi) <= S2Const.PiOver2 &&
      lng.isValid && lat.isEmpty == lng.isEmpty

  def isEmpty: Boolean = lat.isEmpty
  def isFull: Boolean = lat == FullLat && lng.isFull
  def isInverted: Boolean = lng.isInverted

  def lo: S2LatLng = S2LatLng(lat.lo, lng.lo)
  def hi: S2LatLng = S2LatLng(lat.hi, lng.hi)
  def center: S2LatLng = S2LatLng(lat.center, lng.center)
  def size: S2LatLng = S2LatLng(lat.length, lng.length)

  def area: Double =
    if (isEmpty) 0
    else lng.length * math.abs(math.sin(lat.hi) - math.sin(lat.lo))

  /** k-th vertex in CCW order SW, SE, NE, NW (`S2LatLngRect.cs:348-364`). */
  def getVertex(k: Int): S2LatLng = k match {
    case 0 => S2LatLng(lat.lo, lng.lo)
    case 1 => S2LatLng(lat.lo, lng.hi)
    case 2 => S2LatLng(lat.hi, lng.hi)
    case 3 => S2LatLng(lat.hi, lng.lo)
    case _ => throw new IllegalArgumentException("Invalid vertex index.")
  }

  def contains(ll: S2LatLng): Boolean =
    lat.contains(ll.latRadians) && lng.contains(ll.lngRadians)

  def contains(p: S2Point): Boolean = contains(S2LatLng.fromPoint(p))

  def interiorContains(ll: S2LatLng): Boolean =
    lat.interiorContains(ll.latRadians) && lng.interiorContains(ll.lngRadians)

  def interiorContains(p: S2Point): Boolean = interiorContains(S2LatLng.fromPoint(p))

  def contains(other: S2LatLngRect): Boolean =
    lat.contains(other.lat) && lng.contains(other.lng)

  def interiorContains(other: S2LatLngRect): Boolean =
    lat.interiorContains(other.lat) && lng.interiorContains(other.lng)

  def intersects(other: S2LatLngRect): Boolean =
    lat.intersects(other.lat) && lng.intersects(other.lng)

  def interiorIntersects(other: S2LatLngRect): Boolean =
    lat.interiorIntersects(other.lat) && lng.interiorIntersects(other.lng)

  def addPoint(p: S2Point): S2LatLngRect = addPoint(S2LatLng.fromPoint(p))

  def addPoint(ll: S2LatLng): S2LatLngRect =
    S2LatLngRect(lat.addPoint(ll.latRadians), lng.addPoint(ll.lngRadians))

  /** Grow in lat/lng space: latitudes clamp, longitudes wrap
    * (`S2LatLngRect.cs:672-681`). */
  def expanded(margin: S2LatLng): S2LatLngRect =
    if (isEmpty) this
    else S2LatLngRect(
      lat.expanded(margin.latRadians).intersection(FullLat),
      lng.expanded(margin.lngRadians))

  def union(other: S2LatLngRect): S2LatLngRect =
    S2LatLngRect(lat.union(other.lat), lng.union(other.lng))

  def intersection(other: S2LatLngRect): S2LatLngRect = {
    val iLat = lat.intersection(other.lat)
    val iLng = lng.intersection(other.lng)
    if (iLat.isEmpty || iLng.isEmpty) Empty else S2LatLngRect(iLat, iLng)
  }

  /** Grow by a fixed spherical distance (cap convolution)
    * (`S2LatLngRect.cs:720-736`). */
  def convolveWithCap(angleRadians: Double): S2LatLngRect = {
    val cap = S2Cap.fromAxisAngle(S2Point(1, 0, 0), angleRadians)
    var r = this
    var k = 0
    while (k < 4) {
      val vertexCap = S2Cap.fromAxisHeight(getVertex(k).toPoint, cap.height)
      r = r.union(vertexCap.rectBound)
      k += 1
    }
    r
  }

  def approxEquals(other: S2LatLngRect, maxError: Double = 1e-15): Boolean =
    lat.approxEquals(other.lat, maxError) && lng.approxEquals(other.lng, maxError)

  // --- S2Region ---

  def capBound: S2Cap = {
    // Smaller of a pole-axis cap and a center-axis cap (`S2LatLngRect.cs:161-212`).
    if (isEmpty) return S2Cap.Empty

    var poleZ = 0.0
    var poleAngle = 0.0
    if (lat.lo + lat.hi < 0) { poleZ = -1; poleAngle = S2Const.PiOver2 + lat.hi }
    else { poleZ = 1; poleAngle = S2Const.PiOver2 - lat.lo }
    val poleCap = S2Cap.fromAxisAngle(S2Point(0, 0, poleZ), poleAngle)

    val lngSpan = lng.hi - lng.lo
    if (Math.IEEEremainder(lngSpan, 2 * S2Const.Pi) >= 0 && lngSpan < 2 * S2Const.Pi) {
      var midCap = S2Cap.fromAxisAngle(center.toPoint, 0)
      var k = 0
      while (k < 4) { midCap = midCap.addPoint(getVertex(k).toPoint); k += 1 }
      if (midCap.height < poleCap.height) return midCap
    }
    poleCap
  }

  def rectBound: S2LatLngRect = this

  /** Exact: a rect contains a cell iff it contains the cell's bound
    * (`S2LatLngRect.cs:220-225`). */
  def containsCell(cell: S2Cell): Boolean = contains(cell.rectBound)

  /** Cheap, conservative (`S2LatLngRect.cs:235-239`). */
  def mayIntersectCell(cell: S2Cell): Boolean = intersects(cell.rectBound)

  /** Exact rect x cell intersection, handling the curved constant-latitude
    * edges (`S2LatLngRect.cs:555-632`). */
  def intersectsCell(cell: S2Cell): Boolean = {
    if (isEmpty) return false
    if (contains(cell.center)) return true
    if (cell.contains(center.toPoint)) return true
    if (!intersects(cell.rectBound)) return false

    val cellV = new Array[S2Point](4)
    val cellLl = new Array[S2LatLng](4)
    var i = 0
    while (i < 4) {
      cellV(i) = cell.getVertex(i)
      cellLl(i) = S2LatLng.fromPoint(cellV(i))
      if (contains(cellLl(i))) return true
      i += 1
    }
    i = 0
    while (i < 4) {
      val edgeLng = S1Interval.fromPointPair(cellLl(i).lngRadians, cellLl((i + 1) & 3).lngRadians)
      if (lng.intersects(edgeLng)) {
        val a = cellV(i)
        val b = cellV((i + 1) & 3)
        if (edgeLng.contains(lng.lo) && intersectsLngEdge(a, b, lat, lng.lo)) return true
        if (edgeLng.contains(lng.hi) && intersectsLngEdge(a, b, lat, lng.hi)) return true
        if (intersectsLatEdge(a, b, lat.lo, lng)) return true
        if (intersectsLatEdge(a, b, lat.hi, lng)) return true
      }
      i += 1
    }
    false
  }
}

object S2LatLngRect {
  val FullLat: R1Interval = R1Interval(-S2Const.PiOver2, S2Const.PiOver2)
  val FullLng: S1Interval = S1Interval.Full
  val Full: S2LatLngRect = S2LatLngRect(FullLat, FullLng)
  val Empty: S2LatLngRect = S2LatLngRect(R1Interval.Empty, S1Interval.Empty)

  def fromPoint(p: S2LatLng): S2LatLngRect =
    S2LatLngRect(R1Interval(p.latRadians, p.latRadians), S1Interval.fromPoint(p.lngRadians))

  def fromCorners(lo: S2LatLng, hi: S2LatLng): S2LatLngRect =
    S2LatLngRect(R1Interval(lo.latRadians, hi.latRadians), S1Interval(lo.lngRadians, hi.lngRadians))

  def fromPointPair(p1: S2LatLng, p2: S2LatLng): S2LatLngRect =
    S2LatLngRect(
      R1Interval.fromPointPair(p1.latRadians, p2.latRadians),
      S1Interval.fromPointPair(p1.lngRadians, p2.lngRadians))

  def fromCenterSize(center: S2LatLng, size: S2LatLng): S2LatLngRect =
    fromPoint(center).expanded(S2LatLng(size.latRadians * 0.5, size.lngRadians * 0.5))

  /** Bound of the geodesic edge a->b, including latitude extrema attained in
    * the edge interior (`S2LatLngRect.cs:307-337`). */
  def fromEdge(a: S2Point, b: S2Point): S2LatLngRect = {
    val r = fromPointPair(S2LatLng.fromPoint(a), S2LatLng.fromPoint(b))
    val ab = S2Predicates.robustCrossProd(a, b)
    val dir = ab.cross(S2Point(0, 0, 1))
    val da = dir.dot(a)
    val db = dir.dot(b)
    if (da * db >= 0) r
    else {
      val absLat = math.acos(math.abs(ab.z / ab.norm))
      if (da < 0) S2LatLngRect(R1Interval(r.lat.lo, absLat), r.lng)
      else S2LatLngRect(R1Interval(-absLat, r.lat.hi), r.lng)
    }
  }

  /** Edge AB x constant-longitude segment (a true geodesic)
    * (`S2LatLngRect.cs:777-786`). */
  private[s2] def intersectsLngEdge(a: S2Point, b: S2Point, lat: R1Interval, lng: Double): Boolean =
    S2Predicates.simpleCrossing(a, b,
      S2LatLng(lat.lo, lng).toPoint, S2LatLng(lat.hi, lng).toPoint)

  /** Edge AB x constant-latitude curve; 0, 1 or 2 intersections
    * (`S2LatLngRect.cs:792-853`). */
  private[s2] def intersectsLatEdge(a: S2Point, b: S2Point, lat: Double, lng: S1Interval): Boolean = {
    var z = S2Point.normalize(S2Predicates.robustCrossProd(a, b))
    if (z.z < 0) z = -z
    val y = S2Point.normalize(S2Predicates.robustCrossProd(z, S2Point(0, 0, 1)))
    val x = y.cross(z)

    val sinLat = math.sin(lat)
    if (math.abs(sinLat) >= x.z) return false
    val cosTheta = sinLat / x.z
    val sinTheta = math.sqrt(1 - cosTheta * cosTheta)
    val theta = math.atan2(sinTheta, cosTheta)

    val abTheta = S1Interval.fromPointPair(
      math.atan2(a.dot(y), a.dot(x)), math.atan2(b.dot(y), b.dot(x)))

    if (abTheta.contains(theta)) {
      val isect = (x * cosTheta) + (y * sinTheta)
      if (lng.contains(math.atan2(isect.y, isect.x))) return true
    }
    if (abTheta.contains(-theta)) {
      val isect = (x * cosTheta) - (y * sinTheta)
      if (lng.contains(math.atan2(isect.y, isect.x))) return true
    }
    false
  }
}
