package graft.s2

/** A spherical cap: all points within some angle of an axis, stored as
  * (axis, height) where height = 1 - cos(angle)
  * (`OpenSky.S2Geometry/S2Cap.cs:21-509`). */
final case class S2Cap(axis: S2Point, height: Double) extends S2Region {
  import S2Cap._

  def area: Double = 2 * S2Const.Pi * math.max(0.0, height)

  /** Opening angle in radians; negative for empty caps (`S2Cap.cs:73-86`). */
  def angle: Double =
    if (isEmpty) -1 else 2 * math.asin(math.sqrt(0.5 * height))

  def isValid: Boolean = math.abs(axis.norm2 - 1) <= 1e-15 && height <= 2
  def isEmpty: Boolean = height < 0
  def isFull: Boolean = height >= 2

  def complement: S2Cap = {
    val cHeight = if (isFull) -1.0 else 2 - math.max(height, 0.0)
    S2Cap(-axis, cHeight)
  }

  def contains(p: S2Point): Boolean = (axis - p).norm2 <= 2 * height

  def interiorContains(p: S2Point): Boolean =
    isFull || (axis - p).norm2 < 2 * height

  def contains(other: S2Cap): Boolean =
    if (isFull || other.isEmpty) true
    else angle >= axis.angle(other.axis) + other.angle

  def interiorIntersects(other: S2Cap): Boolean = !complement.contains(other)

  def addPoint(p: S2Point): S2Cap =
    if (isEmpty) S2Cap(p, 0)
    else {
      // Round up so cap.addPoint(p).contains(p) holds (`S2Cap.cs:358-375`).
      val dist2 = (axis - p).norm2
      S2Cap(axis, math.max(height, RoundUp * 0.5 * dist2))
    }

  def addCap(other: S2Cap): S2Cap =
    if (isEmpty) S2Cap(other.axis, other.height)
    else {
      val a = axis.angle(other.axis) + other.angle
      if (a >= S2Const.Pi) S2Cap(axis, 2)
      else {
        val d = math.sin(0.5 * a)
        S2Cap(axis, math.max(height, RoundUp * 2 * d * d))
      }
    }

  def capBound: S2Cap = this

  def rectBound: S2LatLngRect = {
    if (isEmpty) return S2LatLngRect.Empty
    val axisLatLng = S2LatLng.fromPoint(axis)
    val capAngle = angle

    var allLongitudes = false
    var latLo = axisLatLng.latRadians - capAngle
    var latHi = axisLatLng.latRadians + capAngle
    var lngLo = -S2Const.Pi
    var lngHi = S2Const.Pi
    if (latLo <= -S2Const.PiOver2) { latLo = -S2Const.PiOver2; allLongitudes = true }
    if (latHi >= S2Const.PiOver2) { latHi = S2Const.PiOver2; allLongitudes = true }
    if (!allLongitudes) {
      // Law of sines: sin(lngSpan) = sin(capAngle)/cos(lat) (`S2Cap.cs:173-196`).
      val sinA = math.sqrt(height * (2 - height))
      val sinC = math.cos(axisLatLng.latRadians)
      if (sinA <= sinC) {
        val angleA = math.asin(sinA / sinC)
        lngLo = Math.IEEEremainder(axisLatLng.lngRadians - angleA, 2 * S2Const.Pi)
        lngHi = Math.IEEEremainder(axisLatLng.lngRadians + angleA, 2 * S2Const.Pi)
      }
    }
    S2LatLngRect(R1Interval(latLo, latHi), S1Interval(lngLo, lngHi))
  }

  def containsCell(cell: S2Cell): Boolean = {
    // All four vertices in the cap, and the complement must not reach the cell
    // (`S2Cap.cs:202-221`).
    val vertices = new Array[S2Point](4)
    var k = 0
    while (k < 4) {
      vertices(k) = cell.getVertex(k)
      if (!contains(vertices(k))) return false
      k += 1
    }
    !complement.intersects(cell, vertices)
  }

  def mayIntersectCell(cell: S2Cell): Boolean = {
    val vertices = new Array[S2Point](4)
    var k = 0
    while (k < 4) {
      vertices(k) = cell.getVertex(k)
      if (contains(vertices(k))) return true
      k += 1
    }
    intersects(cell, vertices)
  }

  /** Cap x cell intersection given no cell vertex is inside
    * (`S2Cap.cs:412-471`). */
  private[s2] def intersects(cell: S2Cell, vertices: Array[S2Point]): Boolean = {
    if (height >= 1) return false
    if (isEmpty) return false
    if (cell.contains(axis)) return true
    val sin2Angle = height * (2 - height)
    var k = 0
    while (k < 4) {
      val edge = cell.getEdgeRaw(k)
      val dot = axis.dot(edge)
      if (dot <= 0) {
        if (dot * dot > sin2Angle * edge.norm2) return false
        val dir = edge.cross(axis)
        if (dir.dot(vertices(k)) < 0 && dir.dot(vertices((k + 1) & 3)) > 0) return true
      }
      k += 1
    }
    false
  }

  def approxEquals(other: S2Cap, maxError: Double = 1e-14): Boolean =
    (axis.approxEquals(other.axis, maxError) && math.abs(height - other.height) <= maxError) ||
      (isEmpty && other.height <= maxError) ||
      (other.isEmpty && height <= maxError) ||
      (isFull && other.height >= 2 - maxError) ||
      (other.isFull && height >= 2 - maxError)
}

object S2Cap {
  /** Multiplier guaranteeing a float result >= the true result (`S2Cap.cs:28`). */
  private val RoundUp = 1.0 + 1.0 / (1L << 52)

  val Empty: S2Cap = S2Cap(S2Point(1, 0, 0), -1)
  val Full: S2Cap = S2Cap(S2Point(1, 0, 0), 2)

  def fromAxisHeight(axis: S2Point, height: Double): S2Cap = S2Cap(axis, height)

  /** Height = 2*sin^2(angle/2): precise for small angles (`S2Cap.cs:288-297`). */
  def fromAxisAngle(axis: S2Point, angleRadians: Double): S2Cap = {
    val d = math.sin(0.5 * angleRadians)
    S2Cap(axis, 2 * d * d)
  }

  def fromAxisArea(axis: S2Point, area: Double): S2Cap = S2Cap(axis, area / (2 * S2Const.Pi))
}
