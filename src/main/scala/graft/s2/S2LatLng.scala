package graft.s2

/** A (lat, lng) pair in radians. Conversions and the haversine distance match
  * `OpenSky.S2Geometry/S2LatLng.cs` (earth radius 6367000.0 m, NOT WGS84). */
final case class S2LatLng(latRadians: Double, lngRadians: Double) {
  def latDegrees: Double = 180.0 / math.Pi * latRadians
  def lngDegrees: Double = 180.0 / math.Pi * lngRadians

  /** Typed angle accessors (`S2LatLng.cs` Lat/Lng properties) — carry the
    * E5/E6/E7 fixed-point ENCODE side via [[S1Angle]]. */
  def lat: S1Angle = S1Angle(latRadians)
  def lng: S1Angle = S1Angle(lngRadians)

  def isValid: Boolean =
    math.abs(latRadians) <= S2Const.PiOver2 && math.abs(lngRadians) <= S2Const.Pi

  /** Clamp latitude, wrap longitude into [-Pi, Pi] (`S2LatLng.cs:117-126`). */
  def normalized: S2LatLng =
    S2LatLng(
      math.max(-S2Const.PiOver2, math.min(S2Const.PiOver2, latRadians)),
      Math.IEEEremainder(lngRadians, 2 * S2Const.Pi))

  /** Unit direction vector (`S2LatLng.cs:210-216`). */
  def toPoint: S2Point = {
    val cosphi = math.cos(latRadians)
    S2Point(math.cos(lngRadians) * cosphi, math.sin(lngRadians) * cosphi, math.sin(latRadians))
  }

  /** Haversine great-circle angle (`S2LatLng.cs:223-249`). */
  def getDistance(o: S2LatLng): Double = {
    val dlat = math.sin(0.5 * (o.latRadians - latRadians))
    val dlng = math.sin(0.5 * (o.lngRadians - lngRadians))
    val x = dlat * dlat + dlng * dlng * math.cos(latRadians) * math.cos(o.latRadians)
    2 * math.atan2(math.sqrt(x), math.sqrt(math.max(0.0, 1.0 - x)))
  }

  def getDistance(o: S2LatLng, radius: Double): Double = getDistance(o) * radius

  def getEarthDistance(o: S2LatLng): Double = getDistance(o, S2LatLng.EarthRadiusMeters)

  def approxEquals(o: S2LatLng, maxError: Double = 1e-9): Boolean =
    math.abs(latRadians - o.latRadians) < maxError &&
      math.abs(lngRadians - o.lngRadians) < maxError
}

object S2LatLng {
  val EarthRadiusMeters = 6367000.0

  def fromRadians(latRadians: Double, lngRadians: Double): S2LatLng =
    S2LatLng(latRadians, lngRadians)

  /** Degree->radian conversion is `deg * (Pi/180)` exactly (`S1Angle.cs:121-124`). */
  def fromDegrees(latDegrees: Double, lngDegrees: Double): S2LatLng =
    S2LatLng(latDegrees * (math.Pi / 180), lngDegrees * (math.Pi / 180))

  def fromE5(latE5: Long, lngE5: Long): S2LatLng = fromDegrees(latE5 * 1e-5, lngE5 * 1e-5)
  def fromE6(latE6: Long, lngE6: Long): S2LatLng = fromDegrees(latE6 * 1e-6, lngE6 * 1e-6)
  def fromE7(latE7: Long, lngE7: Long): S2LatLng = fromDegrees(latE7 * 1e-7, lngE7 * 1e-7)

  /** Point -> lat/lng via atan2, pole-accurate for non-unit vectors
    * (`S2LatLng.cs:48-54`). */
  def fromPoint(p: S2Point): S2LatLng =
    S2LatLng(latitude(p), longitude(p))

  def latitude(p: S2Point): Double = math.atan2(p.z, math.sqrt(p.x * p.x + p.y * p.y))
  def longitude(p: S2Point): Double = math.atan2(p.y, p.x)
}
