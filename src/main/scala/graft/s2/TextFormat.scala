package graft.s2

/** Parser for the compact "lat:lng, lat:lng, ..." geometry text format used
  * throughout the reference test suite (`GeometryTestCase.cs:181-229`);
  * loops separated by ';' form a polygon (each loop normalized). Exposed as
  * a user API for defining query regions. */
object TextShapes {

  def parseVertices(str: String): IndexedSeq[S2Point] =
    str.split(',').toIndexedSeq.map { token =>
      val colon = token.indexOf(':')
      require(colon != -1, s"Illegal vertex '$token' — expected 'lat:lng'")
      val lat = token.substring(0, colon).trim.toDouble
      val lng = token.substring(colon + 1).trim.toDouble
      S2LatLng.fromDegrees(lat, lng).toPoint
    }

  def point(str: String): S2Point = parseVertices(str).head

  def loop(str: String): S2Loop = new S2Loop(parseVertices(str))

  /** Regular n-gon inscribed in the geodesic circle of the given angular
    * radius: the polygon approximation of a cap boundary. With n >= 2000
    * vertices, containment tests run through the per-loop edge index. */
  def circle(centerLatDeg: Double, centerLonDeg: Double,
             radiusRadians: Double, n: Int): S2Polygon = {
    val z = S2LatLng.fromDegrees(centerLatDeg, centerLonDeg).toPoint
    val x = z.ortho
    val y = z.cross(x)
    val r = math.sin(radiusRadians)
    val h = math.cos(radiusRadians)
    val verts = (0 until n).map { i =>
      val phi = 2 * math.Pi * i / n
      S2Point.normalize((x * (math.cos(phi) * r)) + (y * (math.sin(phi) * r)) + (z * h))
    }
    new S2Polygon(Seq(new S2Loop(verts)))
  }

  def polygon(str: String): S2Polygon = {
    val loops = str.split(';').toSeq.filter(_.trim.nonEmpty).map { token =>
      val l = loop(token)
      l.normalize()
      l
    }
    new S2Polygon(loops)
  }
}
