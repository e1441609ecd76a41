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

  def polygon(str: String): S2Polygon = {
    val loops = str.split(';').toSeq.filter(_.trim.nonEmpty).map { token =>
      val l = loop(token)
      l.normalize()
      l
    }
    new S2Polygon(loops)
  }
}
