package graft.s2

/** Named geometric fixtures parsed from "lat:lng, ..." strings, mirroring the
  * reference test helpers (`GeometryTestCase.cs:181-229`) and the fixture set
  * in `S2LoopTest.cs:15-57` / `S2PolygonTest.cs:15-61`. */
object TestFixtures {

  def parseVertices(str: String): IndexedSeq[S2Point] =
    str.split(',').toIndexedSeq.map { token =>
      val colon = token.indexOf(':')
      require(colon != -1, s"Illegal string: $token. Should look like '35:20'")
      val lat = token.substring(0, colon).trim.toDouble
      val lng = token.substring(colon + 1).trim.toDouble
      S2LatLng.fromDegrees(lat, lng).toPoint
    }

  def makePoint(str: String): S2Point = parseVertices(str).head

  def makeLoop(str: String): S2Loop = new S2Loop(parseVertices(str))

  def makePolygon(str: String): S2Polygon = {
    val loops = str.split(';').toSeq.filter(_.trim.nonEmpty).map { token =>
      val loop = makeLoop(token)
      loop.normalize()
      loop
    }
    new S2Polygon(loops)
  }

  // S2LoopTest.cs fixtures
  val candyCane: S2Loop = makeLoop("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
  val arctic80: S2Loop = makeLoop("80:-150, 80:-30, 80:90")
  val antarctic80: S2Loop = makeLoop("-80:120, -80:0, -80:-120")
  def northHemi: S2Loop = makeLoop("0:-180, 0:-90, 0:0, 0:90")
  def southHemi: S2Loop = { val l = makeLoop("0:-180, 0:-90, 0:0, 0:90"); l.invert(); l }

  // S2PolygonTest.cs fixtures
  val Near0 = "-1:0, 0:1, 1:0, 0:-1"
  val Near1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1"
  val Near2 = "5:-2, -2:5, -1:-2"
  val Near3 = "6:-3, -3:6, -2:-2"
  val NearHemi = "0:-90, -90:0, 0:90, 90:0"

  val Far0 = "0:179, 1:180, 0:-179, 2:-180"
  val Far1 = "0:179, -1:179, 1:180, -1:-179, 0:-179, 3:-178, 2:-180, 3:178"

  val South0a = "-90:0, -89.99:0, -89.99:0.01"
  val SouthHemi = "0:-180, 0:60, 0:-60"
}
