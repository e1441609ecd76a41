package graft.s2

/** The coverage-query extensions layered on the core library
  * (`OpenSky.S2Geometry/Extensions/OpenSkyS2.cs`): point->tile encoding and
  * the circular / doughnut / rectangle flood-fill coverings used to turn
  * spatial predicates into cell-id range predicates. */
object OpenSkyCoverage {

  final case class CircularCoverage(level: Int, cells: IndexedSeq[Long])
  final case class DoughnutCoverage(includeLevel: Int, includeCells: IndexedSeq[Long],
                                    excludeLevel: Int, excludeCells: IndexedSeq[Long])
  final case class RectangleCoverage(level: Int, cells: IndexedSeq[Long])

  /** Point -> cell id at the requested level (`OpenSkyS2.cs:43-48`);
    * golden-vector surface ("476c544" for LOWW at level 11). */
  def cellIdForCoordinates(latitude: Double, longitude: Double, level: Int): Long =
    S2CellId.parentForLevel(S2CellId.fromLatLngDegrees(latitude, longitude), level)

  /** Cap flood-fill covering at the deepest level staying under maxCells;
    * radius in nautical miles; the radius->angle conversion uses the WGS84
    * semi-major axis 6378137 m, unlike the library's 6367000 m earth radius
    * (`OpenSkyS2.cs:101-127`). */
  def circularCoverage(latitude: Double, longitude: Double, radiusNm: Double,
                       minLevel: Int = 3, maxLevel: Int = 9, maxCells: Int = 500): CircularCoverage = {
    val s2Point = S2LatLng.fromDegrees(latitude, longitude).toPoint
    val angle = ((radiusNm * 1.852) * 1000) / 6378137.0
    val sphereCap = S2Cap.fromAxisAngle(s2Point, angle)

    var cells: IndexedSeq[Long] = Vector.empty
    var selectedLevel = minLevel
    var level = minLevel
    var stop = false
    while (level <= maxLevel && !stop) {
      val levelCells = S2RegionCoverer.getSimpleCovering(sphereCap, s2Point, level)
      if (levelCells.length < maxCells) {
        cells = levelCells
        selectedLevel = level
      } else stop = true
      level += 1
    }
    CircularCoverage(selectedLevel, cells)
  }

  /** Outer-circle include cells minus inner-circle exclude cells
    * (`OpenSkyS2.cs:192-198`). Engine-side this becomes a semi-join plus an
    * anti-join on cell prefix. */
  def doughnutCoverage(latitude: Double, longitude: Double,
                       outerRadiusNm: Double, innerRadiusNm: Double,
                       minLevel: Int = 3, maxLevel: Int = 9, maxCells: Int = 500): DoughnutCoverage = {
    val outer = circularCoverage(latitude, longitude, outerRadiusNm, minLevel, maxLevel, maxCells)
    val inner = circularCoverage(latitude, longitude, innerRadiusNm, minLevel, maxLevel, maxCells)
    DoughnutCoverage(outer.level, outer.cells, inner.level, inner.cells)
  }

  /** Lat/lng-rect flood-fill covering between two corners
    * (`OpenSkyS2.cs:297-322`). */
  def rectangleCoverage(fromLatitude: Double, fromLongitude: Double,
                        toLatitude: Double, toLongitude: Double,
                        minLevel: Int = 3, maxLevel: Int = 9, maxCells: Int = 300): RectangleCoverage = {
    val fromS2 = S2LatLng.fromDegrees(fromLatitude, fromLongitude)
    val toS2 = S2LatLng.fromDegrees(toLatitude, toLongitude)
    val rect = S2LatLngRect.fromPointPair(fromS2, toS2)

    var cells: IndexedSeq[Long] = Vector.empty
    var selectedLevel = minLevel
    var level = minLevel
    var stop = false
    while (level <= maxLevel && !stop) {
      val levelCells = S2RegionCoverer.getSimpleCovering(rect, fromS2.toPoint, level)
      if (levelCells.length < maxCells) {
        cells = levelCells
        selectedLevel = level
      } else stop = true
      level += 1
    }
    RectangleCoverage(selectedLevel, cells)
  }
}
