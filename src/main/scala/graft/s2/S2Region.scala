package graft.s2

/** A two-dimensional region on the unit sphere; the contract the region
  * coverer subdivides against (`OpenSky.S2Geometry/IS2Region.cs:11-43`). */
trait S2Region extends Serializable {
  /** A bounding spherical cap (may be conservative). */
  def capBound: S2Cap

  /** A bounding latitude-longitude rectangle (may be conservative). */
  def rectBound: S2LatLngRect

  /** True only if the cell is entirely contained (exact-ish, conservative on
    * the "false" side). */
  def containsCell(cell: S2Cell): Boolean

  /** False only if the cell definitely does not intersect (may err "true"). */
  def mayIntersectCell(cell: S2Cell): Boolean
}
