package graft.s2

/** A closed, bounded interval on the real line; empty iff lo > hi.
  * Semantics match `OpenSky.S2Geometry/R1Interval.cs`. */
final case class R1Interval(lo: Double, hi: Double) {
  def center: Double = 0.5 * (lo + hi)
  def length: Double = hi - lo
  def isEmpty: Boolean = lo > hi

  def contains(p: Double): Boolean = p >= lo && p <= hi
  def interiorContains(p: Double): Boolean = p > lo && p < hi

  def contains(y: R1Interval): Boolean =
    y.isEmpty || (y.lo >= lo && y.hi <= hi)

  def interiorContains(y: R1Interval): Boolean =
    y.isEmpty || (y.lo > lo && y.hi < hi)

  def intersects(y: R1Interval): Boolean =
    if (lo <= y.lo) y.lo <= hi && y.lo <= y.hi
    else lo <= y.hi && lo <= hi

  def interiorIntersects(y: R1Interval): Boolean =
    y.lo < hi && lo < y.hi && lo < hi && y.lo <= y.hi

  def addPoint(p: Double): R1Interval =
    if (isEmpty) R1Interval(p, p)
    else if (p < lo) R1Interval(p, hi)
    else if (p > hi) R1Interval(lo, p)
    else this

  def expanded(radius: Double): R1Interval =
    if (isEmpty) this else R1Interval(lo - radius, hi + radius)

  def union(y: R1Interval): R1Interval =
    if (isEmpty) y
    else if (y.isEmpty) this
    else R1Interval(math.min(lo, y.lo), math.max(hi, y.hi))

  def intersection(y: R1Interval): R1Interval =
    R1Interval(math.max(lo, y.lo), math.min(hi, y.hi))

  def approxEquals(y: R1Interval, maxError: Double = 1e-15): Boolean =
    if (isEmpty) y.length <= maxError
    else if (y.isEmpty) length <= maxError
    else math.abs(y.lo - lo) + math.abs(y.hi - hi) <= maxError
}

object R1Interval {
  val Empty: R1Interval = R1Interval(1, 0)
  def fromPoint(p: Double): R1Interval = R1Interval(p, p)
  def fromPointPair(p1: Double, p2: Double): R1Interval =
    if (p1 <= p2) R1Interval(p1, p2) else R1Interval(p2, p1)
}
