package graft.s2

/** A closed interval on the unit circle (longitudes), possibly "inverted"
  * (lo > hi) meaning it wraps through +/-Pi.
  *
  * The +/-Pi canonicalization, inverted-interval logic, and each containment /
  * intersection / union / intersection rule replicate the reference exactly
  * (`OpenSky.S2Geometry/S1Interval.cs:6-595`) — this type is the subtle core
  * of the lat/lng-rect region math and is heavily unit-tested there.
  */
final class S1Interval private (val lo: Double, val hi: Double) extends Serializable {
  import S1Interval._

  def isValid: Boolean =
    math.abs(lo) <= Pi && math.abs(hi) <= Pi &&
      !(lo == -Pi && hi != Pi) && !(hi == -Pi && lo != Pi)

  def isFull: Boolean = hi - lo == 2 * Pi
  def isEmpty: Boolean = lo - hi == 2 * Pi
  def isInverted: Boolean = lo > hi

  def center: Double = {
    val c = 0.5 * (lo + hi)
    if (!isInverted) c
    else if (c <= 0) c + Pi
    else c - Pi
  }

  def length: Double = {
    val len = hi - lo
    if (len >= 0) len
    else {
      val wrapped = len + 2 * Pi
      if (wrapped > 0) wrapped else -1
    }
  }

  def complement: S1Interval =
    if (lo == hi) Full else mkChecked(hi, lo)

  def contains(p0: Double): Boolean = {
    val p = if (p0 == -Pi) Pi else p0
    fastContains(p)
  }

  /** Containment without the -Pi -> Pi renormalization of `p`. */
  def fastContains(p: Double): Boolean =
    if (isInverted) (p >= lo || p <= hi) && !isEmpty
    else p >= lo && p <= hi

  def interiorContains(p0: Double): Boolean = {
    val p = if (p0 == -Pi) Pi else p0
    if (isInverted) p > lo || p < hi
    else (p > lo && p < hi) || isFull
  }

  def contains(y: S1Interval): Boolean =
    if (isInverted) {
      if (y.isInverted) y.lo >= lo && y.hi <= hi
      else (y.lo >= lo || y.hi <= hi) && !isEmpty
    } else {
      if (y.isInverted) isFull || y.isEmpty
      else y.lo >= lo && y.hi <= hi
    }

  def interiorContains(y: S1Interval): Boolean =
    if (isInverted) {
      if (!y.isInverted) y.lo > lo || y.hi < hi
      else (y.lo > lo && y.hi < hi) || y.isEmpty
    } else {
      if (y.isInverted) isFull || y.isEmpty
      else (y.lo > lo && y.hi < hi) || isFull
    }

  def intersects(y: S1Interval): Boolean =
    if (isEmpty || y.isEmpty) false
    else if (isInverted) y.isInverted || y.lo <= hi || y.hi >= lo
    else if (y.isInverted) y.lo <= hi || y.hi >= lo
    else y.lo <= hi && y.hi >= lo

  def interiorIntersects(y: S1Interval): Boolean =
    if (isEmpty || y.isEmpty || lo == hi) false
    else if (isInverted) y.isInverted || y.lo < hi || y.hi > lo
    else if (y.isInverted) y.lo < hi || y.hi > lo
    else (y.lo < hi && y.hi > lo) || isFull

  def addPoint(p0: Double): S1Interval = {
    val p = if (p0 == -Pi) Pi else p0
    if (fastContains(p)) this
    else if (isEmpty) fromPoint(p)
    else {
      val dlo = positiveDistance(p, lo)
      val dhi = positiveDistance(hi, p)
      if (dlo < dhi) S1Interval(p, hi) else S1Interval(lo, p)
    }
  }

  def expanded(radius: Double): S1Interval = {
    if (isEmpty) return this
    if (length + 2 * radius >= 2 * Pi - 1e-15) return Full
    var newLo = Math.IEEEremainder(lo - radius, 2 * Pi)
    val newHi = Math.IEEEremainder(hi + radius, 2 * Pi)
    if (newLo == -Pi) newLo = Pi
    S1Interval(newLo, newHi)
  }

  def union(y: S1Interval): S1Interval = {
    if (y.isEmpty) return this
    if (fastContains(y.lo)) {
      if (fastContains(y.hi)) {
        if (contains(y)) this else Full
      } else mkChecked(lo, y.hi)
    } else if (fastContains(y.hi)) mkChecked(y.lo, hi)
    else if (isEmpty || y.fastContains(lo)) y
    else {
      val dlo = positiveDistance(y.hi, lo)
      val dhi = positiveDistance(hi, y.lo)
      if (dlo < dhi) mkChecked(y.lo, hi) else mkChecked(lo, y.hi)
    }
  }

  def intersection(y: S1Interval): S1Interval = {
    if (y.isEmpty) return Empty
    if (fastContains(y.lo)) {
      if (fastContains(y.hi)) { if (y.length < length) y else this }
      else mkChecked(y.lo, hi)
    } else if (fastContains(y.hi)) mkChecked(lo, y.hi)
    else if (y.fastContains(lo)) this
    else Empty
  }

  def approxEquals(y: S1Interval, maxError: Double = 1e-9): Boolean =
    if (isEmpty) y.length <= maxError
    else if (y.isEmpty) length <= maxError
    else math.abs(Math.IEEEremainder(y.lo - lo, 2 * Pi)) +
      math.abs(Math.IEEEremainder(y.hi - hi, 2 * Pi)) <= maxError

  override def equals(obj: Any): Boolean = obj match {
    case o: S1Interval => lo == o.lo && hi == o.hi
    case _ => false
  }
  override def hashCode: Int =
    31 * java.lang.Double.hashCode(lo) + java.lang.Double.hashCode(hi)
  override def toString: String = s"[$lo, $hi]"
}

object S1Interval {
  private val Pi = math.Pi

  val Empty: S1Interval = new S1Interval(Pi, -Pi)
  val Full: S1Interval = new S1Interval(-Pi, Pi)

  /** Public constructor: canonicalizes a bare -Pi endpoint to Pi
    * (`S1Interval.cs:23-40`). */
  def apply(lo: Double, hi: Double): S1Interval = {
    var newLo = lo
    var newHi = hi
    if (lo == -Pi && hi != Pi) newLo = Pi
    if (hi == -Pi && lo != Pi) newHi = Pi
    new S1Interval(newLo, newHi)
  }

  /** Trusted constructor: endpoints already canonical. */
  private[s2] def mkChecked(lo: Double, hi: Double): S1Interval = new S1Interval(lo, hi)

  def fromPoint(p0: Double): S1Interval = {
    val p = if (p0 == -Pi) Pi else p0
    new S1Interval(p, p)
  }

  def fromPointPair(p1c: Double, p2c: Double): S1Interval = {
    val p1 = if (p1c == -Pi) Pi else p1c
    val p2 = if (p2c == -Pi) Pi else p2c
    if (positiveDistance(p1, p2) <= Pi) new S1Interval(p1, p2)
    else new S1Interval(p2, p1)
  }

  /** Distance from a to b going CCW, in [0, 2*Pi); stable for tiny positive
    * distances (`S1Interval.cs:584-594`). */
  def positiveDistance(a: Double, b: Double): Double = {
    val d = b - a
    if (d >= 0) d else (b + Pi) - (a - Pi)
  }
}
