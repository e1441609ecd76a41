package graft.s2

/** Robust geometric predicates: the numeric bedrock of point-in-polygon.
  *
  * `robustCcw`'s threshold dance, the stable-difference `expensiveCcw`
  * fallback with its deterministic tie-breaking, and the symbolic-perturbation
  * planar tests must match the reference exactly
  * (`OpenSky.S2Geometry/S2.cs:440-726`) or loop-containment parity flips.
  */
object S2Predicates {

  /** Sign of det(a,b,c) with threshold 1.6e-15 = 2*14*2^-54; falls back to
    * the expensive stable computation near zero (`S2.cs:482-526`). */
  def robustCcw(a: S2Point, b: S2Point, c: S2Point): Int =
    robustCcw(a, b, c, a.cross(b))

  def robustCcw(a: S2Point, b: S2Point, c: S2Point, aCrossB: S2Point): Int = {
    val kMinAbsValue = 1.6e-15
    val det = aCrossB.dot(c)
    if (det > kMinAbsValue) 1
    else if (det < -kMinAbsValue) -1
    else expensiveCcw(a, b, c)
  }

  def simpleCcw(a: S2Point, b: S2Point, c: S2Point): Boolean =
    c.cross(a).dot(b) > 0

  /** True if edge AB crosses CD at an interior point of both
    * (`S2.cs:180-197`). */
  def simpleCrossing(a: S2Point, b: S2Point, c: S2Point, d: S2Point): Boolean = {
    val ab = a.cross(b)
    val cd = c.cross(d)
    val acb = -ab.dot(c)
    val cbd = -cd.dot(b)
    val bda = ab.dot(d)
    val dac = cd.dot(a)
    (acb * cbd > 0) && (cbd * bda > 0) && (bda * dac > 0)
  }

  /** Stable orientation for nearly-colinear points: difference vectors from
    * the vertex opposite the longest edge, then symbolic perturbation
    * (`S2.cs:533-644`). */
  private def expensiveCcw(a: S2Point, b: S2Point, c: S2Point): Int = {
    if (a == b || b == c || c == a) return 0

    val sab = if (a.dot(b) > 0) -1.0 else 1.0
    val sbc = if (b.dot(c) > 0) -1.0 else 1.0
    val sca = if (c.dot(a) > 0) -1.0 else 1.0
    val vab = a + (b * sab)
    val vbc = b + (c * sbc)
    val vca = c + (a * sca)
    val dab = vab.norm2
    val dbc = vbc.norm2
    val dca = vca.norm2

    var sign = 0.0
    if (dca < dbc || (dca == dbc && a.lessThan(b))) {
      if (dab < dbc || (dab == dbc && a.lessThan(c)))
        sign = vab.cross(vca).dot(a) * sab // BC is longest edge
      else
        sign = vca.cross(vbc).dot(c) * sca // AB is longest edge
    } else {
      if (dab < dca || (dab == dca && b.lessThan(c)))
        sign = vbc.cross(vab).dot(b) * sbc // CA is longest edge
      else
        sign = vca.cross(vbc).dot(c) * sca // AB is longest edge
    }
    if (sign > 0) return 1
    if (sign < 0) return -1

    // Numerically coplanar: symbolic perturbation by (eps, eps^2, eps^3) ==
    // planar CCW around the origin in YZ, then ZX, then XY planes.
    var ccw = planarOrderedCcw(a.y, a.z, b.y, b.z, c.y, c.z)
    if (ccw == 0) {
      ccw = planarOrderedCcw(a.z, a.x, b.z, b.x, c.z, c.x)
      if (ccw == 0) ccw = planarOrderedCcw(a.x, a.y, b.x, b.y, c.x, c.y)
    }
    ccw
  }

  private def planarCcw(ax: Double, ay: Double, bx: Double, by: Double): Int = {
    val sab = if (ax * bx + ay * by > 0) -1.0 else 1.0
    val vabX = ax + bx * sab
    val vabY = ay + by * sab
    val da = ax * ax + ay * ay
    val db = bx * bx + by * by
    var sign = 0.0
    // 2-d lexicographic tie-break mirrors `R2Vector` operator< (R2Vector.cs).
    val aLessB = ax < bx || (ax == bx && ay < by)
    if (da < db || (da == db && aLessB))
      sign = (ax * vabY - ay * vabX) * sab
    else
      sign = vabX * by - vabY * bx
    if (sign > 0) 1 else if (sign < 0) -1 else 0
  }

  private def planarOrderedCcw(ax: Double, ay: Double, bx: Double, by: Double,
                               cx: Double, cy: Double): Int = {
    var sum = 0
    sum += planarCcw(ax, ay, bx, by)
    sum += planarCcw(bx, by, cx, cy)
    sum += planarCcw(cx, cy, ax, ay)
    if (sum > 0) 1 else if (sum < 0) -1 else 0
  }

  /** True if edges OA, OB, OC occur in that order sweeping CCW around O
    * (`S2.cs:706-726`). */
  def orderedCcw(a: S2Point, b: S2Point, c: S2Point, o: S2Point): Boolean = {
    var sum = 0
    if (robustCcw(b, o, a) >= 0) sum += 1
    if (robustCcw(c, o, b) >= 0) sum += 1
    if (robustCcw(a, o, c) > 0) sum += 1
    sum >= 2
  }

  /** Cross product stabilized as (b+a)x(b-a); non-zero even for a == +/-b
    * (`S2.cs:212-233`). */
  def robustCrossProd(a: S2Point, b: S2Point): S2Point = {
    val x = (b + a).cross(b - a)
    if (x != S2Point.Zero) x else a.ortho
  }

  /** Triangle area via l'Huilier, switching to Girard for long skinny
    * triangles (`S2.cs:258-320`). */
  def area(a: S2Point, b: S2Point, c: S2Point): Double = {
    val sa = b.angle(c)
    val sb = c.angle(a)
    val sc = a.angle(b)
    val s = 0.5 * (sa + sb + sc)
    if (s >= 3e-4) {
      val s2 = s * s
      val dmin = s - math.max(sa, math.max(sb, sc))
      if (dmin < 1e-2 * s * s2 * s2) {
        val girard = girardArea(a, b, c)
        if (dmin < s * (0.1 * girard)) return girard
      }
    }
    4 * math.atan(math.sqrt(math.max(0.0,
      math.tan(0.5 * s) * math.tan(0.5 * (s - sa)) *
        math.tan(0.5 * (s - sb)) * math.tan(0.5 * (s - sc)))))
  }

  def girardArea(a: S2Point, b: S2Point, c: S2Point): Double = {
    val ab = a.cross(b)
    val bc = b.cross(c)
    val ac = a.cross(c)
    math.max(0.0, ab.angle(ac) - ab.angle(bc) + bc.angle(ac))
  }

  def signedArea(a: S2Point, b: S2Point, c: S2Point): Double =
    area(a, b, c) * robustCcw(a, b, c)

  def planarCentroid(a: S2Point, b: S2Point, c: S2Point): S2Point =
    S2Point((a.x + b.x + c.x) / 3.0, (a.y + b.y + c.y) / 3.0, (a.z + b.z + c.z) / 3.0)

  /** True centroid of spherical triangle ABC times its signed area
    * (`S2.cs:403-424`). */
  def trueCentroid(a: S2Point, b: S2Point, c: S2Point): S2Point = {
    val sina = b.cross(c).norm
    val sinb = c.cross(a).norm
    val sinc = a.cross(b).norm
    val ra = if (sina == 0) 1 else math.asin(sina) / sina
    val rb = if (sinb == 0) 1 else math.asin(sinb) / sinb
    val rc = if (sinc == 0) 1 else math.asin(sinc) / sinc
    val x = S2Point(a.x, b.x, c.x)
    val y = S2Point(a.y, b.y, c.y)
    val z = S2Point(a.z, b.z, c.z)
    val r = S2Point(ra, rb, rc)
    S2Point(
      0.5 * y.cross(z).dot(r),
      0.5 * z.cross(x).dot(r),
      0.5 * x.cross(y).dot(r))
  }

  /** Interior angle at vertex B of triangle ABC (`S2.cs:738-741`). */
  def angle(a: S2Point, b: S2Point, c: S2Point): Double =
    a.cross(b).angle(c.cross(b))

  /** Exterior turning angle at vertex B; positive for CCW (`S2.cs:756-762`). */
  def turnAngle(a: S2Point, b: S2Point, c: S2Point): Double = {
    val outAngle = b.cross(a).angle(c.cross(b))
    if (robustCcw(a, b, c) > 0) outAngle else -outAngle
  }

  def approxEquals(a: S2Point, b: S2Point, maxError: Double = 1e-15): Boolean =
    a.angle(b) <= maxError

  def isUnitLength(p: S2Point): Boolean = math.abs(p.norm2 - 1) <= 1e-15
}
