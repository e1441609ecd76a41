package graft.s2

/** One-dimensional angle with fixed-point codecs (reference `S1Angle.cs`).
  *
  * Degrees<->radians use the reference's exact double expressions
  * (`S1Angle.cs:32-35` Degrees = radians*(180/Pi); :121-124 FromDegrees =
  * deg*(Pi/180)), so `fromRadians(Pi).degrees == 180.0` exactly. The
  * E5/E6/E7 ENCODE accessors round half-to-even like C# `Math.Round`
  * (`S1Angle.cs:69-82`) — `math.rint`, not `math.round` (half-up) — and
  * the decoders multiply by the inverse power of ten (`S1Angle.cs:126-143`,
  * including the documented E6 "multiply, don't divide" shortcut). */
final case class S1Angle(radians: Double) extends Ordered[S1Angle] {
  def degrees: Double = radians * (180.0 / math.Pi)

  def e5: Long = math.rint(degrees * 1e5).toLong
  def e6: Long = math.rint(degrees * 1e6).toLong
  def e7: Long = math.rint(degrees * 1e7).toLong

  def compare(o: S1Angle): Int = java.lang.Double.compare(radians, o.radians)
}

object S1Angle {
  def fromRadians(radians: Double): S1Angle = S1Angle(radians)
  def fromDegrees(degrees: Double): S1Angle = S1Angle(degrees * (math.Pi / 180.0))

  def e5(e5: Long): S1Angle = fromDegrees(e5 * 1e-5)
  def e6(e6: Long): S1Angle = fromDegrees(e6 * 1e-6)
  def e7(e7: Long): S1Angle = fromDegrees(e7 * 1e-7)

  /** Angle between two (not necessarily unit) points (`S1Angle.cs:22-26`). */
  def between(x: S2Point, y: S2Point): S1Angle = S1Angle(x.angle(y))

  def max(a: S1Angle, b: S1Angle): S1Angle = if (b > a) b else a
  def min(a: S1Angle, b: S1Angle): S1Angle = if (b > a) a else b
}
