package graft.s2

import org.scalatest.funsuite.AnyFunSuite

/** Reference vectors from `S1AngleTest.cs` (S1AngleBasicTest), including
  * the round-1-missing ENCODE direction of E5/E6/E7. */
class S1AngleSpec extends AnyFunSuite {

  test("radians<->degrees conversions are exact at Pi/180") {
    assert(S1Angle.fromRadians(math.Pi).radians === math.Pi)
    assert(S1Angle.fromRadians(math.Pi).degrees === 180.0)
    assert(S1Angle.fromDegrees(180).radians === math.Pi)
    assert(S1Angle.fromDegrees(180).degrees === 180.0)
    assert(S1Angle.fromRadians(math.Pi / 2).degrees === 90.0)
    assert(S1Angle.fromRadians(-math.Pi / 2).degrees === -90.0)
    assert(S1Angle.fromDegrees(-45).radians === -math.Pi / 4)
  }

  test("E5/E6/E7 decode vectors (S1AngleTest.cs:28-31)") {
    assert(S1Angle.e5(2000000L) === S1Angle.fromDegrees(20))
    assert(S1Angle.e6(-60000000L) === S1Angle.fromDegrees(-60))
    assert(S1Angle.e7(750000000L) === S1Angle.fromDegrees(75))
  }

  test("E5/E6/E7 encode vectors (S1AngleTest.cs:32-34)") {
    assert(S1Angle.fromDegrees(12.34567).e5 === 1234567L)
    assert(S1Angle.fromDegrees(12.345678).e6 === 12345678L)
    assert(S1Angle.fromDegrees(-12.3456789).e7 === -123456789L)
  }

  test("decode->encode round-trips across magnitudes and signs") {
    for (v <- Seq(-123456789L, -1L, 0L, 1L, 999999999L, 1800000000L))
      assert(S1Angle.e7(v).e7 === v)
    for (v <- Seq(-18000000L, -12345678L, 0L, 654321L, 180000000L))
      assert(S1Angle.e6(v).e6 === v)
    for (v <- Seq(-1800000L, -54321L, 0L, 12345L, 18000000L))
      assert(S1Angle.e5(v).e5 === v)
  }

  test("S2LatLng typed accessors round-trip fixed-point coordinates") {
    val ll = S2LatLng.fromE5(4820000L, 1637000L)
    assert(ll.lat.e5 === 4820000L)
    assert(ll.lng.e5 === 1637000L)
    val l7 = S2LatLng.fromE7(-123456789L, 987654321L)
    assert(l7.lat.e7 === -123456789L)
    assert(l7.lng.e7 === 987654321L)
    assert(S2LatLng.fromE6(-60000000L, 12345678L).lng.e6 === 12345678L)
  }

  test("ordering and S2Point angle bridge") {
    assert(S1Angle.fromDegrees(1) < S1Angle.fromDegrees(2))
    assert(S1Angle.max(S1Angle.fromDegrees(1), S1Angle.fromDegrees(2)) === S1Angle.fromDegrees(2))
    assert(S1Angle.min(S1Angle.fromDegrees(1), S1Angle.fromDegrees(2)) === S1Angle.fromDegrees(1))
    val a = S2LatLng.fromDegrees(0, 0).toPoint
    val b = S2LatLng.fromDegrees(0, 90).toPoint
    assert(math.abs(S1Angle.between(a, b).degrees - 90.0) < 1e-12)
  }
}
