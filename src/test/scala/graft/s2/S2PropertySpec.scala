package graft.s2

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven property tests (the ScalaCheck arm of the test plan,
  * SURVEY.md section 5), mirroring `GeometryTestCase.cs` generators; a
  * small deterministic driver replaces the scalatestplus bridge (not in
  * the offline dependency cache). */
class S2PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(123456L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private val genFace: Gen[Int] = Gen.choose(0, 5)
  private val genPos: Gen[Long] = Gen.long.map(_ & (-1L >>> S2CellId.FaceBits))
  private val genLevel: Gen[Int] = Gen.choose(0, S2CellId.MaxLevel)

  private val genCellId: Gen[Long] = for {
    f <- genFace; p <- genPos; l <- genLevel
  } yield S2CellId.fromFacePosLevel(f, p, l)

  private val genLeafCell: Gen[Long] = for {
    f <- genFace; p <- genPos
  } yield S2CellId.fromFacePosLevel(f, p, S2CellId.MaxLevel)

  private val genLatLng: Gen[(Double, Double)] = for {
    lat <- Gen.choose(-90.0, 90.0)
    lng <- Gen.choose(-180.0, 180.0)
  } yield (lat, lng)

  test("leaf roundtrip: fromLatLng(toLatLng(id)) == id") {
    forAll(genLeafCell) { id =>
      assert(S2CellId.fromLatLngRadians(S2CellId.toLatRadians(id), S2CellId.toLngRadians(id)) == id)
    }
  }

  test("token roundtrip at every level") {
    forAll(genCellId) { id =>
      assert(S2CellId.fromToken(S2CellId.toToken(id)) == id)
    }
  }

  test("parent contains child; ranges nest; rangeMin+rangeMax == 2*id") {
    forAll(genCellId) { id =>
      assert(S2CellId.rangeMin(id) + S2CellId.rangeMax(id) == 2 * id)
      if (S2CellId.level(id) > 0) {
        val p = S2CellId.parent(id)
        assert(S2CellId.contains(p, id))
        assert(java.lang.Long.compareUnsigned(S2CellId.rangeMin(p), S2CellId.rangeMin(id)) <= 0)
        assert(java.lang.Long.compareUnsigned(S2CellId.rangeMax(p), S2CellId.rangeMax(id)) >= 0)
      }
    }
  }

  test("arbitrary lat/lng maps into the containing cell at every coarser level") {
    forAll(genLatLng, genLevel) { case ((lat, lng), level) =>
      val leaf = S2CellId.fromLatLngDegrees(lat, lng)
      val tile = S2CellId.parentForLevel(leaf, level)
      assert(S2CellId.contains(tile, leaf))
      assert(S2CellId.level(tile) == level)
      // the tile's center maps back into the tile
      assert(S2CellId.contains(tile, S2CellId.fromPoint(S2CellId.toPoint(tile))))
    }
  }

  test("neighbors are symmetric and at the requested level") {
    forAll(genFace, genPos, Gen.choose(1, S2CellId.MaxLevel - 1)) { (f, p, lvl) =>
      val id = S2CellId.fromFacePosLevel(f, p, lvl)
      for (n <- S2CellId.edgeNeighbors(id)) {
        assert(S2CellId.level(n) == lvl)
        assert(S2CellId.edgeNeighbors(n).contains(id))
      }
    }
  }

  test("cell union normalization is idempotent and order-insensitive") {
    forAll(Gen.listOfN(12, genCellId)) { ids =>
      val u1 = S2CellUnion.normalized(ids)
      val u2 = S2CellUnion.normalized(scala.util.Random.shuffle(ids))
      assert(u1.cellIds == u2.cellIds)
      assert(S2CellUnion.normalized(u1.cellIds).cellIds == u1.cellIds)
      for (id <- ids) assert(u1.contains(id))
    }
  }

  test("haversine distance: symmetry, identity, triangle sanity") {
    forAll(genLatLng, genLatLng) { (a, b) =>
      val pa = S2LatLng.fromDegrees(a._1, a._2)
      val pb = S2LatLng.fromDegrees(b._1, b._2)
      // Math.sin need not be bitwise odd-symmetric, so symmetry holds only
      // to ~1 ulp (same as the reference implementation)
      assert(math.abs(pa.getDistance(pb) - pb.getDistance(pa)) < 1e-12)
      assert(pa.getDistance(pa) == 0.0)
      assert(pa.getDistance(pb) <= math.Pi + 1e-12)
    }
  }
}
