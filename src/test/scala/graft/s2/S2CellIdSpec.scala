package graft.s2

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors + invariants for the cell-id kernel, mirroring the
  * reference suite (`S2CellIdTest.cs`, `OpenSkyS2Tests.cs`). */
class S2CellIdSpec extends AnyFunSuite {
  import S2CellId._

  test("golden tokens (S2CellIdTest.cs:297-302)") {
    assert(toToken(266L) == "000000000000010a")
    assert(toToken(0x80855c0000000000L) == "80855c")
    assert(fromToken("000000000000010a") == 266L)
    assert(fromToken("80855c") == 0x80855c0000000000L)
    assert(toToken(0L) == "X")
    assert(fromToken("X") == 0L)
    assert(fromToken("x") == 0L)
  }

  test("LOWW airport tile tokens (OpenSkyS2Tests.cs:41-45)") {
    val leaf = fromLatLngDegrees(48.11027908325195, 16.569721221923828)
    assert(toToken(parentForLevel(leaf, 11)) == "476c544")
    assert(toToken(parentForLevel(leaf, 8)) == "476c5")
  }

  test("basic face/level/position structure (S2CellIdTest.cs DefaultConstructor/FaceDefinitions)") {
    assert(fromLatLngDegrees(0, 0) != 0)
    assert(face(fromLatLngDegrees(0, 0)) == 0)
    assert(face(fromLatLngDegrees(0, 90)) == 1)
    assert(face(fromLatLngDegrees(90, 0)) == 2)
    assert(face(fromLatLngDegrees(0, 180)) == 3)
    assert(face(fromLatLngDegrees(0, -90)) == 4)
    assert(face(fromLatLngDegrees(-90, 0)) == 5)
  }

  test("rangeMin + rangeMax == 2*id (S2CellIdTest.cs:150)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 2000) {
      val f = rnd.nextInt(6)
      val pos = rnd.nextLong() & (-1L >>> FaceBits)
      val lvl = rnd.nextInt(MaxLevel + 1)
      val id = fromFacePosLevel(f, pos, lvl)
      assert(rangeMin(id) + rangeMax(id) == 2 * id)
    }
  }

  test("encode/decode roundtrip on random leaf cells, full reference count (S2CellIdTest.cs:21-32)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 200000) {
      val f = rnd.nextInt(6)
      val pos = rnd.nextLong() & (-1L >>> FaceBits)
      val id = fromFacePosLevel(f, pos, MaxLevel)
      assert(isValid(id))
      assert(level(id) == MaxLevel)
      val rt = fromLatLngRadians(toLatRadians(id), toLngRadians(id))
      assert(rt == id, s"roundtrip failed for ${toToken(id)}")
    }
  }

  test("token roundtrip at random levels (S2CellIdTest.cs:304-324)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 10000) {
      val f = rnd.nextInt(6)
      val pos = rnd.nextLong() & (-1L >>> FaceBits)
      val lvl = rnd.nextInt(MaxLevel + 1)
      val id = fromFacePosLevel(f, pos, lvl)
      val tok = toToken(id)
      assert(tok.length <= 16)
      assert(fromToken(tok) == id)
    }
  }

  test("containment: parent contains children, siblings disjoint (S2CellIdTest.cs:153-183)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 2000) {
      val f = rnd.nextInt(6)
      val pos = rnd.nextLong() & (-1L >>> FaceBits)
      val lvl = 1 + rnd.nextInt(MaxLevel)
      val id = fromFacePosLevel(f, pos, lvl)
      val par = parent(id)
      assert(contains(par, id))
      assert(!contains(id, par))
      assert(intersects(par, id) && intersects(id, par))
      if (lvl < MaxLevel) {
        for (c <- 0 until 4) {
          assert(contains(id, child(id, c)))
          assert(parent(child(id, c)) == id)
          assert(childPosition(child(id, c), lvl + 1) == c)
        }
        assert(!contains(child(id, 0), child(id, 1)))
        assert(!intersects(child(id, 0), child(id, 1)))
      }
    }
  }

  test("hilbert continuity: consecutive cells adjacent (S2CellIdTest.cs:185-210)") {
    // Walk the level-6 curve over all faces: consecutive cell centers must be
    // within MaxEdge of each other (the curve never jumps).
    val lvl = 6
    val maxDist = S2Projections.MaxEdge.getValue(lvl)
    var id = begin(lvl)
    val stop = end(lvl)
    var count = 0
    while (id != stop && count < 3000) {
      val p = toPoint(id)
      val q = toPoint(nextWithWrap(id))
      assert(p.angle(q) <= maxDist)
      id = next(id)
      count += 1
    }
  }

  test("face-1 edge neighbors span faces {5,3,2,0} (S2CellIdTest.cs:247-255)") {
    val faceCell = fromFacePosLevel(1, 0, 0)
    val nbrs = edgeNeighbors(faceCell)
    assert(nbrs.map(face).toSeq == Seq(5, 3, 2, 0))
    assert(nbrs.forall(level(_) == 0))
  }

  test("corner leaf of face 0 has vertex neighbors on faces {0,4,5} (S2CellIdTest.cs:268-276)") {
    val corner = fromFaceIj(0, 0, 0)
    val nbrs = vertexNeighbors(corner, 0)
    assert(nbrs.length == 3)
    assert(nbrs.map(face).sorted.toSeq == Seq(0, 4, 5))
  }

  test("vertex neighbors of leaf near face-2 center (S2CellIdTest.cs:257-264)") {
    // neighbors of the leaf at the center point of face 2 at level MaxLevel-1
    val id = fromPoint(S2Point(0, 0, 1))
    val nbrs = vertexNeighbors(id, MaxLevel - 1).sorted(Ordering.fromLessThan(unsignedLess))
    assert(nbrs.length == 4)
    assert(nbrs.forall(n => level(n) == MaxLevel - 1))
  }

  test("allNeighbors is superset of edge neighbors, symmetric (S2CellIdTest.cs:70-94)") {
    val rnd = new scala.util.Random(123456)
    for (_ <- 0 until 200) {
      val f = rnd.nextInt(6)
      val pos = rnd.nextLong() & (-1L >>> FaceBits)
      val lvl = 1 + rnd.nextInt(MaxLevel - 1)
      val id = fromFacePosLevel(f, pos, lvl)
      val all = allNeighbors(id, lvl).toSet
      val edge = edgeNeighbors(id).toSet
      assert(edge.subsetOf(all))
      // neighbor relation is symmetric
      for (n <- all) assert(allNeighbors(n, lvl).contains(id))
    }
  }

  test("next/prev with wrap (S2CellIdTest.cs:141-150)") {
    assert(nextWithWrap(prev(end(0))) == begin(0))
    assert(prevWithWrap(begin(2)) == prev(end(2)))
    assert(nextWithWrap(prev(end(MaxLevel))) == begin(MaxLevel))
  }

  test("isValid/isFace/isLeaf") {
    for (f <- 0 until 6) {
      val faceCell = fromFacePosLevel(f, 0, 0)
      assert(isValid(faceCell) && isFace(faceCell) && !isLeaf(faceCell))
      assert(level(faceCell) == 0)
    }
    assert(!isValid(0L))
    assert(!isValid(-1L)) // sentinel: face 7
  }
}

/** Exact neighbor-formula vectors and the allNeighbors/vertexNeighbors
  * equivalence, ported 1:1 from `S2CellIdTest.cs:65-296`. */
class S2CellIdNeighborParitySpec extends org.scalatest.funsuite.AnyFunSuite {
  import S2CellId._

  test("vertex neighbors of face-2 center at level 5 match the (i,j) formula (S2CellIdTest.cs:257-264)") {
    val nbrs = vertexNeighbors(fromPoint(S2Point(0, 0, 1)), 5)
      .sorted(Ordering.fromLessThan(unsignedLess))
    assert(nbrs.length == 4)
    for (i <- 0 until 4) {
      val expected = parentForLevel(
        fromFaceIj(2,
          (1 << 29) - (if (i < 2) 1 else 0),
          (1 << 29) - (if (i == 0 || i == 3) 1 else 0)), 5)
      assert(nbrs(i) == expected, s"neighbor $i")
    }
  }

  test("corner vertex neighbors are exactly the face cells 0, 4, 5 (S2CellIdTest.cs:268-276)") {
    val id = fromFacePosLevel(0, 0, MaxLevel)
    val nbrs = vertexNeighbors(id, 0).sorted(Ordering.fromLessThan(unsignedLess))
    assert(nbrs.toSeq == Seq(
      fromFacePosLevel(0, 0, 0), fromFacePosLevel(4, 0, 0), fromFacePosLevel(5, 0, 0)))
  }

  test("allNeighbors == union of children's vertexNeighbors, 1000 random cells (S2CellIdTest.cs:70-94,279-294)") {
    val rnd = new scala.util.Random(123456)
    def randomCellId(): Long = {
      val f = rnd.nextInt(6)
      val pos = rnd.nextLong() & (-1L >>> FaceBits)
      fromFacePosLevel(f, pos, rnd.nextInt(MaxLevel + 1))
    }
    for (_ <- 0 until 1000) {
      var toTest = randomCellId()
      if (isLeaf(toTest)) toTest = parent(toTest)
      val maxDiff = math.min(6, MaxLevel - level(toTest) - 1)
      val lvl = level(toTest) + rnd.nextInt(maxDiff + 1)

      val all = scala.collection.mutable.HashSet.empty[Long]
      val expected = scala.collection.mutable.HashSet.empty[Long]
      all ++= allNeighbors(toTest, lvl)
      val end = childEndForLevel(toTest, lvl + 1)
      var c = childBeginForLevel(toTest, lvl + 1)
      while (c != end) {
        all += parent(c)
        expected ++= vertexNeighbors(c, lvl)
        c = next(c)
      }
      assert(all == expected, s"mismatch for ${toToken(toTest)} at level $lvl")
    }
  }
}
