package graft.s2

import scala.collection.mutable

/** Per-geometry spatial index: edges keyed by covering cells in parallel
  * sorted arrays with range lookups (`OpenSky.S2Geometry/S2EdgeIndex.cs`).
  *
  * In the distributed engine, the same layout (data keyed by covering cell,
  * sorted by cell id, probed by parent walks + descendant ranges) becomes the
  * covering join over a cell-clustered table; this in-memory form backs
  * large-loop containment tests and the brute-vs-index cost model
  * (`PredictAdditionalCalls`, break-even m>100 edges and >30 queries).
  */
abstract class S2EdgeIndex {
  import S2EdgeIndex._

  private var cells: Array[Long] = _
  private var edges: Array[Int] = _
  private var indexComputed = false
  private var minimumS2LevelUsed = S2CellId.MaxLevel
  private var queryCount = 0

  protected def numEdges: Int
  protected def edgeFrom(index: Int): S2Point
  protected def edgeTo(index: Int): S2Point

  def reset(): Unit = {
    minimumS2LevelUsed = S2CellId.MaxLevel
    indexComputed = false
    queryCount = 0
    cells = null
    edges = null
  }

  def isIndexComputed: Boolean = indexComputed

  protected def incrementQueryCount(): Unit = queryCount += 1

  /** Cost-model-driven lazy build (`S2EdgeIndex.cs:208-218`): index iff
    * m > 100 edges and > 30 total queries. */
  def predictAdditionalCalls(n: Int): Unit = {
    if (!indexComputed && numEdges > 100 && (queryCount + n) > 30) computeIndex()
  }

  /** Build the sorted (cell, edge) arrays (`S2EdgeIndex.cs:96-154`). */
  def computeIndex(): Unit = {
    if (indexComputed) return
    val cellList = mutable.ArrayBuffer.empty[Long]
    val edgeList = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < numEdges) {
      val cover = mutable.ArrayBuffer.empty[Long]
      val level = getCovering(edgeFrom(i), edgeTo(i), thickenEdge = true, cover)
      minimumS2LevelUsed = math.min(minimumS2LevelUsed, level)
      for (cellId <- cover) { cellList += cellId; edgeList += i }
      i += 1
    }
    val indices = Array.range(0, cellList.length)
    val cArr = cellList.toArray
    val eArr = edgeList.toArray
    val sorted = indices.sortWith((x, y) => compare(cArr(x), eArr(x), cArr(y), eArr(y)) < 0)
    cells = sorted.map(cArr)
    edges = sorted.map(eArr)
    indexComputed = true
  }

  /** All edges whose covering may overlap the covering of edge (a, b):
    * parent-cell walk + descendant-range scan with refinement
    * (`S2EdgeIndex.cs:240-260`). */
  def findCandidateCrossings(a: S2Point, b: S2Point): IndexedSeq[Int] = {
    require(indexComputed)
    val cover = mutable.ArrayBuffer.empty[Long]
    getCovering(a, b, thickenEdge = false, cover)
    val uniqueSet = mutable.HashSet.empty[Int]
    getEdgesInParentCells(cover, uniqueSet)
    getEdgesInChildrenCells(a, b, cover, uniqueSet)
    uniqueSet.toIndexedSeq
  }

  /** Iterate candidate edges for a query edge: brute force below the cost
    * threshold, indexed above it (`S2EdgeIndex.cs:626-716`). */
  def candidates(a: S2Point, b: S2Point): IndexedSeq[Int] = {
    predictAdditionalCalls(1)
    if (!indexComputed) {
      incrementQueryCount()
      0 until numEdges
    } else findCandidateCrossings(a, b)
  }

  /** One-level covering of an edge, optionally thickened by 1%
    * (`S2EdgeIndex.cs:325-401`). */
  private def getCovering(a: S2Point, b: S2Point, thickenEdge: Boolean,
                          edgeCovering: mutable.ArrayBuffer[Long]): Int = {
    edgeCovering.clear()
    val edgeLength = a.angle(b)
    val idealLevel = S2Projections.MinWidth.getMaxLevel(edgeLength * (1 + 2 * Thickening))

    val containingCellId: Long =
      if (!thickenEdge) containingCell(a, b)
      else {
        if (idealLevel == S2CellId.MaxLevel) {
          S2CellId.parentForLevel(0xFFF0L, 3)
        } else {
          val pq = (b - a) * Thickening
          val ortho = S2Point.normalize(pq.cross(a)) * (edgeLength * Thickening)
          val p = a - pq
          val q = b + pq
          containingCell(p - ortho, p + ortho, q - ortho, q + ortho)
        }
      }

    if (containingCellId != S2CellId.Sentinel &&
        S2CellId.level(containingCellId) >= idealLevel - 2) {
      edgeCovering += containingCellId
      return S2CellId.level(containingCellId)
    }

    if (idealLevel == 0) {
      var cellid = S2CellId.begin(0)
      while (cellid != S2CellId.end(0)) {
        edgeCovering += cellid
        cellid = S2CellId.next(cellid)
      }
      return 0
    }

    val middle = S2Point.normalize((a + b) / 2)
    val actualLevel = math.min(idealLevel, S2CellId.MaxLevel - 1)
    edgeCovering ++= S2CellId.vertexNeighbors(S2CellId.fromPoint(middle), actualLevel)
    actualLevel
  }

  /** Inclusive (start, end) index range of entries for [cell1, cell2]. */
  private def getEdgesRange(cell1: Long, cell2: Long): (Int, Int) = {
    var c1 = cell1
    var c2 = cell2
    if (java.lang.Long.compareUnsigned(c1, c2) > 0) { val t = c1; c1 = c2; c2 = t }
    (-1 - binarySearch(c1, Int.MinValue), -1 - binarySearch(c2, Int.MaxValue))
  }

  private def binarySearch(cell: Long, edge: Int): Int = {
    var low = 0
    var high = cells.length - 1
    while (low <= high) {
      val mid = (low + high) >> 1
      val cmp = compare(cells(mid), edges(mid), cell, edge)
      if (cmp < 0) low = mid + 1
      else if (cmp > 0) high = mid - 1
      else return mid
    }
    -(low + 1)
  }

  private def getEdgesInParentCells(cover: Iterable[Long],
                                    candidateCrossings: mutable.HashSet[Int]): Unit = {
    val parentCells = mutable.HashSet.empty[Long]
    for (coverCell <- cover) {
      var parentLevel = S2CellId.level(coverCell) - 1
      var break = false
      while (parentLevel >= minimumS2LevelUsed && !break) {
        if (!parentCells.add(S2CellId.parentForLevel(coverCell, parentLevel))) break = true
        parentLevel -= 1
      }
    }
    for (parentCell <- parentCells) {
      val (lo, hi) = getEdgesRange(parentCell, parentCell)
      var i = lo
      while (i < hi) { candidateCrossings += edges(i); i += 1 }
    }
  }

  private def getEdgesInChildrenCells(a: S2Point, b: S2Point,
                                      cover: mutable.ArrayBuffer[Long],
                                      candidateCrossings: mutable.HashSet[Int]): Unit = {
    while (cover.nonEmpty) {
      val cell = cover.remove(cover.length - 1)
      val (lo0, hi0) = getEdgesRange(S2CellId.rangeMin(cell), S2CellId.rangeMax(cell))
      if (hi0 - lo0 <= 16) {
        var i = lo0
        while (i < hi0) { candidateCrossings += edges(i); i += 1 }
      } else {
        val (lo1, hi1) = getEdgesRange(cell, cell)
        var i = lo1
        while (i < hi1) { candidateCrossings += edges(i); i += 1 }
        for (child <- S2Cell(cell).subdivide()) {
          if (edgeIntersectsCellBoundary(a, b, child)) cover += child.id
        }
      }
    }
  }
}

object S2EdgeIndex {
  private val Thickening = 0.01
  private val MaxDetError = 1e-14

  private def compare(cell1: Long, edge1: Int, cell2: Long, edge2: Int): Int = {
    val c = java.lang.Long.compareUnsigned(cell1, cell2)
    if (c != 0) c
    else java.lang.Integer.compare(edge1, edge2)
  }

  /** Smallest common ancestor of 4 leaf cells, or Sentinel across faces. */
  private[s2] def containingCell(pa: S2Point, pb: S2Point, pc: S2Point, pd: S2Point): Long = {
    var a = S2CellId.fromPoint(pa)
    var b = S2CellId.fromPoint(pb)
    var c = S2CellId.fromPoint(pc)
    var d = S2CellId.fromPoint(pd)
    if (S2CellId.face(a) != S2CellId.face(b) || S2CellId.face(a) != S2CellId.face(c) ||
        S2CellId.face(a) != S2CellId.face(d)) return S2CellId.Sentinel
    while (a != b || a != c || a != d) {
      a = S2CellId.parent(a); b = S2CellId.parent(b)
      c = S2CellId.parent(c); d = S2CellId.parent(d)
    }
    a
  }

  private[s2] def containingCell(pa: S2Point, pb: S2Point): Long = {
    var a = S2CellId.fromPoint(pa)
    var b = S2CellId.fromPoint(pb)
    if (S2CellId.face(a) != S2CellId.face(b)) return S2CellId.Sentinel
    while (a != b) { a = S2CellId.parent(a); b = S2CellId.parent(b) }
    a
  }

  /** Conservative crossing test clipping tiny determinants to "maybe"
    * (`S2EdgeIndex.cs:493-516`). */
  private[s2] def lenientCrossing(a: S2Point, b: S2Point, c: S2Point, d: S2Point): Boolean = {
    val acb = a.cross(c).dot(b)
    val bda = b.cross(d).dot(a)
    if (math.abs(acb) < MaxDetError || math.abs(bda) < MaxDetError) return true
    if (acb * bda < 0) return false
    val cbd = c.cross(b).dot(d)
    val dac = c.cross(a).dot(c)
    if (math.abs(cbd) < MaxDetError || math.abs(dac) < MaxDetError) return true
    (acb * cbd >= 0) && (acb * dac >= 0)
  }

  private[s2] def edgeIntersectsCellBoundary(a: S2Point, b: S2Point, cell: S2Cell): Boolean = {
    val vertices = Array.tabulate(4)(cell.getVertex)
    var i = 0
    while (i < 4) {
      if (lenientCrossing(a, b, vertices(i), vertices((i + 1) % 4))) return true
      i += 1
    }
    false
  }
}

/** Edge index over a loop's vertex chain (the reference's anonymous loop
  * index, `S2Loop.cs` AnonS2EdgeIndex). */
final class S2LoopEdgeIndex(loop: S2Loop) extends S2EdgeIndex {
  protected def numEdges: Int = loop.numVertices
  protected def edgeFrom(index: Int): S2Point = loop.vertex(index)
  protected def edgeTo(index: Int): S2Point = loop.vertex(index + 1)
}
