package graft.s2

import scala.collection.mutable

/** Region -> cell-union approximation: best-first priority-queue subdivision
  * (`OpenSky.S2Geometry/S2RegionCoverer.cs`).
  *
  * Engine role: this is a driver-side *planning* step — coverings are tiny
  * (<= maxCells) and are computed once per query region, then broadcast as the
  * build side of the covering join.
  */
final class S2RegionCoverer {
  import S2RegionCoverer._

  private var _minLevel = 0
  private var _maxLevel = S2CellId.MaxLevel
  private var _levelMod = 1
  private var _maxCells = DefaultMaxCells

  private var region: S2Region = _
  private var interiorCovering = false
  private val result = mutable.ArrayBuffer.empty[Long]
  // Max-heap on priority: less-negative priorities (larger cells, fewer
  // children) pop first (`S2RegionCoverer.cs:384-392,580-595`).
  private val candidateQueue =
    mutable.PriorityQueue.empty[QueueEntry](Ordering.by(_.priority))

  def minLevel: Int = _minLevel
  def maxLevel: Int = _maxLevel
  def levelMod: Int = _levelMod
  def maxCells: Int = _maxCells

  def setMinLevel(v: Int): this.type = { _minLevel = math.max(0, math.min(S2CellId.MaxLevel, v)); this }
  def setMaxLevel(v: Int): this.type = { _maxLevel = math.max(0, math.min(S2CellId.MaxLevel, v)); this }
  def setLevelMod(v: Int): this.type = { _levelMod = math.max(1, math.min(3, v)); this }
  def setMaxCells(v: Int): this.type = { _maxCells = v; this }

  private def maxChildrenShift: Int = 2 * _levelMod

  /** Covering satisfying all constraints incl. minLevel/levelMod
    * (`S2RegionCoverer.cs:214-226`). */
  def getCovering(region: S2Region): IndexedSeq[Long] =
    getCoveringUnion(region).denormalize(_minLevel, _levelMod)

  def getInteriorCovering(region: S2Region): IndexedSeq[Long] =
    getInteriorCoveringUnion(region).denormalize(_minLevel, _levelMod)

  /** Normalized covering (constraints except minLevel/levelMod). */
  def getCoveringUnion(region: S2Region): S2CellUnion = {
    interiorCovering = false
    getCoveringInternal(region)
    val u = S2CellUnion.normalized(result)
    result.clear()
    u
  }

  def getInteriorCoveringUnion(region: S2Region): S2CellUnion = {
    interiorCovering = true
    getCoveringInternal(region)
    val u = S2CellUnion.normalized(result)
    result.clear()
    u
  }

  /** Candidate iff the cell may intersect; terminal when contained or at
    * maxLevel (`S2RegionCoverer.cs:301-339`). */
  private def newCandidate(cell: S2Cell): Candidate = {
    if (!region.mayIntersectCell(cell)) return null
    var isTerminal = false
    if (cell.level >= _minLevel) {
      if (interiorCovering) {
        if (region.containsCell(cell)) isTerminal = true
        else if (cell.level + _levelMod > _maxLevel) return null
      } else {
        if (cell.level + _levelMod > _maxLevel || region.containsCell(cell)) isTerminal = true
      }
    }
    new Candidate(cell, isTerminal, maxChildrenShift)
  }

  private def addCandidate(candidate: Candidate): Unit = {
    if (candidate == null) return
    if (candidate.isTerminal) {
      result += candidate.cell.id
      return
    }
    val numLevels = if (candidate.cell.level < _minLevel) 1 else _levelMod
    val numTerminals = expandChildren(candidate, candidate.cell, numLevels)

    if (candidate.numChildren == 0) {
      // no children intersect: drop
    } else if (!interiorCovering && numTerminals == (1 << maxChildrenShift) &&
               candidate.cell.level >= _minLevel) {
      // All children terminal: add the parent instead (`:372-381`).
      candidate.isTerminal = true
      addCandidate(candidate)
    } else {
      val priority = -((((candidate.cell.level << maxChildrenShift) + candidate.numChildren)
        << maxChildrenShift) + numTerminals)
      candidateQueue.enqueue(QueueEntry(priority, candidate))
    }
  }

  private def expandChildren(candidate: Candidate, cell: S2Cell, numLevels0: Int): Int = {
    val numLevels = numLevels0 - 1
    val childCells = cell.subdivide()
    var numTerminals = 0
    var i = 0
    while (i < 4) {
      if (numLevels > 0) {
        if (region.mayIntersectCell(childCells(i)))
          numTerminals += expandChildren(candidate, childCells(i), numLevels)
      } else {
        val child = newCandidate(childCells(i))
        if (child != null) {
          candidate.children(candidate.numChildren) = child
          candidate.numChildren += 1
          if (child.isTerminal) numTerminals += 1
        }
      }
      i += 1
    }
    numTerminals
  }

  /** Seed with <=4 vertex-neighbor cells of the bounding cap's center at a
    * level sized from the cap angle, else the 6 faces
    * (`S2RegionCoverer.cs:439-477`). */
  private def getInitialCandidates(): Unit = {
    if (_maxCells >= 4) {
      val cap = region.capBound
      var level = math.min(
        S2Projections.MinWidth.getMaxLevel(2 * cap.angle),
        math.min(_maxLevel, S2CellId.MaxLevel - 1))
      if (_levelMod > 1 && level > _minLevel)
        level -= (level - _minLevel) % _levelMod
      if (level > 0) {
        val id = S2CellId.fromPoint(cap.axis)
        for (base <- S2CellId.vertexNeighbors(id, level))
          addCandidate(newCandidate(S2Cell(base)))
        return
      }
    }
    var face = 0
    while (face < 6) {
      addCandidate(newCandidate(FaceCells(face)))
      face += 1
    }
  }

  private def getCoveringInternal(r: S2Region): Unit = {
    require(candidateQueue.isEmpty && result.isEmpty)
    region = r
    getInitialCandidates()
    while (candidateQueue.nonEmpty && (!interiorCovering || result.length < _maxCells)) {
      val candidate = candidateQueue.dequeue().candidate
      if (candidate.cell.level < _minLevel || candidate.numChildren == 1 ||
          result.length + (if (interiorCovering) 0 else candidateQueue.length) +
            candidate.numChildren <= _maxCells) {
        var i = 0
        while (i < candidate.numChildren) {
          addCandidate(candidate.children(i))
          i += 1
        }
      } else if (!interiorCovering) {
        candidate.isTerminal = true
        addCandidate(candidate)
      }
    }
    candidateQueue.clear()
    region = null
  }
}

object S2RegionCoverer {
  val DefaultMaxCells = 8

  private val FaceCells: Array[S2Cell] =
    Array.tabulate(6)(face => S2Cell(S2CellId.fromFacePosLevel(face, 0, 0)))

  private final class Candidate(val cell: S2Cell, var isTerminal: Boolean, maxChildrenShift: Int) {
    var children: Array[Candidate] =
      if (isTerminal) null else new Array[Candidate](1 << maxChildrenShift)
    var numChildren: Int = 0
  }

  private final case class QueueEntry(priority: Int, candidate: Candidate)

  /** Fixed-level BFS flood fill from a seed point (`S2RegionCoverer.cs:289-293`). */
  def getSimpleCovering(region: S2Region, start: S2Point, level: Int): IndexedSeq[Long] =
    floodFill(region, S2CellId.parentForLevel(S2CellId.fromPoint(start), level))

  /** All edge-connected cells at start's level intersecting the region
    * (`S2RegionCoverer.cs:540-569`). */
  def floodFill(region: S2Region, start: Long): IndexedSeq[Long] = {
    val all = mutable.HashSet.empty[Long]
    val frontier = mutable.ArrayBuffer.empty[Long]
    val output = mutable.ArrayBuffer.empty[Long]
    all += start
    frontier += start
    while (frontier.nonEmpty) {
      val id = frontier.remove(frontier.length - 1)
      if (region.mayIntersectCell(S2Cell(id))) {
        output += id
        for (nbr <- S2CellId.edgeNeighbors(id)) {
          if (!all.contains(nbr)) {
            frontier += nbr
            all += nbr
          }
        }
      }
    }
    output.toIndexedSeq
  }
}
