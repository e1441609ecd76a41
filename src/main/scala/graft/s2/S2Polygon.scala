package graft.s2

import scala.collection.mutable

/** A polygon: a set of loops with nesting depths (shells even, holes odd).
  * Construction builds the shell/hole forest and preorders it
  * (`OpenSky.S2Geometry/S2Polygon.cs:37-43,273-325,975-1043`).
  *
  * A point is inside iff it is contained by an odd number of loops
  * (`S2Polygon.cs:944-964`).
  */
final class S2Polygon(inputLoops: Seq[S2Loop]) extends S2Region with Serializable {
  private val loops = mutable.ArrayBuffer.empty[S2Loop]
  private var _bound: S2LatLngRect = S2LatLngRect.Empty
  private var hasHoles: Boolean = false
  private var _numVertices: Int = 0

  init(inputLoops)

  def numLoops: Int = loops.length
  def loop(k: Int): S2Loop = loops(k)
  def numVertices: Int = _numVertices
  def rectBound: S2LatLngRect = _bound
  def capBound: S2Cap = _bound.capBound

  /** XOR of per-loop containment: odd number of enclosing loops => inside
    * (`S2Polygon.cs:944-964`). */
  def contains(p: S2Point): Boolean = {
    if (numLoops == 1) return loop(0).contains(p)
    if (!_bound.contains(p)) return false
    var inside = false
    var i = 0
    while (i < numLoops) {
      inside ^= loop(i).contains(p)
      if (inside && !hasHoles) return true // shells are disjoint
      i += 1
    }
    inside
  }

  def containsCell(cell: S2Cell): Boolean = {
    if (numLoops == 1) return loop(0).containsCell(cell)
    val cellBound = cell.rectBound
    if (!_bound.contains(cellBound)) return false
    val cellPoly = new S2Polygon(Seq(S2Loop.fromCell(cell, cellBound)))
    contains(cellPoly)
  }

  def mayIntersectCell(cell: S2Cell): Boolean = {
    if (numLoops == 1) return loop(0).mayIntersectCell(cell)
    val cellBound = cell.rectBound
    if (!_bound.intersects(cellBound)) return false
    val cellPoly = new S2Polygon(Seq(S2Loop.fromCell(cell, cellBound)))
    intersects(cellPoly)
  }

  /** Polygon x polygon containment (`S2Polygon.cs:512-563`). */
  def contains(b: S2Polygon): Boolean = {
    if (numLoops == 1 && b.numLoops == 1) return loop(0).contains(b.loop(0))
    if (!_bound.contains(b.rectBound)) {
      if (!_bound.lng.union(b.rectBound.lng).isFull) return false
    }
    if (!hasHoles && !b.hasHoles) {
      var j = 0
      while (j < b.numLoops) {
        if (!anyLoopContains(b.loop(j))) return false
        j += 1
      }
      return true
    }
    containsAllShells(b) && b.excludesAllHoles(this)
  }

  /** Polygon x polygon intersection (`S2Polygon.cs:570-602`). */
  def intersects(b: S2Polygon): Boolean = {
    if (numLoops == 1 && b.numLoops == 1) return loop(0).intersects(b.loop(0))
    if (!_bound.intersects(b.rectBound)) return false
    if (!hasHoles && !b.hasHoles) {
      var i = 0
      while (i < numLoops) {
        var j = 0
        while (j < b.numLoops) {
          if (loop(i).intersects(b.loop(j))) return true
          j += 1
        }
        i += 1
      }
      return false
    }
    intersectsAnyShell(b) || b.intersectsAnyShell(this)
  }

  /** Signed-sum of per-loop areas/centroids (`S2Polygon.cs:447-469`). */
  private def getAreaCentroid(doCentroid: Boolean): S2AreaCentroid = {
    var areaSum = 0.0
    var centroidSum = S2Point.Zero
    var i = 0
    while (i < numLoops) {
      val l = loop(i)
      val loopSign = l.sign
      if (doCentroid) {
        val ac = l.areaAndCentroid
        areaSum += loopSign * ac.area
        val c = ac.centroid.get
        centroidSum = S2Point(
          centroidSum.x + loopSign * c.x,
          centroidSum.y + loopSign * c.y,
          centroidSum.z + loopSign * c.z)
      } else {
        areaSum += loopSign * l.area
      }
      i += 1
    }
    S2AreaCentroid(areaSum, if (doCentroid) Some(centroidSum) else scala.None)
  }

  def areaAndCentroid: S2AreaCentroid = getAreaCentroid(doCentroid = true)
  def area: Double = getAreaCentroid(doCentroid = false).area
  def centroid: Option[S2Point] = getAreaCentroid(doCentroid = true).centroid

  /** Shortest angle from p to the polygon; 0 if contained
    * (`S2Polygon.cs:488-504`). */
  def getDistance(p: S2Point): Double = {
    if (contains(p)) return 0
    var minDistance = math.Pi
    var i = 0
    while (i < numLoops) {
      minDistance = math.min(minDistance, loop(i).getDistance(p))
      i += 1
    }
    minDistance
  }

  def boundaryApproxEquals(b: S2Polygon, maxError: Double = 1e-15): Boolean = {
    if (numLoops != b.numLoops) return false
    (0 until numLoops).forall { i =>
      val a = loop(i)
      (0 until b.numLoops).exists { j =>
        b.loop(j).depth == a.depth && b.loop(j).boundaryApproxEquals(a, maxError)
      }
    }
  }

  // ---------------------------------------------------------------------------

  /** Nesting-forest construction + preorder (`S2Polygon.cs:273-325`). */
  private def init(input: Seq[S2Loop]): Unit = {
    // key = parent loop (null = root); value = children in insertion order
    val loopMap = new java.util.IdentityHashMap[S2Loop, mutable.ArrayBuffer[S2Loop]]()
    val RootKey: S2Loop = null
    loopMap.put(RootKey, mutable.ArrayBuffer.empty)

    for (l <- input) {
      insertLoop(l, RootKey, loopMap)
      _numVertices += l.numVertices
    }

    // Sort each child list for a deterministic total order.
    val it = loopMap.values().iterator()
    while (it.hasNext) {
      val children = it.next()
      val sorted = children.sortWith((a, b) => a.compareTo(b) < 0)
      children.clear()
      children ++= sorted
    }

    initLoop(RootKey, -1, loopMap)

    hasHoles = false
    _bound = S2LatLngRect.Empty
    var i = 0
    while (i < numLoops) {
      if (loop(i).sign < 0) hasHoles = true
      else _bound = _bound.union(loop(i).rectBound)
      i += 1
    }
  }

  private def insertLoop(newLoop: S2Loop, parent: S2Loop,
                         loopMap: java.util.IdentityHashMap[S2Loop, mutable.ArrayBuffer[S2Loop]]): Unit = {
    var children = loopMap.get(parent)
    if (children == null) {
      children = mutable.ArrayBuffer.empty
      loopMap.put(parent, children)
    }
    for (child <- children) {
      if (child.containsNested(newLoop)) {
        insertLoop(newLoop, child, loopMap)
        return
      }
    }
    // Reparent any children the new loop encloses (`S2Polygon.cs:1000-1022`).
    var newChildren = loopMap.get(newLoop)
    var i = 0
    while (i < children.length) {
      val child = children(i)
      if (newLoop.containsNested(child)) {
        if (newChildren == null) {
          newChildren = mutable.ArrayBuffer.empty
          loopMap.put(newLoop, newChildren)
        }
        newChildren += child
        children.remove(i)
      } else i += 1
    }
    children += newLoop
  }

  private def initLoop(l: S2Loop, depth: Int,
                       loopMap: java.util.IdentityHashMap[S2Loop, mutable.ArrayBuffer[S2Loop]]): Unit = {
    if (l != null) {
      l.depth = depth
      loops += l
    }
    val children = loopMap.get(l)
    if (children != null) for (child <- children) initLoop(child, depth + 1, loopMap)
  }

  private def containsOrCrosses(b: S2Loop): Int = {
    var inside = false
    var i = 0
    while (i < numLoops) {
      val result = loop(i).containsOrCrosses(b)
      if (result < 0) return -1
      if (result > 0) inside ^= true
      i += 1
    }
    if (inside) 1 else 0
  }

  private def anyLoopContains(b: S2Loop): Boolean =
    (0 until numLoops).exists(i => loop(i).contains(b))

  private def containsAllShells(b: S2Polygon): Boolean =
    (0 until b.numLoops).forall { j =>
      b.loop(j).sign < 0 || containsOrCrosses(b.loop(j)) > 0
    }

  private def excludesAllHoles(b: S2Polygon): Boolean =
    (0 until b.numLoops).forall { j =>
      b.loop(j).sign > 0 || containsOrCrosses(b.loop(j)) == 0
    }

  private def intersectsAnyShell(b: S2Polygon): Boolean =
    (0 until b.numLoops).exists { j =>
      b.loop(j).sign >= 0 && containsOrCrosses(b.loop(j)) != 0
    }

  override def toString: String = s"S2Polygon($numLoops loops, ${_numVertices} vertices)"
}

object S2Polygon {
  def apply(loops: S2Loop*): S2Polygon = new S2Polygon(loops)

  /** Valid iff no duplicate (undirected) edges across loops, every loop is
    * normalized, and no two loops cross (`S2Polygon.cs:348-400`); assumes
    * each loop already validated. */
  def isValidPolygon(loops: Seq[S2Loop]): Boolean = {
    if (loops.length > 1) {
      val edges = new java.util.HashSet[(S2Point, S2Point)]()
      for (lp <- loops; j <- 0 until lp.numVertices) {
        val a = lp.vertex(j)
        val b = lp.vertex(j + 1)
        val key = if (a.lessThan(b)) (a, b) else (b, a)
        if (!edges.add(key)) return false
      }
    }
    for (i <- loops.indices) {
      if (!loops(i).isNormalized) return false
      for (j <- i + 1 until loops.length) {
        if (loops(i).containsOrCrosses(loops(j)) < 0) return false
      }
    }
    true
  }
}
