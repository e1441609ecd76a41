package graft.s2

import scala.collection.mutable

/** Polygon boolean operations: intersection, union, n-way union
  * (`OpenSky.S2Geometry/S2Polygon.cs:604-900`).
  *
  * The approach clips each polygon's boundary to the interior (or exterior)
  * of the other and reassembles the surviving directed edges with the
  * polygon builder; intersection points come from the robust edge
  * intersection with the default 1.5e-15 rad tolerance
  * (`S2EdgeUtil.cs:26`). */
object S2PolygonOps {

  /** A point on edge (a0, a1) at parameter t in [0, 1]. */
  private final case class ParametrizedPoint(t: Double, point: S2Point)

  private implicit val ppOrdering: Ordering[ParametrizedPoint] =
    (x: ParametrizedPoint, y: ParametrizedPoint) => {
      val c = java.lang.Double.compare(x.t, y.t)
      if (c != 0) c
      else if (x.point == y.point) 0
      else if (x.point.lessThan(y.point)) -1
      else 1
    }

  /** Edge index over a polygon's directed boundary; holes (or everything,
    * when reversed) iterate backwards (`S2Polygon.cs:1292-1335`). */
  private final class PolygonEdgeIndex(poly: S2Polygon, reverse: Boolean) extends S2EdgeIndex {
    private val loopToFirstIndex = new Array[Int](poly.numLoops)
    private val indexToLoop: Array[Int] = {
      var total = 0
      val buf = mutable.ArrayBuffer.empty[Int]
      for (j <- 0 until poly.numLoops) {
        loopToFirstIndex(j) = total
        for (_ <- 0 until poly.loop(j).numVertices) { buf += j; total += 1 }
      }
      buf.toArray
    }

    protected def numEdges: Int = indexToLoop.length

    def edgeFromTo(index: Int): (S2Point, S2Point) = {
      val loopIndex = indexToLoop(index)
      val vertexInLoop = index - loopToFirstIndex(loopIndex)
      val loop = poly.loop(loopIndex)
      val (fromIndex, toIndex) =
        if (loop.isHole ^ reverse)
          (loop.numVertices - 1 - vertexInLoop, 2 * loop.numVertices - 2 - vertexInLoop)
        else
          (vertexInLoop, vertexInLoop + 1)
      (loop.vertex(fromIndex), loop.vertex(toIndex))
    }

    protected def edgeFrom(index: Int): S2Point = edgeFromTo(index)._1
    protected def edgeTo(index: Int): S2Point = edgeFromTo(index)._2
  }

  /** Record the intersection of (a0,a1) with (b0,b1) given its crossing
    * status (`S2Polygon.cs:616-648`). */
  private def addIntersection(a0: S2Point, a1: S2Point, b0: S2Point, b1: S2Point,
                              addSharedEdges: Boolean, crossing: Int,
                              intersections: mutable.Buffer[ParametrizedPoint]): Unit = {
    if (crossing > 0) {
      val x = S2EdgeUtil.getIntersection(a0, a1, b0, b1)
      val t = S2EdgeUtil.getDistanceFraction(x, a0, a1)
      intersections += ParametrizedPoint(t, x)
    } else if (S2EdgeUtil.vertexCrossing(a0, a1, b0, b1)) {
      var t = if (a0 == b0 || a0 == b1) 0.0 else 1.0
      if (!addSharedEdges && a1 == b1) t = 1.0
      intersections += ParametrizedPoint(t, if (t == 0) a0 else a1)
    }
  }

  /** All crossings of edge (a0,a1) with polygon B's boundary
    * (`S2Polygon.cs:655-681`). */
  private def clipEdge(a0: S2Point, a1: S2Point, bIndex: PolygonEdgeIndex,
                       addSharedEdges: Boolean,
                       intersections: mutable.Buffer[ParametrizedPoint]): Unit = {
    val crosser = new EdgeCrosser(a0, a1, a0)
    var previousTo: S2Point = null
    for (index <- bIndex.candidates(a0, a1)) {
      val (from, to) = bIndex.edgeFromTo(index)
      if (previousTo != from) crosser.restartAt(from)
      previousTo = to
      val crossing = crosser.robustCrossing(to)
      if (crossing >= 0)
        addIntersection(a0, a1, from, to, addSharedEdges, crossing, intersections)
    }
  }

  /** Clip A's boundary to the interior (or exterior when invertB) of B and
    * feed the surviving directed sub-edges to the builder
    * (`S2Polygon.cs:694-737`). */
  private def clipBoundary(a: S2Polygon, reverseA: Boolean,
                           b: S2Polygon, reverseB: Boolean,
                           invertB: Boolean, addSharedEdges: Boolean,
                           builder: S2PolygonBuilder): Unit = {
    val bIndex = new PolygonEdgeIndex(b, reverseB)
    bIndex.predictAdditionalCalls(a.numVertices)

    val intersections = mutable.ArrayBuffer.empty[ParametrizedPoint]
    for (li <- 0 until a.numLoops) {
      val aLoop = a.loop(li)
      var n = aLoop.numVertices
      val dir = if (aLoop.isHole ^ reverseA) -1 else 1
      var inside = b.contains(aLoop.vertex(0)) ^ invertB
      var j = if (dir > 0) 0 else n
      while (n > 0) {
        val a0 = aLoop.vertex(j)
        val a1 = aLoop.vertex(j + dir)
        intersections.clear()
        clipEdge(a0, a1, bIndex, addSharedEdges, intersections)

        if (inside) intersections += ParametrizedPoint(0.0, a0)
        inside = (intersections.length & 1) == 1
        if (inside) intersections += ParametrizedPoint(1.0, a1)

        val sorted = intersections.sorted
        var i = 1
        while (i < sorted.length) {
          builder.addEdge(sorted(i - 1).point, sorted(i).point)
          i += 2
        }
        n -= 1
        j += dir
      }
    }
  }

  /** A intersect B (`S2Polygon.cs:764-788`). */
  def intersection(a: S2Polygon, b: S2Polygon,
                   vertexMergeRadius: Double = S2EdgeUtil.DefaultIntersectionTolerance): S2Polygon = {
    if (!a.rectBound.intersects(b.rectBound)) return new S2Polygon(Nil)
    val builder = new S2PolygonBuilder(
      S2PolygonBuilderOptions.DirectedXor.copy(mergeDistance = vertexMergeRadius))
    clipBoundary(a, reverseA = false, b, reverseB = false, invertB = false, addSharedEdges = true, builder)
    clipBoundary(b, reverseA = false, a, reverseB = false, invertB = false, addSharedEdges = false, builder)
    builder.assemblePolygon()._1
  }

  /** A union B (`S2Polygon.cs:790-812`). */
  def union(a: S2Polygon, b: S2Polygon,
            vertexMergeRadius: Double = S2EdgeUtil.DefaultIntersectionTolerance): S2Polygon = {
    val builder = new S2PolygonBuilder(
      S2PolygonBuilderOptions.DirectedXor.copy(mergeDistance = vertexMergeRadius))
    clipBoundary(a, reverseA = false, b, reverseB = false, invertB = true, addSharedEdges = true, builder)
    clipBoundary(b, reverseA = false, a, reverseB = false, invertB = true, addSharedEdges = false, builder)
    builder.assemblePolygon()._1
  }

  /** N-way union, smallest polygons first (`S2Polygon.cs:819-894`); the
    * distributed analogue is a treeReduce over per-partition unions. */
  def destructiveUnion(polygons: Seq[S2Polygon],
                       vertexMergeRadius: Double = S2EdgeUtil.DefaultIntersectionTolerance): S2Polygon = {
    val queue = mutable.PriorityQueue.empty[(Int, S2Polygon)](
      Ordering.by[(Int, S2Polygon), Int](_._1).reverse)
    polygons.foreach(p => queue.enqueue((p.numVertices, p)))
    if (queue.isEmpty) return new S2Polygon(Nil)
    while (queue.size >= 2) {
      val (aSize, aPoly) = queue.dequeue()
      val (bSize, bPoly) = queue.dequeue()
      queue.enqueue((aSize + bSize, union(aPoly, bPoly, vertexMergeRadius)))
    }
    queue.dequeue()._2
  }
}
