package graft.s2

import scala.collection.mutable

/** Builder options (`OpenSky.S2Geometry/S2PolygonBuilder.cs:683-780`).
  *
  * @param undirectedEdges edges have no preferred direction; loops come out CCW
  * @param xorEdges an edge and its reverse (or duplicate) cancel on insert
  */
final case class S2PolygonBuilderOptions(undirectedEdges: Boolean,
                                         xorEdges: Boolean,
                                         validate: Boolean = false,
                                         mergeDistance: Double = 0.0)

object S2PolygonBuilderOptions {
  val DirectedXor: S2PolygonBuilderOptions = S2PolygonBuilderOptions(undirectedEdges = false, xorEdges = true)
  val UndirectedXor: S2PolygonBuilderOptions = S2PolygonBuilderOptions(undirectedEdges = true, xorEdges = true)
  val UndirectedUnion: S2PolygonBuilderOptions = S2PolygonBuilderOptions(undirectedEdges = true, xorEdges = false)
  val DirectedUnion: S2PolygonBuilderOptions = S2PolygonBuilderOptions(undirectedEdges = false, xorEdges = false)
}

/** Assembles polygons from an edge soup: greedy leftmost-turn loop tracing
  * with backtracking, optional XOR of opposite edges, and merge-radius vertex
  * snapping via a cell-keyed point index
  * (`OpenSky.S2Geometry/S2PolygonBuilder.cs:38-680`).
  *
  * Engine role: the driver-side assembly step for region prep and the
  * polygon boolean operations; the distributed analogue of `MergeVertices`
  * is a groupBy-cell + union-find pass (SURVEY.md section 2.7).
  */
final class S2PolygonBuilder(val options: S2PolygonBuilderOptions = S2PolygonBuilderOptions.DirectedXor) {

  // origin vertex -> multiset of destination vertices
  private val edges = mutable.LinkedHashMap.empty[S2Point, mutable.Map[S2Point, Int]]

  private def bagAdd(bag: mutable.Map[S2Point, Int], v: S2Point): Unit =
    bag.updateWith(v) { case Some(n) => Some(n + 1); case None => Some(1) }

  private def bagRemove(bag: mutable.Map[S2Point, Int], v: S2Point): Unit =
    bag.updateWith(v) { case Some(1) => None; case Some(n) => Some(n - 1); case None => None }

  /** Add one edge; self-edges ignored; reverse edges cancel under XOR
    * (`S2PolygonBuilder.cs:74-109`). */
  def addEdge(v0: S2Point, v1: S2Point): Unit = {
    if (v0 == v1) return
    if (options.xorEdges) {
      val candidates = edges.get(v1)
      if (candidates.exists(_.contains(v0))) {
        eraseEdge(v1, v0)
        return
      }
    }
    bagAdd(edges.getOrElseUpdate(v0, mutable.HashMap.empty), v1)
    if (options.undirectedEdges)
      bagAdd(edges.getOrElseUpdate(v1, mutable.HashMap.empty), v0)
  }

  /** Add a loop's edges; holes (negative sign) are added reversed
    * (`S2PolygonBuilder.cs:120-128`). */
  def addLoop(loop: S2Loop): Unit = {
    val sign = loop.sign
    var i = loop.numVertices
    while (i > 0) {
      addEdge(loop.vertex(i), loop.vertex(i + sign))
      i -= 1
    }
  }

  def addPolygon(polygon: S2Polygon): Unit =
    for (i <- 0 until polygon.numLoops) addLoop(polygon.loop(i))

  private def eraseEdge(v0: S2Point, v1: S2Point): Unit = {
    val vset = edges(v0)
    bagRemove(vset, v1)
    if (vset.isEmpty) edges.remove(v0)
    if (options.undirectedEdges) {
      val vset1 = edges(v1)
      bagRemove(vset1, v0)
      if (vset1.isEmpty) edges.remove(v1)
    }
  }

  private def eraseLoopVertices(v: IndexedSeq[S2Point]): Unit = {
    val n = v.length
    var i = n - 1
    var j = 0
    while (j < n) { eraseEdge(v(i), v(j)); i = j; j += 1 }
  }

  private def eraseLoop(l: S2Loop): Unit =
    eraseLoopVertices((0 until l.numVertices).map(l.vertex))

  private def rejectLoopVertices(v: IndexedSeq[S2Point],
                                 unusedEdges: mutable.Buffer[(S2Point, S2Point)]): Unit = {
    val n = v.length
    var i = n - 1
    var j = 0
    while (j < n) { unusedEdges += ((v(i), v(j))); i = j; j += 1 }
  }

  /** Greedy leftmost-turn loop tracing from edge (v0, v1), backtracking at
    * dead ends (`S2PolygonBuilder.cs:338-409`). */
  private def assembleLoop(v0Start: S2Point, v1Start: S2Point,
                           unusedEdges: mutable.Buffer[(S2Point, S2Point)]): Option[S2Loop] = {
    var path = mutable.ArrayBuffer(v0Start, v1Start)
    val index = mutable.HashMap(v1Start -> 1)

    while (path.length >= 2) {
      val v0 = path(path.length - 2)
      val v1 = path(path.length - 1)
      var v2: S2Point = null
      edges.get(v1) match {
        case Some(vset) =>
          for (v <- vset.keys) {
            if (v != v0) {
              if (v2 == null || S2Predicates.orderedCcw(v0, v2, v, v1)) v2 = v
            }
          }
        case None =>
      }
      if (v2 == null) {
        // Dead end: drop this edge and backtrack.
        unusedEdges += ((v0, v1))
        eraseEdge(v0, v1)
        index.remove(v1)
        path.remove(path.length - 1)
      } else index.get(v2) match {
        case None =>
          index.put(v2, path.length)
          path += v2
        case Some(start) =>
          // Loop closed: discard the lead-in prefix.
          val loopPath = path.slice(start, path.length).toIndexedSeq
          if (options.validate && !new S2Loop(loopPath).isValid) {
            rejectLoopVertices(loopPath, unusedEdges)
            eraseLoopVertices(loopPath)
            return None
          }
          return Some(new S2Loop(loopPath))
      }
    }
    None
  }

  /** Assemble all edges into non-crossing loops; returns (loops, unused
    * edges); empties the builder (`S2PolygonBuilder.cs:159-205`). */
  def assembleLoops(): (Seq[S2Loop], Seq[(S2Point, S2Point)]) = {
    if (options.mergeDistance > 0) mergeVertices()
    val loops = mutable.ArrayBuffer.empty[S2Loop]
    val unusedEdges = mutable.ArrayBuffer.empty[(S2Point, S2Point)]
    while (edges.nonEmpty) {
      val (v0, vset) = edges.head
      val v1 = vset.keys.head
      assembleLoop(v0, v1, unusedEdges) match {
        case Some(loop0) =>
          var loop = loop0
          // Undirected edges may trace a CW loop first; retrace reversed
          // until normalized (`S2PolygonBuilder.cs:197-200`).
          while (options.undirectedEdges && !loop.isNormalized) {
            loop = assembleLoop(loop.vertex(1), loop.vertex(0), unusedEdges).get
          }
          loops += loop
          eraseLoop(loop)
        case None =>
      }
    }
    (loops.toSeq, unusedEdges.toSeq)
  }

  /** Assemble and normalize into a polygon; returns (polygon, unusedEdges)
    * (`S2PolygonBuilder.cs:224-251`). */
  def assemblePolygon(): (S2Polygon, Seq[(S2Point, S2Point)]) = {
    val (loops, unusedEdges0) = assembleLoops()
    val unusedEdges = mutable.ArrayBuffer.from(unusedEdges0)
    if (!options.undirectedEdges) loops.foreach(_.normalize())
    if (options.validate && !S2Polygon.isValidPolygon(loops)) {
      for (loop <- loops)
        rejectLoopVertices((0 until loop.numVertices).map(loop.vertex), unusedEdges)
      return (new S2Polygon(Nil), unusedEdges.toSeq)
    }
    (new S2Polygon(loops), unusedEdges.toSeq)
  }

  // ---------------------------------------------------------------------------
  // Vertex merging (`S2PolygonBuilder.cs:428-540,560-674`)
  // ---------------------------------------------------------------------------

  /** Snap vertex clusters within mergeDistance to a single representative via
    * a cell-keyed point index + BFS over the proximity graph. */
  private def mergeVertices(): Unit = {
    val index = new PointIndex(options.mergeDistance)
    for ((v0, vset) <- edges) {
      index.add(v0)
      for (v1 <- vset.keys) index.add(v1)
    }

    val mergeMap = mutable.HashMap.empty[S2Point, S2Point]
    val frontier = mutable.Stack.empty[S2Point]
    for (mp <- index.points if !mp.marked) {
      mp.marked = true
      val vstart = mp.point
      frontier.push(vstart)
      while (frontier.nonEmpty) {
        val v0 = frontier.pop()
        for (v1 <- index.query(v0)) {
          frontier.push(v1)
          mergeMap.put(v1, vstart)
        }
      }
    }
    moveVertices(mergeMap)
  }

  private def moveVertices(mergeMap: mutable.HashMap[S2Point, S2Point]): Unit = {
    if (mergeMap.isEmpty) return
    val edgesCopy = mutable.ArrayBuffer.empty[(S2Point, S2Point)]
    for ((v0, vset) <- edges; (v1, count) <- vset) {
      if (mergeMap.contains(v0) || mergeMap.contains(v1)) {
        if (!options.undirectedEdges || v0.lessThan(v1)) {
          var c = 0
          while (c < count) { edgesCopy += ((v0, v1)); c += 1 }
        }
      }
    }
    for ((e0, e1) <- edgesCopy) {
      eraseEdge(e0, e1)
      addEdge(mergeMap.getOrElse(e0, e0), mergeMap.getOrElse(e1, e1))
    }
  }

  /** Fixed-radius point index: cell-id buckets at the level where a disc of
    * the search radius fits in any cell (`S2PolygonBuilder.cs:560-674`). */
  private final class PointIndex(searchRadius: Double) {
    final class MarkedPoint(val point: S2Point) { var marked = false }

    private val level =
      math.min(S2Projections.MinWidth.getMaxLevel(2 * searchRadius), S2CellId.MaxLevel - 1)
    private val buckets = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[MarkedPoint]]

    def add(p: S2Point): Unit = {
      val id = S2CellId.parentForLevel(S2CellId.fromPoint(p), level)
      val bucket = buckets.getOrElseUpdate(id, mutable.ArrayBuffer.empty)
      if (!bucket.exists(_.point == p)) bucket += new MarkedPoint(p)
    }

    def points: Iterator[MarkedPoint] = buckets.valuesIterator.flatten

    /** Unmarked points within searchRadius of center; marks them. */
    def query(center: S2Point): Seq[S2Point] = {
      val out = mutable.ArrayBuffer.empty[S2Point]
      for (id <- S2CellId.vertexNeighbors(S2CellId.fromPoint(center), level);
           bucket <- buckets.get(id); mp <- bucket if !mp.marked) {
        if (center.angle(mp.point) <= searchRadius) {
          out += mp.point
          mp.marked = true
        }
      }
      out.toSeq
    }
  }
}
