package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.{S2LatLng, S2Loop, S2Point}

/** The polygon region-region join: the engine's bucketed composition equals
  * kernel brute force, and the oracle's first-principles convex
  * intersection logic (vertex-in OR edge-crossing) agrees with the kernel
  * for every pair of the 50-region fixture. */
class LoopIntersectSpec extends SparkTestBase {

  private val All: Seq[(Long, Seq[(Double, Double)])] =
    SparkEntry.HexPolys.map(t => (t._1, t._2)) ++
      SparkEntry.HexPolysVar.map(t => (t._1 + 100L, t._2))

  private def loopOf(verts: Seq[(Double, Double)]): S2Loop =
    new S2Loop(verts.map { case (la, lo) =>
      S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq)

  private lazy val pts: Map[Long, IndexedSeq[S2Point]] = All.map { case (id, vs) =>
    id -> vs.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq
  }.toMap

  /** Scala mirror of the oracle SQL's convex-intersection predicate (same
    * doubles, same formulas). */
  private def sqlPredicate(a: Long, b: Long): Boolean = {
    def edges(id: Long): IndexedSeq[(S2Point, S2Point, S2Point)] = {
      val v = pts(id)
      v.indices.map(i => (v(i), v((i + 1) % v.size), v(i).cross(v((i + 1) % v.size))))
    }
    def vertexIn(vid: Long, eid: Long): Boolean =
      pts(vid).exists(p => edges(eid).forall { case (_, _, n) => n.dot(p) > 0 })
    def crossing: Boolean = edges(a).exists { case (ea0, ea1, na) =>
      edges(b).exists { case (eb0, eb1, nb) =>
        val acb = -na.dot(eb0); val cbd = -nb.dot(ea1)
        val bda = na.dot(eb1); val dac = nb.dot(ea0)
        acb * cbd > 0 && cbd * bda > 0 && bda * dac > 0
      }
    }
    vertexIn(a, b) || vertexIn(b, a) || crossing
  }

  test("oracle's convex intersection logic == kernel intersects for all 1225 pairs") {
    val loops = All.map { case (id, vs) => id -> loopOf(vs) }.toMap
    var hits = 0
    for {
      (ia, _) <- All
      (ib, _) <- All
      if ia < ib
    } {
      val kernel = loops(ia).intersects(loops(ib))
      val sql = sqlPredicate(ia, ib)
      assert(kernel == sql, s"pair ($ia, $ib): kernel=$kernel sql=$sql")
      if (kernel) hits += 1
    }
    info(s"intersecting pairs: $hits of ${All.size * (All.size - 1) / 2}")
    assert(hits > 0, "fixture degenerate: no intersecting pairs")
    assert(hits < All.size * (All.size - 1) / 2, "fixture degenerate: everything intersects")
  }

  test("no fixture vertex sits near-degenerate on a foreign edge plane") {
    var minAbs = Double.MaxValue
    for ((ia, _) <- All; (ib, _) <- All; if ia != ib) {
      val v = pts(ib)
      val edgeNs = v.indices.map(i => v(i).cross(v((i + 1) % v.size)))
      for (p <- pts(ia); n <- edgeNs) {
        val d = math.abs(n.dot(p))
        if (d < minAbs) minAbs = d
      }
    }
    info(f"min |vertex . edge-normal| across fixtures = $minAbs%.3e")
    assert(minAbs > 1e-12)
  }

  test("loopIntersectJoin equals kernel brute force over the 50-region catalog") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val table = SparkEntry.hexPolyTable(spark, dir).unionByName(
      SparkEntry.hexPolyVarTable(spark, dir).withColumn("region_id", col("region_id") + 100L))
    val got = SpatialJoin.loopIntersectJoin(table, "region_id", "lats", "lons", level = 5)
      .as[(Long, Long)].collect().toSet
    val loops = All.map { case (id, vs) => id -> loopOf(vs) }
    val want = (for {
      (ia, la) <- loops
      (ib, lb) <- loops
      if ia < ib && la.intersects(lb)
    } yield (ia, ib)).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"join diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
