package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.{S2EdgeUtil, S2LatLng, S2Point}

/** Polyline crossing join: the covering-bucketed composition equals kernel
  * brute force over all 300 fixture pairs, and the oracle's sign decisions
  * are fp-stable (no edge-pair triple product near zero). */
class PolylineCrossJoinSpec extends SparkTestBase {

  private lazy val chains: Seq[(Long, IndexedSeq[S2Point])] =
    SparkEntry.FixtureRoutes.map { case (k, vs) =>
      k -> vs.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }.toIndexedSeq
    }

  private def crosses(a: IndexedSeq[S2Point], b: IndexedSeq[S2Point]): Boolean =
    (0 until a.size - 1).exists(i => (0 until b.size - 1).exists(j =>
      S2EdgeUtil.robustCrossing(a(i), a(i + 1), b(j), b(j + 1)) > 0))

  test("polylineCrossJoin equals kernel brute force over all pairs (sf0.001)") {
    import spark.implicits._
    val want = (for {
      (ka, ca) <- chains; (kb, cb) <- chains
      if ka < kb && crosses(ca, cb)
    } yield (ka, kb)).toSet
    assert(want.nonEmpty, "fixture degenerate: no crossing pairs")
    assert(want.size < chains.size * (chains.size - 1) / 2, "fixture degenerate: all pairs cross")
    val got = SpatialJoin.polylineCrossJoin(
        SparkEntry.routeTable(spark, sf("sf0.001")), "line_id", "lats", "lons", level = 5)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got == want,
      s"diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("oracle sign decisions are fp-stable: no triple product near zero") {
    var minSig = Double.MaxValue
    for {
      (ka, ca) <- chains; (kb, cb) <- chains if ka < kb
      i <- 0 until ca.size - 1; j <- 0 until cb.size - 1
    } {
      val (a, b, c, d) = (ca(i), ca(i + 1), cb(j), cb(j + 1))
      val ab = a.cross(b)
      val cd = c.cross(d)
      for (v <- Seq(-ab.dot(c), ab.dot(d), -cd.dot(b), cd.dot(a)))
        minSig = math.min(minSig, math.abs(v))
    }
    info(f"min |edge-pair triple product| = $minSig%.3e")
    assert(minSig > 1e-9, "an edge-pair sign decision sits at fp noise; oracle not trustworthy")
  }

  test("coverings are complete: every crossing pair shares a level-5 covering cell") {
    // the candidate-generation argument, checked directly against the kernel
    import graft.s2.{S2Polyline, S2RegionCoverer}
    val covs = chains.map { case (k, pts) =>
      val line = new S2Polyline(pts)
      k -> S2RegionCoverer.getSimpleCovering(line, line.vertex(0), 5).toSet
    }.toMap
    for {
      (ka, ca) <- chains; (kb, cb) <- chains
      if ka < kb && crosses(ca, cb)
    } assert(covs(ka).intersect(covs(kb)).nonEmpty,
      s"crossing pair ($ka, $kb) shares no covering cell — candidates incomplete")
  }
}
