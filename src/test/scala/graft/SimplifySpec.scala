package graft

import org.apache.spark.sql.functions._

import graft.operators.Trajectories
import graft.s2.{S2EdgeUtil, S2LatLng, S2Point, S2Polyline}

/** Spherical Douglas-Peucker: golden kernel cases plus the operator-level
  * deviation-bound contract on real event tracks (the property that makes
  * the rows-only query trustworthy: every dropped point sits within
  * tolerance of the simplified track). */
class SimplifySpec extends SparkTestBase {

  private def pt(lat: Double, lon: Double): S2Point =
    S2LatLng.fromDegrees(lat, lon).toPoint

  private def minDistToPolyline(x: S2Point, verts: Array[S2Point]): Double =
    (1 until verts.length).map(i => S2EdgeUtil.getDistance(x, verts(i - 1), verts(i))).min

  test("collinear meridian collapses to endpoints; spike above tolerance survives") {
    val meridian = Array.tabulate(11)(i => pt(i * 5.0, 10.0))
    assert(S2Polyline.simplifyIndices(meridian, 1e-9).toSeq === Seq(0, 10))

    // ~111 km spike at vertex 5 (1 degree of longitude off the meridian)
    val spiked = meridian.updated(5, pt(25.0, 11.0))
    val keptTight = S2Polyline.simplifyIndices(spiked, 1e-9)
    assert(keptTight.contains(5))
    // tolerance 2 degrees of arc swallows the spike
    val keptLoose = S2Polyline.simplifyIndices(spiked, math.toRadians(2.0))
    assert(keptLoose.toSeq === Seq(0, 10))
  }

  test("n <= 2 and zero tolerance are identity-shaped") {
    val two = Array(pt(0, 0), pt(1, 1))
    assert(S2Polyline.simplifyIndices(two, 1.0).toSeq === Seq(0, 1))
    assert(S2Polyline.simplifyIndices(Array(pt(0, 0)), 1.0).toSeq === Seq(0))
    // zero tolerance keeps every vertex of a non-degenerate zigzag
    val zig = Array.tabulate(9)(i => pt(i.toDouble, if (i % 2 == 0) 0.0 else 0.5))
    assert(S2Polyline.simplifyIndices(zig, 0.0).length === 9)
  }

  test("deviation bound + subsequence + endpoints on sf0.001 event tracks") {
    val tolM = 200000.0
    val tolRad = tolM / 6367000.0
    val ev = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val keptRows = Trajectories.simplifyTracks(ev, "user_id", "ts", "event_id",
      "lat", "lon", tolM)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val keptByUser = keptRows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).toSet }
    val tracks = ev.select("user_id", "ts", "event_id", "lat", "lon")
      .collect()
      .map(r => (r.getLong(0), (r.getAs[java.time.LocalDateTime]("ts"), r.getLong(2),
        r.getDouble(3), r.getDouble(4))))
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.map(_._2).sortBy(t => (t._1, t._2))(
          Ordering.Tuple2(Ordering.by((d: java.time.LocalDateTime) =>
            d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + d.getNano), Ordering.Long))
      }
    assert(tracks.keySet === keptByUser.keySet)
    var dropped = 0
    for ((u, trk) <- tracks) {
      val kept = keptByUser(u)
      val ordered = trk.map(_._2)
      // endpoints always kept
      assert(kept.contains(ordered.head) && kept.contains(ordered.last), s"user $u endpoints")
      val simplified = trk.filter(t => kept.contains(t._2))
        .map(t => pt(t._3, t._4)).toArray
      if (simplified.length >= 2) {
        for (t <- trk if !kept.contains(t._2)) {
          dropped += 1
          val d = minDistToPolyline(pt(t._3, t._4), simplified)
          assert(d <= tolRad, s"user $u point ${t._2} deviates ${d * 6367000.0} m > $tolM m")
        }
      }
    }
    assert(dropped > 0, "tolerance dropped nothing; property vacuous")
  }

  test("operator matches the kernel applied per collected track") {
    val ev = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
      .where(col("user_id") < 3)
    val got = Trajectories.simplifyTracks(ev, "user_id", "ts", "event_id", "lat", "lon", 500000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = ev.select("user_id", "ts", "event_id", "lat", "lon").collect()
      .map(r => (r.getLong(0), (r.getAs[java.time.LocalDateTime]("ts"), r.getLong(2),
        r.getDouble(3), r.getDouble(4))))
      .groupBy(_._1).toSeq.flatMap { case (u, rs) =>
        val trk = rs.map(_._2).sortBy(t => (t._1, t._2))(
          Ordering.Tuple2(Ordering.by((d: java.time.LocalDateTime) =>
            d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + d.getNano), Ordering.Long))
        val verts = trk.map(t => pt(t._3, t._4)).toArray
        S2Polyline.simplifyIndices(verts, 500000.0 / 6367000.0).toSeq.map(i => (u, trk(i)._2))
      }.toSet
    assert(got === want && got.nonEmpty)
  }
}
