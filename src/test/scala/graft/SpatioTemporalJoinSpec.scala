package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.s2.S2LatLng

/** Spatio-temporal pair join: the composite (cell, time-bucket) equi-join
  * equals driver-side brute force, emits each pair exactly once (counted
  * BEFORE the final projection would hide duplicates), and the catalog
  * thresholds sit far from any fixture pair. */
class SpatioTemporalJoinSpec extends SparkTestBase {

  private def eventPoints(dir: String): Array[(Long, Long, Double, Double)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").cast("long"), unix_micros(col("ts").cast("timestamp")),
        expr(SparkEntry.latSqlFor("event_id")), expr(SparkEntry.lonSqlFor("event_id")))
      .as[(Long, Long, Double, Double)].collect()
  }

  private def brute(pts: Array[(Long, Long, Double, Double)],
                    radiusM: Double, windowSec: Long): Set[(Long, Long)] = {
    val winUs = windowSec * 1000000L
    (for {
      i <- pts.indices.iterator
      j <- (i + 1) until pts.length
      (ia, ta, laa, loa) = pts(i)
      (ib, tb, lab, lob) = pts(j)
      if math.abs(ta - tb) <= winUs
      if S2LatLng.fromDegrees(laa, loa)
        .getEarthDistance(S2LatLng.fromDegrees(lab, lob)) <= radiusM
    } yield (math.min(ia, ib), math.max(ia, ib))).toSet
  }

  private def joined(dir: String, radiusM: Double, windowSec: Long) = {
    val pts = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    SpatialJoin.spatioTemporalJoin(pts, "event_id", "ts", "lat", "lon", radiusM, windowSec)
  }

  test("join equals brute force and emits each pair exactly once (sf0.001)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val r = SparkEntry.StJoinRadiusM
    val w = SparkEntry.StJoinWindowSec
    val want = brute(eventPoints(dir), r, w)
    assert(want.nonEmpty, "fixture degenerate: no spatio-temporal pairs")
    val rows = joined(dir, r, w)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect()
    assert(rows.length == rows.distinct.length, "a pair was emitted more than once")
    assert(rows.toSet == want,
      s"diverged: missing=${(want -- rows.toSet).take(5)} extra=${(rows.toSet -- want).take(5)}")
  }

  test("window boundary is exact to the microsecond") {
    import spark.implicits._
    // two points 1 m apart; Δt exactly the window, and the window + 1 µs
    val base = 1700000000000000L
    val df = Seq(
      (1L, base, 10.0, 20.0),
      (2L, base + 60000000L, 10.0, 20.00001),
      (3L, base + 60000001L, 10.0, 20.00002))
      .toDF("event_id", "tus", "lat", "lon")
      .withColumn("ts", timestamp_micros(col("tus")))
    val got = SpatialJoin.spatioTemporalJoin(df, "event_id", "ts", "lat", "lon",
        radiusM = 1000.0, windowSec = 60L)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 3L)),
      s"exact-boundary semantics broken: $got (1-2 at exactly 60 s is IN, 1-3 at 60 s + 1 µs is OUT)")
  }

  test("catalog thresholds are fp-stable on the oracle fixture (sf0.01)") {
    val pts = eventPoints(sf("sf0.01"))
    val r = SparkEntry.StJoinRadiusM
    val winUs = SparkEntry.StJoinWindowSec * 1000000L
    var minDistGap = Double.MaxValue
    var minTimeGap = Long.MaxValue
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (_, ta, laa, loa) = pts(i)
      val (_, tb, lab, lob) = pts(j)
      val dt = math.abs(ta - tb)
      if (dt <= winUs) {
        val gap = math.abs(S2LatLng.fromDegrees(laa, loa)
          .getEarthDistance(S2LatLng.fromDegrees(lab, lob)) - r)
        if (gap < minDistGap) minDistGap = gap
      }
      val d = S2LatLng.fromDegrees(laa, loa).getEarthDistance(S2LatLng.fromDegrees(lab, lob))
      if (d <= r * 1.1) {
        val gap = math.abs(dt - winUs)
        if (gap < minTimeGap) minTimeGap = gap
      }
    }
    info(f"min |dist - radius| in-window = $minDistGap%.3e m; min |dt - window| near-radius = $minTimeGap µs")
    assert(minDistGap > 1e-3)
    assert(minTimeGap > 1000L)
  }
}
