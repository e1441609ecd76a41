package graft

import java.sql.Timestamp

import graft.operators.Trajectories
import graft.s2.{R1Interval, S1Interval, S2LatLngRect, S2Region}

/** OD flows + visit episodes: brute-force equivalence on hand-built tracks
  * (region hops, none-gaps, 1-point episodes, first-match overlap rule). */
class MobilitySpec extends SparkTestBase {

  private def rect(latLo: Double, latHi: Double, lonLo: Double, lonHi: Double): S2Region =
    S2LatLngRect(
      R1Interval(math.toRadians(latLo), math.toRadians(latHi)),
      S1Interval(math.toRadians(lonLo), math.toRadians(lonHi)))

  // a and b overlap on lat 8-12 / lon 8-12: the first-match rule must pick a
  private val regions: Seq[(String, S2Region)] = Seq(
    "a" -> rect(0, 12, 0, 12),
    "b" -> rect(8, 20, 8, 20))

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // (user, minute, order, lat, lon) -> label by brute force
  private val track = Seq(
    (1L, 0, 10L, 5.0, 5.0),    // a
    (1L, 1, 11L, 6.0, 6.0),    // a   (same island)
    (1L, 2, 12L, 10.0, 10.0),  // a   (overlap zone: first match wins)
    (1L, 3, 13L, 15.0, 15.0),  // b
    (1L, 4, 14L, 50.0, 50.0),  // none
    (1L, 5, 15L, 16.0, 16.0),  // b   (1-point episode after a none gap)
    (2L, 0, 20L, 55.0, 55.0),  // none (entity entirely outside)
    (2L, 1, 21L, 56.0, 56.0),  // none
    (3L, 0, 30L, 1.0, 1.0)     // a   (single-observation entity)
  )

  private def df = {
    import spark.implicits._
    track.map { case (u, m, o, la, lo) => (u, ts(m), o, la, lo) }
      .toDF("user_id", "ts", "event_id", "lat", "lon")
  }

  test("odFlows == brute-force consecutive-label transitions") {
    val got = Trajectories.odFlows(df, "user_id", "ts", "event_id", "lat", "lon", regions)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // user 1: a->b, b->none, none->b; users 2 and 3 contribute nothing
    assert(got === Map(("a", "b") -> 1L, ("b", "none") -> 1L, ("none", "b") -> 1L))
  }

  test("visitEpisodes == brute-force islands with exact integer-µs dwell") {
    val got = Trajectories.visitEpisodes(df, "user_id", "ts", "event_id", "lat", "lon", regions)
      .select("user_id", "region_id", "enter_order", "n_points", "dwell_micros")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === Set(
      (1L, "a", 10L, 3L, 120000000L), // minutes 0-2 incl. the overlap point
      (1L, "b", 13L, 1L, 0L),
      (1L, "b", 15L, 1L, 0L),         // separate episode: a none row splits the runs
      (3L, "a", 30L, 1L, 0L)))        // user 2 (all none) absent entirely
  }

  test("minPoints / minDwellMicros filters") {
    val episodes = Trajectories.visitEpisodes(
      df, "user_id", "ts", "event_id", "lat", "lon", regions, minPoints = 2)
      .collect()
    assert(episodes.length === 1 && episodes.head.getAs[Long]("n_points") === 3L)
    val dwellFiltered = Trajectories.visitEpisodes(
      df, "user_id", "ts", "event_id", "lat", "lon", regions, minDwellMicros = 1L)
      .collect()
    assert(dwellFiltered.length === 1)
  }

  test("trackBounds: wrap-aware minimal lon interval, brute-force checked") {
    import spark.implicits._
    val pts = Seq(
      // entity 1 straddles the antimeridian: {170, 175, -178} -> wraps
      (1L, 10.0, 170.0), (1L, 12.0, 175.0), (1L, 11.0, -178.0),
      // entity 2 is an ordinary cluster
      (2L, -5.0, 20.0), (2L, -7.0, 25.0), (2L, -6.0, 22.0),
      // entity 3: single point
      (3L, 42.0, 13.0)
    ).toDF("user_id", "lat", "lon")
    val got = Trajectories.trackBounds(pts, "user_id", "lat", "lon")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) === ((10.0, 12.0, 170.0, -178.0)), "wrapping interval: lon_lo > lon_hi")
    assert(got(2L) === ((-7.0, -5.0, 20.0, 25.0)))
    assert(got(3L) === ((42.0, 42.0, 13.0, 13.0)))
    // brute force: the chosen interval's circular width equals the
    // exhaustive minimum over all point-anchored intervals
    def width(lo: Double, hi: Double) = if (hi >= lo) hi - lo else hi + 360 - lo
    for ((id, lons) <- Seq(1L -> Seq(170.0, 175.0, -178.0), 2L -> Seq(20.0, 25.0, 22.0))) {
      val best = lons.map { lo =>
        val w = lons.map(x => width(lo, x)).max; (w, lo)
      }.min
      val (_, _, lo, hi) = got(id)
      assert(math.abs(width(lo, hi) - best._1) < 1e-12, s"entity $id not minimal")
    }
    // every point must lie inside the kernel S1Interval of the result
    import graft.s2.S1Interval
    for ((id, lons) <- Seq(1L -> Seq(170.0, 175.0, -178.0), 3L -> Seq(13.0))) {
      val (_, _, lo, hi) = got(id)
      val iv = S1Interval(math.toRadians(lo), math.toRadians(hi))
      lons.foreach(l => assert(iv.contains(math.toRadians(l)), s"$l outside $lo..$hi"))
    }
  }

  test("reserved-name collision is rejected loudly") {
    val bad = df.withColumnRenamed("lat", "region_id")
    intercept[IllegalArgumentException] {
      Trajectories.visitEpisodes(bad, "user_id", "ts", "event_id", "region_id", "lon", regions)
    }
  }

  test("anchorPoints == per-entity scalar lower medians; outliers cannot drag the anchor") {
    import spark.implicits._
    // user 1: nine fixes at home plus one glitch on the other side of the
    // planet — the anchor must stay exactly home
    val home = (0 until 9).map(i => (1L, 52.5 + i * 0.0001, 13.4 - i * 0.0001))
    val glitch = Seq((1L, -33.9, 151.2))
    val rnd = new scala.util.Random(61)
    val others = for (u <- 2L to 6L; _ <- 0 until (5 + rnd.nextInt(10)))
      yield (u, rnd.nextDouble() * 120 - 60, rnd.nextDouble() * 340 - 170)
    val rows = home ++ glitch ++ others
    val got = Trajectories.anchorPoints(rows.toDF("uid", "lat", "lon"),
        "uid", "lat", "lon")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def med(vs: Seq[Long]): Long = vs.sorted.apply((vs.size + 1) / 2 - 1)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val lats = vs.map(v => math.round(v._2 * 1000000)).toSeq
      val lons = vs.map(v => math.round(v._3 * 1000000)).toSeq
      assert(got(u) == ((vs.size.toLong, med(lats), med(lons))), s"user $u")
    }
    // the glitch landed the user's anchor inside the home cluster
    val (_, la, lo) = got(1L)
    assert(la >= 52500000L && la <= 52501000L && lo >= 13399000L && lo <= 13400000L)
  }

  test("anchorPoints: NULL-coordinate fixes are dropped up front (documented contract)") {
    import spark.implicits._
    // user 1: three clean fixes plus fixes with NULL lat, NULL lon, and
    // both NULL — n_obs and both medians must come from the clean three
    // alone (an unfiltered NULL would inflate n and leave the histogram
    // fold's answer unset through the NULL group — the round-4 NULL-guard
    // fix this spec pins); user 2 is all-NULL and must be absent
    val rows: Seq[(Long, Option[Double], Option[Double])] = Seq(
      (1L, Some(52.5001), Some(13.4001)), (1L, Some(52.5002), Some(13.4002)),
      (1L, Some(52.5003), Some(13.4003)),
      (1L, None, Some(13.9)), (1L, Some(52.9), None), (1L, None, None),
      (2L, None, None), (2L, None, Some(1.0)))
    val got = Trajectories.anchorPoints(rows.toDF("uid", "lat", "lon"),
        "uid", "lat", "lon")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L), s"all-NULL users must be absent: $got")
    assert(got(1L) == ((3L, 52500200L, 13400200L)), got(1L))
  }

  test("awayRate == scalar anchor-distance gate; radius-boundary margin (sf0.01)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val r = 8000000.0
    val got = Trajectories.awayRate(pts, "user_id", "lat", "lon", r)
      .select("user_id", "n_obs", "n_away").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val rows = pts.select("user_id", "lat", "lon")
      .as[(Long, Double, Double)].collect()
    val anchors = rows.groupBy(_._1).map { case (u, vs) =>
      def med(xs: Seq[Long]) = xs.sorted.apply((xs.size + 1) / 2 - 1)
      u -> (med(vs.map(v => math.round(v._2 * 1e6)).toSeq),
        med(vs.map(v => math.round(v._3 * 1e6)).toSeq))
    }
    var minGap = Double.MaxValue
    val want = rows.groupBy(_._1).map { case (u, vs) =>
      val (la, lo) = anchors(u)
      val a = graft.s2.S2LatLng.fromDegrees(la / 1e6, lo / 1e6)
      val away = vs.count { v =>
        val d = graft.s2.S2LatLng.fromDegrees(v._2, v._3).getEarthDistance(a)
        minGap = math.min(minGap, math.abs(d - r))
        d > r
      }
      u -> ((vs.size.toLong, away.toLong))
    }
    assert(got == want)
    assert(minGap > 1e-3, s"radius margin too thin: $minGap m")
    assert(got.values.exists(v => v._2 > 0 && v._2 < v._1), "fixture degenerate")
  }

  test("anchorDrift: a mover drifts, a stayer stays near zero; rounding margins (sf0.01)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // stayer: same home both periods; mover: Berlin -> Sydney
    val rows =
      (0 until 5).map(i => (1L, false, 52.5 + i * 0.001, 13.4)) ++
      (0 until 5).map(i => (1L, true, 52.5 + i * 0.001, 13.4)) ++
      (0 until 5).map(i => (2L, false, 52.5, 13.4 + i * 0.001)) ++
      (0 until 5).map(i => (2L, true, -33.87, 151.2 + i * 0.001))
    val got = Trajectories.anchorDrift(rows.toDF("uid", "pb", "lat", "lon"),
        "uid", "lat", "lon", col("pb"))
      .select("uid", "drift_m").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L)
    assert(got(2L) > 16000000L && got(2L) < 17000000L, s"mover drift ${got(2L)}")
    // oracle margin: no sf0.01 drift sits near a half-meter rounding edge
    val pts = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val drifts = Trajectories.anchorDrift(pts, "user_id", "lat", "lon",
        col("ts").cast("timestamp") >= lit("2024-01-16 00:00:00").cast("timestamp"))
      .select(col("lat_a_e6"), col("lon_a_e6"), col("lat_b_e6"), col("lon_b_e6"))
      .as[(Long, Long, Long, Long)].collect()
    var minGap = Double.MaxValue
    drifts.foreach { case (la, lo, lb, lb2) =>
      val d = graft.s2.S2LatLng.fromDegrees(la / 1e6, lo / 1e6)
        .getEarthDistance(graft.s2.S2LatLng.fromDegrees(lb / 1e6, lb2 / 1e6))
      val frac = d - math.floor(d)
      minGap = math.min(minGap, math.abs(frac - 0.5))
    }
    assert(drifts.length > 100)
    assert(minGap > 1e-6, s"half-meter rounding margin too thin: $minGap")
  }
}
