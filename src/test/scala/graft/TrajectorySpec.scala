package graft

import org.apache.spark.sql.functions._

import graft.operators.Trajectories
import graft.s2.S2LatLng

/** Trajectory stats and region visits: brute-force equivalence plus the
  * rounding-margin precondition that makes the integer-centimeter oracle
  * exact (same argument shape as OracleMarginSpec for the PIP oracles). */
class TrajectorySpec extends SparkTestBase {

  private def geo(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("lat", ((col("event_id") * 9973 + 12345) % 18000).cast("double") / 100.0 - 90.0)
    .withColumn("lon", ((col("event_id") * 31337 + 54321) % 36000).cast("double") / 100.0 - 180.0)

  test("trajStats == per-user brute force (kernel distances, integer-meter sums)") {
    val pts = geo(spark.read.parquet(s"${sf("sf0.001")}/events.parquet"))
    val got = Trajectories.trajStats(pts, "user_id", "ts", "event_id", "lat", "lon")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // full-precision (epochSecond, nano) ordering key — millis truncation
    // could disagree with the operator's ts ordering on sub-ms timestamps
    def tsKey(r: org.apache.spark.sql.Row, i: Int): (Long, Int) = {
      val inst = r.getAs[java.time.LocalDateTime](i).toInstant(java.time.ZoneOffset.UTC)
      (inst.getEpochSecond, inst.getNano)
    }
    val rows = pts.select("user_id", "ts", "event_id", "lat", "lon").collect()
      .map(r => (r.getLong(0), tsKey(r, 1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val expected = rows.groupBy(_._1).map { case (uid, g) =>
      val sorted = g.sortBy(e => (e._2, e._3))
      val segs = sorted.sliding(2).collect { case Array(a, b) =>
        math.round(S2LatLng.fromDegrees(a._4, a._5).getEarthDistance(
          S2LatLng.fromDegrees(b._4, b._5)))
      }.toSeq
      uid -> ((sorted.length.toLong,
        if (segs.isEmpty) 0L else segs.sum,
        if (segs.isEmpty) 0L else segs.max))
    }
    assert(got === expected)
    assert(got.values.exists(_._2 > 0))
  }

  test("rounding margin at sf0.01: no segment distance sits near a half-meter boundary") {
    // the oracle recomputes each segment's haversine in SQL with the same
    // formula but different fp op ORDER (e.g. radians conversion), so the
    // two sides can differ by ~ulp (~2.4e-10 m at track scale); the
    // integer-meter oracle is exact iff no distance is that close to a
    // x.5 m rounding boundary. Deterministic inputs -> assert the margin
    // once (measured 1.6e-6 m; centimeter units measured 2e-8 m — too
    // close, which is why trajStats rounds to meters).
    val pts = geo(spark.read.parquet(s"${sf("sf0.01")}/events.parquet"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    import graft.functions.s2functions._
    val margin = pts
      .withColumn("__plat", lag(col("lat"), 1).over(w))
      .withColumn("__plon", lag(col("lon"), 1).over(w))
      .where(col("__plat").isNotNull)
      .select(s2_distance_m(col("__plat"), col("__plon"), col("lat"), col("lon")).as("m"))
      .select(abs(col("m") - floor(col("m")) - 0.5).as("margin"))
      .agg(min("margin")).head().getDouble(0)
    info(f"min distance to a rounding boundary = $margin%.3e m")
    assert(margin > 1e-7, f"segment within $margin%.3e m of a half-meter boundary " +
      "- the integer-meter oracle would be fp-order-sensitive")
  }

  test("speedFlags == per-user brute force; both flag classes populated") {
    val pts = geo(spark.read.parquet(s"${sf("sf0.001")}/events.parquet"))
    val maxSpeed = 340L
    val got = Trajectories.speedFlags(pts, "user_id", "ts", "event_id", "lat", "lon", maxSpeed)
      .select("user_id", "event_id", "seg_m", "dt_micros", "is_jump")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4)))).toMap

    val rows = pts.select("user_id", "ts", "event_id", "lat", "lon").collect().map { r =>
      val inst = r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC)
      (r.getLong(0), (inst.getEpochSecond, inst.getNano), r.getLong(2),
        r.getDouble(3), r.getDouble(4))
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val sorted = g.sortBy(e => (e._2, e._3))
      sorted.zipWithIndex.toSeq.map { case (cur, i) =>
        if (i == 0) (uid, cur._3) -> ((None, None, false))
        else {
          val prev = sorted(i - 1)
          val segM = math.round(S2LatLng.fromDegrees(prev._4, prev._5)
            .getEarthDistance(S2LatLng.fromDegrees(cur._4, cur._5)))
          val dtUs = (cur._2._1 - prev._2._1) * 1000000L + (cur._2._2 - prev._2._2) / 1000L
          (uid, cur._3) -> ((Some(segM), Some(dtUs), segM * 1000000L > maxSpeed * dtUs))
        }
      }
    }.toMap
    assert(got === expected)
    assert(got.values.exists(_._3) && got.values.exists(v => v._2.isDefined && !v._3),
      "fixture must populate both flag classes")
  }

  test("headings == per-user brute force; turn integer-exact over rounded bearings") {
    val pts = geo(spark.read.parquet(s"${sf("sf0.001")}/events.parquet"))
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val got = Trajectories.headings(pts, "user_id", "ts", "event_id", "lat", "lon")
      .select("user_id", "event_id", "bearing_deg", "turn_deg")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((opt(r, 2), opt(r, 3)))).toMap

    def bearing(plat: Double, plon: Double, lat: Double, lon: Double): Long = {
      val phi1 = math.toRadians(plat); val phi2 = math.toRadians(lat)
      val dl = math.toRadians(lon - plon)
      val deg = math.toDegrees(math.atan2(math.sin(dl) * math.cos(phi2),
        math.cos(phi1) * math.sin(phi2) - math.sin(phi1) * math.cos(phi2) * math.cos(dl)))
      math.round(((deg % 360.0) + 360.0) % 360.0) % 360L
    }
    val rows = pts.select("user_id", "ts", "event_id", "lat", "lon").collect().map { r =>
      val inst = r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC)
      (r.getLong(0), (inst.getEpochSecond, inst.getNano), r.getLong(2),
        r.getDouble(3), r.getDouble(4))
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val sorted = g.sortBy(e => (e._2, e._3))
      val bs = sorted.zipWithIndex.map { case (cur, i) =>
        if (i == 0) None
        else Some(bearing(sorted(i - 1)._4, sorted(i - 1)._5, cur._4, cur._5))
      }
      sorted.zipWithIndex.map { case (cur, i) =>
        val turn = for { b <- bs(i); p <- if (i == 0) None else bs(i - 1) }
          yield ((b - p + 540L) % 360L) - 180L
        (uid, cur._3) -> ((bs(i), turn))
      }
    }.toMap
    assert(got === expected)
    val turns = got.values.flatMap(_._2)
    assert(turns.exists(_ > 0) && turns.exists(_ < 0), "fixture must bend both ways")
    assert(got.values.flatMap(_._1).forall(b => b >= 0 && b < 360))
  }

  test("bearing rounding margin at sf0.01: no heading near a half-degree boundary") {
    // engine and oracle compute the same heading formula with potentially
    // different trig libraries (~1e-12 deg divergence); the whole-degree
    // oracle is exact iff no heading sits that close to a x.5 boundary
    val pts = geo(spark.read.parquet(s"${sf("sf0.01")}/events.parquet"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val phi1 = radians(col("__plat")); val phi2 = radians(col("lat"))
    val dl = radians(col("lon") - col("__plon"))
    val deg = degrees(atan2(sin(dl) * cos(phi2),
      cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dl)))
    val margin = pts
      .withColumn("__plat", lag(col("lat"), 1).over(w))
      .withColumn("__plon", lag(col("lon"), 1).over(w))
      .where(col("__plat").isNotNull)
      .select(((deg % 360.0 + 360.0) % 360.0).as("h"))
      .select(abs(col("h") - floor(col("h")) - 0.5).as("margin"))
      .agg(min("margin")).head().getDouble(0)
    info(f"min heading distance to a rounding boundary = $margin%.3e deg")
    assert(margin > 1e-7, f"heading within $margin%.3e deg of a half-degree boundary " +
      "- the whole-degree oracle would be fp-order-sensitive")
  }

  private def bruteHausdorff(rows: Array[(Long, Double, Double)]): Map[(Long, Long), Double] = {
    val byUser = rows.groupBy(_._1).view
      .mapValues(_.map(e => S2LatLng.fromDegrees(e._2, e._3))).toMap
    val ids = byUser.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = byUser(ids(i)); b = byUser(ids(j))
      hab = a.map(x => b.map(x.getEarthDistance).min).max
      hba = b.map(x => a.map(x.getEarthDistance).min).max
    } yield (ids(i), ids(j)) -> math.max(hab, hba)).toMap
  }

  test("hausdorffJoin == brute-force symmetric Hausdorff (pairs AND values)") {
    val maxM = 3400000L
    val pts = geo(spark.read.parquet(s"${sf("sf0.001")}/events.parquet"))
    val got = Trajectories.hausdorffJoin(pts, "user_id", "lat", "lon", maxM)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = pts.select("user_id", "lat", "lon").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = bruteHausdorff(rows)
      .map { case (k, h) => k -> math.round(h) }.filter(_._2 <= maxM)
    assert(got === expected)
    assert(got.nonEmpty, "threshold must admit some pairs")
    assert(bruteHausdorff(rows).exists(_._2 > maxM + 1), "threshold must reject some pairs")
  }

  test("hausdorff rounding margin at sf0.01 on the catalog query's user subset") {
    val pts = geo(spark.read.parquet(s"${sf("sf0.01")}/events.parquet"))
      .where(col("user_id") % 5 === 0)
    val rows = pts.select("user_id", "lat", "lon").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val margin = bruteHausdorff(rows).values
      .map(h => math.abs(h - math.floor(h) - 0.5)).min
    info(f"min Hausdorff distance to a rounding boundary = $margin%.3e m")
    assert(margin > 1e-7)
  }

  test("hausdorffJoin prunes and stays complete at a fine bucketing level") {
    import spark.implicits._
    // A and B ~22 km apart point-for-point; C on the other side of the
    // world. D = 50 km buckets at a level where C never pairs.
    val base = Seq((10.0, 20.0), (10.1, 20.1), (10.2, 20.3), (10.05, 20.5))
    val rows =
      base.map { case (la, lo) => (1L, la, lo) } ++
        base.map { case (la, lo) => (2L, la + 0.2, lo) } ++
        base.map { case (la, lo) => (3L, la + 40.0, lo + 120.0) }
    val df = rows.toDF("user_id", "lat", "lon")
    val got = Trajectories.hausdorffJoin(df, "user_id", "lat", "lon", 50000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = bruteHausdorff(rows.toArray)
      .map { case (k, h) => k -> math.round(h) }.filter(_._2 <= 50000L)
    assert(got === expected)
    assert(got.keySet === Set((1L, 2L)))
  }

  test("stayPoints == brute-force anchor walk; parameters discriminate") {
    val eps = 4000000.0
    val minDwell = 50000000000L
    val pts = geo(spark.read.parquet(s"${sf("sf0.001")}/events.parquet"))
    val got = Trajectories.stayPoints(pts, "user_id", "ts", "event_id", "lat", "lon",
        eps, minDwell)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    val rows = pts.select("user_id", "ts", "event_id", "lat", "lon").collect().map { r =>
      val inst = r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC)
      (r.getLong(0), inst.getEpochSecond * 1000000L + inst.getNano / 1000L,
        r.getLong(2), r.getDouble(3), r.getDouble(4))
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val s = g.sortBy(e => (e._2, e._3))
      val ps = s.map(e => S2LatLng.fromDegrees(e._4, e._5))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      var i = 0
      while (i < s.length) {
        var j = i + 1
        while (j < s.length && ps(i).getEarthDistance(ps(j)) <= eps) j += 1
        val dwell = s(j - 1)._2 - s(i)._2
        if (dwell >= minDwell) {
          out += ((uid, s(i)._3, s(j - 1)._3, (j - i).toLong, dwell)); i = j
        } else i += 1
      }
      out
    }.toSet
    assert(got === expected)
    assert(got.nonEmpty, "parameters must admit some stay points")
    val emitters = got.map(_._1)
    assert(rows.map(_._1).toSet.diff(emitters).nonEmpty,
      "parameters must leave some users without stay points")
  }

  test("staypoint eps margin at sf0.01: no same-user pair distance near the 4000 km bound") {
    val pts = geo(spark.read.parquet(s"${sf("sf0.01")}/events.parquet"))
    import graft.functions.s2functions._
    val a = pts.select(col("user_id"), col("event_id").as("ea"),
      col("lat").as("la"), col("lon").as("loa"))
    val b = pts.select(col("user_id"), col("event_id").as("eb"),
      col("lat").as("lb"), col("lon").as("lob"))
    val margin = a.join(b, "user_id").where(col("ea") < col("eb"))
      .select(abs(s2_distance_m(col("la"), col("loa"), col("lb"), col("lob"))
        - 4000000.0).as("m"))
      .agg(min("m")).head().getDouble(0)
    info(f"min same-user pair distance to the eps bound = $margin%.3e m")
    assert(margin > 1e-3,
      "a pair distance at the eps boundary would make the walk fp-order-sensitive")
  }

  test("tripSegments == brute-force gap islands; fixture yields multi-trip users") {
    val gap = 50000000000L
    val pts = geo(spark.read.parquet(s"${sf("sf0.001")}/events.parquet"))
    val got = Trajectories.tripSegments(pts, "user_id", "ts", "event_id", "lat", "lon", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sorted.toSeq

    val rows = pts.select("user_id", "ts", "event_id", "lat", "lon").collect().map { r =>
      val inst = r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC)
      (r.getLong(0), inst.getEpochSecond * 1000000L + inst.getNano / 1000L,
        r.getLong(2), r.getDouble(3), r.getDouble(4))
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val s = g.sortBy(e => (e._2, e._3))
      // split into trips at gaps
      val trips = s.tail.foldLeft(Vector(Vector(s.head))) { (acc, cur) =>
        if (cur._2 - acc.last.last._2 > gap) acc :+ Vector(cur)
        else acc.init :+ (acc.last :+ cur)
      }
      trips.map { t =>
        val segs = t.sliding(2).collect { case Seq(a, b) =>
          math.round(S2LatLng.fromDegrees(a._4, a._5)
            .getEarthDistance(S2LatLng.fromDegrees(b._4, b._5)))
        }.toSeq
        (uid, t.map(_._3).min, t.map(_._3).max, t.length.toLong,
          segs.sum, t.last._2 - t.head._2)
      }
    }.sorted
    assert(got === expected)
    val tripsPerUser = got.groupBy(_._1).view.mapValues(_.size)
    assert(tripsPerUser.values.exists(_ > 1), "gap must split some user into multiple trips")
  }

  test("visitsRegions == brute-force vertex containment") {
    val pts = geo(spark.read.parquet(s"${sf("sf0.001")}/events.parquet"))
    val got = Trajectories.visitsRegions(pts, "lat", "lon", "user_id", SparkEntryRegions.rects)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rows = pts.select("user_id", "lat", "lon").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = (for {
      (rid, region) <- SparkEntryRegions.rects
      (uid, la, lo) <- rows
      if graft.operators.SpatialJoin.regionContains(region, la, lo)
    } yield (rid, uid)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
