package graft

import org.apache.spark.sql.functions._

import graft.operators.Tiling

/** Tile change detection: toy exactness, global invariants at the gate
  * scale, and the floor-margin precondition for the INSERTED points'
  * distinct lat/lon derivation (the base derivation's margin is pinned in
  * WebMercatorSpec). */
class TileChangeSpec extends SparkTestBase {

  test("toy snapshots: disjoint moves produce exactly the expected deltas") {
    import spark.implicits._
    // tile centers far from any z=6 boundary: (0,0) is mid-tile-safe? use
    // clearly interior points: lon -177.1 -> zx 0; lon 177.1 -> zx 63
    val before = Seq((10.3, -177.1), (10.3, -177.1), (10.3, 177.1)).toDF("lat", "lon")
    val after = Seq((10.3, -177.1), (45.2, 2.3)).toDF("lat", "lon")
    val got = Tiling.tileChangeCounts(before, after, "lat", "lon", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // (-177.1): 2 -> 1; (177.1): 1 -> 0; (2.3): 0 -> 1
    assert(got.map(t => (t._3, t._4, t._5)) === Set((2L, 1L, -1L), (1L, 0L, -1L), (0L, 1L, 1L)))
  }

  test("gate-scale invariants: delta sums to the snapshot size difference, no zero rows") {
    val before = SparkEntry.points(spark, sf("sf0.01")).select("lat", "lon")
    val after = before.limit(0).unionByName(
      SparkEntry.points(spark, sf("sf0.01")).where(col("o_orderkey") % 3 =!= 0)
        .select("lat", "lon"))
    val diff = Tiling.tileChangeCounts(before, after, "lat", "lon", 6).collect()
    assert(diff.forall(_.getLong(4) != 0L))
    val (nb, na) = (before.count(), after.count())
    assert(diff.map(_.getLong(4)).sum === na - nb)
  }

  test("kAnonymousTileDays: every released cell has >= k users; suppressed data exists") {
    import spark.implicits._
    val ev = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val released = Tiling.kAnonymousTileDays(ev, "lat", "lon", "user_id", "ts", 4, 5)
    assert(released.where(col("n_entities") < 5).count() === 0L)
    assert(released.count() > 0L, "k=5 released nothing — degenerate resolution")
    // the gate must actually suppress something at this resolution
    val all = Tiling.kAnonymousTileDays(ev, "lat", "lon", "user_id", "ts", 4, 1)
    assert(all.count() > released.count(), "k=5 suppressed nothing — gate untested")
    // released events + suppressed events partition the corpus
    val totEvents = all.agg(sum("n_events")).head().getLong(0)
    assert(totEvents === ev.count())
  }

  test("oracle floor margin holds for the event-derived points too (z=4 and z=6)") {
    val Cut = 85.05112878
    val lats = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .select("lat").collect()
    for (n <- Seq(16.0, 64.0)) {
      var minMargin = Double.MaxValue
      var equator = 0
      for (r <- lats) {
        val lat = r.getDouble(0)
        val latc = math.min(Cut, math.max(-Cut, lat))
        val phi = latc * math.Pi / 180.0
        val yf = (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.Pi) / 2.0 * n
        val nearest = math.rint(yf)
        if (lat == 0.0) equator += 1
        else if (nearest >= 1.0 && nearest <= n - 1.0) {
          val m = math.abs(yf - nearest)
          if (m < minMargin) minMargin = m
        }
      }
      info(f"n=$n%.0f: min event-derivation |yf - rint(yf)| = $minMargin%.3e ($equator equator rows)")
      assert(minMargin > 1e-9)
    }
  }

  test("oracle floor margin holds for the inserted-point derivation too (z=6)") {
    val Cut = 85.05112878
    val lats = SparkEntry.orders(spark, sf("sf0.01"))
      .where(col("o_orderkey") % 5 === 0)
      .withColumn("lat", expr(SparkEntry.latSqlFor("(o_orderkey * 7 + 3)")))
      .select("lat").collect()
    var minMargin = Double.MaxValue
    var equator = 0
    for (r <- lats) {
      val lat = r.getDouble(0)
      val latc = math.min(Cut, math.max(-Cut, lat))
      val phi = latc * math.Pi / 180.0
      val yf = (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.Pi) / 2.0 * 64.0
      val nearest = math.rint(yf)
      if (lat == 0.0) equator += 1
      else if (nearest >= 1.0 && nearest <= 63.0) {
        val m = math.abs(yf - nearest)
        if (m < minMargin) minMargin = m
      }
    }
    info(f"min insert-derivation |yf - rint(yf)| = $minMargin%.3e ($equator equator rows)")
    assert(minMargin > 1e-9)
  }

  test("zxyLocalOutliers: a planted spike on a flat field flags exactly itself") {
    import spark.implicits._
    // z=4 tiles are 22.5 deg wide; fill a 5x5 block of tile centers with
    // 10 points each, then pile 100 extra onto the center tile
    def center(zx: Long, zy: Long): (Double, Double) = {
      val n = 16.0
      val lon = (zx + 0.5) / n * 360.0 - 180.0
      val yf = (zy + 0.5) / n
      val lat = math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * yf))))
      (lat, lon)
    }
    val flat = for {
      zx <- 3L to 7L; zy <- 3L to 7L; _ <- 0 until 10
    } yield center(zx, zy)
    val spike = Seq.fill(100)(center(5L, 5L))
    val got = Tiling.zxyLocalOutliers((flat ++ spike).toDF("lat", "lon"),
        "lat", "lon", z = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // center: n=110, neighborhood all 10s -> med 10, mad 0, flagged.
    // block-edge tiles see zero-filled outside positions (med can drop),
    // but only tiles breaking 3x MAD flag — the spike must be among them
    // and every flagged tile must genuinely break the gate
    assert(got.contains((5L, 5L, 110L, 10L, 0L)), s"spike not flagged: $got")
    got.foreach { case (_, _, n, med, mad) =>
      assert(math.abs(n - med) > 3 * mad)
    }
  }

  test("zxyLocalOutliers: an empty tile inside a heavy field is NOT flagged (documented hole scope)") {
    import spark.implicits._
    // the scaladoc's SCOPE contract (round-4 verdict ask #8): outlier
    // CANDIDATES are observed tiles only — a zero-count hole surrounded
    // by heavy neighbors never appears in the output (hole detection is
    // zxyCoverageHoles' job over the dilated tile set). Planted case: a
    // 5x5 block of 50-point tiles with the CENTER left empty — a
    // maximally anomalous hole (|0 - 50| >> 3*MAD were it a candidate).
    def center(zx: Long, zy: Long): (Double, Double) = {
      val n = 16.0
      val lon = (zx + 0.5) / n * 360.0 - 180.0
      val yf = (zy + 0.5) / n
      val lat = math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * yf))))
      (lat, lon)
    }
    val field = for {
      zx <- 3L to 7L; zy <- 3L to 7L if (zx, zy) != ((5L, 5L)); _ <- 0 until 50
    } yield center(zx, zy)
    val got = Tiling.zxyLocalOutliers(field.toDF("lat", "lon"), "lat", "lon", z = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(!got.exists(t => t._1 == 5L && t._2 == 5L),
      s"the empty hole must not be flagged (observed-tiles-only scope): $got")
    // and the coverage-gap report draws the SAME line from the other
    // side: a data-adjacent empty tile is a sampling artifact (inside
    // every neighbor's dilation), while a tile with an all-empty
    // neighborhood is a genuine catalog gap
    val gaps = Tiling.zxyCoverageGaps(field.toDF("lat", "lon"), "lat", "lon", z = 4)
      .as[(Long, Long)].collect().toSet
    assert(!gaps.contains((5L, 5L)), "data-adjacent hole is not a catalog gap")
    assert(gaps.contains((12L, 12L)), "an isolated far tile is a catalog gap")
  }

  test("zxyLocalOutliers == independent scalar replay on the sf0.01 fixture") {
    import spark.implicits._
    val pts = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val got = Tiling.zxyLocalOutliers(pts, "lat", "lon", z = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val counts = Tiling.zxyAssign(pts, "lat", "lon", 4)
      .groupBy("zx", "zy").count()
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val n = 16L
    val want = counts.flatMap { case ((zx, zy), v) =>
      val nbrs = for {
        dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0
        zy2 = zy + dy if zy2 >= 0 && zy2 < n
      } yield counts.getOrElse((((zx + dx + n) % n), zy2), 0L)
      val sorted = nbrs.sorted
      val kth = (nbrs.size + 1) / 2
      val med = sorted(kth - 1)
      val mad = nbrs.map(x => math.abs(x - med)).sorted.apply(kth - 1)
      if (math.abs(v - med) > 3 * mad) Some((zx, zy, v, med, mad)) else None
    }.toSet
    assert(want.size > 10, s"fixture degenerate: ${want.size}")
    assert(got === want)
  }

  test("zxyStaleTiles: planted old/fresh tiles flag exactly; frontier tile never flags") {
    import spark.implicits._
    def at(lon: Double, day: Int) =
      (20.0, lon, new java.sql.Timestamp(
        java.time.LocalDate.of(2024, 1, 1).plusDays(day).atStartOfDay()
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000L))
    // three distinct z=4 tiles: fresh (day 30), mildly old (day 25,
    // 5 days silent — below the gate), stale (day 3)
    val pts = Seq(at(-150.0, 30), at(-150.0, 1), at(-60.0, 25), at(60.0, 3))
    val got = Tiling.zxyStaleTiles(pts.toDF("lat", "lon", "ts"),
        "lat", "lon", "ts", z = 4, staleDays = 10L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (zx, _, n, _, silent) = got.head
    assert(zx == 10L && n == 1L && silent == 27L, s"got ${got.toSeq}") // lon 60 -> zx 10
  }

  test("zxyCoverageGaps == scalar dilation complement; observed+dilated tiles never gap") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val pts = Seq.fill(150)((rnd.nextDouble() * 120 - 60, rnd.nextDouble() * 360 - 180))
    val z = 5
    val n = 1L << z
    val got = Tiling.zxyCoverageGaps(pts.toDF("lat", "lon"), "lat", "lon", z)
      .as[(Long, Long)].collect().toSet
    val observed = Tiling.zxyAssign(pts.toDF("lat", "lon"), "lat", "lon", z)
      .select("zx", "zy").distinct().as[(Long, Long)].collect().toSet
    val dilated = observed.flatMap { case (zx, zy) =>
      for { dx <- -1 to 1; dy <- -1 to 1; zy2 = zy + dy if zy2 >= 0 && zy2 < n }
        yield (((zx + dx + n) % n), zy2)
    }
    val want = (for { x <- 0L until n; y <- 0L until n } yield (x, y)).toSet -- dilated
    assert(got == want)
    assert(got.nonEmpty && observed.forall(t => !got.contains(t)))
  }

  test("zxyCompactCoverage: full blocks promote, partial blocks stay, expansion round-trips") {
    import spark.implicits._
    def center(zx: Long, zy: Long, z: Int): (Double, Double) = {
      val n = (1L << z).toDouble
      val lon = (zx + 0.5) / n * 360.0 - 180.0
      val yf = (zy + 0.5) / n
      val lat = math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * yf))))
      (lat, lon)
    }
    // z=3: an aligned full 4x4 block (-> one z=1 tile), an aligned full
    // 2x2 block (-> one z=2 tile), one lone tile (stays at z=3)
    val pts = (for { zx <- 0L to 3L; zy <- 0L to 3L } yield center(zx, zy, 3)) ++
      (for { zx <- 6L to 7L; zy <- 6L to 7L } yield center(zx, zy, 3)) :+
      center(5L, 1L, 3)
    val got = Tiling.zxyCompactCoverage(pts.toDF("lat", "lon"), "lat", "lon", z = 3)
      .as[(Int, Long, Long)].collect().toSet
    assert(got == Set((1, 0L, 0L), (2, 3L, 3L), (3, 5L, 1L)), s"got $got")
    // round-trip: expanding the compacted cover back to z reproduces the
    // observed tile set exactly (no overlap, no loss) on random points
    val rnd = new scala.util.Random(47)
    val rpts = Seq.fill(3000)((rnd.nextDouble() * 160 - 80, rnd.nextDouble() * 360 - 180))
    val observed = Tiling.zxyAssign(rpts.toDF("lat", "lon"), "lat", "lon", 5)
      .select("zx", "zy").distinct().as[(Long, Long)].collect().toSet
    val compact = Tiling.zxyCompactCoverage(rpts.toDF("lat", "lon"), "lat", "lon", z = 5)
      .as[(Int, Long, Long)].collect()
    val expanded = compact.flatMap { case (zoom, zx, zy) =>
      val f = 1L << (5 - zoom)
      for (dx <- 0L until f; dy <- 0L until f) yield (zx * f + dx, zy * f + dy)
    }
    assert(expanded.length == expanded.toSet.size, "overlapping cover")
    assert(expanded.toSet == observed, "expansion does not round-trip")
    assert(compact.length < observed.size, "nothing compacted — fixture degenerate")
  }

  test("tileSeasonalAnomalies: zero-filled lower median, spike/quiet gates, zero-med branch") {
    import spark.implicits._
    def at(lon: Double, h: Int) =
      (20.0, lon, new java.sql.Timestamp(
        java.time.LocalDateTime.of(2024, 1, 5, h, 30).toEpochSecond(
          java.time.ZoneOffset.UTC) * 1000L))
    // tile A (lon -150): 20 hours at 5 plus hour 23 at 11 -> med 5, spike 11
    val a = (0 until 20).flatMap(h => Seq.fill(5)(at(-150.0, h))) ++
      Seq.fill(11)(at(-150.0, 23))
    // tile B (lon -60): only 3 present hours -> zero median, all spike
    val b = (0 until 3).flatMap(h => Seq.fill(7)(at(-60.0, h)))
    // tile C (lon 60): all 24 hours, 23 at 6 and one at 1 -> med 6, quiet 1
    val c = (0 until 23).flatMap(h => Seq.fill(6)(at(60.0, h))) ++ Seq(at(60.0, 23))
    val df = (a ++ b ++ c).toDF("lat", "lon", "ts")
    val got = Tiling.tileSeasonalAnomalies(df, "lat", "lon", "ts", z = 3)
      .select("zx", "hour", "n", "med", "flag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    val want: Set[(Long, Long, Long, Long, String)] =
      Set((0L, 23L, 11L, 5L, "spike"),
        (2L, 0L, 7L, 0L, "spike"), (2L, 1L, 7L, 0L, "spike"), (2L, 2L, 7L, 0L, "spike"),
        (5L, 23L, 1L, 6L, "quiet"))
    assert(got === want, s"got $got")
  }

  test("tileSeasonalAnomalies == independent per-tile replay on the sf0.01 fixture") {
    import spark.implicits._
    val pts = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val got = Tiling.tileSeasonalAnomalies(pts, "lat", "lon", "ts", z = 3)
      .select("zx", "zy", "hour", "n", "med", "flag")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    val counts = Tiling.zxyAssign(pts, "lat", "lon", 3)
      .withColumn("hour", hour(col("ts")).cast("long"))
      .groupBy("zx", "zy", "hour").count()
      .as[(Long, Long, Long, Long)].collect()
    val want = counts.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((zx, zy), rows) =>
      val sorted = (rows.map(_._4) ++ Seq.fill(24 - rows.length)(0L)).sorted
      val med = sorted(11)
      rows.flatMap { case (_, _, h, n) =>
        if (n > 2 * med) Some((zx, zy, h, n, med, "spike"))
        else if (2 * n < med) Some((zx, zy, h, n, med, "quiet"))
        else None
      }
    }.toSet
    assert(want.exists(_._6 == "spike") && want.exists(_._6 == "quiet"),
      "fixture degenerate")
    assert(got === want)
  }
}
