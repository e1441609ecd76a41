package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Trajectories
import graft.s2.S2LatLng

/** DTW track-similarity join: degenerate and hand-checked dynamics,
  * brute-force enumeration over all monotone warping paths, the blocked
  * `pairs` plug-in, and the whole-meter rounding margins that make
  * q_dtw_join's integer DP cross-engine exact. */
class DtwSpec extends SparkTestBase {

  private def df(rows: Seq[(Long, Long, Long, Double, Double)]) = {
    import spark.implicits._
    rows.map { case (id, us, tie, la, lo) =>
      (id, new Timestamp(us / 1000), tie, la, lo) }
      .toDF("tid", "ts", "fix_id", "lat", "lon")
  }

  private def run(rows: Seq[(Long, Long, Long, Double, Double)],
                  maxPoints: Int = 8): Map[(Long, Long), Long] = {
    import spark.implicits._
    Trajectories.dtwJoin(df(rows), "tid", "ts", "fix_id", "lat", "lon", maxPoints)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
  }

  private def cost(a: (Double, Double), b: (Double, Double)): Long =
    math.round(S2LatLng.fromDegrees(a._1, a._2)
      .getEarthDistance(S2LatLng.fromDegrees(b._1, b._2)))

  /** Brute minimum over all monotone warping paths (1,1)->(n,m). */
  private def brute(a: Seq[(Double, Double)], b: Seq[(Double, Double)]): Long = {
    def go(i: Int, j: Int): Long = {
      val c = cost(a(i), b(j))
      if (i == 0 && j == 0) c
      else {
        val preds = Seq(
          if (i > 0) Some(go(i - 1, j)) else None,
          if (j > 0) Some(go(i, j - 1)) else None,
          if (i > 0 && j > 0) Some(go(i - 1, j - 1)) else None).flatten
        c + preds.min
      }
    }
    go(a.length - 1, b.length - 1)
  }

  test("identical tracks cost 0; a rate-doubled same-route copy matches brute force") {
    val route = Seq((10.0, 20.0), (10.5, 20.5), (11.0, 21.0), (11.5, 21.5))
    val t1 = route.zipWithIndex.map { case ((la, lo), i) =>
      (1L, (i + 1) * 1000000L, i.toLong, la, lo) }
    val t2 = route.zipWithIndex.map { case ((la, lo), i) =>
      (2L, (i + 1) * 1000000L, i.toLong, la, lo) }
    // track 3 samples the same route twice as densely (every midpoint too)
    val dense = route.init.zip(route.tail).flatMap { case (a, b) =>
      Seq(a, ((a._1 + b._1) / 2, (a._2 + b._2) / 2)) } :+ route.last
    val t3 = dense.zipWithIndex.map { case ((la, lo), i) =>
      (3L, (i + 1) * 1000000L, i.toLong, la, lo) }
    val got = run(t1 ++ t2 ++ t3)
    assert(got((1L, 2L)) == 0L)
    // each midpoint must still align to an endpoint (DTW warps, it does
    // not interpolate): the cost is exactly the brute-force optimum, and
    // both identical tracks score identically against the dense one
    assert(got((1L, 3L)) == brute(route, dense))
    assert(got((2L, 3L)) == got((1L, 3L)))
  }

  test("dtw == brute-force minimum over all monotone warping paths") {
    val rnd = new scala.util.Random(31)
    val tracks = (1L to 5L).map { id =>
      id -> (0 until 4).map { i =>
        (rnd.nextDouble() * 20, rnd.nextDouble() * 20) }
    }
    val rows = tracks.flatMap { case (id, vs) =>
      vs.zipWithIndex.map { case ((la, lo), i) =>
        (id, (i + 1) * 1000000L, i.toLong, la, lo) } }
    val got = run(rows)
    for {
      (ia, va) <- tracks; (ib, vb) <- tracks if ia < ib
    } assert(got((ia, ib)) == brute(va, vb), s"pair ($ia,$ib)")
  }

  test("blocked pairs: the plug-in gate computes the same costs for its pairs only") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 6L).flatMap { id =>
      (0 until 5).map { i =>
        (id, (i + 1) * 1000000L, i.toLong, rnd.nextDouble() * 10, rnd.nextDouble() * 10) }
    }
    val all = run(rows)
    val blocked = Seq((1L, 4L), (2L, 5L)).toDF("id_a", "id_b")
    val got = Trajectories.dtwJoin(df(rows), "tid", "ts", "fix_id", "lat", "lon", 8,
        pairs = Some(blocked))
      .as[(Long, Long, Long)].collect().map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got.keySet == Set((1L, 4L), (2L, 5L)))
    got.foreach { case (k, v) => assert(v == all(k)) }
  }

  test("all-pairs default is loudly capped") {
    val rows = (1L to 30L).map(id => (id, 1000000L, 0L, 1.0, 1.0))
    intercept[IllegalArgumentException] {
      run(rows.map(r => (r._1, r._2, r._3, r._4, r._5)), maxPoints = 8) // fine
      import spark.implicits._
      Trajectories.dtwJoin(df(rows), "tid", "ts", "fix_id", "lat", "lon", 8,
        maxTracksAllPairs = 10L).collect()
    }
  }

  test("oracle margins (sf0.01): no signature-pair distance near a 10 m rounding boundary") {
    import spark.implicits._
    val pts = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val sig = pts.withColumn("rn", row_number().over(w)).where(col("rn") <= 8)
      .select(col("user_id"), col("lat"), col("lon"))
      .as[(Long, Double, Double)].collect()
    val byUser = sig.groupBy(_._1).view.mapValues(_.map(r =>
      S2LatLng.fromDegrees(r._2, r._3)).toArray).toMap
    var minGap = Double.MaxValue
    val users = byUser.keys.toArray.sorted
    for {
      ui <- users.indices; uj <- ui + 1 until users.length
      p <- byUser(users(ui)); q <- byUser(users(uj))
    } {
      val q10 = p.getEarthDistance(q) / 10.0
      val frac = q10 - math.floor(q10)
      minGap = math.min(minGap, math.abs(frac - 0.5) * 10.0)
    }
    // q_dtw_join quantizes at 10 m, so the rounding boundary is the 5 m
    // offset; same-formula engines differ at ulp scale (~1e-8 m at 2e7 m),
    // leaving >= 10^2x headroom under this bound
    assert(minGap > 1e-6, s"10 m quantization margin too thin: $minGap m")
  }
}
