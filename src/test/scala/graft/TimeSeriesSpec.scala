package graft

import java.sql.Timestamp

import graft.operators.TimeSeries

/** Fixed-step carry-forward resampling: hand-checked grid placement,
  * on-grid observations, duplicate-timestamp collapse, and a brute-force
  * cross-check on fixture events. */
class TimeSeriesSpec extends SparkTestBase {

  private def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))

  test("hand-checked grid: ceil start, carry across gaps, on-grid obs carried by its own instant") {
    import spark.implicits._
    // step 10 s; user 1 observes at 7, 20, 41 -> grid {10, 20, 30, 40}
    val pts = Seq(
      (1L, ts(7), 100L, 1.0), (1L, ts(20), 101L, 2.0), (1L, ts(41), 102L, 3.0),
      (2L, ts(30), 200L, 9.0) // single obs exactly on grid -> one row
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.resampleCarryForward(pts, "user_id", "ts", "event_id",
      Seq("event_id", "value"), stepMicros = 10000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1) / 1000000L, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === Set(
      (1L, 10L, 100L, 1.0), // carries the 7 s obs
      (1L, 20L, 101L, 2.0), // the on-grid obs carries itself
      (1L, 30L, 101L, 2.0), // gap: still the 20 s obs
      (1L, 40L, 101L, 2.0), // 41 s obs is after this instant
      (2L, 30L, 200L, 9.0)))
  }

  test("exact-duplicate timestamps collapse to the max-order row") {
    import spark.implicits._
    val pts = Seq(
      (1L, ts(10), 5L, 1.0), (1L, ts(10), 9L, 2.0), (1L, ts(10), 7L, 3.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.resampleCarryForward(pts, "user_id", "ts", "event_id",
      Seq("event_id", "value"), stepMicros = 10000000L).collect()
    assert(got.length === 1)
    assert((got.head.getLong(2), got.head.getDouble(3)) === ((9L, 2.0)))
  }

  test("matches per-user brute force on fixture events (6 h grid)") {
    val step = 21600000000L
    val df = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = TimeSeries.resampleCarryForward(df, "user_id", "ts", "event_id",
      Seq("event_id"), stepMicros = step)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val obs = df.selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = obs.flatMap { case (u, rows) =>
      val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
      val start = ((lo + step - 1) / step) * step
      (start to hi by step).map { g =>
        val best = rows.filter(_._2 <= g).maxBy(r => (r._2, r._3))
        (u, g) -> best._3
      }
    }
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("linear: hand-checked interpolation, exact hits take observation values") {
    import spark.implicits._
    // user 1: obs (10 s, 1.0), (20 s, 3.0), (40 s, 3.0); grid step 10 s ->
    // instants 10 (hit), 20 (hit), 30 (midpoint of 20..40 -> 3.0), 40 (hit)
    // user 2: obs (5 s, 0.0), (25 s, 10.0) -> 10 -> 2.5, 20 -> 7.5
    val pts = Seq(
      (1L, ts(10), 100L, 1.0), (1L, ts(20), 101L, 3.0), (1L, ts(40), 102L, 3.0),
      (2L, ts(5), 200L, 0.0), (2L, ts(25), 201L, 10.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.resampleLinear(pts, "user_id", "ts", "event_id",
      "value", stepMicros = 10000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1) / 1000000L, r.getDouble(2))).toSet
    assert(got === Set(
      (1L, 10L, 1.0), (1L, 20L, 3.0), (1L, 30L, 3.0), (1L, 40L, 3.0),
      (2L, 10L, 2.5), (2L, 20L, 7.5)))
  }

  test("linear matches per-user brute force EXACTLY on fixture events (6 h grid)") {
    val step = 21600000000L
    val df = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = TimeSeries.resampleLinear(df, "user_id", "ts", "event_id",
      "value", stepMicros = step)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val obs = df.selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "event_id", "CAST(value AS DOUBLE) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val expected = obs.flatMap { case (u, rows) =>
      val dedup = rows.groupBy(_._2).map { case (us, g) => us -> g.maxBy(_._3)._4 }
      val sorted = dedup.toSeq.sortBy(_._1)
      val lo = sorted.head._1; val hi = sorted.last._1
      val start = ((lo + step - 1) / step) * step
      (start to hi by step).map { g =>
        val (t0, v0) = sorted.filter(_._1 <= g).last
        val next = sorted.find(_._1 > g)
        val v = next match {
          case None => v0
          case _ if t0 == g => v0
          case Some((t1, v1)) => v0 + (v1 - v0) * ((g - t0).toDouble / (t1 - t0).toDouble)
        }
        (u, g) -> v
      }
    }
    // exact double equality: the operator promises bit-identical IEEE ops
    assert(got === expected)
    assert(got.values.exists(v => v != math.floor(v)), "grid must hit interpolated values")
  }
}
