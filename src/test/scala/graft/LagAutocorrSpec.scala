package graft

import java.sql.Timestamp

import graft.operators.TimeSeries

/** Per-key lag autocorrelation: hand-checked tiny series, NULL guards,
  * the [-1, 1] Cauchy-Schwarz bound, and an EXACT brute-force replay on
  * fixture events (the operator promises bit-identical IEEE doubles). */
class LagAutocorrSpec extends SparkTestBase {

  private def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))

  test("hand-checked series: alternating -0.75, linear ramp 0, pair -0.5") {
    import spark.implicits._
    // scale 100 -> w = value*100; series chosen so devs are hand-computable
    val pts = Seq(
      // user 1: w = [1,2,1,2] -> devs [-.5,.5,-.5,.5] -> acf = -0.75
      (1L, ts(10), 1L, 0.01), (1L, ts(20), 2L, 0.02),
      (1L, ts(30), 3L, 0.01), (1L, ts(40), 4L, 0.02),
      // user 2: w = [1,2,3] -> devs [-1,0,1] -> num 0 -> acf = 0
      (2L, ts(10), 5L, 0.01), (2L, ts(20), 6L, 0.02), (2L, ts(30), 7L, 0.03),
      // user 3: w = [1,3] -> devs [-1,1] -> num -1, den 2 -> acf = -0.5
      (3L, ts(10), 8L, 0.01), (3L, ts(20), 9L, 0.03)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.lagAutocorr(pts, "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(1L -> ((4L, -0.75)), 2L -> ((3L, 0.0)), 3L -> ((2L, -0.5))))
  }

  test("NULL guards: single observation and constant series") {
    import spark.implicits._
    val pts = Seq(
      (1L, ts(10), 1L, 5.0),                         // n = 1 -> NULL
      (2L, ts(10), 2L, 7.0), (2L, ts(20), 3L, 7.0),  // constant -> den 0 -> NULL
      (2L, ts(30), 4L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.lagAutocorr(pts, "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(got === Map(1L -> true, 2L -> true))
  }

  test("fixture events: exact brute-force replay + Cauchy-Schwarz bound") {
    val df = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = TimeSeries.lagAutocorr(df, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val obs = df.selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "event_id", "CAST(round(value * 100) AS BIGINT) AS w")
      .where("value IS NOT NULL")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = obs.map { case (u, rows) =>
      val w = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val n = w.length.toLong
      val sw = w.sum
      val s2 = w.map(x => x * x).sum
      val sp = w.zip(w.drop(1)).map { case (a, b) => a * b }.sum
      val (hk, tk) = (w.head, w.last)
      // the same fixed IEEE op order as TimeSeries.acfFinalSql(1)
      val (nd, sd, s2d, spd, hkd, tkd) =
        (n.toDouble, sw.toDouble, s2.toDouble, sp.toDouble, hk.toDouble, tk.toDouble)
      val den = nd * (nd * s2d - sd * sd)
      val acf =
        if (n <= 1 || den == 0) None
        else Some((nd * nd * spd - nd * sd * (2 * sd - hkd - tkd) + (nd - 1) * sd * sd) / den)
      u -> ((n, acf))
    }
    assert(got === expected)
    val defined = got.values.flatMap(_._2)
    assert(defined.nonEmpty, "fixture must yield non-NULL coefficients")
    assert(defined.forall(a => a >= -1.0 && a <= 1.0),
      "lag-1 acf must satisfy the Cauchy-Schwarz bound")
  }

  private val Origin = 1704067200000000L // 2024-01-01T00:00:00Z in µs

  test("linearTrend: hand-checked line, NULL guards, exact fixture replay") {
    import spark.implicits._
    def tm(m: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(Origin / 1000000L + m * 60))
    // user 1: exact line y = 2x + 1 on the minute grid (scaled units)
    // user 2: one point -> NULL; user 3: constant time axis -> NULL
    val pts = Seq(
      (1L, tm(0), 0.01), (1L, tm(1), 0.03), (1L, tm(2), 0.05),
      (2L, tm(5), 9.0),
      (3L, tm(7), 1.0), (3L, tm(7), 2.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.linearTrend(pts, "user_id", "ts", "value",
        originMicros = Origin, stepMicros = 60000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got === Map(
      1L -> ((3L, Some(2.0), Some(1.0))),
      2L -> ((1L, None, None)),
      3L -> ((2L, None, None))))

    val df = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val res = TimeSeries.linearTrend(df, "user_id", "ts", "value",
        originMicros = Origin, stepMicros = 60000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val brute = df.selectExpr("user_id",
        s"(unix_micros(CAST(ts AS TIMESTAMP)) - ${Origin}L) div 60000000L AS x",
        "CAST(round(value * 100) AS LONG) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (u, rows) =>
        val n = rows.length.toLong
        val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
        val sxx = rows.map(r => r._2 * r._2).sum
        val sxy = rows.map(r => r._2 * r._3).sum
        val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        val slope =
          if (n < 2 || den == 0) None
          else Some((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) / den)
        u -> ((n, slope))
      }
    assert(res === brute)
    assert(res.values.exists(_._2.isDefined))
  }
}
