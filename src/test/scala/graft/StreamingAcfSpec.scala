package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TimeSeries
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Streaming running lag-1 autocorrelation: cross-batch state continuity
  * on a real MemoryStream, row-for-row equality with the batch-mode fold,
  * and the final-row coefficients equal to [[TimeSeries.lagAutocorr]]. */
class StreamingAcfSpec extends SparkTestBase {

  private def ts(minutes: Int): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  test("running acf across batches == batch-mode fold; last row == the batch operator") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    // three users, value series with real signal: u0 alternating (acf -> -1),
    // u1 ramp, u2 constant (NULL forever); split mid-series across batches
    val events = (0 until 90).map { i =>
      val user = i % 3
      val step = i / 3
      val v = user match {
        case 0 => if (step % 2 == 0) 1.0 else 3.0
        case 1 => 0.5 * step
        case _ => 7.0
      }
      Event(i.toLong, ts(step), user.toLong, "move", v)
    }
    val input = MemoryStream[Event]
    val query = EventStreams
      .acfStream(input.toDF(), "user_id", "ts", "event_id", "value")
      .writeStream.format("memory").queryName("acf_xbatch")
      .outputMode("append").start()
    try {
      // one processed trigger per block — state genuinely crosses batches
      input.addData(events.take(31): _*)
      query.processAllAvailable()
      input.addData(events.slice(31, 62): _*)
      query.processAllAvailable()
      input.addData(events.drop(62): _*)
      query.processAllAvailable()
      def asMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      val got = asMap(spark.sql(
        "SELECT entity_id, event_id, n_obs, acf FROM acf_xbatch").collect())
      val batch = asMap(EventStreams
        .acfStream(events.toDF(), "user_id", "ts", "event_id", "value")
        .toDF().collect())
      assert(got === batch)
      assert(got.size === 90)
      // constant series stays NULL at every prefix; alternating goes negative
      assert(got.collect { case ((2L, _), (_, a)) => a }.forall(_.isEmpty))
      assert(got((0L, 87L))._2.exists(_ < -0.9))
      // the last emitted row per user == the batch operator's coefficient
      val lastRows = got.groupBy(_._1._1).map { case (u, m) => u -> m.maxBy(_._1._2)._2 }
      val whole = TimeSeries
        .lagAutocorr(events.toDF(), "user_id", "ts", "event_id", "value")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
        .toMap
      assert(lastRows === whole)
    } finally query.stop()
  }

  test("running OLS across batches == batch fold; last row == linearTrend") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val origin = 1700000000000000L
    // u0: exact line (slope 2 scaled units/min), u1: noisy-ish alternating
    val events = (0 until 60).map { i =>
      val user = i % 2
      val step = i / 2
      val v = if (user == 0) 0.01 + 0.02 * step else (if (step % 2 == 0) 1.0 else 2.0)
      Event(i.toLong, new Timestamp(origin / 1000L + step * 60000L), user.toLong, "m", v)
    }
    val input = MemoryStream[Event]
    val query = EventStreams
      .olsStream(input.toDF(), "user_id", "ts", "event_id", "value",
        originMicros = origin, stepMicros = 60000000L)
      .writeStream.format("memory").queryName("ols_xbatch")
      .outputMode("append").start()
    try {
      input.addData(events.take(25): _*)
      query.processAllAvailable()
      input.addData(events.drop(25): _*)
      query.processAllAvailable()
      def asMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      val got = asMap(spark.sql(
        "SELECT entity_id, event_id, n_obs, slope, intercept FROM ols_xbatch").collect())
      val batch = asMap(EventStreams
        .olsStream(events.toDF(), "user_id", "ts", "event_id", "value",
          originMicros = origin, stepMicros = 60000000L).toDF().collect())
      assert(got === batch)
      assert(got.size === 60)
      // the exact line: every prefix of u0 with n >= 2 fits slope 2 exactly
      assert(got.collect { case ((0L, _), (n, s, _)) if n >= 2 => s }
        .forall(_.contains(2.0)))
      // final rows equal the batch operator
      val lastRows = got.groupBy(_._1._1).map { case (u, m) =>
        val (_, (n, s, i)) = m.maxBy(_._1._2); u -> ((n, s, i))
      }
      val whole = TimeSeries
        .linearTrend(events.toDF(), "user_id", "ts", "value",
          originMicros = origin, stepMicros = 60000000L)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      assert(lastRows === whole)
    } finally query.stop()
  }

  test("stale arrivals behind the frontier are dropped, not retro-inserted") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams
      .acfStream(input.toDF(), "user_id", "ts", "event_id", "value")
      .writeStream.format("memory").queryName("acf_stale")
      .outputMode("append").start()
    try {
      // separate micro-batches: the stale row must arrive AFTER the
      // frontier advanced (one addData block per processed trigger)
      input.addData(Event(1, ts(10), 1, "a", 1.0), Event(2, ts(20), 1, "a", 2.0))
      query.processAllAvailable()
      input.addData(Event(3, ts(15), 1, "a", 9.0)) // behind the frontier
      query.processAllAvailable()
      input.addData(Event(4, ts(30), 1, "a", 3.0))
      query.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM acf_stale").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L), "the stale row must not emit")
      // and the fold saw only the fresh rows: n_obs of the last row is 3
      val n = spark.sql("SELECT n_obs FROM acf_stale WHERE event_id = 4").head().getLong(0)
      assert(n === 3L)
    } finally query.stop()
  }
}
