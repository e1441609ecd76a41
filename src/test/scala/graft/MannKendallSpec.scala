package graft

import java.sql.Timestamp

import graft.operators.TimeSeries

/** Mann–Kendall: closed-form shapes (monotone, constant, ties) and
  * brute-force pair equality on randomized series — the Fenwick inversion
  * fold must reproduce the O(n²) definition exactly. */
class MannKendallSpec extends SparkTestBase {

  private def mk(rows: Seq[(Long, Long, Long, Double)]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val df = rows.map { case (id, us, ord, v) => (id, new Timestamp(us / 1000), ord, v) }
      .toDF("user_id", "ts", "event_id", "value")
    TimeSeries.mannKendall(df, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, s, v) => id -> (n, s, v) }.toMap
  }

  test("monotone series: S = ±n(n-1)/2, var18 = n(n-1)(2n+5); constant: S = 0, var18 = 0") {
    val up = (0L until 10L).map(i => (1L, i * 1000000L, i, i.toDouble))
    val down = (0L until 10L).map(i => (2L, i * 1000000L, i, -i.toDouble))
    val const = (0L until 10L).map(i => (3L, i * 1000000L, i, 7.0))
    val got = mk(up ++ down ++ const)
    assert(got(1L) == ((10L, 45L, 10L * 9L * 25L)))
    assert(got(2L) == ((10L, -45L, 10L * 9L * 25L)))
    assert(got(3L) == ((10L, 0L, 0L)))
  }

  test("fold == brute-force pair definition on randomized tied series") {
    val rnd = new scala.util.Random(5)
    val rows = for {
      id <- 1L to 8L
      i <- 0L until (20 + rnd.nextInt(60)).toLong
    } yield (id, i * 60000000L, i, (rnd.nextInt(12) - 4) * 0.07)
    val got = mk(rows)
    for ((id, series) <- rows.groupBy(_._1)) {
      val w = series.sortBy(r => (r._2, r._3)).map(r => math.round(r._4 * 100))
      val n = w.length.toLong
      val s = (for (i <- w.indices; j <- i + 1 until w.length)
        yield java.lang.Long.signum(w(j) - w(i)).toLong).sum
      val tie18 = w.groupBy(identity).values
        .map { g => val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }.sum
      assert(got(id) == ((n, s, n * (n - 1) * (2 * n + 5) - tie18)),
        s"entity $id: got ${got(id)}")
    }
    // non-degenerate: at least one entity trends and ties exist
    assert(got.values.exists(_._2 != 0))
    assert(got.values.exists { case (n, _, v) => v < n * (n - 1) * (2 * n + 5) })
  }

  test("streaming twin: cross-batch continuity; last row per entity == batch operator") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.Event
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 80).map { i =>
      val user = i % 2
      val step = i / 2
      val v = if (user == 0) (step % 5).toDouble * 0.11 else step * 0.07
      Event(i.toLong, new Timestamp(1700000000000L + step * 60000L), user.toLong, "m", v)
    }
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val query = EventStreams
      .mannKendallStream(input.toDF(), "user_id", "ts", "event_id", "value")
      .writeStream.format("memory").queryName("mk_xbatch")
      .outputMode("append").start()
    try {
      input.addData(events.take(27): _*)
      query.processAllAvailable()
      input.addData(events.drop(27): _*)
      query.processAllAvailable()
      def asMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val got = asMap(spark.sql(
        "SELECT entity_id, event_id, n_obs, s_stat, var18 FROM mk_xbatch").collect())
      val batch = asMap(EventStreams
        .mannKendallStream(events.toDF(), "user_id", "ts", "event_id", "value")
        .toDF().collect())
      assert(got === batch)
      assert(got.size === 80)
      // final row per entity == the batch Fenwick operator
      val last = got.groupBy(_._1._1).map { case (u, m) => u -> m.maxBy(_._1._2)._2 }
      val whole = TimeSeries
        .mannKendall(events.toDF(), "user_id", "ts", "event_id", "value")
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, n, s, v) => id -> ((n, s, v)) }.toMap
      assert(last === whole)
      // the ramp entity's S reaches the no-tie maximum
      assert(whole(1L)._2 == 40L * 39L / 2)
    } finally query.stop()
  }
}
