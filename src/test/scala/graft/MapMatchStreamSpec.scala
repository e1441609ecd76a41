package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.MapMatch
import graft.streaming.MapMatchStream

case class Fix(event_id: Long, ts: Timestamp, user_id: Long,
               lat: Double, lon: Double)

/** Online map matching: cross-batch frontier continuity on a real
  * MemoryStream (stream == batch fold row for row), the final frontier
  * cost == the offline Viterbi total, and the filter-vs-smoother
  * divergence on an ambiguous first fix. */
class MapMatchStreamSpec extends SparkTestBase {

  private def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private val roads = Seq(
    0L -> Seq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0)),
    1L -> Seq((0.0, 0.1), (1.0, 0.1), (2.0, 0.1)))

  private def roadsDf = {
    import spark.implicits._
    roads.map { case (k, vs) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("line_id", "lats", "lons")
  }

  test("stream across batches == batch fold; final frontier cost == offline total") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two tracks marching up road 0 with one mid-track wobble each
    val fixes = (0 until 24).map { i =>
      val track = i % 2
      val step = i / 2
      val lon = if (step == 5) 0.045 + 0.01 * track else 0.02
      Fix(i.toLong, t(step), track.toLong, 0.2 + step * 0.15, lon)
    }
    val input = MemoryStream[Fix]
    val query = MapMatchStream.matchStream(input.toDF(), "user_id", "ts", "event_id",
        "lat", "lon", roadsDf, "line_id", "lats", "lons", radiusM = 50000.0)
      .writeStream.format("memory").queryName("mm_xbatch")
      .outputMode("append").start()
    try {
      input.addData(fixes.take(9): _*)
      query.processAllAvailable()
      input.addData(fixes.drop(9): _*)
      query.processAllAvailable()
      def asMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getInt(3), r.getLong(4)))).toMap
      val got = asMap(spark.sql(
        "SELECT track_id, event_id, line_id, edge_idx, cost FROM mm_xbatch").collect())
      val batch = asMap(MapMatchStream.matchStream(fixes.toDF(), "user_id", "ts",
        "event_id", "lat", "lon", roadsDf, "line_id", "lats", "lons",
        radiusM = 50000.0).toDF().collect())
      assert(got === batch)
      assert(got.size === 24)
      // the final online frontier cost equals the offline Viterbi total
      val offline = MapMatch.viterbi(fixes.toDF(), "user_id", "ts", "event_id",
          "lat", "lon", roadsDf, "line_id", "lats", "lons", radiusM = 50000.0)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      val lastCost = got.groupBy(_._1._1).map { case (tr, m) => tr -> m.maxBy(_._1._2)._2._3 }
      assert(lastCost === offline)
    } finally query.stop()
  }

  test("filter vs smoother: an ambiguous first fix diverges, the rest agree") {
    import spark.implicits._
    // fix 0 sits slightly nearer road 1; every later fix is clearly on
    // road 0 — the online filter commits to road 1 at fix 0 (no future),
    // the offline smoother re-assigns it to road 0
    val fixes = Fix(0L, t(0), 9L, 0.2, 0.052) +:
      (1 until 6).map(i => Fix(i.toLong, t(i), 9L, 0.2 + i * 0.3, 0.02))
    val online = MapMatchStream.matchStream(fixes.toDF(), "user_id", "ts", "event_id",
        "lat", "lon", roadsDf, "line_id", "lats", "lons", radiusM = 50000.0)
      .toDF().collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val offline = MapMatch.viterbi(fixes.toDF(), "user_id", "ts", "event_id",
        "lat", "lon", roadsDf, "line_id", "lats", "lons", radiusM = 50000.0)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(online(0L) == 1L, s"online should greedily take road 1: $online")
    assert(offline(0L) == 0L, s"offline should smooth fix 0 onto road 0: $offline")
    (1L until 6L).foreach { i =>
      assert(online(i) == 0L && offline(i) == 0L, s"fix $i diverged unexpectedly")
    }
  }
}
