package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SpatialJoin}
import graft.s2.S2LatLng

/** Co-movement composite (spatio-temporal contacts -> user pairs ->
  * connected components): equals a driver-side union-find brute force,
  * and the catalog query's tightened thresholds (300 km / 1 h) sit far
  * from any fixture pair's decision boundary. */
class ContactClustersSpec extends SparkTestBase {

  private def eventRows(dir: String): Array[(Long, Long, Long, Double, Double)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")),
        expr(SparkEntry.latSqlFor("event_id")), expr(SparkEntry.lonSqlFor("event_id")))
      .as[(Long, Long, Long, Double, Double)].collect()
  }

  private def bruteClusters(rows: Array[(Long, Long, Long, Double, Double)],
                            radiusM: Double, windowSec: Long): Map[Long, Long] = {
    val winUs = windowSec * 1000000L
    val userPairs = (for {
      i <- rows.indices.iterator
      j <- (i + 1) until rows.length
      (_, ua, ta, laa, loa) = rows(i)
      (_, ub, tb, lab, lob) = rows(j)
      if ua != ub && math.abs(ta - tb) <= winUs
      if S2LatLng.fromDegrees(laa, loa)
        .getEarthDistance(S2LatLng.fromDegrees(lab, lob)) <= radiusM
    } yield (math.min(ua, ub), math.max(ua, ub))).toSet
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    userPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(u => u -> find(u)).toMap
  }

  test("composite == brute-force union-find over brute-force contacts (sf0.001)") {
    val radiusM = 1000000.0
    val windowSec = 14400L
    val pts = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val contacts = SpatialJoin.spatioTemporalJoin(pts, "event_id", "ts", "lat", "lon",
      radiusM, windowSec).select("id_a", "id_b")
    val ev = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .select("event_id", "user_id")
    val userPairs = contacts
      .join(ev.select(col("event_id").as("id_a"), col("user_id").as("__ua")), "id_a")
      .join(ev.select(col("event_id").as("id_b"), col("user_id").as("__ub")), "id_b")
      .where(col("__ua") =!= col("__ub"))
      .select(least(col("__ua"), col("__ub")).as("id_a"),
        greatest(col("__ua"), col("__ub")).as("id_b"))
      .distinct()
    val got = Dedup.duplicateClusters(userPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = bruteClusters(eventRows(sf("sf0.001")), radiusM, windowSec)
    assert(got === expected)
    assert(expected.values.toSet.size >= 2, "fixture must yield multiple components")
  }

  test("contact thresholds (300 km / 1 h) are fp-stable on the oracle fixture (sf0.01)") {
    val rows = eventRows(sf("sf0.01"))
    val r = SparkEntry.ContactRadiusM
    val winUs = SparkEntry.ContactWindowSec * 1000000L
    var minDistGap = Double.MaxValue
    var minTimeGap = Long.MaxValue
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val (_, _, ta, laa, loa) = rows(i)
      val (_, _, tb, lab, lob) = rows(j)
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
