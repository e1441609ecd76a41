package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.s2.S2LatLng

/** DBSCAN: the bucketed-join composition equals a driver-side union-find
  * brute force (cores, borders, noise, labels, all of it), and the oracle's
  * eps-threshold decisions are fp-stable across engines. */
class DbscanSpec extends SparkTestBase {

  private def custPoints(dir: String): Array[(Long, Double, Double)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"),
        expr(SparkEntry.latSqlFor("c_custkey")), expr(SparkEntry.lonSqlFor("c_custkey")))
      .as[(Long, Double, Double)].collect()
  }

  /** Reference DBSCAN: all-pairs distances + union-find over core-core
    * edges, min-id labels, min-cluster border assignment. */
  private def brute(pts: Array[(Long, Double, Double)], epsM: Double,
                    minPts: Int): Set[(Long, Long, Boolean)] = {
    val ll = pts.map { case (id, la, lo) => id -> S2LatLng.fromDegrees(la, lo) }
    val nbrs = ll.map { case (id, p) =>
      id -> ll.collect { case (oid, q) if oid != id &&
        p.getEarthDistance(q) <= epsM => oid }.toSet
    }.toMap
    val core = nbrs.collect { case (id, ns) if ns.size + 1 >= minPts => id }.toSet
    val parent = scala.collection.mutable.Map(core.map(id => id -> id).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(id => id -> core.filter(find(_) == find(id)).min).toMap
    val borders = nbrs.collect {
      case (id, ns) if !core(id) && ns.exists(core) =>
        (id, ns.filter(core).map(label).min, false)
    }
    core.map(id => (id, label(id), true)) ++ borders
  }

  test("dbscan equals union-find brute force (sf0.001, eps 500 km)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val pts = custPoints(dir)
    val want = brute(pts, 500000.0, 3)
    assert(want.exists(_._3), "fixture degenerate: no core points")
    assert(want.exists(!_._3), "fixture degenerate: no border points")
    assert(want.map(_._1).size < pts.length, "fixture degenerate: no noise")
    assert(want.groupBy(_._2).size >= 2, "fixture degenerate: single cluster")
    val df = spark.read.parquet(s"$dir/customer.parquet").select("c_custkey")
      .withColumn("lat", expr(SparkEntry.latSqlFor("c_custkey")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("c_custkey")))
    val got = Clustering.dbscan(df, "c_custkey", "lat", "lon", epsM = 500000.0, minPts = 3)
      .select(col("id").cast("long"), col("cluster_id").cast("long"), col("is_core"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == want,
      s"dbscan diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("catalog params are fp-stable and non-degenerate (sf0.01)") {
    val pts = custPoints(sf("sf0.01"))
    val eps = SparkEntry.DbscanEpsM
    var minGap = Double.MaxValue
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val a = S2LatLng.fromDegrees(pts(i)._2, pts(i)._3)
      val b = S2LatLng.fromDegrees(pts(j)._2, pts(j)._3)
      val gap = math.abs(a.getEarthDistance(b) - eps)
      if (gap < minGap) minGap = gap
    }
    info(f"min |dist - eps| = $minGap%.3e m")
    assert(minGap > 1e-3, "a pair sits on the eps boundary; threshold not fp-stable")
    val want = brute(pts, eps, SparkEntry.DbscanMinPts)
    assert(want.exists(_._3) && want.exists(!_._3) && want.map(_._1).size < pts.length,
      "catalog fixture degenerate: needs cores, borders, and noise")
  }
}
