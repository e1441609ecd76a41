package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin

/** IDW interpolation: bucketed candidate generation vs a driver-side
  * ALL-PAIRS replay (completeness + bit-exact estimates), and the
  * antimeridian wrap of the planar metric. */
class IdwSpec extends SparkTestBase {

  private val C = SpatialJoin.IdwLonScale

  /** Brute force over every (query, sample) pair with the operator's exact
    * arithmetic and fold order. */
  private def idwRef(samples: Seq[(Long, Double, Double, Double)],
                     queries: Seq[(Long, Double, Double)],
                     radiusDeg: Double): Map[Long, (Long, Double)] =
    queries.flatMap { case (qid, qlat, qlon) =>
      val terms = samples.flatMap { case (id, v, lat, lon) =>
        val dlat = qlat - lat
        val rawDlon = math.abs(qlon - lon)
        val dlonW = math.min(rawDlon, 360.0 - rawDlon)
        val d2 = dlat * dlat + (dlonW * C) * (dlonW * C)
        if (d2 > 0.0 && d2 <= radiusDeg * radiusDeg) Some((d2, v, id)) else None
      }.sorted
      if (terms.isEmpty) None
      else {
        var num = 0.0; var den = 0.0
        for ((d2, v, _) <- terms) { num += v / d2; den += 1.0 / d2 }
        Some(qid -> (terms.size.toLong, num / den))
      }
    }.toMap

  test("idwInterpolate == all-pairs driver replay, bit for bit (sf0.001 customers x suppliers)") {
    val sDf = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
      .select(col("o_orderkey").as("id"),
        (col("o_orderkey") % 97).cast("double").as("v"),
        expr(SparkEntry.latSqlFor("o_orderkey")).as("lat"),
        expr(SparkEntry.lonSqlFor("o_orderkey")).as("lon"))
    val qDf = spark.read.parquet(s"${sf("sf0.001")}/supplier.parquet")
      .select(col("s_suppkey").as("qid"),
        expr(SparkEntry.latSqlFor("s_suppkey")).as("qlat"),
        expr(SparkEntry.lonSqlFor("s_suppkey")).as("qlon"))
    val got = SpatialJoin.idwInterpolate(sDf, "lat", "lon", "v", "id",
        qDf, "qid", "qlat", "qlon", radiusDeg = 10.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val samples = sDf.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    val queries = qDf.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val want = idwRef(samples, queries, 10.0)
    assert(got.keySet == want.keySet,
      s"candidate generation incomplete: missing ${want.keySet -- got.keySet}, " +
        s"extra ${got.keySet -- want.keySet}")
    // bit-exact: same IEEE ops in the same order — zero tolerance
    for ((qid, (n, est)) <- want)
      assert(got(qid) == ((n, est)), s"qid=$qid: got ${got(qid)} want ($n, $est)")
    assert(want.nonEmpty && want.values.exists(_._1 > 1))
  }

  test("antimeridian wrap: samples at lon +179.9 weigh into a query at -179.9") {
    import spark.implicits._
    val sDf = Seq((1L, 10.0, 0.0, 179.9), (2L, 50.0, 0.0, 179.5))
      .toDF("id", "v", "lat", "lon")
    val qDf = Seq((100L, 0.0, -179.9)).toDF("qid", "qlat", "qlon")
    val rows = SpatialJoin.idwInterpolate(sDf, "lat", "lon", "v", "id",
      qDf, "qid", "qlat", "qlon", radiusDeg = 2.0).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 2L,
      s"wrap-side samples not found: ${rows.toSeq}")
    // nearer sample (0.2 deg wrapped) dominates the farther (0.6 deg)
    val est = rows(0).getDouble(2)
    assert(est > 10.0 && est < 20.0, s"estimate not distance-weighted: $est")
  }
}
