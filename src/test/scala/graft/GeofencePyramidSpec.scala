package graft

import org.apache.spark.sql.functions._

import graft.operators.{Geofence, SpatialJoin, Tiling}

/** Geofence transition detection and the one-pass tile pyramid. */
class GeofencePyramidSpec extends SparkTestBase {

  // the ONE synthetic-coordinate derivation (SparkEntry.latSqlFor), not an
  // inline copy, so spec and query cannot drift
  private def geo(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
    .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))

  test("geofence transitions == brute-force membership diff per track") {
    val pts = geo(spark.read.parquet(s"${sf("sf0.001")}/events.parquet"))
    val got = Geofence.transitions(pts, "user_id", "ts", "event_id", "lat", "lon",
      SparkEntryRegions.rects)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet

    // full-precision ordering key (epochSecond, nano) — millis truncation
    // could disagree with the operator's ts ordering on sub-ms timestamps
    def tsKey(r: org.apache.spark.sql.Row, i: Int): (Long, Int) = {
      val inst = r.getAs[java.time.LocalDateTime](i).toInstant(java.time.ZoneOffset.UTC)
      (inst.getEpochSecond, inst.getNano)
    }
    val rows = pts.select("user_id", "ts", "event_id", "lat", "lon").collect()
      .map(r => (r.getLong(0), tsKey(r, 1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val expected = (for {
      (rid, region) <- SparkEntryRegions.rects
      (_, track) <- rows.groupBy(_._1).toSeq
      sorted = track.sortBy(e => (e._2, e._3))
      (e, i) <- sorted.zipWithIndex
      in = SpatialJoin.regionContains(region, e._4, e._5)
      was = i > 0 && SpatialJoin.regionContains(region, sorted(i - 1)._4, sorted(i - 1)._5)
      if in != was
    } yield (e._1, e._3, rid, if (in) "enter" else "exit")).toSet
    assert(got === expected)
    assert(got.exists(_._4 == "enter") && got.exists(_._4 == "exit"))
  }

  test("tile pyramid: each level is exactly the finer level rolled up by s2_parent") {
    import graft.functions.s2functions._
    val pts = SparkEntry.points(spark, sf("sf0.001"))
    val total = pts.count()
    val pyr = Tiling.tilePyramid(pts, "lat", "lon", 2, 6).cache()
    for (l <- 2 to 6) {
      val lvl = pyr.where(col("level") === l)
      assert(lvl.agg(sum("n")).head().getLong(0) === total, s"level $l must cover every point")
      // equals the single-level histogram
      val direct = Tiling.tileStats(pts, "lat", "lon", l)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(lvl.select("tile_token", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet === direct)
    }
    // rollup identity: level L == level L+1 grouped by parent
    for (l <- 2 to 5) {
      val coarse = pyr.where(col("level") === l)
        .select("tile_token", "n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val rolled = pyr.where(col("level") === l + 1)
        .select(s2_token(s2_parent(s2_cell_from_token(col("tile_token")), l)).as("p"), col("n"))
        .groupBy("p").agg(sum("n").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(coarse === rolled, s"level $l != rollup of level ${l + 1}")
    }
    pyr.unpersist()
  }
}
