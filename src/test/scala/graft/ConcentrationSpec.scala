package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profiling, Tiling, Trajectories}

/** Gini index and per-entity visit concentration: hand-checked closed
  * forms, degenerate guards, and exact brute-force replays on fixture
  * events (both operators promise bit-identical IEEE doubles). */
class ConcentrationSpec extends SparkTestBase {

  test("gini: uniform is 0, single-spike is (n-1)/n, hand case exact") {
    import spark.implicits._
    val uniform = Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)).toDF("x", "t")
    val g0 = Profiling.giniIndex(uniform, "x", "t").head()
    assert((g0.getLong(0), g0.getLong(1), g0.getDouble(2)) === ((4L, 20L, 0.0)))
    val spike = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 4L)).toDF("x", "t")
    assert(Profiling.giniIndex(spike, "x", "t").head().getDouble(2) === 0.75)
    // x = [1, 3]: rank-sum num = 2*(1*1 + 2*3) - 3*4 = 2, den = 2*4 -> 0.25
    val pair = Seq((3L, 1L), (1L, 2L)).toDF("x", "t")
    assert(Profiling.giniIndex(pair, "x", "t").head().getDouble(2) === 0.25)
    // all-zero mass -> NULL
    val zeros = Seq((0L, 1L), (0L, 2L)).toDF("x", "t")
    assert(Profiling.giniIndex(zeros, "x", "t").head().isNullAt(2))
  }

  test("gini on fixture zoom-6 tile counts == exact brute force") {
    val pts = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val tiles = Tiling.zxyAssign(pts, "lat", "lon", 6)
      .groupBy("zx", "zy").agg(count(lit(1)).as("x"))
      .withColumn("t", col("zx") * 64L + col("zy"))
    val got = Profiling.giniIndex(tiles, "x", "t").head()
    val xs = tiles.collect().map(_.getAs[Long]("x")).sorted
    val n = xs.length.toLong
    val sx = xs.sum
    val srx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val want = (2 * srx - (n + 1) * sx).toDouble / (n * sx).toDouble
    assert(got.getLong(0) === n)
    assert(got.getLong(1) === sx)
    assert(got.getDouble(2) === want)
    assert(want > 0.0 && want < 1.0, "fixture tiles must be unequal but not degenerate")
  }

  test("visitConcentration: hand case and exact brute force on fixture") {
    import spark.implicits._
    // entity 1: cells a,a,b -> c = [2,1], hhi = (4+1)/9; entity 2: one cell -> 1.0
    val visits = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 30L)).toDF("user_id", "cell")
    val hand = Trajectories.visitConcentration(visits, "user_id", "cell")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(hand === Map(1L -> ((3L, 2L, 5.0 / 9.0)), 2L -> ((1L, 1L, 1.0))))

    val pts = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("lat", expr(SparkEntry.latSqlFor("event_id")))
      .withColumn("lon", expr(SparkEntry.lonSqlFor("event_id")))
    val cells = Tiling.zxyAssign(pts, "lat", "lon", 6)
      .withColumn("cell", col("zx") * 64L + col("zy"))
    val got = Trajectories.visitConcentration(cells, "user_id", "cell")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val brute = cells.select("user_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, rows) =>
        val cs = rows.groupBy(_._2).map(_._2.length.toLong).toSeq
        val nv = cs.sum
        u -> ((nv, cs.length.toLong, cs.map(c => c * c).sum.toDouble / (nv * nv).toDouble))
      }
    assert(got === brute)
    assert(got.values.exists(_._3 < 1.0) && got.values.forall(v => v._3 > 0.0 && v._3 <= 1.0))
  }
}
