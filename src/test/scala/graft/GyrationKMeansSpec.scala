package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Trajectories}

/** Radius of gyration + seeded integer k-means: closed-form hand fixtures,
  * loud-guard contracts, and exact driver-side replays at sf0.001. */
class GyrationKMeansSpec extends SparkTestBase {

  test("radiusOfGyration: closed-form square fixture") {
    import spark.implicits._
    // centroid (1,1), every point at squared distance 2:
    // num = 4*16 - 16 - 16 = 32, rg = sqrt(32)/4 = sqrt(2)
    val pts = Seq((1L, 0L, 0L), (1L, 2L, 0L), (1L, 0L, 2L), (1L, 2L, 2L))
      .toDF("user_id", "x", "y")
    val got = Trajectories.radiusOfGyration(pts, "user_id", "x", "y").collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 4L)
    assert(got(0).getLong(2) === 32L)
    assert(java.lang.Double.doubleToLongBits(got(0).getDouble(3)) ===
      java.lang.Double.doubleToLongBits(math.sqrt(32.0) / 4.0))
  }

  test("radiusOfGyration: negative coordinate raises loudly") {
    import spark.implicits._
    val pts = Seq((1L, -1L, 0L)).toDF("user_id", "x", "y")
    val e = intercept[Exception] {
      Trajectories.radiusOfGyration(pts, "user_id", "x", "y").collect()
    }
    assert(e.getMessage != null)
  }

  test("radiusOfGyration: exact integer replay at sf0.001") {
    val pts = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("x", expr("(event_id * 9973 + 12345) % 18000"))
      .withColumn("y", expr("(event_id * 31337 + 54321) % 36000"))
    val got = Trajectories.radiusOfGyration(pts, "user_id", "x", "y")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = pts.select("user_id", "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).view.mapValues { g =>
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sq = g.map(p => p._2 * p._2 + p._3 * p._3).sum
      (n, n * sq - sx * sx - sy * sy)
    }.toMap
    assert(got === want)
    assert(want.values.forall(_._2 >= 0), "Konig-Huygens numerator must be non-negative")
  }

  private val seeds = Seq((0, 0L, 0L), (1, 100L, 100L))

  test("kMeansScaled: hand fixture converges to the two obvious centroids") {
    import spark.implicits._
    val pts = Seq((1L, 1L, 1L), (2L, 3L, 1L), (3L, 99L, 99L), (4L, 101L, 99L))
      .toDF("id", "x", "y")
    val got = Clustering.kMeansScaled(pts, "id", "x", "y", seeds, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((0, 2L, 2L, 1L), (1, 2L, 100L, 99L)))
  }

  test("kMeansScaled: an empty cluster keeps its previous centroid with n = 0") {
    import spark.implicits._
    val pts = Seq((1L, 1L, 1L), (2L, 3L, 1L)).toDF("id", "x", "y")
    val got = Clustering.kMeansScaled(pts, "id", "x", "y", seeds, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((0, 2L, 2L, 1L), (1, 0L, 100L, 100L)))
  }

  test("kMeansScaled: out-of-range coordinate raises loudly") {
    import spark.implicits._
    val pts = Seq((1L, 5L, 2000001L)).toDF("id", "x", "y")
    val e = intercept[Exception] {
      Clustering.kMeansScaled(pts, "id", "x", "y", seeds, rounds = 1,
        maxCoord = 1000000L).collect()
    }
    assert(e.getMessage != null)
  }

  test("kMeansScaled: exact 3-round replay at sf0.001") {
    val pts = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
      .withColumn("x", expr("(o_orderkey * 9973 + 12345) % 18000"))
      .withColumn("y", expr("(o_orderkey * 31337 + 54321) % 36000"))
    val ks = Seq(
      (0, 3000L, 6000L), (1, 3000L, 18000L), (2, 3000L, 30000L),
      (3, 9000L, 12000L), (4, 9000L, 24000L),
      (5, 15000L, 6000L), (6, 15000L, 18000L), (7, 15000L, 30000L))
    val got = Clustering.kMeansScaled(pts, "o_orderkey", "x", "y", ks, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

    val rows = pts.select("o_orderkey", "x", "y").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    var cents: Seq[(Int, Long, Long)] = ks
    var lastN: Map[Int, Long] = Map.empty
    for (_ <- 1 to 3) {
      val assigned = rows.map { case (x, y) =>
        val best = cents.map { case (cid, cx, cy) =>
          ((x - cx) * (x - cx) + (y - cy) * (y - cy), cid)
        }.min._2
        (best, x, y)
      }
      val byC = assigned.groupBy(_._1)
      lastN = cents.map { case (cid, _, _) =>
        cid -> byC.get(cid).map(_.length.toLong).getOrElse(0L)
      }.toMap
      cents = cents.map { case (cid, cx, cy) =>
        byC.get(cid) match {
          case Some(g) =>
            (cid, g.map(_._2).sum / g.length, g.map(_._3).sum / g.length)
          case None => (cid, cx, cy)
        }
      }
    }
    val want = cents.map { case (cid, cx, cy) => (cid, lastN(cid), cx, cy) }
      .sortBy(_._1)
    assert(got === want)
    assert(got.count(_._2 > 0) >= 6, s"degenerate clustering: $got")
  }
}
