package graft

import org.apache.spark.sql.functions._

import graft.operators.Trajectories

/** Cell co-visitation affinity: hand fixture with closed-form Jaccard,
  * brute-force replay on the real table, and the loud per-entity fan
  * guard (silent wedge truncation would under-count pairs invisibly). */
class CoVisitationSpec extends SparkTestBase {

  test("hand fixture: exact overlap counts and scaled Jaccard rank") {
    import spark.implicits._
    // u1: {10, 20, 30}; u2: {10, 20}; u3: {10, 20}; u4: {30, 40}
    // (10,20): common 3, da 3, db 3 -> J = 3/3 -> score 10^12
    // (10,30), (20,30): common 1 -> below minCommon 2
    // (30,40): common 1 -> below
    val visits = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 10L), // duplicate visit must not double-count
      (4L, 30L), (4L, 40L)
    ).toDF("user_id", "cell")
    val got = Trajectories.coVisitation(visits, "user_id", "cell",
      minCommon = 2, maxCellsPerEntity = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq((10L, 20L, 3L, 3L, 3L, 1000000000000L)))
  }

  test("per-entity fan guard raises loudly, never truncates") {
    import spark.implicits._
    val visits = (1L to 10L).map(c => (1L, c)).toDF("user_id", "cell")
    val e = intercept[Exception] {
      Trajectories.coVisitation(visits, "user_id", "cell", 1, 4, 5).collect()
    }
    assert(e.getMessage != null)
  }

  test("brute-force replay is exact at sf0.001") {
    val cellSql = "(((event_id * 9973 + 12345) % 18000) div 1000) * 100 + " +
      "(((event_id * 31337 + 54321) % 36000) div 1000)"
    val visits = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("cell", expr(cellSql))
    val got = Trajectories.coVisitation(visits, "user_id", "cell",
      minCommon = 2, maxCellsPerEntity = 512, k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

    val raw = visits.select(col("user_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val deg = raw.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val common = raw.groupBy(_._1).values.flatMap { vs =>
      val cells = vs.map(_._2).sorted
      for (i <- cells.indices; j <- i + 1 until cells.size) yield (cells(i), cells(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2)
    val want = common.map { case ((a, b), cm) =>
      (a, b, cm, deg(a), deg(b), cm * 1000000000000L / (deg(a) + deg(b) - cm))
    }.toSeq.sortBy { case (a, b, _, _, _, s) => (-s, a, b) }.take(30)
    assert(got === want)
    assert(got.size === 30, s"degenerate affinity listing: ${got.size} rows")
  }
}
