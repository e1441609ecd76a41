package graft

import org.apache.spark.sql.functions._

import graft.plans.S2Extensions
import graft.s2.{R1Interval, S1Interval, S2LatLngRect, TextShapes}

/** SparkSessionExtensions: SQL function registration and the
  * spatial-predicate bounds-pushdown rule. */
class ExtensionsSpec extends SparkTestBase {

  private def pointsDf = {
    spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
      .withColumn("lat", expr("CAST((o_orderkey * 9973 + 12345) % 18000 AS DOUBLE) / CAST(100 AS DOUBLE) - CAST(90 AS DOUBLE)"))
      .withColumn("lon", expr("CAST((o_orderkey * 31337 + 54321) % 36000 AS DOUBLE) / CAST(100 AS DOUBLE) - CAST(180 AS DOUBLE)"))
      .select("o_orderkey", "lat", "lon")
  }

  test("s2_* functions usable from SQL after registration") {
    S2Extensions.install(spark)
    pointsDf.createOrReplaceTempView("pts")
    val row = spark.sql(
      """SELECT s2_token(s2_parent(s2_cell_id(48.11027908325195D, 16.569721221923828D), 11)) AS tok,
        | s2_level(s2_parent(s2_cell_id(lat, lon), 8)) AS lvl
        |FROM pts LIMIT 1""".stripMargin).collect()(0)
    assert(row.getString(0) == "476c544")
    assert(row.getInt(1) == 8)
  }

  test("st_contains predicate matches pipJoin refinement semantics") {
    S2Extensions.install(spark)
    val poly = TextShapes.polygon("0:-30, 30:0, 0:30, -30:0")
    val viaPredicate = pointsDf
      .where(S2Extensions.st_contains(poly, col("lat"), col("lon")))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val brute = pointsDf.collect().filter { r =>
      graft.operators.SpatialJoin.regionContains(poly, r.getDouble(1), r.getDouble(2))
    }.map(_.getLong(0)).toSet
    assert(viaPredicate == brute)
    assert(brute.nonEmpty)
  }

  test("PushS2RegionBounds injects scan-pushable lat/lon conjuncts") {
    S2Extensions.install(spark)
    val rect = S2LatLngRect(
      R1Interval(math.toRadians(10), math.toRadians(20)),
      S1Interval(math.toRadians(30), math.toRadians(40)))
    val df = pointsDf.where(S2Extensions.st_contains(rect, col("lat"), col("lon")))
    val optimized = df.queryExecution.optimizedPlan.toString
    // the rule must have conjoined plain comparisons on lat/lon
    assert(optimized.contains(">= 9.99") || optimized.contains(">= 10.0"),
      s"no pushed lat bound in:\n$optimized")
    // and the result is still exact
    val got = df.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val brute = pointsDf.collect().filter { r =>
      graft.operators.SpatialJoin.regionContains(rect, r.getDouble(1), r.getDouble(2))
    }.map(_.getLong(0)).toSet
    assert(got == brute)
  }

  test("s2_rect_covering: SQL-registered, constant-folded, complete for a rect") {
    graft.functions.s2functions.registerAll(spark)
    // wrap rect spanning the antimeridian
    val df = spark.sql(
      """SELECT s2_rect_covering(CAST(-5.0 AS DOUBLE), CAST(5.0 AS DOUBLE),
        |                        CAST(175.0 AS DOUBLE), CAST(-175.0 AS DOUBLE), 4) AS cov""".stripMargin)
    // literal args -> ConstantFolding evaluates at plan time: the optimized
    // plan carries the array literal, not the expression
    assert(!df.queryExecution.optimizedPlan.toString.contains("s2_rect_covering"),
      "literal-arg covering must constant-fold")
    val cov = df.head().getSeq[Long](0).toSet
    assert(cov.nonEmpty)
    import graft.s2.{S2Cell, S2CellId}
    // completeness: every point of the rect maps to a level-4 cell in cov
    for (lat <- BigDecimal(-4.9) to BigDecimal(4.9) by 1.1; lonOff <- BigDecimal(0.1) to BigDecimal(9.9) by 1.1) {
      val lon = 175.0 + lonOff.toDouble
      val lonW = if (lon > 180) lon - 360 else lon
      val cell = S2CellId.parentForLevel(S2CellId.fromLatLngDegrees(lat.toDouble, lonW), 4)
      assert(cov.contains(cell), s"cell of ($lat, $lonW) missing from covering")
    }
    // all members really are level 4 and SOUND: each intersects the rect
    assert(cov.forall(S2CellId.level(_) == 4))
    val wrapRect = S2LatLngRect(
      R1Interval(math.toRadians(-5.0), math.toRadians(5.0)),
      S1Interval(math.toRadians(175.0), math.toRadians(-175.0)))
    assert(cov.forall(c => wrapRect.mayIntersectCell(S2Cell(c))),
      "covering member does not intersect the rect")
  }

  test("s2_cap_covering: SQL-registered, constant-folded, complete and sound for a cap") {
    graft.functions.s2functions.registerAll(spark)
    val radiusM = 2500000.0
    val df = spark.sql(
      s"SELECT s2_cap_covering(CAST(10.0 AS DOUBLE), CAST(20.0 AS DOUBLE), ${radiusM}D, 4) AS cov")
    assert(!df.queryExecution.optimizedPlan.toString.contains("s2_cap_covering"),
      "literal-arg cap covering must constant-fold")
    val cov = df.head().getSeq[Long](0).toSet
    assert(cov.nonEmpty)
    import graft.s2.{S2Cell, S2CellId, S2LatLng}
    val angle = radiusM / S2LatLng.EarthRadiusMeters
    val cap = graft.s2.S2Cap.fromAxisAngle(S2LatLng.fromDegrees(10.0, 20.0).toPoint, angle)
    // completeness: every contained sample point's level-4 cell is in cov
    for (lat <- BigDecimal(-10) to BigDecimal(30) by 2.7; lon <- BigDecimal(0) to BigDecimal(40) by 2.7) {
      val p = S2LatLng.fromDegrees(lat.toDouble, lon.toDouble).toPoint
      if (cap.contains(p)) {
        val cell = S2CellId.parentForLevel(S2CellId.fromPoint(p), 4)
        assert(cov.contains(cell), s"cell of ($lat, $lon) missing from cap covering")
      }
    }
    // soundness: every member is level 4 and may intersect the cap
    assert(cov.forall(S2CellId.level(_) == 4))
    assert(cov.forall(c => cap.mayIntersectCell(S2Cell(c))),
      "cap covering member does not intersect the cap")
    // guard: a leaf-level covering of a planet-scale cap must fail fast,
    // not hang the driver inside constant folding
    val huge = intercept[Exception] {
      spark.sql(s"SELECT s2_cap_covering(0.0D, 0.0D, ${radiusM}D, 30)").collect()
    }
    assert(huge.getMessage.contains("coarser level"), s"unexpected guard message: ${huge.getMessage}")
  }
}
