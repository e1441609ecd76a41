package graft

import org.apache.spark.sql.functions._

import graft.operators.{SpatialJoin, Validation}

/** The one-scan validation gate and the two PIP-composition operators
  * added alongside it: brute-force equality against the obvious
  * per-rule / join-then-aggregate plans, the single-scan plan shape,
  * null-predicate semantics, the guard rails, and the exact-complement
  * property of the anti join. */
class ValidationZonalSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("validate == one filter-count per rule, including a NULL-valued predicate") {
    val rules = Seq(
      "short" -> (col("n_chars") < 200L),
      "zh" -> (col("lang") === "zh"),
      // substring on a possibly-absent match: NULL for most rows — must
      // count as no violation, not poison the sum
      "null_pred" -> (substring(col("text"), 1, 1) === "Z"),
      "never" -> lit(false))
    val got = Validation.validate(docs, rules)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val n = docs.count()
    val want = rules.map { case (name, p) => (name, docs.where(p).count(), n) }
    assert(got == want)
  }

  test("validate is a single scan: one parquet read in the executed plan") {
    val plan = Validation.validate(docs, Seq(
        "a" -> col("n_chars").isNull, "b" -> (col("lang") === "en")))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly 1 scan, got $scans:\n$plan")
  }

  test("tvDrift: identical periods give zero contribs; a moved bucket's contrib is exact") {
    import spark.implicits._
    // period A: 6×x, 4×y; period B: identical shape scaled 2x -> all zero
    val same = (Seq.fill(6)("x") ++ Seq.fill(4)("y")).map((_, false)) ++
      (Seq.fill(12)("x") ++ Seq.fill(8)("y")).map((_, true))
    val g0 = Validation.tvDrift(same.toDF("b", "p"), col("b"), col("p"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(g0 == Map("x" -> ((6L, 12L, 0L)), "y" -> ((4L, 8L, 0L))))
    // shift mass x->z in B: contribs = |a*NB - b*NA|, NA = 10, NB = 10
    val drift = (Seq.fill(6)("x") ++ Seq.fill(4)("y")).map((_, false)) ++
      (Seq.fill(2)("x") ++ Seq.fill(4)("y") ++ Seq.fill(4)("z")).map((_, true))
    val g1 = Validation.tvDrift(drift.toDF("b", "p"), col("b"), col("p"))
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(g1 == Map("x" -> 40L, "y" -> 0L, "z" -> 40L))
    // TV = sum/(2*NA*NB) = 80/200 = 0.4: exactly the moved mass fraction
  }

  test("validate guards: empty rules, bad names, duplicate names") {
    intercept[IllegalArgumentException](Validation.validate(docs, Seq.empty))
    intercept[IllegalArgumentException](
      Validation.validate(docs, Seq("bad name" -> lit(true))))
    intercept[IllegalArgumentException](
      Validation.validate(docs, Seq("x" -> lit(true), "x" -> lit(false))))
  }

  private lazy val pts =
    SparkEntry.points(spark, sf("sf0.001")).select("o_orderkey", "lat", "lon")
  private lazy val polys = SparkEntry.hexPolyTable(spark, sf("sf0.001"))

  test("zonalStats == polygonPipJoin then groupBy (the naive plan)") {
    val got = SpatialJoin.zonalStats(pts, "lat", "lon", "o_orderkey",
        polys, "region_id", "lats", "lons", level = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = SpatialJoin.polygonPipJoin(pts, "lat", "lon",
        polys, "region_id", "lats", "lons", level = 6)
      .groupBy("region_id")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("zonalStats guards: reserved columns and non-integral valueCol") {
    intercept[IllegalArgumentException](
      SpatialJoin.zonalStats(pts.withColumn("__n", lit(1)), "lat", "lon",
        "o_orderkey", polys, "region_id", "lats", "lons", level = 6))
    intercept[IllegalArgumentException](
      SpatialJoin.zonalStats(pts.withColumn("v", lit(1.5)), "lat", "lon", "v",
        polys, "region_id", "lats", "lons", level = 6))
  }

  test("polygonPipAntiJoin is the exact complement of polygonPipJoin") {
    val matched = SpatialJoin.polygonPipJoin(pts, "lat", "lon",
        polys, "region_id", "lats", "lons", level = 6)
      .select("o_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val anti = SpatialJoin.polygonPipAntiJoin(pts, "o_orderkey", "lat", "lon",
        polys, "region_id", "lats", "lons", level = 6)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val all = pts.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert((matched intersect anti).isEmpty)
    assert((matched union anti) == all)
    assert(matched.nonEmpty && anti.nonEmpty)
  }
}
