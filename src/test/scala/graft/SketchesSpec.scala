package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches.HistQuantile

/** Histogram-quantile sketch: deterministic contract (bucket lower edge at
  * the max(1, ceil(q*n)) running count), partitioning-independence of the
  * merge, one-bucket-width error bound vs the exact quantile, clamping. */
class SketchesSpec extends SparkTestBase {

  test("hand-computed tiny case incl. q=0 and q=1") {
    import spark.implicits._
    // buckets of width 10 from 0: values -> buckets {0:[3], 1:[12,15], 3:[35]}
    val df = Seq(3L, 12L, 15L, 35L).toDF("v")
    val hq = udaf(new HistQuantile(0L, 10L, 5, Seq(0.0, 0.5, 0.75, 1.0)))
    val got = df.agg(hq(col("v")).as("qa"))
      .select(explode(col("qa"))).collect().map(_.getLong(0)).toSeq
    // n=4: targets max(1,0)=1 -> b0; ceil(2)=2 -> b1; ceil(3)=3 -> b1; 4 -> b3
    assert(got === Seq(0L, 10L, 10L, 30L))
  }

  test("partitioning-independent and within one bucket width of the exact quantile") {
    import spark.implicits._
    val xs = (0 until 5000).map(i => math.abs(i * 2654435761L % 100000L))
    val hq = udaf(new HistQuantile(0L, 1000L, 100, Seq(0.5, 0.95)))
    val r1 = xs.toDF("v").repartition(1).agg(hq(col("v"))).collect()(0).getSeq[Long](0)
    val r7 = xs.toDF("v").repartition(7).agg(hq(col("v"))).collect()(0).getSeq[Long](0)
    assert(r1 === r7, "merge must be partitioning-independent")
    val sorted = xs.sorted
    for ((q, est) <- Seq(0.5, 0.95).zip(r1)) {
      val exact = sorted(math.max(0, math.ceil(q * xs.size).toInt - 1))
      assert(est <= exact && exact < est + 1000,
        s"q=$q est=$est exact=$exact not within one bucket")
    }
  }

  test("out-of-range values clamp to the edge buckets") {
    import spark.implicits._
    val df = Seq(-500L, -1L, 1000000L).toDF("v")
    val hq = udaf(new HistQuantile(0L, 10L, 4, Seq(0.0, 1.0)))
    val got = df.agg(hq(col("v"))).collect()(0).getSeq[Long](0)
    assert(got === Seq(0L, 30L))
  }

  test("sketch groupBy == exact SQL recomputation on lineitem") {
    val li = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
    val hq = udaf(new HistQuantile(0L, 100000L, 110, Seq(0.5, 0.95)))
    val got = li.withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
      .groupBy("l_returnflag").agg(hq(col("cents")).as("qa"))
      .select(col("l_returnflag"), element_at(col("qa"), 1).as("p50"),
        element_at(col("qa"), 2).as("p95"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // exact recomputation via Spark SQL windows (mirrors the DuckDB oracle)
    li.createOrReplaceTempView("li_sketch")
    val want = spark.sql(
      """WITH x AS (SELECT l_returnflag,
        |    LEAST(109L, GREATEST(0L, CAST(floor(CAST(round(l_extendedprice * 100) AS BIGINT) / 100000.0) AS BIGINT))) AS b
        |  FROM li_sketch),
        |c AS (SELECT l_returnflag, b, count(*) AS cnt FROM x GROUP BY 1, 2),
        |w AS (SELECT l_returnflag, b,
        |        SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY b) AS cum,
        |        SUM(cnt) OVER (PARTITION BY l_returnflag) AS n FROM c)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN cum >= GREATEST(1L, CAST(ceil(0.5 * n) AS BIGINT)) THEN b * 100000 END) AS p50,
        |  MIN(CASE WHEN cum >= GREATEST(1L, CAST(ceil(0.95 * n) AS BIGINT)) THEN b * 100000 END) AS p95
        |FROM w GROUP BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want && got.nonEmpty)
  }
}
