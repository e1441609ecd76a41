package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sketches}
import graft.operators.Sketches.HllAggregator

/** Sketch contracts the SQL oracle cannot check: estimate ACCURACY (the
  * oracles pin the integer registers/counters bit-for-bit; these specs pin
  * that the estimates derived from them are actually good), the typed
  * aggregator == compositional-aggregation equivalence (i.e. the mergeable
  * register buffer computes the same summary as the groupBy path), and the
  * CMS one-sided-error guarantee. */
class SketchesSpec extends SparkTestBase {

  /** n distinct synthetic values, tagged so different cardinalities don't
    * collide with each other. */
  private def values(tag: String, n: Int) =
    (0 until n).map(i => (tag, s"value-$tag-$i"))

  test("HLL estimate within 3 sigma (6.5% std error at m=256) across cardinalities") {
    import spark.implicits._
    val df = (values("c100", 100) ++ values("c1000", 1000) ++ values("c10000", 10000))
      .toDF("grp", "v")
    val est = Sketches.hllStats(df, Seq("grp"), "v")
      .withColumn("est", Sketches.hllEstimate(col("hll_zeros"), col("hll_harmonic")))
      .select("grp", "est").as[(String, Double)].collect().toMap
    for ((grp, truth) <- Seq("c100" -> 100.0, "c1000" -> 1000.0, "c10000" -> 10000.0)) {
      val rel = math.abs(est(grp) - truth) / truth
      assert(rel < 0.20, s"$grp: est ${est(grp)} vs $truth (rel $rel)")
    }
  }

  test("HLL duplicate-blindness: dup-heavy input yields identical registers") {
    import spark.implicits._
    val base = values("d", 500).toDF("grp", "v")
    val dupped = base.union(base).union(base)
    val a = Sketches.hllStats(base, Seq("grp"), "v").collect().head
    val b = Sketches.hllStats(dupped, Seq("grp"), "v").collect().head
    assert(a === b)
  }

  test("typed HllAggregator (mergeable register buffer) == compositional hllStats") {
    import spark.implicits._
    val df = values("m", 3000).toDF("grp", "v")
    val compositional = Sketches.hllStats(df, Seq("grp"), "v")
      .select("hll_zeros", "hll_harmonic").as[(Long, Long)].collect().head
    // 16 partitions force real partial-buffer merges through merge()
    val hashes = df.repartition(16)
      .select(Dedup.portableHash(col("v")).as("h")).as[Long]
    val packed = hashes.select(new HllAggregator().toColumn).collect().head
    assert(Sketches.unpackHll(packed) === compositional)
  }

  test("KMV estimate (k-1)*P/kth_min within 25% (~3 sigma at k=128) of true cardinality") {
    import spark.implicits._
    val k = 128
    val df = values("k5000", 5000).toDF("grp", "v")
    val sketch = Sketches.kmvSketch(df, Seq("grp"), "v", k)
    val (filled, kth) = Sketches.kmvStats(sketch, Seq("grp"))
      .select("kmv_filled", "kth_min").as[(Long, Long)].collect().head
    assert(filled === k.toLong)
    val est = (k - 1).toDouble * Dedup.HashP / kth
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"est $est")
    // below-k cardinality: the sketch IS the exact distinct set
    val small = Sketches.kmvStats(
      Sketches.kmvSketch(values("k40", 40).toDF("grp", "v"), Seq("grp"), "v", k),
      Seq("grp")).select("kmv_filled").as[Long].collect().head
    assert(small === 40L)
  }

  test("KMV overlap matches/k tracks true Jaccard of planted overlapping sets") {
    import spark.implicits._
    val k = 128
    // A and B share 2000 of 3000 values each: true Jaccard = 2000/4000 = 0.5
    val a = (0 until 3000).map(i => ("a", s"shared-$i"))
    val b = (1000 until 4000).map(i => ("b", s"shared-$i"))
    val df = (a ++ b).toDF("grp", "v")
    val sketch = Sketches.kmvSketch(df, Seq("grp"), "v", k)
    val pairs = Seq(("a", "b")).toDF("ga", "gb")
    val row = Sketches.kmvOverlap(sketch, "grp", pairs, k)
      .select("union_filled", "matches").as[(Long, Long)].collect().head
    assert(row._1 === k.toLong)
    val jaccardEst = row._2.toDouble / k
    assert(math.abs(jaccardEst - 0.5) < 0.15, s"jaccard est $jaccardEst")
  }

  test("CMS is one-sided (est >= true for every key) and exact off collisions") {
    import spark.implicits._
    // zipf-ish: key i appears (100 - i) times, i in [0, 100)
    val rows = (0 until 100).flatMap(i => Seq.fill(100 - i)(s"key-$i"))
    val df = rows.toDF("v")
    val counters = Sketches.cmsCounters(df, "v", depth = 4, width = 256)
    val probes = (0 until 100).map(i => s"key-$i").toDF("v")
    val est = Sketches.cmsEstimate(counters, probes, "v", depth = 4, width = 256)
      .as[(String, Long)].collect().toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var exact = 0
    for ((kk, t) <- truth) {
      assert(est(kk) >= t, s"$kk: est ${est(kk)} < true $t")
      // CMS guarantee: overshoot <= e/width * N with prob 1 - e^-depth;
      // deterministic here, so assert the bound outright (N = 5050)
      assert(est(kk) - t <= (math.E / 256 * rows.size).ceil.toLong, s"$kk overshoot")
      if (est(kk) == t) exact += 1
    }
    assert(exact >= 90, s"only $exact/100 exact at 100 keys over 4x256 counters")
  }

  test("CMS counters are mergeable: counters(A ++ B) == cellwise sum of counters(A), counters(B)") {
    import spark.implicits._
    val a = (0 until 50).map(i => s"key-$i").toDF("v")
    val b = (25 until 75).map(i => s"key-$i").toDF("v")
    val whole = Sketches.cmsCounters(a.union(b), "v")
    val merged = Sketches.cmsCounters(a, "v").union(Sketches.cmsCounters(b, "v"))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
  }
}
