package graft

import graft.operators.Selection

/** Exact distributed selection: brute-force equality over duplicates and
  * negatives, boundary ranks, full-int64-range convergence, and the error
  * contract. */
class SelectionSpec extends SparkTestBase {

  test("kthSmallest == sorted index over a duplicate-heavy signed multiset") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(3000)(rnd.nextInt(200).toLong - 100L)
    val df = vals.toDF("v").repartition(8)
    val sorted = vals.sorted
    for (k <- Seq(1, 2, 77, 1500, 1501, 2999, 3000)) {
      assert(Selection.kthSmallest(df, "v", k) == sorted(k - 1), s"k=$k")
    }
  }

  test("converges on the full int64 spread (extreme range, few values)") {
    import spark.implicits._
    val vals = Seq(Long.MinValue / 2, -5L, 0L, 3L, Long.MaxValue / 2, Long.MaxValue / 2)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    for (k <- 1 to vals.size)
      assert(Selection.kthSmallest(df, "v", k) == sorted(k - 1), s"k=$k")
  }

  test("weightedKth == cumulative-weight brute force (zero weights never decide)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((rnd.nextInt(150).toLong - 50L, rnd.nextInt(5).toLong)) // weights 0..4
    val df = rows.toDF("v", "w").repartition(8)
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    val totalW = expanded.size.toLong
    for (kw <- Seq(1L, totalW / 3, (totalW + 1) / 2, totalW)) {
      assert(Selection.weightedKth(df, "v", "w", kw) == expanded((kw - 1).toInt), s"kw=$kw")
    }
  }

  test("medianAndMad == brute-force lower medians; robust to planted extremes") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(1501)(rnd.nextInt(1000).toLong)
    def brute(vs: Seq[Long]): (Long, Long) = {
      val med = vs.sorted.apply((vs.size + 1) / 2 - 1)
      val devs = vs.map(v => math.abs(v - med)).sorted
      (med, devs((vs.size + 1) / 2 - 1))
    }
    assert(Selection.medianAndMad(base.toDF("v").repartition(8), "v") == brute(base))
    // 50 planted 10^12 extremes: median/MAD move only within the bulk —
    // the robustness property the mean/stddev gate lacks
    val spiked = base ++ Seq.fill(50)(1000000000000L)
    val (m2, d2) = Selection.medianAndMad(spiked.toDF("v").repartition(8), "v")
    assert((m2, d2) == brute(spiked))
    assert(m2 < 1000 && d2 < 1000, s"extremes dragged the robust pair: ($m2, $d2)")
    // nulls are excluded, not counted
    val withNulls = base.map(Option(_)) ++ Seq.fill(200)(Option.empty[Long])
    assert(Selection.medianAndMad(withNulls.toDF("v"), "v") == brute(base))
  }

  test("error contract: empty input and out-of-range k throw") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Selection.kthSmallest(Seq.empty[Long].toDF("v"), "v", 1)
    }
    intercept[IllegalArgumentException] {
      Selection.kthSmallest(Seq(1L, 2L).toDF("v"), "v", 3)
    }
  }
}
