package graft

import org.apache.spark.sql.functions._

import graft.operators.Evaluation

/** Exact AUC + calibration: closed-form fixtures (perfect, reversed,
  * constant score), brute-force pair-counting equality on randomized tied
  * data, and the bin-partition invariants. */
class EvaluationSpec extends SparkTestBase {

  private def auc(rows: Seq[(Long, Boolean, Long)]): (Long, Long, Long, Option[Double]) = {
    import spark.implicits._
    val df = rows.toDF("score", "label", "tie")
    Evaluation.aucStats(df, col("score"), col("label"))
      .as[(Long, Long, Long, Option[Double])].head()
  }

  test("closed forms: perfect separation 1.0, reversed 0.0, constant score 0.5, one-class NULL") {
    val perfect = (1L to 50L).map(i => (i, i > 30L, i))
    assert(auc(perfect)._4.contains(1.0))
    val reversed = (1L to 50L).map(i => (i, i <= 20L, i))
    assert(auc(reversed)._4.contains(0.0))
    val constant = (1L to 50L).map(i => (7L, i % 3 == 0, i))
    assert(auc(constant)._4.contains(0.5))
    assert(auc((1L to 10L).map(i => (i, true, i)))._4.isEmpty)
  }

  test("r2_pos identity == brute-force pair wins + half ties on randomized tied data") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 400L).map(i => (rnd.nextInt(12).toLong, rnd.nextBoolean(), i))
    val (p, nn, r2, a) = auc(rows)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    assert(p == pos.size && nn == neg.size)
    val wins = (for (x <- pos; y <- neg) yield if (x > y) 1L else 0L).sum
    val ties = (for (x <- pos; y <- neg) yield if (x == y) 1L else 0L).sum
    // AUC·2PN = 2·wins + ties; engine-side that is r2_pos − P(P+1)
    assert(r2 - p * (p + 1) == 2 * wins + ties, s"r2=$r2 p=$p wins=$wins ties=$ties")
    val expect = (r2.toDouble - p.toDouble * (p + 1)) / (2 * p.toDouble * nn.toDouble)
    assert(a.contains(expect))
    assert(math.abs(expect - (2.0 * wins + ties) / (2.0 * p * nn)) < 1e-12)
  }

  test("ksTest: identical samples 0, disjoint supports 1, random == brute CDF sup-gap") {
    import spark.implicits._
    def ks(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Option[Double]) =
      Evaluation.ksTest(rows.toDF("v", "p"), col("v"), col("p"))
        .as[(Long, Long, Long, Option[Double])].head()
    val same = (1L to 40L).flatMap(i => Seq((i % 7, false), (i % 7, true)))
    assert(ks(same) == ((40L, 40L, 0L, Some(0.0))))
    val disjoint = (1L to 30L).map(i => (i, false)) ++ (31L to 55L).map(i => (i, true))
    assert(ks(disjoint)._4.contains(1.0))
    val rnd = new scala.util.Random(41)
    val rows = (1 to 500).map(_ => (rnd.nextInt(20).toLong, rnd.nextBoolean()))
    val (na, nb, dnum, d) = ks(rows)
    val a = rows.filterNot(_._2).map(_._1)
    val b = rows.filter(_._2).map(_._1)
    assert(na == a.size && nb == b.size)
    val grid = (a ++ b).distinct.sorted
    val brute = grid.map { v =>
      math.abs(a.count(_ <= v).toLong * nb - b.count(_ <= v).toLong * na) }.max
    assert(dnum == brute)
    assert(d.contains(dnum.toDouble / (na.toDouble * nb.toDouble)))
  }

  test("aucStatsBy == per-segment aucStats; one-class segments NULL") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val rows = (1 to 600).map { _ =>
      val g = Seq("x", "y", "z")(rnd.nextInt(3))
      (g, rnd.nextInt(15).toLong, rnd.nextBoolean())
    } :+ (("onlypos", 3L, true)) :+ (("onlypos", 5L, true))
    val df = rows.toDF("g", "score", "label")
    val got = Evaluation.aucStatsBy(df, "g", col("score"), col("label"))
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    for (g <- Seq("x", "y", "z")) {
      val single = Evaluation.aucStats(df.where(col("g") === g),
          col("score"), col("label"))
        .as[(Long, Long, Long, Option[Double])].head()
      assert(got(g) == ((single._1, single._2, single._3, single._4)), s"segment $g")
    }
    assert(got("onlypos")._4.isEmpty)
    assert(got.size == 4)
  }

  test("groupPercentile == per-group scalar rank; singleton groups NULL") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1L to 300L).map(i =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), i, rnd.nextInt(25).toLong)) :+ (("solo", 999L, 5L))
    val got = Evaluation.groupPercentile(rows.toDF("g", "id", "v"),
        "g", col("v"), col("id"))
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
    val byGrp = rows.groupBy(_._1)
    got.foreach { case (g, id, v, rank, n, pct) =>
      val sorted = byGrp(g).sortBy(r => (r._3, r._2))
      val idx = sorted.indexWhere(_._2 == id)
      assert(v == sorted(idx)._3 && rank == idx + 1 && n == sorted.size)
      if (n <= 1) assert(pct.isEmpty)
      else assert(pct.contains((rank - 1).toDouble / (n - 1).toDouble))
    }
    assert(got.count(_._6.isEmpty) == 1) // the singleton
    assert(got.length == rows.size)
  }

  test("anovaF: closed forms (identical means 0, empty group NULL) and scalar replay") {
    import spark.implicits._
    def f(rows: Seq[(Long, String)], groups: Seq[String]) =
      Evaluation.anovaF(rows.toDF("y", "g"), col("y"), col("g"), groups)
        .select("f_stat").as[Option[Double]].head()
    // identical group distributions -> SSB = 0 -> F = 0
    assert(f(Seq((1L, "a"), (3L, "a"), (1L, "b"), (3L, "b")), Seq("a", "b")).contains(0.0))
    // empty group -> NULL; zero within-variation -> NULL
    assert(f(Seq((1L, "a"), (2L, "a")), Seq("a", "b")).isEmpty)
    assert(f(Seq((1L, "a"), (1L, "a"), (5L, "b"), (5L, "b")), Seq("a", "b")).isEmpty)
    // scalar replay of the same fixed-order expression tree
    val rnd = new scala.util.Random(9)
    val rows = (1 to 300).map { _ =>
      val g = Seq("a", "b", "c")(rnd.nextInt(3))
      val y = (rnd.nextInt(30) + (if (g == "c") 12 else 0)).toLong
      (y, g)
    }
    val got = f(rows, Seq("a", "b", "c"))
    val by = rows.groupBy(_._2)
    val (ns, ss, qs) = (Seq("a", "b", "c").map(g => by(g).size.toDouble),
      Seq("a", "b", "c").map(g => by(g).map(_._1).sum.toDouble),
      Seq("a", "b", "c").map(g => by(g).map(v => v._1 * v._1).sum.toDouble))
    val bsum = (ss, ns).zipped.map((s, n) => s * s / n).reduce(_ + _)
    val (qsum, ssum, nsum) = (qs.reduce(_ + _), ss.reduce(_ + _), ns.reduce(_ + _))
    val expect = ((bsum - ssum * ssum / nsum) / 2) / ((qsum - bsum) / (nsum - 3))
    assert(got.exists(v => java.lang.Double.doubleToLongBits(v) ==
      java.lang.Double.doubleToLongBits(expect)), s"$got != $expect")
    assert(got.exists(_ > 10.0), "fixture degenerate: shifted group should separate")
  }

  test("calibration bins partition the rows near-equally; a ranked fixture is monotone") {
    import spark.implicits._
    val rows = (1L to 1003L).map(i => (i, i > 700L, i))
    val df = rows.toDF("score", "label", "tie")
    val got = Evaluation.calibrationBins(df, col("score"), col("label"), col("tie"), bins = 10)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L to 9L))
    assert(got.map(_._2).sum == 1003L)
    assert(got.map(_._2).max - got.map(_._2).min <= 1)
    assert(got.map(_._3).sum == 303L)
    // perfectly ranked: rates non-decreasing, bottom bin 0, top bin 1
    assert(got.map(_._4).toSeq == got.map(_._4).toSeq.sorted)
    assert(got.head._4 == 0.0 && got.last._4 == 1.0)
  }
}
