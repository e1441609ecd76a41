package graft

import org.apache.spark.sql.functions._

import graft.operators.LanguageModel

/** Bigram-LM perplexity filter vs a driver-side brute-force replay, plus
  * the adjacent-rank margin precondition that makes q_lm_perplexity's
  * rank-only oracle stable under cross-engine ln ulps. */
class LanguageModelSpec extends SparkTestBase {

  /** Brute-force add-one bigram avg_nll over a collected corpus,
    * contributions folded in sorted (w1, w2) order (the operator's fold
    * order). Returns (doc_id, avg_nll, n_bigrams) for scorable docs. */
  private def brute(docs: Seq[(Long, String)]): Seq[(Long, Double, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val v = toks.flatMap(_._2).distinct.size.toLong
    val allBg = toks.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
    val cb = allBg.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cc = allBg.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    toks.collect { case (id, ts) if ts.size >= 2 =>
      val m = ts.zip(ts.drop(1)).groupBy(identity)
        .map { case (k, g) => k -> g.size.toLong }
      val s = m.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (bg, mi)) =>
        acc + mi.toDouble * math.log((cb(bg) + 1L).toDouble / (cc(bg._1) + v).toDouble)
      }
      val n = m.values.sum
      (id, -s / n.toDouble, n)
    }
  }

  private def check(sfName: String, k: Int): Unit = {
    val docs = spark.read.parquet(s"${sf(sfName)}/documents.parquet")
    val collected = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expected = brute(collected).sortBy { case (id, s, _) => (-s, id) }

    val got = LanguageModel.perplexityWorstK(docs, "doc_id", "text", k)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq === (1 to k))
    assert(got.map(_._2).toSeq === expected.take(k).map(_._1),
      s"$sfName: rank order diverged from brute force")
    val nByDoc = expected.map(t => t._1 -> t._3).toMap
    got.foreach { case (_, id, n) => assert(n === nByDoc(id), s"n_bigrams of $id") }

    // margin precondition: adjacent scores inside top k+1 either tie
    // exactly (identical integer inputs -> both engines tie and the doc_id
    // tiebreak decides) or differ by far more than accumulated ulp noise
    expected.take(k + 1).sliding(2).foreach {
      case Seq((idA, sA, _), (idB, sB, _)) =>
        val gap = sA - sB
        assert(gap == 0.0 || gap > 1e-9,
          s"$sfName: fragile margin $gap between $idA and $idB")
      case _ =>
    }
  }

  test("perplexityWorstK matches brute force at sf0.001; margins dwarf ulp noise") {
    check("sf0.001", k = 20)
  }

  test("the sf0.01 driver-gate population satisfies the same margin precondition") {
    check("sf0.01", k = 50)
  }

  test("documents with fewer than 2 tokens are unscorable and never rank") {
    import spark.implicits._
    val docs = Seq(
      (1L, "single"), (2L, ""), (3L, "  "),
      (4L, "a b a b a"), (5L, "x y z"), (6L, "q q q q"))
      .toDF("doc_id", "text")
    val got = LanguageModel.perplexityWorstK(docs, "doc_id", "text", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(4L, 5L, 6L))
  }
}
