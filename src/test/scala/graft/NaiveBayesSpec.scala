package graft

import org.apache.spark.sql.functions._

import graft.operators.NaiveBayes

/** Multinomial NB classifier vs a driver-side brute-force replay, plus the
  * per-doc class-margin precondition that makes q_nb_classify's
  * argmax-only oracle stable under cross-engine ln ulps. */
class NaiveBayesSpec extends SparkTestBase {

  /** Brute-force NB scores per (doc, class), folds in sorted token order
    * (the operator's fold order). Returns doc -> sorted class scores
    * (score desc, label asc). */
  private def brute(docs: Seq[(Long, String, String)]): Map[Long, Seq[(String, Double)]] = {
    val toks = docs.map { case (id, t, l) =>
      (id, l, t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    }
    val v = toks.flatMap(_._3).distinct.size.toLong
    val labels = toks.map(_._2).distinct.sorted
    val clsTok = toks.groupBy(_._2).map { case (l, g) =>
      l -> g.flatMap(_._3).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    }
    val lnprior = toks.groupBy(_._2).map { case (l, g) => l -> math.log(g.size.toDouble) }
    val lnz = toks.groupBy(_._2).map { case (l, g) =>
      l -> math.log((g.map(_._3.size.toLong).sum + v).toDouble)
    }
    toks.map { case (id, _, ts) =>
      val m = ts.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      val scores = labels.map { l =>
        val fold = m.toSeq.filter { case (t, _) => clsTok(l).contains(t) }
          .sortBy(_._1)
          .foldLeft(0.0) { case (acc, (t, mi)) =>
            acc + mi.toDouble * math.log((clsTok(l)(t) + 1L).toDouble)
          }
        l -> (fold - ts.size.toDouble * lnz(l) + lnprior(l))
      }
      id -> scores.sortBy { case (l, s) => (-s, l) }
    }.toMap
  }

  private def check(sfName: String): Unit = {
    val docs = spark.read.parquet(s"${sf(sfName)}/documents.parquet")
    val collected = docs.select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val expected = brute(collected)

    val got = NaiveBayes.trainPredict(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, scores) =>
      assert(got(id) === scores.head._1, s"$sfName doc $id: ${scores.take(2)}")
      // margin precondition: the winning class beats the runner-up by far
      // more than accumulated ulp noise (strictly — no cross-class exact
      // ties, whose oracle-side resolution the distinct SQL arithmetic
      // could not guarantee)
      val gap = scores(0)._2 - scores(1)._2
      assert(gap > 1e-9, s"$sfName doc $id: fragile class margin $gap")
    }
  }

  test("trainPredict matches brute force at sf0.001; class margins dwarf ulp noise") {
    check("sf0.001")
  }

  test("the sf0.01 driver-gate population satisfies the same margin precondition") {
    check("sf0.01")
  }

  test("prediction recovers the planted language structure better than chance") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val preds = NaiveBayes.trainPredict(docs, "doc_id", "text", "lang")
    val joined = preds.join(docs.select("doc_id", "lang"), "doc_id")
    val acc = joined.where(col("pred") === col("lang")).count().toDouble /
      joined.count()
    info(f"self-train accuracy $acc%.3f")
    assert(acc > 0.3, f"NB self-accuracy $acc%.3f at chance level (0.2) — no signal learned")
  }
}
