package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** TextRank keyword extraction vs a full driver-side replay of the whole
  * pipeline (tokenize -> weighted bigram edges -> scaled-integer weighted
  * PageRank -> top-k) — the integer rounds make the comparison EXACT, no
  * tolerance. */
class TextRankSpec extends SparkTestBase {

  /** Driver-side replay: identical tokenizer, canonical hapax-filtered
    * weighted edges, and the 15/20 + 17/20 scaled-integer recurrence with
    * per-edge `pr * w / wdeg` contributions. */
  private def replay(texts: Seq[String], minCount: Int, rounds: Int,
                     k: Int): Seq[(String, Long)] = {
    val pairs = texts.flatMap { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      toks.zip(toks.drop(1))
        .map { case (a, b) => if (a <= b) (a, b) else (b, a) }
        .filter { case (a, b) => a != b }
    }
    // NOT Map.collect{... => key}: a pair-valued collect on a Map rebuilds
    // a MAP keyed by the pair's first element, silently merging edges that
    // share an endpoint
    val edges = pairs.groupBy(identity)
      .view.mapValues(_.size.toLong).filter(_._2 >= minCount).toSeq
    val adj = edges.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val wdeg = adj.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr: Map[String, Long] = wdeg.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to rounds) {
      val sums = adj.groupBy(_._2).view.mapValues { in =>
        in.map { case (src, _, w) => pr(src) * w / wdeg(src) }.sum
      }.toMap
      pr = wdeg.keys.map(w => w -> (150000000L + sums.getOrElse(w, 0L) * 17 / 20)).toMap
    }
    pr.toSeq.sortBy { case (w, p) => (-p, w) }.take(k)
  }

  test("hand fixture: hapax edges drop, weights drive the rank") {
    import spark.implicits._
    // edge weights: (a,b)=2, (b,c)=5, (a,c)=3; (d,e)=1 -> hapax-filtered
    val texts = Seq("a b c b a", "c a c a", "d e", "b c b c")
    val docs = texts.toDF("text")
    val got = TextAnalysis.textRankKeywords(docs, "text", minCount = 2, rounds = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = replay(texts, 2, 3, 10)
    assert(got === want)
    assert(!got.exists(r => r._1 == "d" || r._1 == "e"))
    // weighted: c sits on the two heaviest edges (5 and 3) and must lead;
    // weights make the ranks discriminate (the unweighted walk on this
    // triangle is exactly uniform)
    assert(got.head._1 === "c")
    assert(got.map(_._2).distinct.size === 3)
  }

  test("full-pipeline replay is exact at sf0.001") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val got = TextAnalysis.textRankKeywords(docs, "text", minCount = 2, rounds = 3, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val texts = docs.select(col("text")).collect().map(_.getString(0)).toSeq
    val want = replay(texts, 2, 3, 20)
    assert(got === want)
    assert(got.size === 20, "degenerate corpus: fewer than 20 ranked words")
    // non-degenerate: the weighted listing must discriminate
    assert(got.map(_._2).distinct.size > 10, s"rank ties everywhere: $got")
  }
}
