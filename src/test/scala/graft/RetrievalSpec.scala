package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 top-k vs a driver-side brute-force recomputation, plus the
  * adjacent-rank margin precondition that makes q_bm25's rank-only oracle
  * stable under cross-engine ln/division ulps. */
class RetrievalSpec extends SparkTestBase {

  private val queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join"),
    1L -> Seq("window", "batch"),
    2L -> Seq("customer", "merge", "slow"))
  private val K = 5
  private val k1 = 1.2
  private val b = 0.75

  /** Brute-force BM25 over the collected corpus, contributions summed in
    * sorted-term order (the operator's fold order). */
  private def brute(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Double)]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / n
    val vocab = queries.flatMap(_._2).distinct
    val df = vocab.map(t => t -> toks.values.count(_.contains(t))).toMap
    val idf = vocab.map(t =>
      t -> math.log(1.0 + (n - df(t).toDouble + 0.5) / (df(t) + 0.5))).toMap
    queries.map { case (qid, terms) =>
      val scored = toks.toSeq.flatMap { case (id, ts) =>
        val contribs = terms.distinct.sorted.flatMap { t =>
          val tf = ts.count(_ == t)
          if (tf == 0) None
          else Some(idf(t) * (tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + k1 * ((1.0 - b) + b * ts.size.toDouble / avgdl)))
        }
        if (contribs.isEmpty) None
        else Some(id -> contribs.foldLeft(0.0)(_ + _))
      }
      qid -> scored.sortBy { case (id, s) => (-s, id) }.take(K + 1)
    }.toMap
  }

  test("bm25TopK matches brute force; adjacent-rank margins dwarf ulp noise") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val collected = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expected = brute(collected)

    val got = Retrieval.bm25TopK(docs, "doc_id", "text", queries, K)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }

    queries.foreach { case (qid, _) =>
      val exp = expected(qid).take(K).map(_._1)
      assert(got(qid) === exp, s"query $qid: got ${got(qid)}, expected $exp")
      // margin precondition: each adjacent pair inside top K+1 either has a
      // score gap >> 1 ulp or ties exactly (identical integer inputs), in
      // which case both engines break the tie by doc_id identically
      expected(qid).sliding(2).foreach {
        case Seq((idA, sA), (idB, sB)) =>
          val gap = sA - sB
          assert(gap == 0.0 || gap > 1e-9,
            s"query $qid: fragile margin $gap between $idA and $idB")
        case _ =>
      }
    }
  }

  test("docs sharing no query term never appear; ranks are 1..k dense") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val res = Retrieval.bm25TopK(docs, "doc_id", "text", queries, K).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet === queries.map(_._1).toSet)
    byQ.values.foreach { rs => assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to K)) }
  }
}
