package graft

import graft.operators.Bpe

/** BPE trainer vs a driver-side reference implementation, greedy-merge
  * unit semantics, and the equivalence of greedy application with the
  * oracle's double-delimiter string replace. */
class BpeSpec extends SparkTestBase {

  /** Reference trainer: pure-Scala, same semantics. */
  private def reference(texts: Seq[String], k: Int): Seq[(Int, String, String)] = {
    val words = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    var vocab: Map[Seq[String], Long] = words.toSeq
      .map { case (w, f) => w.map(_.toString).toSeq -> f }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    for (rank <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), _) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r))
        vocab = vocab.toSeq.map { case (s, f) => Bpe.applyMerge(s, l, r) -> f }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
    }
    out.toSeq
  }

  test("applyMerge is greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("b", "a", "n", "a"), "a", "n") === Seq("b", "an", "a"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") === Seq("x"))
    // merged symbols do not cascade within the same round
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "aa") === Seq("a", "a", "a", "a"))
  }

  test("greedy application == the oracle's double-delimiter string replace") {
    val cases = Seq(
      (Seq("a", "a", "a", "a", "a", "a"), "a", "a"),
      (Seq("b", "a", "na", "na"), "na", "na"),
      (Seq("ba", "na"), "a", "na"), // mid-symbol suffix must NOT match
      (Seq("a", "ab"), "a", "a"),   // prefix of a longer symbol must NOT match
      (Seq("ab", "a", "b"), "a", "b"))
    for ((syms, l, r) <- cases) {
      val rep = "||" + syms.mkString("||") + "||"
      val replaced = rep.replace("|" + l + "||" + r + "|", "|" + l + r + "|")
      val viaString = replaced.split("\\|\\|").filter(_.nonEmpty).toSeq
      assert(viaString === Bpe.applyMerge(syms, l, r), s"case $syms merge ($l,$r)")
    }
  }

  test("encodeCounts == per-word reference application of the learned merges") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges = 3)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.select("doc_id", "text").collect().map { r =>
      val n = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).map { w =>
        var syms: Seq[String] = w.map(_.toString)
        for ((l, rr) <- merges) syms = Bpe.applyMerge(syms, l, rr)
        syms.length.toLong
      }.sum
      r.getLong(0) -> n
    }.filter(_._2 > 0).toMap
    assert(got === want)
    // merges strictly shrink the corpus token count vs characters
    val chars = docs.select("text").collect()
      .map(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty).map(_.length).sum).sum
    assert(got.values.sum < chars)
  }

  test("train matches the reference over sf0.001 documents (8 merges)") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val got = Bpe.train(docs, "text", numMerges = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq.sortBy(_._1)
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val want = reference(texts, 8)
    assert(got === want, s"merge lists diverged:\n got $got\nwant $want")
    assert(got.size === 8)
  }
}
