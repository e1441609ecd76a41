package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Substring-level dedup and incremental (batch-vs-corpus) dedup:
  * brute-force equivalence plus the structural no-corpus-recompute
  * guarantee of the incremental path. */
class IncrementalDedupSpec extends SparkTestBase {

  private def tokens(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def ngrams(s: String, n: Int): Set[String] = {
    val t = tokens(s)
    if (t.size < n) Set(t.mkString(" "))
    else t.sliding(n).map(_.mkString(" ")).toSet
  }

  test("substringDups == brute-force n-gram-set intersection, incl. embedded spans") {
    import spark.implicits._
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (0L, s"prefix words here $span trailing junk"),       // embeds the span
      (1L, s"$span completely different continuation text"), // shares it
      (2L, "unrelated document with its own tokens going on and on forever"),
      (3L, s"prefix words here $span trailing junk"),        // exact dup of 0
      (4L, "one two three four five six seven"),             // 7 tokens: too short
      (5L, "short doc only"),                                // sub-n doc
      (6L, "short doc only")                                 // exact dup of 5 (short-gram rule)
    ).toDF("doc_id", "text")
    val got = Dedup.substringDups(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      if (ngrams(ta, 8) intersect ngrams(tb, 8)).nonEmpty
    } yield (ia, ib)).toSet
    assert(got === expected)
    assert(got.contains((0L, 1L)), "embedded-span pair must be found")
    assert(got.contains((0L, 3L)) && got.contains((5L, 6L)))
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!got.contains((0L, 4L)), "7-token prefix is below the 8-token span floor")
  }

  test("incrementalNearDup == full nearDupPairs restricted to pairs touching the batch") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select("doc_id", "text")
    val batch = docs.where(col("doc_id") % 10 === 0)
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val full = Dedup.nearDupPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    val got = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text",
      numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture should contain pairs touching the batch")
    assert(got === expected)
  }

  test("incremental candidate stage generates ZERO corpus-corpus pairs even with corpus-internal dups") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base), (2L, base),                      // corpus-internal exact dups
      (3L, base + " lambda"), (4L, base + " mu"),  // corpus-internal near dups
      (5L, "totally different corpus text with other words entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, base + " nu"),                        // near-dup of corpus 1/2/3/4
      (101L, "fresh batch document sharing nothing with anyone else")
    ).toDF("doc_id", "text")
    val cand = Dedup.incrementalCandidates(
      Dedup.minhashBandedSignatures(corpus, "doc_id", "text", 32, 16),
      Dedup.minhashBandedSignatures(batch, "doc_id", "text", 32, 16),
      "doc_id", numHashes = 32, minEstJaccard = 0.0, maxBucketSize = Int.MaxValue)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.nonEmpty)
    assert(cand.forall(p => p._1 >= 100L || p._2 >= 100L),
      s"corpus-corpus candidate generated: ${cand.filterNot(p => p._1 >= 100L || p._2 >= 100L).toSeq}")
    // ...while the corpus near-dups of the batch doc ARE all found
    val touching = cand.filter(p => p._2 == 100L || p._1 == 100L)
      .flatMap(p => Seq(p._1, p._2)).filter(_ < 100L).toSet
    assert(touching === Set(1L, 2L, 3L, 4L))
  }
}
