package graft

import graft.operators.TextAnalysis

/** Heaps-curve vocabulary growth: a planted growing corpus with known
  * per-decile vocabulary mints, the partition/cumulative invariants, and
  * the duplicate-flattening signature. */
class VocabGrowthSpec extends SparkTestBase {

  private def run(docs: Seq[(Long, String)], buckets: Int = 10) = {
    import spark.implicits._
    TextAnalysis.vocabGrowth(docs.toDF("doc_id", "text"), "doc_id", "text", buckets)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
  }

  test("planted growth: each bucket mints exactly its own new words; invariants hold") {
    // doc i contributes one shared word and one word unique to its bucket
    // of ten docs -> every bucket mints exactly 1 new type after bucket 0
    val docs = (0L until 100L).map { i =>
      i -> s"common w${i / 10} common"
    }
    val got = run(docs)
    assert(got.map(_._1).toSeq == (0L to 9L))
    assert(got.map(_._2).sum == 300L)                 // 3 tokens per doc
    assert(got.head._3 == 2L)                         // 'common' + 'w0'
    assert(got.tail.forall(_._3 == 1L))               // one mint per decile
    assert(got.map(_._4).toSeq == (2L to 11L))        // cumulative 2..11
    // cum_types is the running sum of new_types
    assert(got.map(_._4).toSeq == got.map(_._3).scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("duplicate tail flattens the curve; unique-junk tail keeps it linear") {
    val fresh = (0L until 50L).map(i => i -> s"a$i b$i")
    val dupTail = fresh ++ (50L until 100L).map(i => i -> "a1 b1")
    val gotDup = run(dupTail)
    assert(gotDup.take(5).forall(_._3 > 0) && gotDup.drop(5).forall(_._3 == 0L))
    val junkTail = fresh ++ (50L until 100L).map(i => i -> s"a$i b$i")
    val gotJunk = run(junkTail)
    assert(gotJunk.forall(_._3 == 20L)) // 2 new types x 10 docs per decile
  }
}
