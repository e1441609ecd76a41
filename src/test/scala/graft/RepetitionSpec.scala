package graft

import graft.operators.TextAnalysis

/** Repetition signals: hand-checked integer contracts incl. the degenerate
  * 0/1-token docs and a brute-force cross-check on fixture data. */
class RepetitionSpec extends SparkTestBase {

  private def brute(text: String): (Int, Int, Int, Int, Int) = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val big = if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
    val top = if (big.isEmpty) 0 else big.groupBy(identity).map(_._2.size).max
    (toks.size, toks.distinct.size, big.size, big.distinct.size, top)
  }

  test("hand-checked values incl. degenerate docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "batch batch batch stream batch batch"),
      (1L, "all distinct words in here"),
      (2L, "one"),
      (3L, "  "),
      (4L, "Mixed  CASE   mixed case MIXED case")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    // doc 0: bigrams = [bb, bb, bs, sb, bb] -> top "batch batch" x3
    assert(got(0L) === ((6, 2, 5, 3, 3)))
    assert(got(1L) === ((5, 5, 4, 4, 1)))
    assert(got(2L) === ((1, 1, 0, 0, 0)))
    assert(got(3L) === ((0, 0, 0, 0, 0)))
    // doc 4 lowercased: bigrams alternate {mixed case, case mixed};
    // "mixed case" appears 3x among 5 bigrams, 2 distinct
    assert(got(4L) === ((6, 2, 5, 2, 3)))
  }

  test("matches brute force on fixture documents") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val expected = docs.collect()
      .map(r => r.getLong(0) -> brute(r.getString(1))).toMap
    assert(got === expected)
    assert(got.values.exists(v => v._5 > 1), "fixture should contain repeated bigrams")
  }
}
