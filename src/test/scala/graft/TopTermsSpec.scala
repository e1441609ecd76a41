package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Characteristic-term extraction: exact-k, rank contract, tokenizer
  * agreement with the rest of the text family. */
class TopTermsSpec extends SparkTestBase {

  test("topTerms honors the (tf DESC, df ASC, term ASC) contract on a hand-checked corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana cherry"),        // tf: apple 2
      (2L, "banana banana cherry cherry date"), // tf tie banana/cherry at 2 -> rarer df first
      (3L, "apple banana cherry date date")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // df: apple 2, banana 3, cherry 3, date 2
    val want = Seq(
      (1L, "apple", 2L, 2L),  // tf 2 beats tf-1 terms
      (1L, "banana", 1L, 3L), // tf tie banana/cherry: df tie 3=3 -> term ASC
      (2L, "banana", 2L, 3L), // tf tie at 2: df tie -> banana < cherry
      (2L, "cherry", 2L, 3L),
      (3L, "date", 2L, 2L),   // tf 2 first
      (3L, "apple", 1L, 2L)   // tf-1 tie: df 2 (apple, date-already-used) beats df 3
    ).sortBy(r => (r._1, r._2))
    assert(got == want, s"got $got")
  }

  test("topTerms == brute-force recomputation on a generated corpus") {
    import spark.implicits._
    // letter-only words: the [^\p{L}]+ tokenizer would split digits off
    def word(n: Long): String = "w" + ('a' + (n % 8)).toChar + ('a' + (n / 8 % 5)).toChar
    val docs = (0L until 200L).map { i =>
      val words = (0 until 15).map(j => word((i * 7 + j * j) % 40))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(docs, "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long)].collect().toSet
    // brute force with plain Scala over the same tokenization
    val toks = (0L until 200L).map { i =>
      i -> (0 until 15).map(j => word((i * 7 + j * j) % 40))
    }
    val tf = toks.flatMap { case (d, ws) => ws.map(w => (d, w)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfm = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = toks.flatMap { case (d, ws) =>
      ws.distinct.map(w => (d, w, tf((d, w)), dfm(w)))
        .sortBy { case (_, w, t, f) => (-t, f, w) }.take(3)
    }.toSet
    assert(got == want)
    assert(got.size == 600)
  }
}
