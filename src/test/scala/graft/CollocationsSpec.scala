package graft

import graft.operators.TextAnalysis

/** PMI collocations: the scaled-integer score ranks by PMI (not raw
  * frequency), the hapax filter works, and the whole pipeline replays
  * against driver-side brute force with the identical int64 arithmetic. */
class CollocationsSpec extends SparkTestBase {

  private val Scale = 1000000000000L

  test("collocations ranks by PMI, not frequency: a rare-but-exclusive pair tops a common pair") {
    import spark.implicits._
    // "zig zag": 3 occurrences, both words appear ONLY in this pair.
    // "the cat": 6 occurrences, but "the" also precedes dog/rat everywhere.
    val docs = Seq(
      "the cat the dog the rat zig zag",
      "the cat the dog the rat zig zag",
      "the cat the dog the rat zig zag",
      "the cat the cat the cat the dog the rat"
    ).toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 3, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got.head._1 == "zig" && got.head._2 == "zag", s"got $got")
    // zig/zag each occur 3 times, pair 3 times: score = 3*Scale/9
    assert(got.head._6 == 3L * Scale / 9L)
    // "the cat" has more raw occurrences than "zig zag" yet ranks below it
    val theCat = got.find(r => r._1 == "the" && r._2 == "cat")
    assert(theCat.exists(r => r._3 > got.head._3 && r._6 < got.head._6), s"got $got")
  }

  test("minCount drops hapax pairs that would otherwise top the list") {
    import spark.implicits._
    val docs = Seq(
      "unique singleton",                       // c_xy = c_x = c_y = 1 -> max quotient
      "alpha beta alpha beta alpha beta gamma"
    ).toDF("text")
    val withHapax = TextAnalysis.collocations(docs, "text", minCount = 1, k = 1)
      .collect().head
    assert(withHapax.getString(0) == "unique", s"got $withHapax")
    val filtered = TextAnalysis.collocations(docs, "text", minCount = 2, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(filtered.forall(_._3 >= 2))
    assert(!filtered.exists(_._1 == "unique"))
  }

  test("collocations == brute-force replay with identical int64 arithmetic") {
    import spark.implicits._
    def word(n: Long): String = "w" + ('a' + (n % 7)).toChar + ('a' + (n / 7 % 4)).toChar
    val texts = (0L until 150L).map { i =>
      (0 until 20).map(j => word((i * 3 + j * j + j) % 28)).mkString(" ")
    }
    val docs = texts.toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 4, k = 15)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq

    val tokd = texts.map(_.split("\\s+").toSeq.filter(_.nonEmpty))
    val uni = tokd.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = tokd.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = big.toSeq.collect { case ((w1, w2), cxy) if cxy >= 4 =>
      (w1, w2, cxy, uni(w1), uni(w2), cxy * Scale / (uni(w1) * uni(w2)))
    }.sortBy { case (w1, w2, _, _, _, s) => (-s, w1, w2) }.take(15)
    assert(got == want, s"got $got\nwant $want")
  }
}
