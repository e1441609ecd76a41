package graft

import graft.operators.{AllPairs, Dedup}

/** Exact all-pairs cosine self-join: brute-force equality (= completeness
  * AND soundness of the prefix filter), integer threshold boundary
  * semantics, and evidence the prefix actually prunes. */
class AllPairsSpec extends SparkTestBase {

  /** Driver-side twin of the Dedup.shingles derivation. */
  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val m = math.max(toks.size - (n - 1), 1)
    (1 to m).map(i => toks.slice(i - 1, i - 1 + n).mkString(" ")).toSet
  }

  private def word(n: Long): String =
    "w" + ('a' + (n % 9)).toChar + ('a' + (n / 9 % 6)).toChar

  private def corpus: Seq[(Long, String)] = {
    val base = (0L until 60L).map { i =>
      i -> (0 until 30).map(j => word((i * 5 + j * j + 2 * j) % 54)).mkString(" ")
    }
    // planted near-dups: copies of docs 0..9 with two tokens changed
    val dups = (0L until 10L).map { i =>
      val toks = base(i.toInt)._2.split(" ").toVector
        .updated(3, "zz").updated(17, "qq")
      (100L + i) -> toks.mkString(" ")
    }
    base ++ dups
  }

  test("cosineSelfJoin == brute force over the identical shingle derivation (t2 = 49/100)") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = AllPairs.cosineSelfJoin(docs, "doc_id", "text", t2Num = 49, t2Den = 100)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val sets = corpus.map { case (id, t) => id -> shingleSet(t, 3) }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      ov = (sa & sb).size.toLong
      if 100L * ov * ov >= 49L * sa.size * sb.size
    } yield (ia, ib, ov, sa.size.toLong, sb.size.toLong)).toSet
    assert(want.size >= 10, s"fixture must contain the planted pairs: ${want.size}")
    assert(got == want, s"engine ${got.size} pairs vs brute ${want.size}")
  }

  test("threshold boundary is >= (a pair exactly AT t2 is kept, just below is dropped)") {
    import spark.implicits._
    // unigram sets: A={x,y}, B={x,y,p,q} -> ov=2, 2*ov^2 = 8 == na*nb; C misses y
    val docs = Seq((1L, "x y"), (2L, "x y p q"), (3L, "x z p q"))
      .toDF("doc_id", "text")
    val got = AllPairs.cosineSelfJoin(docs, "doc_id", "text",
        t2Num = 1, t2Den = 2, shingleN = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 2L, 2L, 4L)), s"boundary pair missing: $got")
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L), s"below-threshold pair kept: $got")
  }

  test("prefix filtering prunes (candidates are a small superset of the answer, never the quadratic)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = corpus.toDF("doc_id", "text")
    val post = Dedup.shingles(docs, "doc_id", "text", 3)
    val sizes = post.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val cand = AllPairs.cosineCandidates(post, sizes, "doc_id", 49, 100)
      .as[(Long, Long)].collect().toSet
    val n = corpus.size
    assert(cand.size < n * (n - 1) / 2 / 2, s"no pruning: ${cand.size} of ${n * (n - 1) / 2}")
    val answer = AllPairs.cosineSelfJoin(docs, "doc_id", "text", 49, 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(answer.subsetOf(cand), "candidates must be a superset of the answer")
  }
}
