package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Frequent-n-gram mining: exactness vs brute force under forced
  * evictions, the completeness guard, and the space-saving invariant. */
class HeavyHittersSpec extends SparkTestBase {

  /** Zipf-ish corpus: token t_k appears with weight ~ 1/k, plus planted
    * hot phrases. */
  private def corpus(nDocs: Int) = {
    import spark.implicits._
    (0 until nDocs).map { i =>
      val words = (0 until 20).map { j =>
        val r = (i * 31 + j * 17) % 100
        if (r < 30) "hot phrase alpha" // planted frequent trigram material
        else s"w${(r * r + j) % 50}"
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("frequentNgrams == brute force, including under forced evictions") {
    import spark.implicits._
    val docs = corpus(300).repartition(7)
    for (cap <- Seq(64, 512)) {
      val got = HeavyHitters.frequentNgrams(docs, "text", n = 2, minFraction = 0.01,
        capacity = cap)
        .as[(String, Long)].collect().sortBy(_._1)
      val grams = HeavyHitters.ngrams(docs, "text", 2)
      val total = grams.count()
      val want = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= math.ceil(0.01 * total).toLong)
        .as[(String, Long)].collect().sortBy(_._1)
      assert(got.sameElements(want), s"capacity $cap diverged from brute force")
      assert(got.nonEmpty, "test corpus should have frequent bigrams")
    }
  }

  test("completeness guard trips instead of silently under-reporting") {
    // capacity 2 over a high-cardinality stream: the eviction bound
    // exceeds any tiny threshold -> must throw, not return a subset
    val docs = corpus(300).repartition(2)
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.frequentNgrams(docs, "text", n = 2, minFraction = 0.0001, capacity = 2)
    }
    assert(e.getMessage.contains("not exact"))
  }

  test("full-but-never-evicted summary reports bound 0; empty corpus returns empty") {
    import spark.implicits._
    // exactly `capacity` distinct items, no evictions: bound must be 0 even
    // though counts are large — a firstKey bound would spuriously trip the
    // exactness guard
    val stream = (0 until 4000).map(i => s"g${i % 8}")
    val (cands, bound, seen) = HeavyHitters.spaceSaving(stream.iterator, 8)
    assert(cands.size == 8 && bound == 0L && seen == 4000)
    // a fraction threshold of ceil(f*n)=1 would be <= any nonzero bound;
    // with bound 0 the result must be exact, not a guard failure
    val docs = stream.zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("doc_id", "text")
    val got = HeavyHitters.frequentNgrams(docs, "text", n = 1, minFraction = 0.124,
      capacity = 8).count()
    assert(got == 8)
    // empty corpus: empty result, not an exception
    val empty = HeavyHitters.frequentNgrams(docs.limit(0), "text", n = 1, minFraction = 0.1)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("gram", "cnt"))
  }

  test("space-saving summary never loses an item above the eviction bound") {
    // deterministic skewed stream
    val stream = (0 until 5000).map { i =>
      val r = (i * 2654435761L) % 100
      if (r < 40) s"hot${r % 3}" else s"cold${(i * 7919) % 800}"
    }
    val (cands, bound, seen) = HeavyHitters.spaceSaving(stream.iterator, 64)
    assert(seen == 5000)
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    val missed = exact.filter { case (g, c) => c > bound && !cands.contains(g) }
    assert(missed.isEmpty, s"items above bound $bound missing: $missed")
    assert(Seq("hot0", "hot1", "hot2").forall(cands.contains))
  }
}
