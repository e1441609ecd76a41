package graft

import org.apache.spark.sql.functions._

import graft.operators.SortedNeighborhood

/** Sorted-neighborhood dedup: the two-pass global rank equals the true
  * total order across many partitions, window semantics are exact, and
  * the full pipeline replays against driver-side brute force. */
class SortedNeighborhoodSpec extends SparkTestBase {

  test("globalRank == the true (key, tie) total order across many range partitions") {
    import spark.implicits._
    val rows = (0L until 5000L).map(i => (i, f"k${(i * 2654435761L) % 997}%05d"))
    val df = rows.toDF("id", "key").repartition(16)
    val got = SortedNeighborhood.globalRank(df, col("key"), col("id"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = rows.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("window semantics: pairs within w sorted positions, nothing beyond") {
    import spark.implicits._
    // keys sort as k00..k09; window 3 pairs each row with the next 2
    val docs = (0L until 10L).map(i => (i, f"k$i%02d")).toDF("id", "key")
    val got = SortedNeighborhood.candidates(docs, "id", col("key"), window = 3)
      .as[(Long, Long)].collect().toSet
    val want = (for (i <- 0L until 10L; d <- 1L to 2L if i + d < 10L) yield (i, i + d)).toSet
    assert(got == want)
  }

  test("snmNearDupPairs == brute-force replay of the identical pipeline") {
    import spark.implicits._
    def word(n: Long): String = "w" + ('a' + (n % 8)).toChar + ('a' + (n / 8 % 5)).toChar
    val base = (0L until 80L).map { i =>
      i -> (0 until 25).map(j => word((i * 3 + j * j) % 40)).mkString(" ")
    }
    // near-dups: copies of docs 0..9 with one LATE token changed (early
    // tokens pin the sort key adjacency — the method's stated regime)
    val dups = (0L until 10L).map { i =>
      val toks = base(i.toInt)._2.split(" ").toVector.updated(22, "zz")
      (200L + i) -> toks.mkString(" ")
    }
    val corpus = base ++ dups
    val docs = corpus.toDF("doc_id", "text").repartition(8)
    val got = SortedNeighborhood.snmNearDupPairs(docs, "doc_id", "text",
        window = 6, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // driver-side replay: same key, same total order, same window, same
    // trigram jaccard
    def norm(t: String) = t.toLowerCase.trim.replaceAll("\\s+", " ")
    def tri(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val m = math.max(toks.size - 2, 1)
      (1 to m).map(i => toks.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val ranked = corpus.sortBy { case (id, t) => (norm(t), id) }
    val want = (for {
      i <- ranked.indices; d <- 1 until 6 if i + d < ranked.size
      (ia, ta) = ranked(i); (ib, tb) = ranked(i + d)
      j = (tri(ta) & tri(tb)).size.toDouble / (tri(ta) | tri(tb)).size
      if j >= 0.5
    } yield (math.min(ia, ib), math.max(ia, ib))).toSet
    assert(want.size >= 10, s"fixture must surface the planted pairs: ${want.size}")
    assert(got == want, s"missing=${want -- got}, extra=${got -- want}")
  }
}
