package graft

import graft.operators.Graphs

/** Common-neighbor link prediction: hand-checked wedge semantics,
  * non-adjacency, the minCommon gate, and a brute-force replay on a
  * generated graph. */
class LinkPredictSpec extends SparkTestBase {

  private def run(edges: Seq[(Long, Long)], minCommon: Long): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Graphs.commonNeighborPairs(edges.toDF("id_a", "id_b"), minCommon)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("hand-checked: star center links its leaves, adjacent pairs excluded") {
    // star 0-{1,2,3} plus edge 1-2: (1,3) and (2,3) share neighbor 0;
    // (1,2) also shares 0 but is adjacent, so it must NOT appear
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L))
    assert(run(edges, 1) == Seq((1L, 3L, 1L), (2L, 3L, 1L)))
    // minCommon = 2 filters both singles
    assert(run(edges, 2) == Seq.empty)
  }

  test("two shared neighbors counted exactly") {
    // u=10 and v=20 both adjacent to 1 and 2 (and nothing else)
    val edges = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
    assert(run(edges, 2) == Seq((1L, 2L, 2L), (10L, 20L, 2L)))
  }

  test("equals a brute-force replay on a generated graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for {
      a <- 0 until n; b <- a + 1 until n
      if rnd.nextInt(100) < 12
    } yield (a.toLong, b.toLong)).toSeq
    val adj: Map[Long, Set[Long]] = {
      val m = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
      edges.foreach { case (a, b) => m(a) += b; m(b) += a }
      m.toMap.withDefaultValue(Set.empty)
    }
    val eset = edges.toSet
    val want = (for {
      a <- 0L until n.toLong; b <- a + 1 until n.toLong
      if !eset((a, b))
      c = (adj(a) intersect adj(b)).size.toLong
      if c >= 2
    } yield (a, b, c)).sortBy(t => (t._1, t._2))
    assert(run(edges, 2) == want)
  }

  test("minCommon must be positive") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Graphs.commonNeighborPairs(Seq((1L, 2L)).toDF("id_a", "id_b"), 0)
    }
  }
}
