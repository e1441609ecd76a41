package graft

import graft.operators.Graphs

/** Triangle counting: hand-checked shapes, brute-force equality on a
  * generated graph, and hub behavior under the degree orientation. */
class GraphsSpec extends SparkTestBase {

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graphs.triangleCounts(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
  }

  test("hand-checked: K4 gives every node 3 triangles; a path gives none") {
    val k4 = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    assert(count(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    assert(count(path) == Map.empty[Long, Long])
  }

  test("a hub star closes no triangles; adding one rim edge closes exactly one") {
    val star = (1L to 50L).map(i => (0L, i))
    assert(count(star) == Map.empty[Long, Long])
    val withRim = star :+ (7L, 8L)
    assert(count(withRim) == Map(0L -> 1L, 7L -> 1L, 8L -> 1L))
  }

  test("triangleCounts == brute force on a generated graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = (for {
      i <- 0L until n; j <- i + 1 until n
      if rnd.nextDouble() < 0.12
    } yield (i, j)).toSeq
    val got = count(edges)
    val eset = edges.toSet
    val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- 0L until n; b <- a + 1 until n if eset((a, b))
      c <- b + 1 until n if eset((b, c)) && eset((a, c))
    } {
      want(a) += 1; want(b) += 1; want(c) += 1
    }
    assert(want.values.sum >= 30, s"fixture too sparse: ${want.values.sum}")
    assert(got == want.toMap)
  }
}
