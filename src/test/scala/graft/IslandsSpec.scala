package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Gaps-and-islands: hand-checked merge semantics, touching-interval rule,
  * duplicate determinism, and a scalar sweep-line replay. */
class IslandsSpec extends SparkTestBase {

  private def run(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    IntervalJoin.mergeIslands(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .select("k", "island_id", "island_start", "island_end", "n_intervals")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("hand-checked: overlap merges, touch merges, gap splits, malformed drops") {
    val rows = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap -> one island [0,20]
      (1L, 20L, 30L),                 // touches  -> still island 1, [0,30]
      (1L, 31L, 40L),                 // gap of 1 -> island 2
      (2L, 0L, 5L), (2L, 100L, 90L))  // key 2: one island + one malformed (dropped)
    assert(run(rows) == Seq(
      (1L, 1L, 0L, 30L, 3L), (1L, 2L, 31L, 40L, 1L), (2L, 1L, 0L, 5L, 1L)))
  }

  test("containment and duplicates cannot split an island") {
    val rows = Seq(
      (1L, 0L, 100L), (1L, 10L, 20L), (1L, 10L, 20L), (1L, 50L, 60L))
    assert(run(rows) == Seq((1L, 1L, 0L, 100L, 4L)))
  }

  test("equals a scalar sweep-line replay on a generated set") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 800).map { i =>
      val k = (i % 7).toLong
      val s = rnd.nextInt(1000).toLong
      (k, s, s + 1 + rnd.nextInt(30))
    }
    val want = rows.groupBy(_._1).toSeq.flatMap { case (k, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sortBy(identity)
      val islands = sorted.tail.foldLeft(List((sorted.head, sorted.head._2, 1L))) {
        case (acc @ ((_, mx, n) :: rest), (s, e)) =>
          if (s > mx) ((s, e), e, 1L) :: acc
          else (acc.head._1, math.max(mx, e), n + 1) :: rest
        case (acc, _) => acc
      }.reverse
      islands.zipWithIndex.map { case (((st, _), en, n), idx) =>
        (k, idx + 1L, st.toLong, en, n)
      }
    }.sortBy(t => (t._1, t._2))
    assert(run(rows) == want)
  }
}
