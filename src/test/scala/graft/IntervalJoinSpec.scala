package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Interval-overlap join: bucketed equi-join must equal the brute-force
  * theta join exactly — including touching endpoints, zero-length
  * intervals, bucket-boundary alignment and intervals much longer than a
  * bucket — and each pair must be emitted exactly once. */
class IntervalJoinSpec extends SparkTestBase {

  private val Bucket = 60000L // 1-minute buckets

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  // deterministic pseudo-random intervals; lengths 0..5 buckets so every
  // regime (sub-bucket, multi-bucket, zero-length) occurs, plus exact
  // bucket-boundary starts from the %7==0 arm
  private def mkIntervals(n: Int, salt: Long) = {
    import spark.implicits._
    (0 until n).map { i =>
      val h = i * 2654435761L + salt
      val start0 = math.abs(h % (400L * Bucket))
      val start = if (i % 7 == 0) (start0 / Bucket) * Bucket else start0
      val len = math.abs((h >> 13) % (5L * Bucket + 1))
      (i.toLong + salt, (i % 3).toLong, ts(start), ts(start + len))
    }.toDF("id", "key", "s", "e")
  }

  test("overlapJoin == brute-force theta join, each pair exactly once") {
    val a = mkIntervals(120, 1000)
      .select(col("id").as("a_id"), col("key"), col("s").as("a_s"), col("e").as("a_e"))
    val b = mkIntervals(140, 9000)
      .select(col("id").as("b_id"), col("key"), col("s").as("b_s"), col("e").as("b_e"))

    val got = IntervalJoin.overlapJoin(a, b, Seq("key"), "a_s", "a_e", "b_s", "b_e", Bucket)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = a.join(b, Seq("key"))
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    assert(got.size === got.distinct.size, "pair emitted more than once")
    assert(got.sorted === want.sorted)
    assert(want.nonEmpty)
  }

  test("touching endpoints match; disjoint-by-one-ms do not; malformed rows dropped") {
    import spark.implicits._
    val a = Seq(
      (1L, 0L, ts(0), ts(Bucket)),          // touches b=10 exactly at Bucket
      (2L, 0L, ts(5 * Bucket), ts(4 * Bucket)), // malformed: end < start -> dropped
      (3L, 0L, ts(2 * Bucket), ts(2 * Bucket))) // zero-length on a boundary
      .toDF("a_id", "key", "a_s", "a_e")
    val b = Seq(
      (10L, 0L, ts(Bucket), ts(3 * Bucket)),
      (11L, 0L, ts(Bucket + 1), ts(2 * Bucket)),     // starts 1 ms past a1's end; ends exactly on a3's point
      (12L, 0L, ts(3 * Bucket + 1), ts(9 * Bucket))) // disjoint from all
      .toDF("b_id", "key", "b_s", "b_e")
    val got = IntervalJoin.overlapJoin(a, b, Seq("key"), "a_s", "a_e", "b_s", "b_e", Bucket)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (3L, 10L), (3L, 11L)))
  }

  test("no equi keys: pure overlap join across everything") {
    val a = mkIntervals(40, 0).select(col("id").as("a_id"), col("s").as("a_s"), col("e").as("a_e"))
    val b = mkIntervals(40, 500).select(col("id").as("b_id"), col("s").as("b_s"), col("e").as("b_e"))
    val got = IntervalJoin.overlapJoin(a, b, Nil, "a_s", "a_e", "b_s", "b_e", Bucket)
      .count()
    val want = a.crossJoin(b)
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e")).count()
    assert(got === want && want > 0)
  }

  test("reserved/colliding column names rejected") {
    import spark.implicits._
    val a = Seq((1L, ts(0), ts(1))).toDF("id", "s", "e")
    val b = Seq((2L, ts(0), ts(1))).toDF("id", "bs", "be")
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(a, b, Nil, "s", "e", "bs", "be", Bucket)
    }
    val bad = Seq((1L, ts(0), ts(1), 0L)).toDF("id2", "s2", "e2", "__bucket")
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(a, bad, Nil, "s", "e", "s2", "e2", Bucket)
    }
  }
}
