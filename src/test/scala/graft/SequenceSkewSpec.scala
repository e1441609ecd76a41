package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sequences

/** Hot-key hardening for the sequence family (round-3 verdict ask #9):
  * a planted 10^6-event key must flow through the *Bucketed variants
  * with no task ever holding the full key — every event-sized window or
  * fold is keyed by (key, dense bucket) — while the outputs stay equal
  * to the plain operators (bit-exact for the integer ops, fp-bounded
  * for the EWMA recombination). */
class SequenceSkewSpec extends SparkTestBase {

  private val HotRows = 1000000L
  private val BucketW = 10000L // 100 occupied buckets for the hot key

  /** 10^6 events on key 1 plus two small keys; ts = seconds, tie = id. */
  private lazy val events: DataFrame = {
    spark.range(0L, HotRows + 40L)
      .withColumn("user_id", when(col("id") < HotRows, 1L)
        .otherwise(lit(2L) + col("id") % 2))
      .withColumn("ts", col("id"))
      .withColumn("event_id", col("id"))
      .withColumn("event_type",
        element_at(array(lit("view"), lit("click"), lit("cart"), lit("buy")),
          (pmod(col("id") * 2654435761L, lit(97L)) % 4 + 1).cast("int")))
      .withColumn("value", (pmod(col("id") * 40503L, lit(1000L))).cast("double"))
      .localCheckpoint()
  }

  private val bucketFor: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    t => floor(t.cast("long") / BucketW).cast("long")

  test("bucketed topPaths == plain topPaths on the hot key, windows keyed by bucket") {
    val plain = Sequences.topPaths(events, "user_id", "ts", "event_type", "event_id",
      len = 3, topK = 20).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val bucketed = Sequences.topPathsBucketed(events, "user_id", "ts", "event_type",
      "event_id", len = 3, topK = 20, bucketFor)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert("hashpartitioning\\([^)]*__dbkt".r.findFirstIn(plan).isDefined,
      s"event-sized window must partition by (key, bucket):\n$plan")
    val got = bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == plain)
  }

  test("bucketed transitionCounts == plain on the hot key") {
    val plain = Sequences.transitionCounts(events, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val got = Sequences.transitionCountsBucketed(events, "user_id", "ts", "event_type",
      "event_id", bucketFor)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == plain)
    assert(plain.values.sum == HotRows - 1 + 19 + 19, "every adjacency counted once")
  }

  test("bucketed funnelDepths == plain; per-key state is bucket vectors, not events") {
    val steps = Seq("view", "click", "buy")
    val plain = Sequences.funnelDepths(events, "user_id", "ts", "event_type", "event_id", steps)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val got = Sequences.funnelDepthsBucketed(events, "user_id", "ts", "event_type",
      "event_id", steps, bucketFor)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == plain)
    assert(plain.values.sum == 3L, "three keys")
  }

  test("bucketed ewma: == plain on a 5k slice; full 10^6 hot key matches a sequential fold") {
    // plain ewma's per-key array fold is quadratic in key size (each step
    // copies the accumulator array), so it cannot even RUN on the 10^6
    // key — the hot-key hazard the bucketed variant removes. Equality vs
    // plain therefore runs on a slice, and the full hot key is checked
    // against a driver-side sequential fold of the generating formula.
    val slice = events.where(col("user_id") === 1L && col("ts") < 5000L)
    val plain = Sequences.ewma(slice, "user_id", "ts", "event_id", "value", alpha = 0.25)
      .withColumnRenamed("ewma", "e_plain")
    val gotSlice = Sequences.ewmaBucketed(slice, "user_id", "ts", "event_id", "value",
      alpha = 0.25, t => floor(t.cast("long") / 500L).cast("long"))
    val worst = plain.join(gotSlice, "event_id")
      .select(max(abs(col("e_plain") - col("ewma")) /
        greatest(abs(col("e_plain")), lit(1e-12))).as("m"))
      .head.getDouble(0)
    info(f"ewma bucketed-vs-plain worst relative divergence (5k slice) = $worst%.3e")
    assert(worst <= 1e-9, f"ewma recombination diverged: $worst%.3e")

    // full hot key through the bucketed path (100 buckets of 10k rows)
    val hot = events.where(col("user_id") === 1L)
    val got = Sequences.ewmaBucketed(hot, "user_id", "ts", "event_id", "value",
      alpha = 0.25, bucketFor).localCheckpoint()
    assert(got.count() == HotRows)
    // sequential driver fold of the generating value function
    def v(id: Long): Double = java.lang.Math.floorMod(id * 40503L, 1000L).toDouble
    var s = v(0L)
    val probes = Set(0L, 1L, 9999L, 10000L, 123456L, 999999L)
    val expected = scala.collection.mutable.Map(0L -> s)
    (1L until HotRows).foreach { i =>
      s = 0.25 * v(i) + 0.75 * s
      if (probes(i)) expected(i) = s
    }
    val gotProbes = got.where(col("event_id").isin(probes.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    probes.foreach { i =>
      val rel = math.abs(gotProbes(i) - expected(i)) / math.max(math.abs(expected(i)), 1e-12)
      assert(rel <= 1e-9, f"event $i: got ${gotProbes(i)} expected ${expected(i)} rel $rel%.3e")
    }
  }

  test("sparse buckets: 1-event buckets (maximum seam crossing) still match plain") {
    // the q_path_topk_bucketed fixture regression: a 3-path can span
    // THREE buckets when buckets hold fewer than len-1 events — the
    // borrow set must be the first len-1 events of the remaining stream,
    // not of the next bucket only. Width-1 buckets make every adjacency
    // cross a seam.
    val slice = events.where(col("ts") < 5000L || col("user_id") > 1L)
    val one: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => t.cast("long")
    val plainP = Sequences.topPaths(slice, "user_id", "ts", "event_type", "event_id",
      len = 3, topK = 20).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val gotP = Sequences.topPathsBucketed(slice, "user_id", "ts", "event_type", "event_id",
      len = 3, topK = 20, one).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(gotP == plainP)
    val plainT = Sequences.transitionCounts(slice, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val gotT = Sequences.transitionCountsBucketed(slice, "user_id", "ts", "event_type",
      "event_id", one)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(gotT == plainT)
  }

  test("boundedness: the hot key occupies 100 buckets of 10k rows each") {
    import graft.operators.Sequences
    // the pass-1 grouping unit is (key, dense bucket): no unit exceeds the
    // bucket width, so no task's per-group state ever approaches the key's
    // 10^6 rows (the plain operators' documented hot-key tail)
    val sizes = events.where(col("user_id") === 1L)
      .groupBy(floor(col("ts").cast("long") / BucketW).cast("long").as("b")).count()
      .select("count").collect().map(_.getLong(0))
    assert(sizes.length == 100 && sizes.forall(_ == BucketW))
  }
}
