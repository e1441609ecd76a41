package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap join — the generic range-join family member (time
  * ranges, altitude bands, id ranges) that equi-join engines lack; the
  * reference's workload meets it as "which flight tracks were airborne
  * while this restriction was active". Semantics: emit (l, r) for every
  * pair with `l.start <= r.end AND r.start <= l.end` (closed intervals),
  * optionally under extra equi keys.
  *
  * Distributed shape: each interval explodes into the fixed-width time
  * buckets it touches and the two sides equi-join on (keys, bucket) —
  * never a theta/cross join. A pair that overlaps shares every bucket in
  * `[max(starts), min(ends)]`, so to emit it EXACTLY once (with no
  * pair-dedup shuffle) the join keeps only the FIRST shared bucket:
  * `bucket == max(floor(l.start/w), floor(r.start/w))`. That bucket is
  * common to both sequences iff the intervals overlap, so the conjunct is
  * both the dedup and (with the explicit overlap predicate) redundant-safe.
  *
  * Scale: cost per row is `len/bucketWidth + 1` bucket copies carrying
  * only (keys, bucket, start, end, payload) — pick `bucketMillis` near
  * the TYPICAL interval length so most intervals copy 1-2×. A single
  * pathological month-long interval under hour buckets copies ~720× —
  * bounded and known in advance, unlike the unbounded row-pair blowup of
  * a naive range theta-join. Within a bucket the match is a hash join;
  * bucket hotness follows data density, which AQE skew-split handles.
  */
object IntervalJoin {

  private val Reserved = Seq("__bs", "__be", "__bucket", "__rbs", "__rbe")

  /** Gaps-and-islands: merge each key's overlapping-or-touching closed
    * intervals into maximal contiguous ISLANDS — the classic
    * coverage/uptime primitive (sensor online time, user presence,
    * airspace occupancy): an interval starts a new island iff its start
    * exceeds the running max end of every earlier interval of the key.
    * Output: one row per island with (keys..., island_id, island_start,
    * island_end, n_intervals); island ids number 1..k per key in start
    * order.
    *
    * Shape: ONE shuffle on the key, two frames of the same per-key window
    * (running max-end and running new-island sum) + one hash aggregate —
    * no self-join, no explode. Exact-duplicate (start, end) rows tie in
    * the window order but cannot change island structure (the second of a
    * tie is never a new island), so the result is deterministic. Rows
    * with end < start are malformed and dropped, matching [[overlapJoin]].
    * Per-key data serializes through one task — the shared ranking-window
    * caveat (AsOfJoin.scala); keys here are entities, not corpora. */
  def mergeIslands(df: DataFrame, keys: Seq[String],
                   startCol: String, endCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(startCol), col(endCol))
    df.where(col(endCol) >= col(startCol))
      .withColumn("__pmax",
        max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L).otherwise(0L))
      .withColumn("island_id", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keys.map(col) :+ col("island_id"): _*)
      .agg(min(col(startCol)).as("island_start"), max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Join `left` × `right` on equal `keys` and interval overlap.
    * `*StartCol`/`*EndCol` are timestamp (or timestamp_ntz) columns;
    * rows with `end < start` are malformed and dropped (a descending
    * `sequence()` would otherwise fabricate buckets). Output carries all
    * left columns plus the non-key right columns; column names must not
    * collide across sides (rename before calling) or with the reserved
    * `__b*` internals. */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lStartCol: String, lEndCol: String,
                  rStartCol: String, rEndCol: String,
                  bucketMillis: Long = 3600000L): DataFrame = {
    require(bucketMillis > 0, s"bucketMillis must be positive, got $bucketMillis")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val clash = (lCols ++ rCols).filter(Reserved.contains) ++
      (rCols.toSet -- keys).intersect(lCols.toSet -- keys)
    require(clash.isEmpty,
      s"overlapJoin: column names collide or use reserved __b* names: ${clash.mkString(", ")}")

    def bucketOf(c: String) =
      floor(unix_millis(col(c).cast("timestamp")) / lit(bucketMillis)).cast("long")

    val lb = left
      .where(col(lEndCol) >= col(lStartCol))
      .withColumn("__bs", bucketOf(lStartCol))
      .withColumn("__be", bucketOf(lEndCol))
      .withColumn("__bucket", explode(sequence(col("__bs"), col("__be"))))
      .drop("__be")
    val rb = right
      .where(col(rEndCol) >= col(rStartCol))
      .withColumn("__rbs", bucketOf(rStartCol))
      .withColumn("__rbe", bucketOf(rEndCol))
      .withColumn("__bucket", explode(sequence(col("__rbs"), col("__rbe"))))
      .drop("__rbe")

    val cond = (keys.map(k => lb(k) === rb(k)) :+
      (lb("__bucket") === rb("__bucket")) :+
      (lb(lStartCol) <= rb(rEndCol)) :+
      (rb(rStartCol) <= lb(lEndCol)) :+
      // first shared bucket: emits each overlapping pair exactly once
      (lb("__bucket") === greatest(lb("__bs"), rb("__rbs"))))
      .reduce(_ && _)

    val rKeep = rCols.filterNot(keys.contains)
    lb.join(rb, cond)
      .select(lCols.map(lb(_)) ++ rKeep.map(rb(_)): _*)
  }
}
