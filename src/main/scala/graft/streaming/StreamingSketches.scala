package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, Sketches}

/** Per-cell HLL register state. */
case class HllRegs(regs: Array[Byte])

/** One emitted register summary (the exact-integer HLL contract). */
case class CellHll(cell: String, hll_zeros: Long, hll_harmonic: Long)

/** Streaming mergeable sketches: distinct-count state that never stores
  * ids. The batch twin ([[graft.operators.Sketches.hllStats]]) shuffles
  * (group, bucket, rank) rows; here each group's COMPLETE state is its
  * 256-byte register array, folded across micro-batches with
  * [[Sketches.HllAggregator]] — the same reduce the batch typed aggregator
  * uses, so the two paths cannot diverge.
  *
  * Why no watermark, no timeout, no ordering logic (contrast the geofence
  * operator's frontier discipline): register folding is COMMUTATIVE and
  * IDEMPOTENT-under-max, so out-of-order arrivals need no frontier, a
  * replayed row changes nothing, and the emitted summary after any prefix
  * of batches equals the batch operator over the rows seen so far —
  * batch-identical under ANY arrival order (StreamingSketchesSpec pins
  * all three). State size is 256 bytes per distinct cell — bounded by
  * geography, not by traffic — which is the entire point at 100 TB/day:
  * the exact-distinct twin would hold every device id in state. */
object StreamingSketches {

  /** Per-cell distinct-value HLL over a (possibly streaming) input.
    * Emits each touched cell's cumulative (zeros, harmonic) integers
    * every micro-batch; in batch mode emits exactly once per cell,
    * equal to [[Sketches.hllStats]]. */
  def cellVisitorsHll(points: DataFrame, cellCol: String, valueCol: String): Dataset[CellHll] = {
    val spark0 = points.sparkSession
    import spark0.implicits._
    val isStream = points.isStreaming
    val src = points
      .where(col(valueCol).isNotNull)
      .select(col(cellCol).cast("string").as("cell"),
        Dedup.portableHash(col(valueCol).cast("string")).as("raw"))
      .as[(String, Long)]
    src.groupByKey(_._1)
      .flatMapGroupsWithState[HllRegs, CellHll](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (cell, rows, state) =>
          val agg = new Sketches.HllAggregator
          var regs = state.getOption.map(_.regs).getOrElse(agg.zero)
          rows.foreach(r => regs = agg.reduce(regs, r._2))
          if (isStream) state.update(HllRegs(regs)) else state.remove()
          val (z, h) = Sketches.unpackHll(agg.finish(regs))
          Iterator.single(CellHll(cell, z, h))
      }
  }
}
