package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.streaming.StreamingSketches

/** Streaming per-cell HLL: cross-batch register state equals the batch
  * sketch, replayed rows are idempotent, arrival order is irrelevant —
  * the three properties the operator's no-frontier design claims. */
class StreamingSketchesSpec extends SparkTestBase {

  private def batchStats(rows: Seq[(String, Long)]) = {
    val spark0 = spark
    import spark0.implicits._
    Sketches.hllStats(rows.toDF("cell", "user_id"), Seq("cell"), "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def lastPerCell(table: String): Set[(String, Long, Long)] = {
    // Append-mode flatMapGroups emits one cumulative row per touched cell
    // per batch: the LAST emission per cell is the final register state
    val rows = spark.sql(
      s"""SELECT cell, hll_zeros, hll_harmonic FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cell ORDER BY __rid DESC) AS rnk
         |  FROM (SELECT *, monotonically_increasing_id() AS __rid FROM $table))
         |WHERE rnk = 1""".stripMargin)
    rows.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("cross-batch register state == the batch sketch; duplicate replay is idempotent") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val b1 = (0L until 300L).map(i => (s"c${i % 3}", i % 97))
    val b2 = (0L until 300L).map(i => (s"c${i % 4}", (i * 7) % 211)) ++ b1.take(50) // replayed rows

    val input = MemoryStream[(String, Long)]
    val query = StreamingSketches.cellVisitorsHll(
        input.toDF().toDF("cell", "user_id"), "cell", "user_id")
      .writeStream.format("memory").queryName("cell_hll")
      .outputMode("append").start()
    try {
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      // duplicates fold to the same registers: batch over DISTINCT union
      assert(lastPerCell("cell_hll") == batchStats(b1 ++ b2))
    } finally query.stop()
  }

  test("arrival order is irrelevant (commutative fold): reversed feed gives identical registers") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = (0L until 400L).map(i => (s"g${i % 5}", (i * 13) % 173))
    val input = MemoryStream[(String, Long)]
    val query = StreamingSketches.cellVisitorsHll(
        input.toDF().toDF("cell", "user_id"), "cell", "user_id")
      .writeStream.format("memory").queryName("cell_hll_rev")
      .outputMode("append").start()
    try {
      input.addData(rows.reverse: _*)
      query.processAllAvailable()
      assert(lastPerCell("cell_hll_rev") == batchStats(rows))
    } finally query.stop()
  }

  test("batch-mode run emits once per cell and equals hllStats") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (0L until 500L).map(i => (s"z${i % 4}", (i * 3) % 131))
    val got = StreamingSketches.cellVisitorsHll(rows.toDF("cell", "user_id"), "cell", "user_id")
      .collect().map(c => (c.cell, c.hll_zeros, c.hll_harmonic))
    assert(got.length == 4, "one emission per cell in batch mode")
    assert(got.toSet == batchStats(rows))
  }
}
