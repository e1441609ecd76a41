package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-entity fixed-step resampling with
  * carry-forward — the feature-grid builder for training pipelines (one
  * row per entity per grid instant, each carrying the latest observation
  * at or before that instant; the batch analogue of an as-of join against
  * a generated clock). */
object TimeSeries {

  private val Reserved = Seq("__us", "__ord", "__payload", "__lo", "__hi",
    "__grid", "__carry", "grid_us")

  /** One row per `stepMicros` grid instant per entity, from the entity's
    * first observation rounded UP to the grid through its last, carrying
    * the latest observation at-or-before each instant (`carryCols`).
    * Exact-duplicate (entity, timestamp) observations collapse
    * deterministically to the max-`orderCol` row first, so the carried
    * value is well-defined on both the engine and the oracle side.
    *
    * Distributed shape: a per-entity min/max aggregation sizes the grid,
    * grid instants explode from `sequence()` on the executors (never a
    * driver loop), and ONE window pass over (entity, time) merges grid and
    * observation rows — a grid instant costs one shuffled row, and
    * observations are never duplicated (compare the naive grid×obs range
    * join, which copies every observation once per grid instant it could
    * serve). Output: (idCol, grid_us, carryCols*). */
  def resampleCarryForward(points: DataFrame, idCol: String, tsCol: String,
                           orderCol: String, carryCols: Seq[String],
                           stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be positive: $stepMicros")
    require(carryCols.nonEmpty, "resampleCarryForward: nothing to carry")
    val clash = points.columns.filter(Reserved.contains)
    require(clash.isEmpty, s"resampleCarryForward reserves ${Reserved.mkString(", ")}; " +
      s"rename: ${clash.mkString(", ")}")
    // cast: NTZ-typed inputs; the grid is an integer-µs axis, zone-free
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val obs = points
      .select(col(idCol), us.as("__us"), col(orderCol).as("__ord"),
        struct(carryCols.map(col): _*).as("__payload"))
      .groupBy(col(idCol), col("__us"))
      .agg(max_by(col("__payload"), col("__ord")).as("__payload"))
    val payloadType = obs.schema("__payload").dataType
    val bounds = obs.groupBy(col(idCol))
      .agg(min(col("__us")).as("__lo"), max(col("__us")).as("__hi"))
    val grid = bounds.select(col(idCol),
      explode(sequence(
        expr(s"((__lo + ${stepMicros - 1}) div $stepMicros) * $stepMicros"),
        col("__hi"), lit(stepMicros))).as("__us"))
    val merged = grid
      .select(col(idCol), col("__us"), lit(1).as("__grid"),
        lit(null).cast(payloadType).as("__payload"))
      .unionByName(obs.select(col(idCol), col("__us"), lit(0).as("__grid"),
        col("__payload")))
    // observations sort BEFORE a grid instant at the same µs, so an
    // exactly-on-grid observation is carried by its own instant
    val w = Window.partitionBy(idCol).orderBy(col("__us"), col("__grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("__carry", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__grid") === 1)
      .select(Seq(col(idCol), col("__us").as("grid_us")) ++
        carryCols.map(c => col(s"__carry.$c").as(c)): _*)
  }
}
