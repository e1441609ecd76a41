package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the classic multi-criteria OLAP
  * operator (Börzsönyi/Kossmann/Stocker, ICDE'01): keep exactly the rows
  * not dominated by any other row, where `d` dominates `r` iff
  * `d.min <= r.min AND d.max >= r.max` with at least one strict
  * inequality (minimize `minCol`, maximize `maxCol`).
  *
  * Distributed shape — the textbook two-phase grid prune, never an
  * all-pairs join:
  *
  *  1. *Grid prune.* Bucket rows by `floor(min / bucketWidth)`; one tiny
  *     hash aggregate yields each bucket's best `max`. Every row in bucket
  *     b with `max <= ` the running best of buckets `< b` is dominated by
  *     SOME row of a strictly-earlier bucket (strictly cheaper by the
  *     floor-bucket construction, no worse on `max`), so one broadcast
  *     join + filter discards it inside the scan. The prefix-max window
  *     runs over the BUCKET table (bounded by the value range over
  *     `bucketWidth`, a plan-time constant), never over data rows.
  *  2. *Exact finish on survivors.* Survivors are the rows that improve on
  *     every earlier bucket's best — per-bucket record-setters, orders of
  *     magnitude fewer than the input (worst case: one bucket holding an
  *     anti-correlated staircase degrades to that bucket's size; pick
  *     `bucketWidth` so buckets are numerous). The exact 2-D rule is then
  *     one per-value aggregate plus a strict-prefix max over DISTINCT
  *     survivor values: a row is skyline iff its `max` equals its value
  *     group's best AND strictly exceeds the best of every smaller value.
  *
  * Phase 1 only ever removes dominated rows and dominance is transitive,
  * so skyline(survivors) == skyline(input) — the exact pass makes the
  * result independent of `bucketWidth` (spec-pinned). Ties are kept: two
  * identical (min,max) points do not strictly dominate each other and both
  * emerge, matching the ANSI-SQL replay in the catalog oracle. */
object Skyline {

  /** Skyline of (`minCol` minimized, `maxCol` maximized); output columns
    * (idCol, minCol, maxCol). Rows with a null coordinate are excluded
    * (dominance is undefined for them). */
  def skyline2d(df: DataFrame, idCol: String, minCol: String, maxCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pts = df
      .select(col(idCol), col(minCol).cast("double").as("__x"),
        col(maxCol).cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("__b", floor(col("__x") / lit(bucketWidth)).cast("long"))
    // phase 1: bounded bucket-best table, strict-prefix running max
    val bucketBest = pts.groupBy("__b").agg(max("__y").as("__bm"))
      .withColumn("__pm", max("__bm").over(
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)))
      .select("__b", "__pm")
    val survivors = pts.join(broadcast(bucketBest), "__b")
      .where(col("__pm").isNull || col("__y") > col("__pm"))
    // phase 2: exact rule over the (small) survivor set — per-value best
    // plus a strict-prefix max over distinct survivor values
    val valueBest = survivors.groupBy("__x").agg(max("__y").as("__vm"))
      .withColumn("__prev", max("__vm").over(
        Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)))
    survivors.join(broadcast(valueBest), "__x")
      .where(col("__y") === col("__vm") &&
        (col("__prev").isNull || col("__y") > col("__prev")))
      .select(col(idCol), col("__x").as(minCol), col("__y").as(maxCol))
  }
}
