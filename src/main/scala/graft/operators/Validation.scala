package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gates: evaluate a rule set over a table in ONE
  * scan and report per-rule violation counts — the expectation check a
  * training-data pipeline runs on every ingested batch before it is
  * allowed downstream (schema drift, null creep, out-of-range values,
  * malformed categorical codes).
  *
  * Scale shape: all rules compile into a single global aggregate — one
  * whole-stage-codegen scan producing one partial row per task and one
  * 1-row final — then the driver-free unpivot explodes that row into the
  * (rule, violations, n_rows) report. No shuffle of data rows, no second
  * scan per rule, nothing per-row ever reaches the driver. */
object Validation {

  /** @param rules (name, violationPredicate) pairs — a row VIOLATES a rule
    *              when its predicate is TRUE. A predicate evaluating to
    *              NULL counts as no violation: write explicit `IS NULL`
    *              checks for null-sensitive rules. Names must be
    *              `[A-Za-z0-9_]+` (they become intermediate column names).
    * @return one row per rule: (rule, violations, n_rows), in rule order */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "validate: empty rule set")
    val bad = rules.map(_._1).filterNot(_.matches("[A-Za-z0-9_]+"))
    require(bad.isEmpty, s"validate: rule names must be [A-Za-z0-9_]+: ${bad.mkString(", ")}")
    require(rules.map(_._1).distinct.size == rules.size, "validate: duplicate rule names")

    val aggs = rules.map { case (n, p) =>
      sum(when(p, 1L).otherwise(0L)).as(s"__v_$n")
    } :+ count(lit(1)).as("__rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (n, _) =>
        struct(lit(n).as("rule"),
          coalesce(col(s"__v_$n"), lit(0L)).as("violations"),
          col("__rows").as("n_rows"))
      }: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__r.violations").as("violations"),
        col("__r.n_rows").as("n_rows"))
  }

  /** Distribution-drift gate between two periods of the same table — the
    * "did this week's ingest change shape?" monitor a training-data
    * pipeline runs per batch. Per bucket b with period counts (a_b, b_b)
    * and period totals (N_A, N_B), emits the EXACT integer total-variation
    * contribution
    *
    *   contrib_b = |a_b·N_B − b_b·N_A|      (so TV distance = Σ contrib
    *                                         / (2·N_A·N_B))
    *
    * Total variation instead of PSI/KL on purpose: TV clears the
    * per-bucket rational to one integer — hash-exact, no transcendental
    * log, no epsilon for empty buckets (a bucket absent from one period
    * contributes its full count, where PSI needs a smoothing fudge).
    * Output: (bucket, n_a, n_b, contrib), every column exact int64.
    *
    * Shape at scale: ONE hash aggregate over (bucket) with two
    * conditional-sum partials, then a 1-row total broadcast joined back —
    * no second scan, no window, no per-row shuffle. Integer headroom:
    * contrib < count·total ≤ N_A·N_B, exact while N_A·N_B < 2⁶³ (~3e9
    * rows per period). */
  def tvDrift(df: DataFrame, bucketCol: Column, isPeriodB: Column): DataFrame = {
    // pinned: the bucket-cardinality count table feeds both the totals
    // aggregate and the final join — without the pin each consumer
    // re-scans the full input (2 scans for a 1-scan-shaped gate)
    val counts = df.groupBy(bucketCol.as("bucket"))
      .agg(sum(when(isPeriodB, 0L).otherwise(1L)).as("n_a"),
        sum(when(isPeriodB, 1L).otherwise(0L)).as("n_b"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_a"), col("n_b"),
        abs(col("n_a") * col("__tb") - col("n_b") * col("__ta")).as("contrib"))
  }
}
