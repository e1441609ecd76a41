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
}
