package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time joins against slowly-changing dimensions (SCD type 2):
  * every fact row picks the ONE dimension version whose half-open validity
  * interval `[validFrom, validTo)` contains the fact timestamp.
  *
  * Distributed shape: a plain equi-join on the business key with the
  * validity range as an ADDITIONAL join predicate — never a theta join.
  * Spark evaluates the range conjuncts inside the hash/sort-merge join, so
  * the only row amplification is the per-key version count (a dimension
  * property, typically < 10), and the big fact side shuffles once on the
  * key it would shuffle on anyway. Dimensions that fit in memory broadcast
  * (`spark.sql.autoBroadcastJoinThreshold` decides; no hint needed).
  *
  * This is deliberately NOT [[graft.operators.Intervals]]' bucketed
  * interval-overlap join: there the join key IS the interval (buckets make
  * it an equi-join); here the business key already equi-partitions both
  * sides and the interval is a residual filter.
  *
  * Correctness precondition — versions of one key must tile time without
  * overlap (the SCD2 invariant). [[scd2Violations]] checks it in one
  * per-key window pass (sort by validFrom within key, compare each row's
  * validTo to its successor's validFrom): run it after every dimension
  * load rather than trusting the upstream. */
object TemporalJoin {

  /** Join each fact row to the dimension version valid at its timestamp.
    * Inner by default: a fact timestamp covered by no version drops (use
    * `joinType = "left"` to keep it with null dimension columns). */
  def scd2Join(fact: DataFrame, factKey: String, factTs: String,
               dim: DataFrame, dimKey: String,
               validFrom: String, validTo: String,
               joinType: String = "inner"): DataFrame = {
    val cond = fact(factKey) === dim(dimKey) &&
      fact(factTs) >= dim(validFrom) && fact(factTs) < dim(validTo)
    fact.join(dim, cond, joinType).drop(dim(dimKey))
  }

  /** SCD2 invariant check: per key, versions ordered by `validFrom` must
    * be non-empty (`validFrom < validTo`) and non-overlapping
    * (`validTo <= ` next `validFrom`). Returns the offending rows with a
    * `violation` label — empty means the dimension is point-in-time safe
    * (gaps are legal: they make inner-join facts drop, not duplicate). */
  def scd2Violations(dim: DataFrame, dimKey: String,
                     validFrom: String, validTo: String): DataFrame = {
    val w = Window.partitionBy(dimKey).orderBy(col(validFrom))
    dim
      .withColumn("__next_from", lead(col(validFrom), 1).over(w))
      .withColumn("violation",
        when(col(validFrom) >= col(validTo), lit("empty_interval"))
          .when(col("__next_from").isNotNull && col(validTo) > col("__next_from"),
            lit("overlaps_successor")))
      .where(col("violation").isNotNull)
      .drop("__next_from")
  }
}
