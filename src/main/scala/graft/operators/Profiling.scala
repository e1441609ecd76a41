package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the validation pass every 100-TB ingest runs before
  * training: per-column null/distinct/extreme stats, computed in ONE scan
  * of the table (a per-column loop of `df.select(col).agg(...)` would read
  * the table once per column; at 100 TB that difference is the whole job).
  *
  * Output is long format — one row per profiled column:
  * `(col_name, n_nonnull, n_distinct, min_val, max_val)` with min/max cast
  * to double for numeric columns and null for strings (a string's
  * extremes depend on collation; its null/distinct counts do not).
  *
  * Exactness/scale tradeoff is explicit: `exact = true` (the default, and
  * the oracle-checked contract) uses `count(distinct)` — Spark plans the
  * multi-distinct aggregate with one Expand of (#cols + 1) row copies,
  * still a single scan, with map-side partials collapsing each copy to
  * its distinct values. For trillion-row profiling where even that
  * expansion hurts, `exact = false` swaps in HyperLogLog
  * (`approx_count_distinct`, mergeable fixed-size state, no Expand) —
  * same single-scan plan, ±2% on the distinct counts only.
  */
object Profiling {

  def profile(df: DataFrame, numericCols: Seq[String], stringCols: Seq[String] = Nil,
              exact: Boolean = true): DataFrame = {
    val cols = numericCols ++ stringCols
    require(cols.nonEmpty, "profile: no columns given")
    require(cols.distinct.size == cols.size, s"profile: duplicate columns in $cols")
    def distinctOf(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    // one flat agg row: 4 measures per column, computed in a single pass
    val measures = numericCols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"), distinctOf(c).as(s"__d_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"), max(col(c)).cast("double").as(s"__mx_$c"))
    } ++ stringCols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"), distinctOf(c).as(s"__d_$c"))
    }
    val flat = df.agg(measures.head, measures.tail: _*)
    // reshape driver-side literals-free: stack the single row to long format
    val stacked = cols.map { c =>
      val isNum = numericCols.contains(c)
      struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_nonnull"),
        col(s"__d_$c").cast("long").as("n_distinct"),
        (if (isNum) col(s"__mn_$c") else lit(null).cast("double")).as("min_val"),
        (if (isNum) col(s"__mx_$c") else lit(null).cast("double")).as("max_val"))
    }
    flat.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** The one double-domain Gini expression, shared verbatim with the SQL
    * oracle: every operand is an exact int64 aggregate. */
  val GiniFinalSql: String =
    "CASE WHEN n < 1 OR sx = 0 THEN NULL " +
      "ELSE CAST(2*srx - (n+1)*sx AS DOUBLE) / CAST(n*sx AS DOUBLE) END"

  /** Exact Gini index of a non-negative integer distribution — the
    * inequality summary for skew triage (how concentrated is activity
    * across cells / documents across domains?). Uses the rank-sum
    * identity gini = (2·Σr·xᵣ − (n+1)·Σx) / (n·Σx) over the ASCENDING
    * global rank r by (value, tie): within a tie group the values are
    * equal, so Σr·x is invariant under any tie permutation and the
    * deterministic (value, tie) order makes the integer numerator exact
    * and engine-independent. One double division at the end
    * ([[GiniFinalSql]], replayed verbatim by the oracle).
    *
    * Distributed shape: [[SortedNeighborhood.globalRank]]'s two-pass
    * range rank (sampled range exchange + per-partition row_number +
    * broadcast offsets — never a single-partition window), then one tiny
    * aggregate. Integer headroom: Σr·x ≤ n·Σx must stay under 2⁶³
    * (n = distinct groups, Σx = total weight) — loudly guarded.
    * Output: one row (n_groups, total, gini). */
  def giniIndex(df: DataFrame, valueCol: String, tieCol: String): DataFrame = {
    val ranked = SortedNeighborhood.globalRank(
      df.select(col(valueCol).cast("long").as("x"), col(tieCol).cast("long").as("t")),
      col("x"), col("t"))
    ranked
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("rank") * col("x")).as("srx"),
        min(col("x")).as("__mn"))
      .withColumn("__ok",
        when(col("__mn") >= 0L, true)
          .otherwise(raise_error(lit("giniIndex: negative values are undefined"))))
      .withColumn("__ok2",
        // n*sx and 2*srx are the largest intermediates; srx <= n*sx by
        // construction, so one double-domain check covers both
        when(col("n").cast("double") * col("sx").cast("double") <= lit(4.6e18), true)
          .otherwise(raise_error(lit("giniIndex: n*sum(x) overflows int64"))))
      .where(col("__ok") && col("__ok2"))
      .select(col("n").as("n_groups"), col("sx").as("total"),
        expr(GiniFinalSql).as("gini"))
  }
}
