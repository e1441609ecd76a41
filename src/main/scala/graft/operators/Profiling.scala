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
}
