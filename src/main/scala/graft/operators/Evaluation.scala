package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model/filter evaluation over scored, labeled rows — the ops a
  * training-data pipeline runs on every quality/classifier signal before
  * trusting it as a curation gate (does the quality score actually rank
  * kept docs above dropped ones? is it calibrated?). Everything here is
  * EXACT integer arithmetic plus one shared final IEEE expression, the
  * house discipline for float output. */
object Evaluation {

  /** The AUC final expression over the exact integer aggregates
    * (n_pos, n_neg, r2_pos) — shared verbatim with the SQL oracle.
    * r2_pos = Σ over tied-score groups of p·(min_rank + max_rank) is twice
    * the tie-averaged positive rank sum, so
    * AUC = (r2_pos − P(P+1)) / (2PN) is the Mann–Whitney U normalization
    * with the standard half-credit for ties. */
  val AucFinalSql: String =
    """CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
      | ELSE (CAST(r2_pos AS DOUBLE) - CAST(n_pos AS DOUBLE)*(CAST(n_pos AS DOUBLE)+1))
      |  / (2*CAST(n_pos AS DOUBLE)*CAST(n_neg AS DOUBLE)) END""".stripMargin

  /** ROC AUC of an integer score against a boolean label, EXACTLY —
    * tie-aware (ties get half credit, the Mann–Whitney convention), no
    * sampling, no sketch. Returns ONE row (n_pos, n_neg, r2_pos, auc);
    * the three integers are exact, auc is [[AucFinalSql]] applied once.
    *
    * Tie handling without a tie-rank pass: rows are totally ordered by
    * (score, tieCol) through the two-pass range-partitioned
    * [[SortedNeighborhood.globalRank]] (no single-task sort), so a tied
    * score group occupies CONSECUTIVE ranks and its tie-averaged rank is
    * (min + max)/2 — one hash aggregate per distinct score recovers
    * exact doubled rank sums from the distinct ranks.
    *
    * Shape at scale: the two-pass rank (one range exchange + a
    * partition-count-bounded offset broadcast), one per-score hash
    * aggregate, one 1-row final. Integer headroom: r2_pos ≤ 2·P·n — the
    * same double-domain guard as giniIndex trips loudly past ~4.6e18. */
  def aucStats(df: DataFrame, scoreCol: Column, labelCol: Column,
               tieCol: Column): DataFrame = {
    val ranked = SortedNeighborhood.globalRank(
      df.select(scoreCol.cast("long").as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"), tieCol.as("__t")),
      col("__s"), col("__t"))
    val perScore = ranked.groupBy(col("__s"))
      .agg(min(col("rank")).as("__mn"), max(col("rank")).as("__mx"),
        sum(col("__y")).as("__p"), count(lit(1)).as("__n"))
    perScore
      .agg(sum(col("__p")).as("n_pos"),
        sum(col("__n") - col("__p")).as("n_neg"),
        sum(col("__p") * (col("__mn") + col("__mx"))).as("r2_pos"),
        max(col("__mx")).as("__maxr"))
      .withColumn("__ok",
        when(col("n_pos").cast("double") * 2 * col("__maxr").cast("double")
          <= lit(4.6e18), true)
          .otherwise(raise_error(lit("aucStats: rank sum overflows int64"))))
      .where(col("__ok"))
      .select(col("n_pos"), col("n_neg"), col("r2_pos"),
        expr(AucFinalSql).as("auc"))
  }

  /** The per-bin rate expression — shared verbatim with the SQL oracle. */
  val CalibrationRateSql: String =
    "CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE)"

  /** Reliability diagram in equal-FREQUENCY score bins: rows ranked by
    * (score, tieCol) split into `bins` near-equal slices, each reporting
    * exact (n_rows, n_pos) and the one-division positive rate — "does a
    * higher quality score mean a higher keep rate, monotonically?".
    * Equal-frequency (rank-based) rather than equal-width on purpose:
    * skewed score distributions put all mass in one width bin.
    * bin = (rank−1)·bins div n, integer-exact. Output: (bin, n_rows,
    * n_pos, rate), `bins` rows.
    *
    * Shape: the same two-pass global rank, a 1-row count broadcast for
    * the divisor (counted from the UNRANKED input — a column-pruned
    * scan, so the 100M-row ranked frame has exactly one consumer and
    * needs no pin; the first cut checkpointed it and paid a full
    * materialization), one bin hash aggregate. */
  def calibrationBins(df: DataFrame, scoreCol: Column, labelCol: Column,
                      tieCol: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100000, s"bins out of range: $bins")
    val src = df.select(scoreCol.cast("long").as("__s"),
      when(labelCol, 1L).otherwise(0L).as("__y"), tieCol.as("__t"))
    val total = src.agg(count(lit(1)).as("__n"))
    val ranked = SortedNeighborhood.globalRank(src, col("__s"), col("__t"))
    ranked.crossJoin(broadcast(total))
      .withColumn("bin", expr(s"((rank - 1) * $bins) div __n"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"), sum(col("__y")).as("n_pos"))
      .withColumn("rate", expr(CalibrationRateSql))
  }
}
