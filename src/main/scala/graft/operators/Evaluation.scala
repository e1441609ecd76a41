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
    * Tie handling without ranking a single raw row: a tied score group
    * occupies consecutive ranks [below+1, below+t] in any (score, tie)
    * total order, so its tie-averaged doubled rank sum is
    * p·(2·below + t + 1) — recovered from per-score (t, p) counts plus a
    * global weighted prefix sum over the SCORE table
    * ([[SortedNeighborhood.globalPrefixSum]], the two-pass
    * range-partitioned shape). The expensive pass is therefore ONE hash
    * aggregate over the data; everything ordered is score-cardinality
    * rows (a 100M-row table with 100k distinct scores range-sorts 100k
    * rows, not 100M — ranking raw rows measured 7× slower at 100M).
    *
    * Integer headroom: r2_pos ≤ 2·P·n — the same double-domain guard as
    * giniIndex trips loudly past ~4.6e18. */
  def aucStats(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val perScore = df
      .select(scoreCol.cast("long").as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__t"), sum(col("__y")).as("__p"))
    val withBelow = SortedNeighborhood.globalPrefixSum(perScore, col("__s"), col("__t"))
    withBelow
      .agg(sum(col("__p")).as("n_pos"),
        sum(col("__t") - col("__p")).as("n_neg"),
        sum(col("__p") * (lit(2L) * col("below") + col("__t") + 1L)).as("r2_pos"),
        max(col("below") + col("__t")).as("__maxr"))
      .withColumn("__ok",
        when(col("n_pos").cast("double") * 2 * col("__maxr").cast("double")
          <= lit(4.6e18), true)
          .otherwise(raise_error(lit("aucStats: rank sum overflows int64"))))
      .where(col("__ok"))
      .select(col("n_pos"), col("n_neg"), col("r2_pos"),
        expr(AucFinalSql).as("auc"))
  }

  /** The KS final expression over (n_a, n_b, d_num) — shared verbatim
    * with the SQL oracle. D = d_num / (n_a·n_b). */
  val KsFinalSql: String =
    """CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
      | ELSE CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)) END""".stripMargin

  /** Two-sample Kolmogorov–Smirnov statistic between the value
    * distributions of two periods, EXACTLY — the ordered-CDF drift test
    * that [[graft.operators.Validation.tvDrift]]'s categorical gate
    * cannot express (a small shift of a continuous score moves every
    * quantile a little; TV on buckets dilutes it, the CDF sup-gap does
    * not). Integer form: D·n_a·n_b = max over values of
    * |cumA·n_b − cumB·n_a| (cum = inclusive prefix counts in value
    * order), so the output row (n_a, n_b, d_num, ks) carries three exact
    * int64s and ONE shared final division.
    *
    * Shape at scale: ONE data-sized hash aggregate to per-value
    * (a, b) counts, then two value-cardinality
    * [[SortedNeighborhood.globalPrefixSum]] passes (range exchanges of
    * the distinct-value table only) and a 1-row max — nothing row-sized
    * ever sorts, the same compaction that makes [[aucStats]] scale.
    * Integer headroom: cum·n ≤ n_a·n_b, guarded loudly past 4.6e18. */
  def ksTest(df: DataFrame, valueCol: Column, isPeriodB: Column): DataFrame = {
    val perVal = df
      .select(valueCol.cast("long").as("__v"),
        when(isPeriodB, 1L).otherwise(0L).as("__y"))
      .groupBy(col("__v"))
      .agg(sum(lit(1L) - col("__y")).as("__ta"), sum(col("__y")).as("__tb"))
    val withA = SortedNeighborhood.globalPrefixSum(perVal, col("__v"), col("__ta"))
      .withColumnRenamed("below", "__belowA")
    val withB = SortedNeighborhood.globalPrefixSum(withA, col("__v"), col("__tb"))
      .withColumnRenamed("below", "__belowB")
    val totals = perVal.agg(sum(col("__ta")).as("__na"), sum(col("__tb")).as("__nb"))
    withB.crossJoin(broadcast(totals))
      .withColumn("__ok",
        when(col("__na").cast("double") * col("__nb").cast("double") <= lit(4.6e18), true)
          .otherwise(raise_error(lit("ksTest: cum*n overflows int64"))))
      .where(col("__ok"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(abs((col("__belowA") + col("__ta")) * col("__nb")
          - (col("__belowB") + col("__tb")) * col("__na"))).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"), expr(KsFinalSql).as("ks"))
  }

  /** [[aucStats]] PER SEGMENT — the evaluation slice every monitoring
    * dashboard needs (an overall AUC of 0.8 hiding a 0.5 segment is the
    * classic silent failure): one row (grpCol, n_pos, n_neg, r2_pos, auc)
    * per group, same exact tie-aware integers, same compaction — the
    * data-sized work is ONE (group, score) hash aggregate, then the
    * grouped prefix sum runs over (group × distinct-score) rows only.
    * Segments with one class report NULL, as [[AucFinalSql]] defines. */
  def aucStatsBy(df: DataFrame, grpCol: String, scoreCol: Column,
                 labelCol: Column): DataFrame = {
    val perScore = df
      .select(col(grpCol), scoreCol.cast("long").as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .groupBy(col(grpCol), col("__s"))
      .agg(count(lit(1)).as("__t"), sum(col("__y")).as("__p"))
    val withBelow = SortedNeighborhood.groupedPrefixSum(perScore, grpCol,
      col("__s"), col("__t"))
    withBelow
      .groupBy(col(grpCol))
      .agg(sum(col("__p")).as("n_pos"),
        sum(col("__t") - col("__p")).as("n_neg"),
        sum(col("__p") * (lit(2L) * col("below") + col("__t") + 1L)).as("r2_pos"),
        max(col("below") + col("__t")).as("__maxr"))
      .withColumn("__ok",
        when(col("n_pos").cast("double") * 2 * col("__maxr").cast("double")
          <= lit(4.6e18), true)
          .otherwise(raise_error(lit("aucStatsBy: rank sum overflows int64"))))
      .where(col("__ok"))
      .select(col(grpCol), col("n_pos"), col("n_neg"), col("r2_pos"),
        expr(AucFinalSql).as("auc"))
  }

  /** The percentile expression over (rank, n_grp) — shared verbatim with
    * the SQL oracle; singleton groups are NULL (no [0,1] span exists). */
  val PercentileFinalSql: String =
    """CASE WHEN n_grp <= 1 THEN NULL
      | ELSE CAST(rank - 1 AS DOUBLE) / CAST(n_grp - 1 AS DOUBLE) END""".stripMargin

  /** PER-ROW percentile of a value within its group — the per-category
    * rank feature (percentile-scaled signals survive distribution shift
    * between categories where raw values don't; the row-level sibling of
    * [[graft.operators.Curation]]'s corpus-level quantile normalization).
    * pct = (rank − 1)/(n_grp − 1) over the exact integer (rank, n_grp)
    * pair, ONE shared final division; rank is total-ordered by
    * (value, tie), so the whole output is hash-exact.
    *
    * Shape at scale: the grouped two-pass range rank
    * ([[SpatialPartition.groupedGlobalRank]]) — a per-group window would
    * serialize each group into one task (5 groups × 20M rows each = five
    * single-task sorts); the two-pass shape range-partitions by
    * (group, value, tie) and attaches offsets from a
    * partition-count-bounded broadcast instead. Output: (grpCol, tieCol,
    * value-as-long, rank, n_grp, pct). */
  def groupPercentile(df: DataFrame, grpCol: String, valueCol: Column,
                      tieCol: Column): DataFrame = {
    val ranked = SpatialPartition.groupedGlobalRank(
      df.select(col(grpCol), valueCol.cast("long").as("__v"), tieCol.as("__tie")),
      grpCol, col("__v"), col("__tie"))
    ranked
      .select(col(grpCol), col("__tie").as("row_id"), col("__v").as("value_q"),
        col("rank"), col("__tot").as("n_grp"))
      .withColumn("pct", expr(PercentileFinalSql))
  }

  /** The one-way ANOVA F expression over the 3k exact integer group
    * moments (n_i, s_i, q_i), groups in FIXED index order so both
    * engines build the identical left-associated IEEE sum trees — shared
    * verbatim with the SQL oracle. NULL when any group is empty or the
    * within-group variation is zero. */
  def anovaFinalSql(k: Int): String = {
    val bsum = (0 until k)
      .map(i => s"(CAST(s_$i AS DOUBLE)*CAST(s_$i AS DOUBLE)/CAST(n_$i AS DOUBLE))")
      .mkString(" + ")
    val qsum = (0 until k).map(i => s"CAST(q_$i AS DOUBLE)").mkString(" + ")
    val ssum = (0 until k).map(i => s"CAST(s_$i AS DOUBLE)").mkString(" + ")
    val nsum = (0 until k).map(i => s"CAST(n_$i AS DOUBLE)").mkString(" + ")
    val anyZero = (0 until k).map(i => s"n_$i = 0").mkString(" OR ")
    s"""CASE WHEN $anyZero THEN NULL
       | WHEN ($qsum) - ($bsum) = 0 THEN NULL
       | ELSE ((($bsum) - ($ssum)*($ssum)/($nsum)) / ${k - 1})
       |  / ((($qsum) - ($bsum)) / (($nsum) - $k)) END""".stripMargin
  }

  /** One-way ANOVA F statistic of an integer-quantized value across a
    * FIXED list of groups — "does this signal actually differ by
    * category?", the analysis gate behind per-source/per-language quality
    * decisions. Per group: exact int64 (n, Σy, Σy²) from ONE conditional
    * hash aggregate (no groupBy — the pivot is the aggregate, so the
    * result is a single row however large the input); the F ratio is
    * [[anovaFinalSql]] applied once, with the group terms summed in
    * index order — deterministic doubles, no order-dependent float
    * aggregation anywhere. Output: one row (n_0, s_0, q_0, …, f_stat).
    * Rows outside `groups` are excluded. Integer headroom: Σy² exact
    * while n·maxY² < 2⁶³ (~3.6e9 rows at |y| ≤ 5·10⁴). */
  def anovaF(df: DataFrame, valueCol: Column, groupCol: Column,
             groups: Seq[String]): DataFrame = {
    require(groups.size >= 2 && groups.size <= 20,
      s"groups size out of range: ${groups.size}")
    require(groups.distinct.size == groups.size, "duplicate groups")
    val y = valueCol.cast("long")
    val aggs = groups.zipWithIndex.flatMap { case (g, i) => Seq(
      sum(when(groupCol === g, 1L).otherwise(0L)).as(s"n_$i"),
      sum(when(groupCol === g, y).otherwise(0L)).as(s"s_$i"),
      sum(when(groupCol === g, y * y).otherwise(0L)).as(s"q_$i")) }
    df.where(groupCol.isin(groups: _*))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("f_stat", expr(anovaFinalSql(groups.size)))
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
