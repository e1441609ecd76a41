package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical operator Spark lacks natively (telemetry /
  * market-data "latest state at or before this time").
  *
  * For each left row: the single latest right row with the same key and
  * right time <= left time; ties on time are broken by `rightOrderCol`
  * (largest wins, so the result is deterministic even with duplicate
  * right timestamps).
  *
  * Implementation is the union-window pattern, chosen over a range join
  * (no row-range explosion) and over a per-row broadcast probe (right side
  * may be huge): tag both sides, union, ONE shuffle by key, per-key sort
  * by (time, side, order) with right rows BEFORE left rows at equal time
  * (so "at or before" includes same-timestamp rights), then carry the
  * last-seen right row forward with `last(ignoreNulls)` over a ROWS
  * frame. Cost: one exchange + one sort of |left| + |right| rows — the
  * same shape as a sort-merge join, with no pair multiplication.
  *
  * Skew caveat: the per-key window serializes each key into ONE task, so a
  * pathological hot key (a single device with 10^8 events) becomes a
  * straggler — a bound a sort-merge join shares but AQE cannot split for
  * window functions. [[asOfBucketed]] is the skew-hardened variant: it
  * bounds the largest window partition by (key, time-bucket) instead of
  * key, at the price of one extra small shuffle of per-bucket summaries. */
object AsOfJoin {

  /** Internal column names reserved by the implementation (both variants);
    * caller columns may not collide (they would be silently clobbered
    * otherwise). */
  private val Reserved =
    Seq("__t", "__side", "__ord", "__carry", "__bkt", "__inb", "__prev", "__rank",
      "__b", "__f", "asof")

  private def requireNoReserved(left: DataFrame, right: DataFrame): Unit = {
    val clash = (left.columns ++ right.columns).distinct.filter(Reserved.contains)
    require(clash.isEmpty,
      s"asOf reserves column names ${Reserved.mkString(", ")}; rename input columns: " +
        clash.mkString(", "))
  }

  /** @param rightOrderCol right-side tiebreaker (numeric/orderable);
    *                      largest value wins among equal timestamps
    * @param rightCarryCols right columns delivered to the output `asof`
    *                       struct (null when no right row qualifies)
    * @return left rows + an `asof` struct of the carried right columns */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTimeCol: String, rightTimeCol: String,
           rightOrderCol: String, rightCarryCols: Seq[String]): DataFrame = {
    requireNoReserved(left, right)
    val carryCols = (rightOrderCol +: rightCarryCols).distinct
    val rightU = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).as("__t"),
        lit(0).as("__side"),
        col(rightOrderCol).as("__ord"),
        struct(carryCols.map(col): _*).as("__carry")): _*)
    val leftU = left.select(
      left.columns.map(col) ++ Seq(col(leftTimeCol).as("__t"), lit(1).as("__side")): _*)
    val unioned = leftU.unionByName(rightU, allowMissingColumns = true)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof", last(col("__carry"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__t", "__side", "__ord", "__carry")
  }

  /** Skew-hardened as-of join: identical semantics to [[asOf]], but no
    * window partition ever exceeds the rows of one (key, time-bucket).
    *
    * Two-pass shape:
    *   1. per-(key, bucket) summaries of the right side (its LAST row by
    *      (time, order)), then a per-key cumulative carry over the summary
    *      rows — a window over #buckets-per-key rows, not #rows-per-key;
    *   2. the union-window of [[asOf]] partitioned by (key, bucket), with
    *      each bucket's left rows falling back to the previous buckets'
    *      carried summary when no right row precedes them in-bucket.
    *
    * A hot key with 10^8 events at bucket width ~ span/10^4 peaks at 10^4
    * rows per window task instead of 10^8; uniform keys pay one extra
    * shuffle of summary rows (one per key-bucket touched by the right
    * side). `bucketFor` maps the time column to a bucket ordinal (e.g.
    * `t => unix_millis(t) div 3600000` for hourly buckets of a timestamp;
    * any monotone integer bucketing works). */
  def asOfBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTimeCol: String, rightTimeCol: String,
                   rightOrderCol: String, rightCarryCols: Seq[String],
                   bucketFor: Column => Column): DataFrame = {
    requireNoReserved(left, right)
    val carryCols = (rightOrderCol +: rightCarryCols).distinct
    val key = keyCols.map(col)

    // pass 1: last right row per (key, bucket) -> cumulative carry per key.
    // max_by over the (time, order) pair implements the same tie rule as the
    // window sort (latest time, then largest order).
    val summaries = right
      .select(key ++ Seq(
        bucketFor(col(rightTimeCol)).as("__bkt"),
        struct(col(rightTimeCol).as("__t"), col(rightOrderCol).as("__o")).as("__rank"),
        struct(carryCols.map(col): _*).as("__carry")): _*)
      .groupBy(key :+ col("__bkt"): _*)
      .agg(max_by(col("__carry"), col("__rank")).as("__carry"))
    // a bucket's summary becomes visible from the NEXT bucket onward (left
    // rows inside bucket k must not see right rows later than themselves in
    // bucket k — those are handled exactly by the in-bucket window below)
    val wCarry = Window.partitionBy(key: _*)
      .orderBy(col("__bkt"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftBuckets = left
      .select(key :+ bucketFor(col(leftTimeCol)).as("__bkt"): _*)
      .distinct()
      .withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(summaries.schema("__carry").dataType))
    val prevCarry = summaries
      .withColumn("__bkt", col("__bkt") + 1)
      .withColumn("__side", lit(0))
      .unionByName(leftBuckets)
      .withColumn("__prev", last(col("__carry"), ignoreNulls = true).over(wCarry))
      .where(col("__side") === 1)
      .select(key ++ Seq(col("__bkt"), col("__prev")): _*)

    // pass 2: the union-window within (key, bucket); fall back to the carry
    val rightU = right.select(
      key ++ Seq(
        bucketFor(col(rightTimeCol)).as("__bkt"),
        col(rightTimeCol).as("__t"),
        lit(0).as("__side"),
        col(rightOrderCol).as("__ord"),
        struct(carryCols.map(col): _*).as("__carry")): _*)
    val leftU = left.select(
      left.columns.map(col) ++ Seq(
        bucketFor(col(leftTimeCol)).as("__bkt"),
        col(leftTimeCol).as("__t"), lit(1).as("__side")): _*)
    val unioned = leftU.unionByName(rightU, allowMissingColumns = true)
    val w = Window.partitionBy(key :+ col("__bkt"): _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__inb", last(col("__carry"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .join(prevCarry, keyCols :+ "__bkt", "left")
      .withColumn("asof", coalesce(col("__inb"), col("__prev")))
      .drop("__t", "__side", "__ord", "__carry", "__inb", "__prev", "__bkt")
  }

  /** FORWARD as-of join: for each left row, the single EARLIEST right row
    * with the same key and right time >= left time (ties on time broken
    * by SMALLEST `rightOrderCol` — the mirror of [[asOf]]'s rule). Same
    * union-window shape and skew caveat; left rows sort BEFORE right rows
    * at equal time so "at or after" includes same-timestamp rights, and
    * the frame looks forward with `first(ignoreNulls)`. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTimeCol: String, rightTimeCol: String,
                  rightOrderCol: String, rightCarryCols: Seq[String]): DataFrame = {
    requireNoReserved(left, right)
    val carryCols = (rightOrderCol +: rightCarryCols).distinct
    val rightU = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).as("__t"),
        lit(1).as("__side"),
        col(rightOrderCol).as("__ord"),
        struct(carryCols.map(col): _*).as("__carry")): _*)
    val leftU = left.select(
      left.columns.map(col) ++ Seq(col(leftTimeCol).as("__t"), lit(0).as("__side")): _*)
    val unioned = leftU.unionByName(rightU, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("asof", first(col("__carry"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .drop("__t", "__side", "__ord", "__carry")
  }

  /** NEAREST as-of join over a NUMERIC time column: for each left row,
    * the right row minimizing |right time - left time|; exact ties in
    * distance prefer the backward (at-or-before) match — pandas
    * merge_asof(direction='nearest') semantics. One union-window pass
    * computing BOTH directions (backward `last` + forward `first` over
    * the same sort, where rights precede lefts at equal time so a
    * zero-distance match lands on the backward side), then an arithmetic
    * choose. Time must be numeric (cast timestamps to epoch micros) so
    * the distance compare is integer-exact. */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTimeCol: String, rightTimeCol: String,
                  rightOrderCol: String, rightCarryCols: Seq[String]): DataFrame = {
    requireNoReserved(left, right)
    val carryCols = (rightTimeCol +: rightOrderCol +: rightCarryCols).distinct
    val rightU = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).as("__t"),
        lit(0).as("__side"),
        col(rightOrderCol).as("__ord"),
        struct(carryCols.map(col): _*).as("__carry")): _*)
    val leftU = left.select(
      left.columns.map(col) ++ Seq(col(leftTimeCol).as("__t"), lit(1).as("__side")): _*)
    val unioned = leftU.unionByName(rightU, allowMissingColumns = true)
    val order = Seq(col("__t"), col("__side"), col("__ord"))
    val wBack = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val back = last(col("__carry"), ignoreNulls = true).over(wBack)
    val fwd = first(col("__carry"), ignoreNulls = true).over(wFwd)
    unioned
      .withColumn("__b", back)
      .withColumn("__f", fwd)
      .where(col("__side") === 1)
      .withColumn("asof",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(col("__t") - col("__b").getField(rightTimeCol) <=
            col("__f").getField(rightTimeCol) - col("__t"), col("__b"))
          .otherwise(col("__f")))
      .drop("__t", "__side", "__ord", "__carry", "__b", "__f")
  }
}
