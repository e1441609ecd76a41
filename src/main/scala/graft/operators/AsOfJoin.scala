package graft.operators

import org.apache.spark.sql.DataFrame
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
  * same shape as a sort-merge join, with no pair multiplication. */
object AsOfJoin {

  /** @param rightOrderCol right-side tiebreaker (numeric/orderable);
    *                      largest value wins among equal timestamps
    * @param rightCarryCols right columns delivered to the output `asof`
    *                       struct (null when no right row qualifies)
    * @return left rows + an `asof` struct of the carried right columns */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTimeCol: String, rightTimeCol: String,
           rightOrderCol: String, rightCarryCols: Seq[String]): DataFrame = {
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
}
