package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over keyed, time-ordered streams: the Markov
  * transition matrix and ordered-funnel progression every product/behavior
  * pipeline computes, in exact-integer form (counts only — nothing float,
  * nothing order-fragile).
  *
  * Scale shape: both operators shuffle ONCE on the sequence key. The
  * transition matrix is a codegen'd lag window followed by a partial+final
  * count aggregate; the funnel folds each user's sorted event list with a
  * constant-size integer state (greedy earliest subsequence matching —
  * provably equivalent to the iterated min-after formulation the SQL
  * oracle uses, which is how the two independent algorithms can
  * cross-check each other). Per-user state is O(events of that user);
  * hot users are the same tail the as-of join documents. */
object Sequences {

  /** (prev_type, next_type, n) counts of adjacent event-type pairs within
    * each key's stream, ordered by (`tsCol`, `tieCol`). */
  def transitionCounts(events: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      .select(col(keyCol), col(tsCol), col(tieCol), col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
  }

  /** Ordered-funnel progression: for each key, the greedy depth reached
    * through `steps` as a SUBSEQUENCE of its (`tsCol`, `tieCol`)-ordered
    * stream (other events may interleave); returns (depth, n_keys) over
    * ALL keys, depth 0 included. Greedy earliest matching is optimal for
    * subsequence progress, so depth equals the iterated
    * min-ts-after-previous-step formulation. */
  def funnelDepths(events: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, tieCol: String,
                   steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"funnel steps must be non-empty and distinct: $steps")
    val stepsArr = array(steps.map(lit): _*)
    val perKey = events
      .groupBy(keyCol)
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("t")))).as("evs"))
      .withColumn("depth",
        aggregate(col("evs"), lit(0),
          (acc, e) => when(acc < steps.size &&
            e.getField("t") === element_at(stepsArr, acc + 1), acc + 1)
            .otherwise(acc)))
    perKey.groupBy("depth").agg(count(lit(1)).as("n_keys"))
  }
}
