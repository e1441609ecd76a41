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

  /** Top-k ordered event paths: every ADJACENT `len`-step window of each
    * key's (`tsCol`, `tieCol`)-ordered stream becomes a `a>b>c` path
    * string; exact counts, global top `topK` by (count desc, path asc) —
    * the deterministic rank rule that makes the listing hash-exact. The
    * clickstream path-mining primitive ("what do users do right before
    * churning/buying").
    *
    * Shape: ONE per-key sort window computing len-1 `lead`s (no
    * self-joins — the wave-18 transition shape generalized), one hash
    * aggregate over at most |types|^len path strings, and the top-k
    * plans as TakeOrderedAndProject (driver holds k rows, never the
    * distribution). Type values must not contain the '>' separator —
    * loudly checked, a silent collision would merge distinct paths. */
  def topPaths(events: DataFrame, keyCol: String, tsCol: String,
               typeCol: String, tieCol: String, len: Int, topK: Int): DataFrame = {
    require(len >= 2, s"len must be >= 2: $len")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val base = events.select(col(keyCol), col(tsCol), col(tieCol),
      col(typeCol).as("__s0"))
    val withSteps = (1 until len).foldLeft(base) { case (df, i) =>
      df.withColumn(s"__s$i", lead(col("__s0"), i).over(w))
    }
    val sepFree = (0 until len).map(i => !col(s"__s$i").contains(">")).reduce(_ && _)
    val path = concat_ws(">", (0 until len).map(i => col(s"__s$i")): _*)
    withSteps
      .where((1 until len).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .withColumn("__ok", when(sepFree, true)
        .otherwise(raise_error(lit(s"topPaths: type value contains the '>' separator"))))
      .where(col("__ok"))
      .select(path.as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topK)
  }

  /** Per-key CUSUM drift alarms over an INTEGER series — the classic
    * change-point detector s_i = max(0, s_{i-1} + (x_i - k)), computed
    * WITHOUT a sequential fold via the prefix-min identity
    *   s_i = p_i - least(min_{j<=i} p_j, 0),   p_i = Σ_{j<=i} (x_j - k)
    * (the running max-clamp recurrence equals the prefix sum minus its
    * clamped running minimum), so the whole detector is TWO window frames
    * over ONE key exchange — no UDF fold, no iteration, pure int64,
    * hash-exact against the identical-window SQL replay. Emits one row
    * per key: (n points, alarms where s > h, max s).
    *
    * `k` is the drift allowance (the detector integrates x - k), `h` the
    * alarm threshold, both in x's units. Same hot-key caveat as every
    * per-key window (one pathological key sorts in one task). */
  def cusumAlarms(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, xCol: String, k: Long, h: Long): DataFrame = {
    require(h > 0, s"h must be positive: $h")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = events.select(col(keyCol), col(tsCol), col(tieCol),
        col(xCol).cast("long").as("__x"))
      .withColumn("__p", sum(col("__x") - lit(k)).over(w))
    val s = p.withColumn("__s", col("__p") - least(min(col("__p")).over(w), lit(0L)))
    s.groupBy(keyCol).agg(
      count(lit(1)).as("n"),
      sum(when(col("__s") > h, 1L).otherwise(0L)).as("alarms"),
      max(col("__s")).as("max_s"))
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

  /** CONVERSION-WINDOW funnel: depth reached through `steps` where every
    * later step must land in `(anchor, anchor + windowSec]` of SOME
    * first-step occurrence (the anchor), and steps stay ordered — the
    * product-analytics semantics ("converted within 12 h of a view").
    * Greedy-earliest matching within a fixed window is optimal, and a
    * later anchor can succeed where the first fails, so depth is the max
    * over anchors. Returns (depth, n_keys) over ALL keys.
    *
    * Shape: one equi-join on the key per step, each with range predicates
    * (the interval-join shape) and an immediate (key, anchor) min
    * aggregate — candidate fan is per-anchor events inside the window,
    * never a cross join. The SQL oracle replays this same formulation;
    * SequencesSpec cross-checks it against an independent per-anchor
    * driver-side brute force. */
  def windowedFunnel(events: DataFrame, keyCol: String, tsCol: String,
                     typeCol: String, steps: Seq[String],
                     windowSec: Long): DataFrame = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      s"need >= 2 distinct steps: $steps")
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val ev = events.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(typeCol).as("__t"))
    val allKeys = ev.select(col("__k")).distinct()
    val anchors = ev.where(col("__t") === steps.head)
      .select(col("__k"), col("__ts").as("__t1"))
    val deadline = col("__t1") + expr(s"INTERVAL $windowSec SECOND")

    var cur = anchors.withColumn("__prev", col("__t1"))
    var reached = anchors.select(col("__k")).distinct()
      .withColumn("depth", lit(1))
    for ((st, i) <- steps.drop(1).zipWithIndex) {
      val nxt = ev.where(col("__t") === st)
        .select(col("__k").as("__k2"), col("__ts").as("__ts2"))
      cur = cur.join(nxt, col("__k") === col("__k2") &&
          col("__ts2") > col("__prev") && col("__ts2") <= deadline)
        .groupBy(col("__k"), col("__t1"))
        .agg(min(col("__ts2")).as("__prev"))
      reached = reached.unionByName(
        cur.select(col("__k")).distinct().withColumn("depth", lit(i + 2)))
    }
    val perKey = allKeys.join(
        reached.groupBy("__k").agg(max("depth").as("depth")), Seq("__k"), "left")
      .withColumn("depth", coalesce(col("depth"), lit(0)))
    perKey.groupBy("depth").agg(count(lit(1)).as("n_keys"))
  }

  /** Per-entity exponentially-weighted moving average — the online
    * smoothing/feature op (monitoring baselines, per-user signal state):
    * s_1 = x_1, s_i = alpha * x_i + (1 - alpha) * s_{i-1} over each key's
    * (`tsCol`, `tieCol`)-ordered values. Returns (tieCol, ewma) per event.
    *
    * Exactness: the fold is pure mult/add in a deterministic order
    * (sorted-list aggregate), so for a dyadic alpha the doubles are
    * bit-reproducible and a SQL oracle replaying the same prefix folds
    * hash-matches them exactly — the Geary's-C discipline for float
    * output. One shuffle on the key; per-key state is O(that key's
    * events), the documented hot-key tail. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val sorted = events.groupBy(keyCol)
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(valueCol).cast("double").as("v")))).as("evs"))
    val folded = sorted.withColumn("ewmas",
      aggregate(col("evs"), array().cast("array<double>"),
        (acc, e) => concat(acc, array(
          when(size(acc) === 0, e.getField("v"))
            .otherwise(lit(alpha) * e.getField("v") +
              lit(1.0 - alpha) * element_at(acc, -1))))))
    folded
      .select(explode(arrays_zip(col("evs"), col("ewmas"))).as("z"))
      .select(col("z.evs.tie").as(tieCol), col("z.ewmas").as("ewma"))
  }

  /** Per-entity Holt double-exponential smoothing — [[ewma]]'s sibling
    * for signals with drift: a level AND a trend state folded over each
    * key's (`tsCol`, `tieCol`)-ordered values,
    *
    *   l_1 = x_1, b_1 = 0
    *   l_i = α·x_i + (1−α)·(l_{i−1} + b_{i−1})
    *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}
    *
    * returning each key's FINAL (level, trend) — the per-entity forecast
    * state (next-step prediction = level + trend). Returns (keyCol,
    * n_obs, level, trend).
    *
    * Exactness: the fold is the same deterministic sorted-list aggregate
    * as [[ewma]], the (1−α)/(1−β) complements are spelled as literal
    * constants on both engines, and b_i recomputes l_i's expression
    * verbatim rather than referencing it — so for dyadic α/β every step
    * is the identical IEEE tree and a SQL oracle folding the same
    * transformed list hash-matches bit-for-bit. One shuffle on the key;
    * per-key state is O(that key's events), the documented hot-key
    * tail. Pass dyadic α/β (0.25, 0.125, …) when hash-exactness against
    * a replaying oracle matters. */
  def holt(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0, 1]: $beta")
    val ca = 1.0 - alpha
    val cb = 1.0 - beta
    val sorted = events.where(col(valueCol).isNotNull).groupBy(keyCol)
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(valueCol).cast("double").as("v")))).as("evs"))
    def lNext(acc: org.apache.spark.sql.Column,
              v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lit(alpha) * v + lit(ca) * (element_at(acc, 1) + element_at(acc, 2))
    val folded = sorted.withColumn("lb",
      aggregate(col("evs"), array().cast("array<double>"),
        (acc, e) => when(size(acc) === 0, array(e.getField("v"), lit(0.0)))
          .otherwise(array(
            lNext(acc, e.getField("v")),
            lit(beta) * (lNext(acc, e.getField("v")) - element_at(acc, 1)) +
              lit(cb) * element_at(acc, 2)))))
    folded.select(col(keyCol), size(col("evs")).cast("long").as("n_obs"),
      element_at(col("lb"), 1).as("level"), element_at(col("lb"), 2).as("trend"))
  }

  /** Cohort retention: keys grouped by their FIRST-activity day, counted
    * distinct-active per (cohort_date, day offset). Returns (cohort_date,
    * offset_days, n_keys) — the classic retention triangle, all dates and
    * counts (integer-exact).
    *
    * Shape: the cohort table is one partial-aggregated min per key; the
    * activity table one distinct per (key, day); the join is an equi-join
    * on the key (the cohort side is exactly one row per key — broadcast
    * when it fits, plain shuffle otherwise) and the final rollup a
    * partial+final count-distinct. Nothing is ever per-event after the
    * first two aggregates. */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val cohorts = events.groupBy(keyCol)
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    val activity = events
      .select(col(keyCol), to_date(col(tsCol)).as("active_date")).distinct()
    activity.join(cohorts, keyCol)
      .withColumn("offset_days", datediff(col("active_date"), col("cohort_date")))
      .groupBy("cohort_date", "offset_days")
      .agg(count_distinct(col(keyCol)).as("n_keys"))
  }
}
