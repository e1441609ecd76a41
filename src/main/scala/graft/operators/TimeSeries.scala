package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-entity fixed-step resampling with
  * carry-forward — the feature-grid builder for training pipelines (one
  * row per entity per grid instant, each carrying the latest observation
  * at or before that instant; the batch analogue of an as-of join against
  * a generated clock). */
object TimeSeries {

  private val Reserved = Seq("__us", "__ord", "__payload", "__lo", "__hi",
    "__grid", "__carry", "__prev", "__next", "__v", "grid_us")

  /** One row per `stepMicros` grid instant per entity, from the entity's
    * first observation rounded UP to the grid through its last, carrying
    * the latest observation at-or-before each instant (`carryCols`).
    * Exact-duplicate (entity, timestamp) observations collapse
    * deterministically to the max-`orderCol` row first, so the carried
    * value is well-defined on both the engine and the oracle side.
    *
    * Distributed shape: a per-entity min/max aggregation sizes the grid,
    * grid instants explode from `sequence()` on the executors (never a
    * driver loop), and ONE window pass over (entity, time) merges grid and
    * observation rows — a grid instant costs one shuffled row, and
    * observations are never duplicated (compare the naive grid×obs range
    * join, which copies every observation once per grid instant it could
    * serve). Output: (idCol, grid_us, carryCols*). */
  def resampleCarryForward(points: DataFrame, idCol: String, tsCol: String,
                           orderCol: String, carryCols: Seq[String],
                           stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be positive: $stepMicros")
    require(carryCols.nonEmpty, "resampleCarryForward: nothing to carry")
    val clash = points.columns.filter(Reserved.contains)
    require(clash.isEmpty, s"resampleCarryForward reserves ${Reserved.mkString(", ")}; " +
      s"rename: ${clash.mkString(", ")}")
    // cast: NTZ-typed inputs; the grid is an integer-µs axis, zone-free
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val obs = points
      .select(col(idCol), us.as("__us"), col(orderCol).as("__ord"),
        struct(carryCols.map(col): _*).as("__payload"))
      .groupBy(col(idCol), col("__us"))
      .agg(max_by(col("__payload"), col("__ord")).as("__payload"))
    val payloadType = obs.schema("__payload").dataType
    val bounds = obs.groupBy(col(idCol))
      .agg(min(col("__us")).as("__lo"), max(col("__us")).as("__hi"))
    val grid = bounds.select(col(idCol),
      explode(sequence(
        expr(s"((__lo + ${stepMicros - 1}) div $stepMicros) * $stepMicros"),
        col("__hi"), lit(stepMicros))).as("__us"))
    val merged = grid
      .select(col(idCol), col("__us"), lit(1).as("__grid"),
        lit(null).cast(payloadType).as("__payload"))
      .unionByName(obs.select(col(idCol), col("__us"), lit(0).as("__grid"),
        col("__payload")))
    // observations sort BEFORE a grid instant at the same µs, so an
    // exactly-on-grid observation is carried by its own instant
    val w = Window.partitionBy(idCol).orderBy(col("__us"), col("__grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("__carry", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__grid") === 1)
      .select(Seq(col(idCol), col("__us").as("grid_us")) ++
        carryCols.map(c => col(s"__carry.$c").as(c)): _*)
  }

  /** Linear-interpolation resampling: like [[resampleCarryForward]] but
    * each grid instant takes `v0 + (v1 - v0) * ((t - t0) / (t1 - t0))`
    * between its bracketing observations — the feature-grid builder for
    * continuous signals. An instant landing exactly on an observation (or
    * on the entity's last one) takes that observation's value verbatim.
    * The formula is evaluated in the same IEEE double op order on the
    * engine and the SQL oracle (integer-µs deltas cast to double, one
    * division, one multiply, one add), so results are hash-exact —
    * no tolerance anywhere. Duplicate (entity, timestamp) observations
    * collapse to the max-`orderCol` row first, as in carry-forward.
    *
    * Distributed shape: identical to carry-forward — executor-side
    * sequence() grid, one union, ONE entity-time exchange+sort shared by
    * the forward (last at-or-before) and backward (first strictly-after)
    * frame passes. Output: (idCol, grid_us, valueCol). */
  def resampleLinear(points: DataFrame, idCol: String, tsCol: String,
                     orderCol: String, valueCol: String,
                     stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be positive: $stepMicros")
    val clash = points.columns.filter(Reserved.contains)
    require(clash.isEmpty, s"resampleLinear reserves ${Reserved.mkString(", ")}; " +
      s"rename: ${clash.mkString(", ")}")
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val obs = points
      .select(col(idCol), us.as("__us"), col(orderCol).as("__ord"),
        col(valueCol).cast("double").as("__v"))
      .groupBy(col(idCol), col("__us"))
      .agg(max_by(col("__v"), col("__ord")).as("__v"))
    val bounds = obs.groupBy(col(idCol))
      .agg(min(col("__us")).as("__lo"), max(col("__us")).as("__hi"))
    val grid = bounds.select(col(idCol),
      explode(sequence(
        expr(s"((__lo + ${stepMicros - 1}) div $stepMicros) * $stepMicros"),
        col("__hi"), lit(stepMicros))).as("__us"))
    val merged = grid
      .select(col(idCol), col("__us"), lit(1).as("__grid"),
        lit(null).cast("struct<u:bigint,v:double>").as("__payload"))
      .unionByName(obs.select(col(idCol), col("__us"), lit(0).as("__grid"),
        struct(col("__us").as("u"), col("__v").as("v")).as("__payload")))
    // observations sort BEFORE a grid instant at the same µs: the forward
    // frame sees an exactly-on-grid observation (t0 = t), the backward
    // frame does not (t1 is the first STRICTLY later observation)
    val ord = Window.partitionBy(idCol).orderBy(col("__us"), col("__grid"))
    val wf = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    merged
      .withColumn("__prev", last(col("__payload"), ignoreNulls = true).over(wf))
      .withColumn("__next", first(col("__payload"), ignoreNulls = true).over(wb))
      .where(col("__grid") === 1)
      .select(col(idCol), col("__us").as("grid_us"),
        when(col("__next").isNull || col("__prev.u") === col("__us"), col("__prev.v"))
          .otherwise(col("__prev.v") + (col("__next.v") - col("__prev.v")) *
            ((col("__us") - col("__prev.u")).cast("double") /
              (col("__next.u") - col("__prev.u")).cast("double")))
          .as(valueCol))
  }

  /** Per-entity lag-`lag` sample autocorrelation of a numeric series
    * ordered by (tsCol, ordCol) — the seasonality/persistence probe for
    * per-key signals (is this user's activity self-correlated step to
    * step?). Values quantize to `round(value * scale)` int64 first, so
    * every aggregate (n, Σw, Σw², Σ lag-products, head/tail-k sums) is an
    * order-independent EXACT integer; the final coefficient
    *
    *   acf = [n²·Σp − n·S·(2S − head − tail) + (n−lag)·S²]
    *         / [n·(n·Σw² − S²)]
    *
    * (the Konig-Huygens expansion of Σ(wᵢ−w̄)(wᵢ₊ₗ−w̄) / Σ(wᵢ−w̄)², cleared
    * of the 1/n means) is ONE fixed IEEE double expression over those
    * integers, bit-equal on any engine that replays it verbatim. Entities
    * with n ≤ lag or a constant series yield NULL.
    *
    * Distributed shape: one hash exchange on idCol shared by the sort
    * window (lead + row_number), the whole-partition count, and the final
    * hash aggregate — no second shuffle, no per-key collect. Integer
    * headroom: aggregates stay exact while n·(scale·max|value|)² < 2⁶³
    * (~3.8e9 rows per key at scale=100, |value| ≤ 500); the double-domain
    * final expression never overflows. Output: (idCol, n_obs, acf). */
  def lagAutocorr(df: DataFrame, idCol: String, tsCol: String, ordCol: String,
                  valueCol: String, scale: Long = 100L, lag: Int = 1): DataFrame = {
    require(scale > 0, s"scale must be positive: $scale")
    require(lag >= 1, s"lag must be >= 1: $lag")
    val clash = df.columns.filter(c => c.startsWith("__") || c == "n_obs" || c == "acf")
    require(clash.isEmpty, s"lagAutocorr reserves __-prefixed, n_obs, acf; " +
      s"rename: ${clash.mkString(", ")}")
    val w = Window.partitionBy(idCol).orderBy(col(tsCol).asc, col(ordCol).asc)
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(idCol), col(tsCol), col(ordCol),
        round(col(valueCol).cast("double") * scale).cast("long").as("__w"))
      .withColumn("__wn", lead(col("__w"), lag).over(w))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cn", count(lit(1)).over(Window.partitionBy(idCol)))
    val agg = rows.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__w")).as("sw"),
        sum(col("__w") * col("__w")).as("s2"),
        sum(when(col("__wn").isNull, lit(0L))
          .otherwise(col("__w") * col("__wn"))).as("sp"),
        sum(when(col("__rn") <= lag, col("__w")).otherwise(lit(0L))).as("hk"),
        sum(when(col("__rn") > col("__cn") - lag, col("__w"))
          .otherwise(lit(0L))).as("tk"))
    // the one double-domain expression; acfFinalSql is shared verbatim
    // with the SQL oracle so both engines build the identical IEEE tree
    agg.select(col(idCol), col("n").as("n_obs"),
      expr(acfFinalSql(lag)).as("acf"))
  }

  /** Per-entity ordinary-least-squares trend of a numeric series against
    * time — "is this user's value drifting, and how fast?". Time
    * quantizes to the integer grid x = (µs − origin) div step and values
    * to y = round(value·scale), so n, Σx, Σy, Σx², Σxy are exact
    * order-independent int64 aggregates; slope = (nΣxy − ΣxΣy) /
    * (nΣx² − (Σx)²) and intercept = (Σy − slope·Σx)/n are fixed IEEE
    * expressions over those integers ([[trendSlopeSql]] /
    * [[trendInterceptSql]], shared verbatim with the oracle). Slope is in
    * scaled-value units per step; entities with n < 2 or a constant time
    * axis yield NULL.
    *
    * Distributed shape: ONE map + ONE hash aggregate — no window, no
    * sort, no second shuffle (OLS needs no ordering, unlike
    * [[lagAutocorr]]). Integer headroom: Σx² exact while n·maxX² < 2⁶³
    * (maxX = series span in steps), loudly guarded against negative x
    * (observations before `originMicros` are a caller bug, not data).
    * Output: (idCol, n_obs, slope, intercept). */
  def linearTrend(df: DataFrame, idCol: String, tsCol: String,
                  valueCol: String, originMicros: Long, stepMicros: Long,
                  scale: Long = 100L): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be positive: $stepMicros")
    require(scale > 0, s"scale must be positive: $scale")
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(idCol),
        expr(s"(unix_micros(CAST($tsCol AS TIMESTAMP)) - ${originMicros}L) div ${stepMicros}L")
          .as("__x0"),
        round(col(valueCol).cast("double") * scale).cast("long").as("__y"))
      .withColumn("__x",
        when(col("__x0") >= 0L, col("__x0"))
          .otherwise(raise_error(concat(
            lit("linearTrend: observation before originMicros: x = "),
            col("__x0").cast("string")))))
    rows.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__x") * col("__y")).as("sxy"))
      .select(col(idCol), col("n").as("n_obs"),
        expr(trendSlopeSql).as("slope"),
        expr(trendInterceptSql).as("intercept"))
  }

  /** OLS slope over the exact integer aggregates n/sx/sy/sxx/sxy —
    * shared verbatim with the SQL oracle. */
  val trendSlopeSql: String =
    """CASE WHEN n < 2 OR CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) = 0 THEN NULL
      | ELSE (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      |  / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) END""".stripMargin

  /** OLS intercept (Σy − slope·Σx)/n with the slope text inlined — one
    * IEEE tree, shared verbatim with the SQL oracle. */
  val trendInterceptSql: String =
    s"""CASE WHEN n < 2 OR CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) = 0 THEN NULL
       | ELSE (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
       |  / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
       |  / CAST(n AS DOUBLE) END""".stripMargin

  /** Per-entity Mann–Kendall trend test statistic — the RANK-based
    * monotone-trend detector (is this signal drifting, without assuming
    * linearity or caring about outliers — the robust sibling of
    * [[linearTrend]]). Values quantize to w = round(value·scale) int64;
    * per entity, ordered by (tsCol, ordCol),
    *
    *   S = Σ_{i<j} sign(w_j − w_i)
    *
    * and the tie-corrected variance integer
    *
    *   var18 = 18·Var(S) = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)
    *
    * (t_g = size of each tied-value group). Both outputs are EXACT int64
    * — consumers divide S by sqrt(var18/18) for the normal approximation;
    * the engine emits only integers so the contract is hash-exact.
    * Output: (idCol, n_obs, s_stat, var18); a constant series gives
    * S = 0, var18 = 0.
    *
    * Distributed shape: S is an inversion count, not a window expression —
    * computed per entity in ONE `groupByKey.mapGroups` pass: sort the
    * entity's rows by (ts, ord), coordinate-compress the values, and walk
    * a Fenwick tree in time order (S += seen-smaller − seen-larger), so a
    * series costs O(n log n) time and O(n) task memory, never the O(n²)
    * pair join the oracle replays. Entities are independent — the pass
    * scales horizontally; per-entity size is loudly capped at
    * `maxPerEntity` (default 1M, which also keeps n(n−1)(2n+5) < 2⁶³ —
    * the var18 overflow bound is n ≤ 1.66M). Keys must be integral
    * (cast to long) — the id shape every events table here uses. */
  def mannKendall(df: DataFrame, idCol: String, tsCol: String, ordCol: String,
                  valueCol: String, scale: Long = 100L,
                  maxPerEntity: Int = 1000000): DataFrame = {
    require(scale > 0, s"scale must be positive: $scale")
    require(maxPerEntity <= 1660000,
      s"maxPerEntity $maxPerEntity would overflow the int64 var18 bound (n <= 1.66M)")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(idCol).cast("long"),
        unix_micros(col(tsCol).cast("timestamp")),
        col(ordCol).cast("long"),
        round(col(valueCol).cast("double") * scale).cast("long"))
      .as[(Long, Long, Long, Long)]
    rows.groupByKey(_._1).mapGroups { (id, it) =>
      val buf = it.toArray
      require(buf.length <= maxPerEntity,
        s"mannKendall: entity $id has ${buf.length} rows (> $maxPerEntity) — " +
          "pre-aggregate the series or raise the cap explicitly")
      java.util.Arrays.sort(buf, Ordering.by((r: (Long, Long, Long, Long)) => (r._2, r._3)))
      val n = buf.length.toLong
      // coordinate-compress the values; Fenwick counts of seen ranks
      val distinct = buf.map(_._4).distinct.sorted
      val rank = distinct.zipWithIndex.toMap
      val m = distinct.length
      val fen = new Array[Long](m + 1)
      def add(i0: Int): Unit = { var i = i0 + 1; while (i <= m) { fen(i) += 1; i += i & -i } }
      def cum(i0: Int): Long = { var i = i0 + 1; var s = 0L; while (i > 0) { s += fen(i); i -= i & -i }; s }
      var s = 0L; var seen = 0L
      for (r <- buf) {
        val rk = rank(r._4)
        val below = if (rk == 0) 0L else cum(rk - 1) // seen strictly smaller
        val gt = seen - cum(rk)                      // seen strictly larger
        s += below - gt
        add(rk); seen += 1
      }
      val tie18 = buf.groupBy(_._4).valuesIterator
        .map { g => val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }.sum
      (id, n, s, n * (n - 1) * (2 * n + 5) - tie18)
    }.toDF(idCol, "n_obs", "s_stat", "var18")
  }

  /** The final-coefficient SQL replayed bit-for-bit by the oracle: every
    * operand is one of the exact integer aggregates n/sw/s2/sp/hk/tk. */
  def acfFinalSql(lag: Int): String =
    s"""CASE WHEN n <= $lag OR CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)*CAST(s2 AS DOUBLE) - CAST(sw AS DOUBLE)*CAST(sw AS DOUBLE)) = 0 THEN NULL
       | ELSE (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)*CAST(sp AS DOUBLE)
       |   - CAST(n AS DOUBLE)*CAST(sw AS DOUBLE)*(2*CAST(sw AS DOUBLE) - CAST(hk AS DOUBLE) - CAST(tk AS DOUBLE))
       |   + (CAST(n AS DOUBLE)-$lag)*CAST(sw AS DOUBLE)*CAST(sw AS DOUBLE))
       |  / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)*CAST(s2 AS DOUBLE) - CAST(sw AS DOUBLE)*CAST(sw AS DOUBLE))) END""".stripMargin
}
