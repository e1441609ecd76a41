package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.s2functions._
import graft.operators._
import graft.s2.{S2LatLngRect, S2Region, R1Interval, S1Interval}
import graft.sources.GeoJson

/** Catalog registry — relational skeleton, windows, as-of joins, time-series folds and order statistics. Entries moved verbatim from SparkEntry
  * (round-3 verdict ask #7: per-domain registries behind the same
  * `queries` map; the 247-row correctness gate pins that nothing moved). */
private[graft] object CatalogSeries {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- relational skeleton (joins / aggs / windows over the big tables) ---
    "q1_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("cnt"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_join_agg" -> ((s, dir) => {
      orders(s, dir)
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("order_cnt"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .orderBy("n_name")
    }),

    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, dir)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 2)
        .select("o_custkey", "o_orderkey", "rnk")
    }),

    "q_events_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          min("value").as("min_value"),
          max("value").as("max_value"),
          countDistinct("user_id").as("users"))
        .orderBy("event_type")
    }),

    "q_events_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
      events(s, dir)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 2)
        .select("user_id", "event_id", "rnk")
    }),

    // conversion-window funnel (view -> click -> purchase, every later
    // step within 12 h of SOME view anchor, steps ordered): per-step
    // interval-shaped joins + per-anchor min aggregates, depth = max over
    // anchors; 14/100/36 spread at sf0.01. Integer/timestamp-exact
    "q_funnel_windowed" -> ((s, dir) =>
      Sequences.windowedFunnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSec = 43200L)),

    // per-user EWMA of event values (alpha = 0.25, dyadic): sorted-list
    // fold, bit-reproducible doubles — the oracle replays the identical
    // prefix folds and the double column hash-matches exactly (the
    // Geary's-C float discipline)
    "q_ewma" -> ((s, dir) =>
      Sequences.ewma(events(s, dir), "user_id", "ts", "event_id", "value", alpha = 0.25)),

    // Holt double-exponential smoothing: each user's final (level, trend)
    // forecast state from the ordered fold — dyadic α=0.25/β=0.125 so the
    // complements are exact and the oracle's identical list_reduce tree
    // hash-matches the doubles bit-for-bit
    "q_holt" -> ((s, dir) =>
      Sequences.holt(events(s, dir), "user_id", "ts", "event_id", "value",
        alpha = 0.25, beta = 0.125)),

    // per-user lag-1 autocorrelation of event values on the centi-unit
    // integer grid: exact int64 aggregates (n, Σw, Σw², Σ lag-products,
    // head/tail), ONE key exchange shared by the sort window and the hash
    // aggregate, and a single fixed IEEE final expression the oracle
    // replays verbatim (TimeSeries.acfFinalSql is the shared text)
    "q_acf" -> ((s, dir) =>
      TimeSeries.lagAutocorr(events(s, dir), "user_id", "ts", "event_id", "value")),

    // per-user OLS value-vs-time trend on the (minute, centi-unit)
    // integer grid: ONE map + ONE hash aggregate (no window — OLS needs
    // no ordering), exact int64 sums, slope/intercept each a single
    // fixed IEEE expression shared verbatim with the oracle
    "q_ols" -> ((s, dir) =>
      TimeSeries.linearTrend(events(s, dir), "user_id", "ts", "value",
        originMicros = 1704067200000000L, stepMicros = 60000000L)),

    // per-user Mann–Kendall monotone-trend test: S = Σ sign-of-pair and
    // the tie-corrected 18·variance, BOTH exact int64 — the rank-based
    // robust sibling of q_ols. The engine computes the inversion count in
    // one mapGroups Fenwick pass (O(n log n) per entity, never a pair
    // join); the oracle replays the O(n²) pair definition in SQL
    "q_mann_kendall" -> ((s, dir) =>
      TimeSeries.mannKendall(events(s, dir), "user_id", "ts", "event_id", "value")),

    // cohort retention triangle: users grouped by first-activity day,
    // distinct-active counted per (cohort, day offset) — dates and counts
    // only, integer-exact
    "q_retention" -> ((s, dir) =>
      Sequences.cohortRetention(events(s, dir), "user_id", "ts")),

    // Markov transition matrix of event types per user stream: one lag
    // window + one count aggregate, integer-exact
    "q_transitions" -> ((s, dir) =>
      Sequences.transitionCounts(events(s, dir), "user_id", "ts", "event_type", "event_id")),

    // per-user CUSUM drift alarms over inter-event gaps (micros): the
    // classic change-point recurrence s = max(0, s + (gap - k)) computed
    // via the prefix-min identity — two window frames over ONE key
    // exchange, pure int64, no sequential fold; k = 40e9 us drift
    // allowance, h = 200e9 us alarm threshold
    "q_cusum" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val gaps = events(s, dir)
        .withColumn("__t", unix_micros(col("ts").cast("timestamp")))
        .withColumn("gap", col("__t") - lag(col("__t"), 1).over(w))
        .where(col("gap").isNotNull)
      Sequences.cusumAlarms(gaps, "user_id", "ts", "event_id", "gap",
        k = 40000000000L, h = 200000000000L)
    }),

    // clickstream path mining: the 20 most frequent ordered 3-step
    // event-type paths (adjacent windows per user stream) — one sort
    // window with two leads, one hash agg over <= |types|^3 strings,
    // TakeOrdered top-k under the deterministic (n desc, path) rank
    "q_path_topk" -> ((s, dir) =>
      Sequences.topPaths(events(s, dir), "user_id", "ts", "event_type", "event_id",
        len = 3, topK = 20)),

    // ordered HIGH-INTENT funnel (view -> click -> purchase among value
    // >= 100 events, as a SUBSEQUENCE): greedy sorted-list fold per user,
    // integer-exact, non-degenerate depth spread (27/51/38/34 at sf0.01);
    // the oracle uses the INDEPENDENT iterated min-after formulation —
    // two different algorithms, same provable answer. SequencesSpec pins
    // the greedy==min-after equivalence and the no-per-user-ts-tie
    // precondition that aligns the orderings
    "q_funnel" -> ((s, dir) =>
      Sequences.funnelDepths(events(s, dir).where(col("value") >= 100.0),
        "user_id", "ts", "event_type", "event_id",
        Seq("view", "click", "purchase"))),

    // skew-hardened twins of the three integer-exact sequence queries:
    // the (key, dense daily-bucket) two-pass construction
    // (Sequences.*Bucketed, round-3 verdict ask #9) reuses each plain
    // query's oracle VERBATIM — bit-equality on the real fixture is the
    // claim, on top of SequenceSkewSpec's planted 10^6-event hot key
    "q_transitions_bucketed" -> ((s, dir) =>
      Sequences.transitionCountsBucketed(events(s, dir), "user_id", "ts", "event_type",
        "event_id", t => floor(unix_micros(t.cast("timestamp")) / lit(86400000000L)).cast("long"))),

    "q_path_topk_bucketed" -> ((s, dir) =>
      Sequences.topPathsBucketed(events(s, dir), "user_id", "ts", "event_type", "event_id",
        len = 3, topK = 20,
        t => floor(unix_micros(t.cast("timestamp")) / lit(86400000000L)).cast("long"))),

    "q_funnel_bucketed" -> ((s, dir) =>
      Sequences.funnelDepthsBucketed(events(s, dir).where(col("value") >= 100.0),
        "user_id", "ts", "event_type", "event_id", Seq("view", "click", "purchase"),
        t => floor(unix_micros(t.cast("timestamp")) / lit(86400000000L)).cast("long"))),

    // --- as-of join: each purchase matched to the user's latest click at
    // or before it (ties by event_id, no-match -> -1) ---
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"), col("user_id"))
      AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        rightOrderCol = "click_id", rightCarryCols = Seq("click_id"))
        .select(col("event_id"), coalesce(col("asof.click_id"), lit(-1L)).as("click_id"))
    }),

    // last-touch attribution: each purchase credits the user's most
    // recent touch (click/view/signup) within a 7-day lookback, else the
    // 'direct' bucket; revenue folded in exact integer cents per channel.
    // One as-of union-window + the lookback as a post-filter on the
    // carried touch time — no per-conversion range join, no explosion
    "q_attribution" -> ((s, dir) => {
      val ev = events(s, dir)
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val touches = ev.where(col("event_type").isin("click", "view", "signup"))
        .select(col("event_id").as("touch_id"), col("ts").as("touch_ts"),
          col("user_id"), col("event_type").as("touch_type"))
      AsOfJoin.asOf(conv, touches, Seq("user_id"), "ts", "touch_ts",
          rightOrderCol = "touch_id", rightCarryCols = Seq("touch_type", "touch_ts"))
        .withColumn("channel",
          when(col("asof.touch_ts").isNotNull &&
              col("asof.touch_ts") >= col("ts") - expr("INTERVAL 7 DAYS"),
            col("asof.touch_type")).otherwise(lit("direct")))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_conversions"), sum("cents").as("revenue_cents"))
    }),

    // FORWARD direction: each purchase matched to the user's EARLIEST
    // click at or after it (ties by smallest id, no-match -> -1)
    "q_asof_fwd" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"), col("user_id"))
      AsOfJoin.asOfForward(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        rightOrderCol = "click_id", rightCarryCols = Seq("click_id"))
        .select(col("event_id"), coalesce(col("asof.click_id"), lit(-1L)).as("click_id"))
    }),

    // NEAREST direction (pandas merge_asof 'nearest'): the click
    // minimizing |click_ts - ts| in epoch micros, exact-distance ties
    // preferring the backward match; integer time arithmetic throughout
    "q_asof_nearest" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("tsm", unix_micros(col("ts").cast("timestamp")))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "tsm", "user_id")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("tsm").as("click_tsm"), col("user_id"))
      AsOfJoin.asOfNearest(purchases, clicks, Seq("user_id"), "tsm", "click_tsm",
        rightOrderCol = "click_id", rightCarryCols = Seq("click_id"))
        .select(col("event_id"), coalesce(col("asof.click_id"), lit(-1L)).as("click_id"))
    }),

    // the skew-hardened two-pass variant must produce the IDENTICAL result
    // (same oracle): windows bounded per (user, hour-bucket) + summary carry
    "q_asof_bucketed" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"), col("user_id"))
      AsOfJoin.asOfBucketed(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        rightOrderCol = "click_id", rightCarryCols = Seq("click_id"),
        bucketFor = t => (unix_millis(t.cast("timestamp")) / lit(3600000L)).cast("long"))
        .select(col("event_id"), coalesce(col("asof.click_id"), lit(-1L)).as("click_id"))
    }),

    // fixed-step resample with carry-forward: per-user 6-hour feature grid
    // carrying the latest (event_id, value) at each instant — the as-of
    // join against a generated clock; oracled with DuckDB's native ASOF
    "q_resample" -> ((s, dir) =>
      operators.TimeSeries.resampleCarryForward(
        events(s, dir), "user_id", "ts", "event_id",
        carryCols = Seq("event_id", "value"), stepMicros = 21600000000L)
        .select("user_id", "grid_us", "event_id", "value")),

    // linear-interpolation twin of q_resample: identical grid, bracketing
    // observations, IEEE-identical interpolation formula on both sides
    "q_resample_linear" -> ((s, dir) =>
      operators.TimeSeries.resampleLinear(
        events(s, dir), "user_id", "ts", "event_id",
        valueCol = "value", stepMicros = 21600000000L)
        .select("user_id", "grid_us", "value")),

    // emerging hotspots: per geohash-2 cell, first-half vs second-half
    // January counts and the relative change — integer-exact, one pass
    "q_trend" -> ((s, dir) =>
      Tiling.geohashTrend(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", 2, "ts", "2024-01-01", "2024-01-16", "2024-01-31")),

    // k-anonymous mobility release: per-(zoom-4 tile, day) activity with
    // cells naming fewer than 5 distinct users SUPPRESSED — the standard
    // aggregate-publication privacy gate (75 of 4874 cells survive at
    // sf0.01; 6969 of 7680 at sf0.1 — suppression bites at both scales).
    // Integer/date-exact under the pinned zxy floor margin
    // spatial inequality of activity: exact Gini over the zoom-6 tile
    // counts via the two-pass global range rank (rank-sum identity,
    // integer-exact numerator, ONE division) — the skew-triage summary
    // a 100-TB ingest runs before choosing a partitioning
    "q_gini" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      val tiles = Tiling.zxyAssign(pts, "lat", "lon", 6)
        .groupBy("zx", "zy").agg(count(lit(1)).as("x"))
        .withColumn("t", col("zx") * 64L + col("zy"))
      Profiling.giniIndex(tiles, "x", "t")
    }),

    // per-user visit concentration (HHI over zoom-6 cells): the log-free
    // predictability proxy — exact rational Σc²/(Σc)², two chained hash
    // aggregates, one division
    "q_hhi" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      val cells = Tiling.zxyAssign(pts, "lat", "lon", 6)
        .withColumn("cell", col("zx") * 64L + col("zy"))
      Trajectories.visitConcentration(cells, "user_id", "cell")
    }),

    // EXACT order statistics without a global sort: iterative 1024-bucket
    // range narrowing, one partial+final aggregate per pass (1024 counter
    // rows cross the exchange, never data), <= 3 passes on this column —
    // the exact complement of the mergeable quantile sketch
    "q_exact_quantile" -> ((s, dir) => {
      val cents = lineitem(s, dir)
        .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val n = cents.count()
      val med = Selection.kthSmallest(cents, "cents", (n + 1) / 2)
      val p95 = Selection.kthSmallest(cents, "cents", (n * 95 + 99) / 100)
      import s.implicits._
      Seq((n, med, p95)).toDF("n", "median_cents", "p95_cents")
    }),

    // MAD outlier gate (modified z-score): docs whose length deviates
    // from the exact median by more than 2x the exact median absolute
    // deviation — the robust curation filter a handful of huge docs
    // cannot drag (unlike mean ± k·stddev). Two chained narrowing
    // selections + one integer gate, everything hash-exact
    "q_mad_outliers" -> ((s, dir) => {
      val docs = documents(s, dir).select(col("doc_id"), col("n_chars"))
      val (med, mad) = Selection.medianAndMad(docs, "n_chars")
      docs.withColumn("dev", abs(col("n_chars") - lit(med)))
        .where(col("dev") > lit(2L * mad))
        .select("doc_id", "n_chars", "dev")
    }),

    // WEIGHTED median via the same narrowing (sum(weight) per bucket):
    // the quantity-weighted price median — robust aggregation over
    // weighted rows with no sort and no materialized expansion
    "q_weighted_median" -> ((s, dir) => {
      val wv = lineitem(s, dir).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      val totalW = wv.agg(sum("qty")).head().getLong(0)
      val med = Selection.weightedKth(wv, "cents", "qty", (totalW + 1) / 2)
      import s.implicits._
      Seq((totalW, med)).toDF("total_weight", "wmedian_cents")
    }),

    // SCD2 point-in-time join: per-customer segment history (three
    // deterministic versions tiling [1990, 2002)) joined to orders at
    // order time — an equi-join on the business key with the validity
    // range as a residual predicate, never a theta join; per-key
    // amplification is the version count, a dimension property
    "q_scd2_join" -> ((s, dir) => {
      val base = customer(s, dir).select(col("c_custkey"), col("c_mktsegment"),
        expr("timestamp'1993-01-01' + make_dt_interval(CAST(c_custkey % 365 AS INT))").as("b1"),
        expr("timestamp'1996-01-01' + make_dt_interval(CAST((c_custkey * 3) % 365 AS INT))").as("b2"))
      val dim = base.select(col("c_custkey"), lit(1).as("version"), col("c_mktsegment"),
          expr("timestamp'1990-01-01'").as("vfrom"), col("b1").as("vto"))
        .unionByName(base.select(col("c_custkey"), lit(2).as("version"), col("c_mktsegment"),
          col("b1").as("vfrom"), col("b2").as("vto")))
        .unionByName(base.select(col("c_custkey"), lit(3).as("version"), col("c_mktsegment"),
          col("b2").as("vfrom"), expr("timestamp'2002-01-01'").as("vto")))
      TemporalJoin.scd2Join(
          orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
          "o_custkey", "o_orderdate", dim, "c_custkey", "vfrom", "vto")
        .select(col("o_orderkey"), col("version").as("dim_version"),
          concat(col("c_mktsegment"), lit("#"), col("version").cast("string")).as("dim_attr"))
    }),

    // 2-D skyline (Pareto frontier): cheapest-for-the-quantity line items
    // — minimize price, maximize quantity. Two-phase grid prune: a
    // broadcast bucket-best table discards dominated rows inside the scan,
    // the exact rule runs only over the per-bucket record-setters; never
    // an all-pairs join (the oracle's window formulation IS the exact
    // 2-D rule, so the result is hash-exact, not recall-pinned)
    "q_skyline" -> ((s, dir) => {
      val pts = lineitem(s, dir).select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        col("l_extendedprice").as("price"), col("l_quantity").as("qty"))
      Skyline.skyline2d(pts, "id", "price", "qty", bucketWidth = 1000.0)
    }),

    // interval-overlap join: click activity windows × error windows per
    // user (1-10 h synthetic durations; hour buckets ≈ typical length,
    // so each interval copies ≤ 11×). The first-shared-bucket conjunct
    // emits each pair once — no pair-dedup shuffle; oracle is the plain
    // quadratic overlap join in DuckDB
    "q_interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
      def withEnd(tf: DataFrame) = tf.withColumn("end_ts",
        expr("timestampadd(MINUTE, CAST(60 + event_id % 540 AS INT), ts)"))
      val clicks = withEnd(ev.where(col("event_type") === "click"))
        .select(col("event_id").as("a_id"), col("user_id"),
          col("ts").as("a_s"), col("end_ts").as("a_e"))
      val errors = withEnd(ev.where(col("event_type") === "error"))
        .select(col("event_id").as("b_id"), col("user_id"),
          col("ts").as("b_s"), col("end_ts").as("b_e"))
      IntervalJoin.overlapJoin(clicks, errors, Seq("user_id"),
        "a_s", "a_e", "b_s", "b_e", bucketMillis = 3600000L)
        .select("a_id", "b_id")
    }),

    // mergeable histogram-quantile sketch: p50/p95 of extended price in
    // cents per return flag, $1000 buckets. Fixed-size state partials
    // map-side and shuffles ONE 110-long buffer per (task, flag) — the
    // 100-TB-safe percentile, yet deterministic integer arithmetic the
    // DuckDB oracle reproduces exactly (bucket counts + running sums)
    "q_quantile_sketch" -> ((s, dir) => {
      val hq = udaf(new graft.functions.Sketches.HistQuantile(
        0L, 100000L, 110, Seq(0.5, 0.95)))
      lineitem(s, dir)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
        .groupBy("l_returnflag")
        .agg(hq(col("cents")).as("qa"))
        .select(col("l_returnflag"),
          element_at(col("qa"), 1).as("p50_c"),
          element_at(col("qa"), 2).as("p95_c"))
    })
  )

  private val oraclesBase: Map[String, String] = Map(

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS cnt,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q_join_agg" ->
      """SELECT n_name, count(*) AS order_cnt,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""".stripMargin,

    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rnk AS INTEGER) AS rnk FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) t WHERE rnk <= 2""".stripMargin,

    "q_events_agg" ->
      """SELECT event_type, count(*) AS cnt, min(value) AS min_value, max(value) AS max_value,
        | count(DISTINCT user_id) AS users FROM events GROUP BY 1""".stripMargin,

    "q_events_window" ->
      """SELECT user_id, event_id, CAST(rnk AS INTEGER) AS rnk FROM (
        | SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
        | FROM events) t WHERE rnk <= 2""".stripMargin,

    // the same per-anchor min-after-within-window formulation
    "q_funnel_windowed" ->
      """WITH a AS (SELECT user_id, ts AS t1 FROM events WHERE event_type = 'view'),
        |d2 AS (SELECT a.user_id, a.t1, min(e.ts) AS t2 FROM a JOIN events e
        |  ON e.user_id = a.user_id AND e.event_type = 'click'
        |  AND e.ts > a.t1 AND e.ts <= a.t1 + INTERVAL 43200 SECOND GROUP BY 1, 2),
        |d3 AS (SELECT d2.user_id, d2.t1, min(e.ts) AS t3 FROM d2 JOIN events e
        |  ON e.user_id = d2.user_id AND e.event_type = 'purchase'
        |  AND e.ts > d2.t2 AND e.ts <= d2.t1 + INTERVAL 43200 SECOND GROUP BY 1, 2),
        |depth AS (SELECT u.user_id,
        |  CASE WHEN u.user_id IN (SELECT user_id FROM d3) THEN 3
        |       WHEN u.user_id IN (SELECT user_id FROM d2) THEN 2
        |       WHEN u.user_id IN (SELECT user_id FROM a) THEN 1 ELSE 0 END AS depth
        |  FROM (SELECT DISTINCT user_id FROM events) u)
        |SELECT depth, count(*) AS n_keys FROM depth GROUP BY 1""".stripMargin,

    // per-event prefix folds replayed with the same (0.25*x + 0.75*acc)
    // op order — list_reduce's left fold == the engine's sorted aggregate,
    // so the doubles match bit for bit
    "q_ewma" ->
      """WITH o AS (SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
        |  FROM events),
        |v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals FROM events GROUP BY 1)
        |SELECT o.event_id,
        |  list_reduce(v.vals[1:o.i], (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma
        |FROM o JOIN v USING (user_id)""".stripMargin,

    // the identical fold: values mapped to [v, 0.0] state pairs so
    // list_reduce's first-element accumulator IS the engine's init branch,
    // then the verbatim level/trend IEEE trees (b recomputes l's
    // expression on both sides; 0.75/0.875 are the exact dyadic
    // complements of the engine's literals)
    "q_holt" ->
      """WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        |           FROM events WHERE value IS NOT NULL GROUP BY 1),
        |f AS (SELECT user_id, CAST(len(vals) AS BIGINT) AS n_obs,
        |  list_reduce(list_transform(vals, x -> [x, 0.0]),
        |    (a, x) -> [0.25*x[1] + 0.75*(a[1]+a[2]),
        |               0.125*((0.25*x[1] + 0.75*(a[1]+a[2])) - a[1]) + 0.875*a[2]]) AS lb
        |  FROM v)
        |SELECT user_id, n_obs, lb[1] AS level, lb[2] AS trend FROM f""".stripMargin,

    // identical centi-unit quantization, identical exact integer
    // aggregates, and the engine's own final-coefficient SQL text
    // (TimeSeries.acfFinalSql) — one division, bit-equal doubles
    "q_acf" ->
      s"""WITH s AS (SELECT user_id, CAST(round(value*100) AS BIGINT) AS w, ts, event_id
         |           FROM events WHERE value IS NOT NULL),
         |p AS (SELECT user_id, w,
         |        lead(w) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS wn,
         |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         |        count(*) OVER (PARTITION BY user_id) AS cn FROM s),
         |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(w) AS BIGINT) AS sw, CAST(sum(w*w) AS BIGINT) AS s2,
         |        CAST(sum(CASE WHEN wn IS NULL THEN 0 ELSE w*wn END) AS BIGINT) AS sp,
         |        CAST(sum(CASE WHEN rn <= 1 THEN w ELSE 0 END) AS BIGINT) AS hk,
         |        CAST(sum(CASE WHEN rn > cn - 1 THEN w ELSE 0 END) AS BIGINT) AS tk
         |      FROM p GROUP BY 1)
         |SELECT user_id, n AS n_obs, ${TimeSeries.acfFinalSql(1)} AS acf FROM a""".stripMargin,

    // identical minute/centi-unit quantization, the same five exact
    // integer aggregates, and the engine's own slope/intercept SQL
    "q_ols" ->
      s"""WITH s AS (SELECT user_id,
         |    (epoch_us(ts) - 1704067200000000) // 60000000 AS x,
         |    CAST(round(value*100) AS BIGINT) AS y
         |  FROM events WHERE value IS NOT NULL),
         |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
         |      FROM s GROUP BY 1)
         |SELECT user_id, n AS n_obs, ${TimeSeries.trendSlopeSql} AS slope,
         |  ${TimeSeries.trendInterceptSql} AS intercept FROM a""".stripMargin,

    // the O(n²) pair definition of S replayed literally (fine at sf
    // scale), the tie term from per-value group counts — every output
    // column an exact integer, so the hash either matches or the Fenwick
    // fold is wrong
    "q_mann_kendall" ->
      """WITH s AS (SELECT user_id, CAST(round(value*100) AS BIGINT) AS w, ts, event_id
        |           FROM events WHERE value IS NOT NULL),
        |o AS (SELECT user_id, w,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i FROM s),
        |p AS (SELECT a.user_id,
        |        CAST(sum(CASE WHEN b.w > a.w THEN 1 WHEN b.w < a.w THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |      FROM o a JOIN o b ON b.user_id = a.user_id AND b.i > a.i GROUP BY 1),
        |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1),
        |t AS (SELECT user_id, CAST(sum(c*(c-1)*(2*c+5)) AS BIGINT) AS tie18 FROM (
        |   SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY user_id, w) g GROUP BY 1)
        |SELECT n.user_id, n.n AS n_obs, COALESCE(p.s_stat, 0) AS s_stat,
        |  n.n*(n.n-1)*(2*n.n+5) - t.tie18 AS var18
        |FROM n JOIN t USING (user_id) LEFT JOIN p ON p.user_id = n.user_id""".stripMargin,

    "q_retention" ->
      """WITH cohorts AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY 1),
        |activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events)
        |SELECT cohort_date, CAST(date_diff('day', cohort_date, active_date) AS INTEGER) AS offset_days,
        |  count(DISTINCT user_id) AS n_keys
        |FROM activity JOIN cohorts USING (user_id) GROUP BY 1, 2""".stripMargin,

    "q_transitions" ->
      """SELECT prev_type, next_type, count(*) AS n FROM (
        | SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  event_type AS next_type FROM events) t
        |WHERE prev_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // identical gap series, prefix-sum and clamped-running-min windows,
    // and the same integer constants; HUGEINT window sums cast back
    "q_cusum" ->
      """WITH t AS (SELECT user_id, ts, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS gap FROM events),
        |p AS (SELECT user_id, ts, event_id,
        |  sum(gap - 40000000000) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM t WHERE gap IS NOT NULL),
        |c AS (SELECT user_id, p - least(min(p) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  0) AS s FROM p)
        |SELECT user_id, count(*) AS n,
        |  CAST(sum(CASE WHEN s > 200000000000 THEN 1 ELSE 0 END) AS BIGINT) AS alarms,
        |  CAST(max(s) AS BIGINT) AS max_s FROM c GROUP BY 1""".stripMargin,

    // identical leads, concatenation, and (n DESC, path) rank rule
    "q_path_topk" ->
      """WITH t AS (SELECT event_type AS s0,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
        |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
        |  FROM events),
        |g AS (SELECT s0 || '>' || s1 || '>' || s2 AS path, count(*) AS n FROM t
        |  WHERE s1 IS NOT NULL AND s2 IS NOT NULL GROUP BY 1)
        |SELECT path, n FROM g ORDER BY n DESC, path LIMIT 20""".stripMargin,

    // iterated min-after step times (the greedy-equivalent formulation):
    // t1 = first view, t2 = first click after t1, t3 = first purchase
    // after t2; depth from which steps landed. Strict ts inequalities are
    // safe because no user has two events at the same timestamp
    // (spec-pinned)
    "q_funnel" ->
      """WITH ev AS (SELECT * FROM events WHERE value >= 100.0),
        |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM ev GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(CASE WHEN e.event_type = 'click' AND e.ts > s1.t1
        |    THEN e.ts END) AS t2
        |  FROM ev e JOIN s1 USING (user_id) GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t2
        |    THEN e.ts END) AS t3
        |  FROM ev e JOIN s2 USING (user_id) GROUP BY 1),
        |d AS (SELECT s1.user_id,
        |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth
        |  FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id))
        |SELECT depth, count(*) AS n_keys FROM d GROUP BY 1""".stripMargin,

    "q_asof_fwd" ->
      """SELECT l.event_id, COALESCE((
        |  SELECT r.event_id FROM events r
        |  WHERE r.user_id = l.user_id AND r.event_type = 'click' AND r.ts >= l.ts
        |  ORDER BY r.ts ASC, r.event_id ASC LIMIT 1), -1) AS click_id
        |FROM events l WHERE l.event_type = 'purchase'""".stripMargin,

    // nearest by |epoch-micros distance|, exact ties -> backward (the
    // is_forward ASC key); same-side ties impossible (no equal per-user
    // timestamps, spec-pinned)
    "q_asof_nearest" ->
      """SELECT l.event_id, COALESCE((
        |  SELECT r.event_id FROM events r
        |  WHERE r.user_id = l.user_id AND r.event_type = 'click'
        |  ORDER BY abs(epoch_us(r.ts) - epoch_us(l.ts)) ASC,
        |    (epoch_us(r.ts) > epoch_us(l.ts)) ASC, r.event_id ASC LIMIT 1), -1) AS click_id
        |FROM events l WHERE l.event_type = 'purchase'""".stripMargin,

    "q_asof_join" ->
      """SELECT l.event_id, COALESCE((
        |  SELECT r.event_id FROM events r
        |  WHERE r.user_id = l.user_id AND r.event_type = 'click' AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1), -1) AS click_id
        |FROM events l WHERE l.event_type = 'purchase'""".stripMargin,

    // last touch per conversion as a correlated subquery restricted to the
    // 7-day window (equivalent to the engine's filter-after-carry: the
    // latest touch overall is in-window iff ANY touch is); integer cents
    "q_attribution" ->
      """WITH conv AS (SELECT event_id, user_id, ts,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE event_type IN ('click', 'view', 'signup')),
        |lt AS (SELECT c.cents, (
        |  SELECT t.event_type FROM t
        |  WHERE t.user_id = c.user_id AND t.ts <= c.ts
        |    AND t.ts >= c.ts - INTERVAL 7 DAY
        |  ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
        |  FROM conv c)
        |SELECT coalesce(channel, 'direct') AS channel,
        |  count(*) AS n_conversions,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM lt GROUP BY 1""".stripMargin,

    // identical semantics to q_asof_join, by construction — identical oracle
    "q_asof_bucketed" ->
      """SELECT l.event_id, COALESCE((
        |  SELECT r.event_id FROM events r
        |  WHERE r.user_id = l.user_id AND r.event_type = 'click' AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1), -1) AS click_id
        |FROM events l WHERE l.event_type = 'purchase'""".stripMargin,

    // resample == DuckDB's native ASOF JOIN against the same generated
    // integer-µs grid (ceil-to-grid start, per-user span), after the same
    // max-event_id collapse of exact-duplicate timestamps
    "q_resample" ->
      """WITH o0 AS (SELECT user_id, epoch_us(ts) AS us, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, epoch_us(ts) ORDER BY event_id DESC) AS rn
        |  FROM events),
        |o AS (SELECT user_id, us, event_id, value FROM o0 WHERE rn = 1),
        |b AS (SELECT user_id, min(us) AS lo, max(us) AS hi FROM o GROUP BY user_id),
        |grid AS (SELECT user_id,
        |  unnest(generate_series(((lo + 21599999999) // 21600000000) * 21600000000, hi, 21600000000)) AS grid_us
        |  FROM b)
        |SELECT grid.user_id, grid_us, event_id, value
        |FROM grid ASOF JOIN o ON grid.user_id = o.user_id AND grid_us >= o.us""".stripMargin,

    // two native ASOF joins bracket each grid instant (>= for prev — an
    // exact hit IS its own prev — and strict < for next, mirroring the
    // engine's frame semantics); the interpolation expression is
    // op-for-op the engine's, so doubles are bit-identical
    "q_resample_linear" ->
      """WITH o0 AS (SELECT user_id, epoch_us(ts) AS us, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, epoch_us(ts) ORDER BY event_id DESC) AS rn
        |  FROM events),
        |o AS (SELECT user_id, us, CAST(value AS DOUBLE) AS value FROM o0 WHERE rn = 1),
        |b AS (SELECT user_id, min(us) AS lo, max(us) AS hi FROM o GROUP BY user_id),
        |grid AS (SELECT user_id,
        |  unnest(generate_series(((lo + 21599999999) // 21600000000) * 21600000000, hi, 21600000000)) AS grid_us
        |  FROM b),
        |pv AS (SELECT grid.user_id, grid_us, o.us AS t0, o.value AS v0
        |       FROM grid ASOF JOIN o ON grid.user_id = o.user_id AND grid_us >= o.us),
        |nx AS (SELECT grid.user_id, grid_us, o.us AS t1, o.value AS v1
        |       FROM grid ASOF LEFT JOIN o ON grid.user_id = o.user_id AND grid_us < o.us)
        |SELECT pv.user_id, pv.grid_us,
        |  CASE WHEN nx.t1 IS NULL OR pv.t0 = pv.grid_us THEN pv.v0
        |       ELSE pv.v0 + (nx.v1 - pv.v0) *
        |         (CAST(pv.grid_us - pv.t0 AS DOUBLE) / CAST(nx.t1 - pv.t0 AS DOUBLE))
        |  END AS value
        |FROM pv JOIN nx ON pv.user_id = nx.user_id AND pv.grid_us = nx.grid_us""".stripMargin,

    // the same zoom-6 mercator arithmetic, an ORDER BY (x, tile) rank,
    // and the engine's own final expression (Profiling.GiniFinalSql)
    "q_gini" ->
      s"""WITH pts AS (SELECT ${latSqlFor("event_id")} AS lat, ${lonSqlFor("event_id")} AS lon FROM events),
         |g AS (SELECT
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) AS zx,
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS zy
         | FROM pts),
         |cnt AS (SELECT zx, zy, CAST(count(*) AS BIGINT) AS x FROM g GROUP BY 1, 2),
         |r AS (SELECT x, row_number() OVER (ORDER BY x, zx*64+zy) AS rank FROM cnt),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |        CAST(sum(rank*x) AS BIGINT) AS srx FROM r)
         |SELECT n AS n_groups, sx AS total, ${graft.operators.Profiling.GiniFinalSql} AS gini FROM a""".stripMargin,

    // identical cell quantization, two integer aggregates, one division
    "q_hhi" ->
      s"""WITH pts AS (SELECT user_id, ${latSqlFor("event_id")} AS lat, ${lonSqlFor("event_id")} AS lon FROM events),
         |g AS (SELECT user_id,
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) * 64 +
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS cell
         | FROM pts),
         |c AS (SELECT user_id, cell, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1, 2)
         |SELECT user_id, CAST(sum(c) AS BIGINT) AS n_visits,
         |  CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(c*c) AS DOUBLE) / CAST(sum(c) * sum(c) AS DOUBLE) AS hhi
         |FROM c GROUP BY 1""".stripMargin,

    "q_trend" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      s"""WITH e AS (SELECT $evLat AS lat, $evLon AS lon, ts FROM events
         |           WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
         |idx AS (SELECT ${geohashIdxSql(2)}, ts FROM e),
         |g AS (SELECT ${geohashCharsSql(2)} AS geohash, ts FROM idx),
         |t AS (SELECT geohash,
         |        sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n_before,
         |        sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n_after
         |      FROM g GROUP BY 1)
         |SELECT geohash, CAST(n_before AS BIGINT) AS n_before,
         |  CAST(n_after AS BIGINT) AS n_after,
         |  CASE WHEN n_before = 0 THEN NULL
         |       ELSE CAST(n_after - n_before AS DOUBLE) / CAST(n_before AS DOUBLE)
         |  END AS pct_change
         |FROM t""".stripMargin
    },

    // rank contract replayed literally: 1-based multiset rank, lower
    // median (n+1)//2, p95 = ceil(0.95 n) = (95n+99)//100
    "q_exact_quantile" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rnk, count(*) OVER () AS n FROM v)
        |SELECT max(n) AS n,
        |  max(CASE WHEN rnk = (n + 1) // 2 THEN c END) AS median_cents,
        |  max(CASE WHEN rnk = (n * 95 + 99) // 100 THEN c END) AS p95_cents
        |FROM r""".stripMargin,

    // the same two lower medians (rank (n+1)//2) and integer gate
    "q_mad_outliers" ->
      """WITH v AS (SELECT doc_id, n_chars FROM documents),
        |r AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rnk,
        |  count(*) OVER () AS n FROM v),
        |m AS (SELECT max(CASE WHEN rnk = (n + 1) // 2 THEN n_chars END) AS med FROM r),
        |d AS (SELECT doc_id, n_chars,
        |  abs(n_chars - (SELECT med FROM m)) AS dev FROM v),
        |r2 AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rnk,
        |  count(*) OVER () AS n FROM d),
        |md AS (SELECT max(CASE WHEN rnk = (n + 1) // 2 THEN dev END) AS mad FROM r2)
        |SELECT doc_id, n_chars, dev FROM d
        |WHERE dev > 2 * (SELECT mad FROM md)""".stripMargin,

    // smallest value whose per-value cumulative weight reaches (W+1)//2
    "q_weighted_median" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
        |  CAST(l_quantity AS BIGINT) AS w FROM lineitem WHERE l_quantity > 0),
        |g AS (SELECT c, sum(w) AS w FROM v GROUP BY c),
        |r AS (SELECT c, sum(w) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cumw,
        |  sum(w) OVER () AS tw FROM g)
        |SELECT CAST(max(tw) AS BIGINT) AS total_weight,
        |  min(CASE WHEN cumw >= (tw + 1) // 2 THEN c END) AS wmedian_cents
        |FROM r""".stripMargin,

    // the same three-version dimension built inline (to_days mirrors
    // make_dt_interval day arithmetic exactly — integer days onto a
    // midnight timestamp), same half-open validity predicate
    "q_scd2_join" ->
      """WITH b AS (SELECT c_custkey, c_mktsegment,
        |  TIMESTAMP '1993-01-01' + to_days(CAST(c_custkey % 365 AS INTEGER)) AS b1,
        |  TIMESTAMP '1996-01-01' + to_days(CAST((c_custkey * 3) % 365 AS INTEGER)) AS b2
        |  FROM customer),
        |dim AS (
        |  SELECT c_custkey, 1 AS version, c_mktsegment,
        |    TIMESTAMP '1990-01-01' AS vfrom, b1 AS vto FROM b
        |  UNION ALL SELECT c_custkey, 2, c_mktsegment, b1, b2 FROM b
        |  UNION ALL SELECT c_custkey, 3, c_mktsegment, b2, TIMESTAMP '2002-01-01' FROM b)
        |SELECT o.o_orderkey, d.version AS dim_version,
        |  d.c_mktsegment || '#' || CAST(d.version AS VARCHAR) AS dim_attr
        |FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
        |  AND o.o_orderdate >= d.vfrom AND o.o_orderdate < d.vto""".stripMargin,

    // the exact 2-D skyline rule in window form: a row is Pareto-optimal
    // iff its qty equals its price group's best AND strictly exceeds the
    // best of every strictly-cheaper price (ties on (price, qty) both
    // stay — neither strictly dominates)
    "q_skyline" ->
      """WITH pts AS (SELECT l_orderkey * 10 + l_linenumber AS id,
        |  l_extendedprice AS price, l_quantity AS qty FROM lineitem),
        |pm AS (SELECT price, max(qty) AS vm FROM pts GROUP BY 1),
        |run AS (SELECT price, vm, max(vm) OVER (ORDER BY price
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev FROM pm)
        |SELECT p.id, p.price, p.qty FROM pts p JOIN run r ON p.price = r.price
        |WHERE p.qty = r.vm AND (r.prev IS NULL OR p.qty > r.prev)""".stripMargin,

    "q_interval_join" ->
      """WITH a AS (SELECT event_id AS a_id, user_id, ts AS a_s,
        |             ts + to_minutes(60 + event_id % 540) AS a_e
        |           FROM events WHERE event_type = 'click'),
        |     b AS (SELECT event_id AS b_id, user_id, ts AS b_s,
        |             ts + to_minutes(60 + event_id % 540) AS b_e
        |           FROM events WHERE event_type = 'error')
        |SELECT a_id, b_id FROM a JOIN b USING (user_id)
        |WHERE a_s <= b_e AND b_s <= a_e""".stripMargin,

    // exact recomputation of the histogram-quantile contract: same bucket
    // counts, same running-sum threshold max(1, ceil(q*n)) — q*n is an
    // IEEE double product of identical operands in both engines, so the
    // threshold can't diverge
    "q_quantile_sketch" ->
      """WITH x AS (SELECT l_returnflag,
        |    LEAST(109, GREATEST(0, CAST(floor(CAST(round(l_extendedprice * 100) AS BIGINT) / 100000.0) AS BIGINT))) AS b
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, b, count(*) AS cnt FROM x GROUP BY 1, 2),
        |w AS (SELECT l_returnflag, b,
        |        SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY b) AS cum,
        |        SUM(cnt) OVER (PARTITION BY l_returnflag) AS n FROM c)
        |SELECT l_returnflag,
        |  CAST(MIN(CASE WHEN cum >= GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT)) THEN b * 100000 END) AS BIGINT) AS p50_c,
        |  CAST(MIN(CASE WHEN cum >= GREATEST(1, CAST(ceil(0.95 * n) AS BIGINT)) THEN b * 100000 END) AS BIGINT) AS p95_c
        |FROM w GROUP BY 1""".stripMargin
  )

  /** The bucketed twins replay their plain queries' oracles verbatim. */
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "q_transitions_bucketed" -> oraclesBase("q_transitions"),
    "q_path_topk_bucketed" -> oraclesBase("q_path_topk"),
    "q_funnel_bucketed" -> oraclesBase("q_funnel"))
}
