package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.s2functions._
import graft.operators._
import graft.s2.{S2LatLngRect, S2Region, R1Interval, S1Interval}
import graft.sources.GeoJson

/** Catalog registry — training-data curation: splits, sampling, packing, evaluation gates. Entries moved verbatim from SparkEntry
  * (round-3 verdict ask #7: per-domain registries behind the same
  * `queries` map; the 247-row correctness gate pins that nothing moved). */
private[graft] object CatalogCuration {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    "q_kanon_release" -> ((s, dir) =>
      Tiling.kAnonymousTileDays(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", "user_id", "ts", z = 4, k = 5)),

    // rendezvous (HRW) shard routing: stable key->owner assignment whose
    // minimal-movement property (adding a shard moves only the keys it
    // wins) is spec-pinned; pure row-local arithmetic, zero exchanges
    "q_shard_assign" -> ((s, dir) =>
      Curation.rendezvousAssign(documents(s, dir).select("doc_id"), "doc_id",
        Seq("s0", "s1", "s2", "s3", "s4"))
        .select("doc_id", "shard")),

    // --- curation: reproducible splits + token-budget packing ---
    "q_split" -> ((s, dir) =>
      Curation.hashSplit(documents(s, dir).select("doc_id"), "doc_id", valFrac = 0.2)
        .select("doc_id", "split")),

    // near-dup clusters never straddle train/val (split key = canonical id)
    "q_split_leakfree" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      val clusters = Dedup.duplicateClusters(
        Dedup.nearDupPairs(docs, "doc_id", "text",
          numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
          .select("id_a", "id_b"))
      Curation.leakFreeSplit(docs.select("doc_id"), "doc_id", clusters, valFrac = 0.2)
        .select("doc_id", "split")
    }),

    // spatially-blocked split: the GEOGRAPHIC leakage guard — every point
    // of a geohash-4 block lands on the same side, so a val point's cell
    // neighbors can never sit in train (spatial cross-validation blocking)
    "q_spatial_split" -> ((s, dir) =>
      Curation.spatialBlockSplit(
        points(s, dir).select(col("o_orderkey"), col("lat"), col("lon")),
        "lat", "lon", precision = 4, valFrac = 0.2)
        .select("o_orderkey", "block", "split")),

    // proportional geo-balanced subsample: 1/8 of every occupied geohash-1
    // cell (32 coarse cells, hundreds of members each — coarse enough that
    // the quota arithmetic is actually exercised) — the quota tracks cell
    // size (dense cells keep their density profile), selection is the
    // deterministic two-round id-hash order, and the ceil quota is the
    // exact integer identity (rank-1)*den < n*num
    "q_cell_sample" -> ((s, dir) => {
      val cells = Tiling.geohashEncode(
        points(s, dir).select(col("o_orderkey"), col("lat"), col("lon")),
        "lat", "lon", 1, out = "cell")
      Curation.proportionalGroupSample(cells, Seq("cell"), "o_orderkey", num = 1, den = 8)
        .select("o_orderkey", "cell")
    }),

    "q_pack" -> ((s, dir) => {
      val withTok = documents(s, dir)
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Curation.packByBudget(withTok, "doc_id", "n_tokens", budgetTokens = 200, buckets = 8)
        .select("doc_id", "bucket", "batch_id")
    }),

    // target-mixture sampling (data mixing): per-source rational quotas —
    // half of src0, a quarter of src1, an eighth of src3, all of src5,
    // everything else dropped; exact integer ceil quotas, hash order
    "q_mixture_sample" -> ((s, dir) =>
      Curation.mixtureSample(documents(s, dir), "source", "doc_id",
          Map("src0" -> (1, 2), "src1" -> (1, 4), "src3" -> (1, 8), "src5" -> (1, 1)))
        .select("doc_id", "source")),

    // deterministic quality-weighted importance sampling: keep iff
    // idHash(id) < P * w div w_max — pure int64, reproducible, no RNG
    "q_importance_sample" -> ((s, dir) => {
      val docs = documents(s, dir)
      val wMax = docs.agg(max("n_chars")).head().getLong(0)
      Curation.importanceSample(docs, "doc_id", "n_chars", wMax)
        .select("doc_id", "n_chars")
    }),

    // deterministic per-group sample: 7 docs per language, chosen by the
    // portable two-round id hash — reproducible regardless of partitioning
    "q_group_sample" -> ((s, dir) =>
      Curation.groupSample(documents(s, dir).select("doc_id", "lang"),
        Seq("lang"), "doc_id", k = 7)
        .select("doc_id", "lang")),

    // per-domain caps over CANONICALIZED urls (the RefinedWeb quota step):
    // messy synthetic urls (mixed-case host, www., :443, tracking params,
    // fragment, shuffled param order) canonicalize scan-side via builtins
    // only, then each domain keeps its 25 hash-order docs — the oracle
    // builds the CLEAN form directly from the id arithmetic, so it checks
    // the whole canonicalize->quota pipeline end to end
    "q_domain_caps" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id").withColumn("url", expr(
        "concat('HTTPS://WWW.D', CAST((doc_id * 2654435761) % 97 AS STRING)," +
          " '.Example.COM:443/p/', CAST(doc_id AS STRING)," +
          " '?utm_source=x&b=', CAST(doc_id % 7 AS STRING), '&a=1#frag')"))
      val canon = docs
        .withColumn("canon_url", Urls.canonicalize(col("url")))
        .withColumn("domain", Urls.domain(col("url")))
      Curation.groupSample(canon.select("doc_id", "domain", "canon_url"),
          Seq("domain"), "doc_id", k = 25)
        .select("doc_id", "domain", "canon_url")
    }),

    // quantile normalization (empirical-CDF transform) of the doc-length
    // feature: two-pass range-partitioned global rank (no single-task
    // window, no driver job; n rides a broadcast 1-row aggregate), one
    // IEEE division on exact integer operands -> bit-reproducible DOUBLE
    "q_quantile_norm" -> ((s, dir) =>
      Curation.quantileNormalize(
        documents(s, dir).select("doc_id", "n_chars"), "n_chars", "doc_id")
        .select("doc_id", "n_chars", "q")),

    // one-scan data-quality gate: five expectation rules over documents in
    // a single global aggregate (no per-rule scans, nothing per-row on the
    // driver); violation counts are integer-exact
    "q_validate" -> ((s, dir) =>
      Validation.validate(documents(s, dir), Seq(
        "doc_id_null" -> col("doc_id").isNull,
        "text_null" -> col("text").isNull,
        "nchars_mismatch" -> (col("text").isNotNull &&
          (col("n_chars").isNull || col("n_chars") =!= length(col("text")))),
        "lang_unknown" -> (col("lang").isNull ||
          !col("lang").isin("en", "zh", "es", "de", "fr")),
        "nchars_range" -> (col("n_chars").isNull ||
          col("n_chars") < 1L || col("n_chars") > 100000L)))),

    // distribution-drift gate between the two halves of January: per
    // event-type bucket, exact integer counts and the total-variation
    // contribution |n_a·N_B − n_b·N_A| — the batch-shape monitor; TV over
    // PSI/KL on purpose (one exact integer per bucket, no log, no
    // empty-bucket smoothing fudge)
    "q_drift" -> ((s, dir) =>
      Validation.tvDrift(events(s, dir), col("event_type"),
        col("ts").cast("timestamp") >= lit("2024-01-16 00:00:00").cast("timestamp"))),

    // two-sample Kolmogorov-Smirnov between the two January halves'
    // centi-quantized value distributions: D·nA·nB = max |cumA·nB −
    // cumB·nA| over the value grid — three exact int64s + one shared
    // division; per-value counts + two value-cardinality prefix sums,
    // nothing row-sized ever sorts
    "q_ks_test" -> ((s, dir) =>
      Evaluation.ksTest(
        events(s, dir).where(col("value").isNotNull),
        round(col("value") * 100).cast("long"),
        col("ts").cast("timestamp") >= lit("2024-01-16 00:00:00").cast("timestamp"))),

    // exact tie-aware ROC AUC of the centi-quantized value score against
    // the purchase label — Mann–Whitney with half-credit ties from
    // per-score (t, p) counts + a score-cardinality global prefix sum:
    // the data-sized work is ONE hash aggregate, nothing row-sized ever
    // sorts; one shared final IEEE expression
    "q_auc" -> ((s, dir) =>
      Evaluation.aucStats(
        events(s, dir).where(col("value").isNotNull),
        round(col("value") * 100).cast("long"),
        col("event_type") === "purchase")),

    // per-segment AUC: the same exact Mann-Whitney statistic sliced by
    // UTC weekday — the dashboard view that catches a failing segment an
    // overall AUC hides; same compaction, grouped prefix sum
    "q_auc_by_day" -> ((s, dir) =>
      Evaluation.aucStatsBy(
        events(s, dir).where(col("value").isNotNull)
          .withColumn("wd", dayofweek(col("ts")).cast("long")),
        "wd", round(col("value") * 100).cast("long"),
        col("event_type") === "purchase")),

    // per-row percentile of value within its event type — the
    // per-category rank feature; exact (rank, n_grp) integers from the
    // grouped two-pass range rank (never a per-group single-task window),
    // one shared final division
    "q_group_percentile" -> ((s, dir) =>
      Evaluation.groupPercentile(
        events(s, dir).where(col("value").isNotNull),
        "event_type", round(col("value") * 100).cast("long"), col("event_id"))),

    // one-way ANOVA: does value differ by event type? 15 exact integer
    // group moments from ONE conditional aggregate (the pivot IS the
    // aggregate — single row at any input size), F as one fixed-order
    // IEEE tree shared with the oracle
    "q_anova" -> ((s, dir) =>
      Evaluation.anovaF(
        events(s, dir).where(col("value").isNotNull),
        round(col("value") * 100).cast("long"), col("event_type"),
        groups = Seq("click", "error", "purchase", "signup", "view"))),

    // the reliability diagram: equal-frequency score deciles with exact
    // (n_rows, n_pos) and a one-division rate — row-rank based (bins cut
    // through tied score groups by the (score, tie) order)
    "q_calibration" -> ((s, dir) =>
      Evaluation.calibrationBins(
        events(s, dir).where(col("value").isNotNull),
        round(col("value") * 100).cast("long"),
        col("event_type") === "purchase", col("event_id"), bins = 10))
  )

  val oracles: Map[String, String] = Map(


    // the zoom-6 replay over the event-derived points, plus the exact
    // distinct-count suppression rule
    "q_kanon_release" ->
      s"""WITH pts AS (SELECT user_id, CAST(ts AS DATE) AS day,
         |  ${latSqlFor("event_id")} AS lat, ${lonSqlFor("event_id")} AS lon FROM events),
         |g AS (SELECT user_id, day,
         |  least(15, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 16.0) AS BIGINT))) AS zx,
         |  least(15, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * 16.0) AS BIGINT))) AS zy
         | FROM pts)
         |SELECT zx, zy, day, count(DISTINCT user_id) AS n_entities, count(*) AS n_events
         |FROM g GROUP BY 1, 2, 3 HAVING count(DISTINCT user_id) >= 5""".stripMargin,

    // the identical argmax over the identical portable hash of
    // 'shard|key'; the zero-padded printf makes the string max equal the
    // engine's (hash, shard) struct max (the q_langid_pred trick)
    "q_shard_assign" ->
      s"""WITH sh(shard) AS (VALUES ('s0'),('s1'),('s2'),('s3'),('s4')),
         |vals AS (SELECT doc_id, shard, shard || '|' || CAST(doc_id AS VARCHAR) AS v
         |  FROM documents CROSS JOIN sh),
         |hashed AS (SELECT doc_id, shard, $SketchValueHashSql AS h FROM vals),
         |fin AS (SELECT doc_id, shard, ${Sketches.finalizeSqlOf("h")} AS h FROM hashed)
         |SELECT doc_id, split_part(max(printf('%010d|%s', h, shard)), '|', 2) AS shard
         |FROM fin GROUP BY doc_id""".stripMargin,

    // curation oracles: the id-hash split arithmetic is integer-exact and
    // mirrored literally (P = 2^31-1, A = Curation.HashA, threshold from
    // Curation.splitThreshold)
    "q_split" -> {
      val (p, a, t) = (Dedup.HashP, Curation.HashA, Curation.splitThreshold(0.2))
      s"""SELECT doc_id,
         | CASE WHEN ((doc_id % $p) * $a) % $p < $t THEN 'val' ELSE 'train' END AS split
         |FROM documents""".stripMargin
    },

    "q_split_leakfree" -> {
      val (p, a, t) = (Dedup.HashP, Curation.HashA, Curation.splitThreshold(0.2))
      s"""WITH RECURSIVE $TriCte,
         |${ccCte(0.9)}
         |SELECT d.doc_id,
         | CASE WHEN ((COALESCE(cc.cluster_id, d.doc_id) % $p) * $a) % $p < $t THEN 'val' ELSE 'train' END AS split
         |FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id""".stripMargin
    },

    // geohash-4 replayed bit for bit, then the block string's code-point
    // fold and the affine side test — all integer, zero tolerance
    "q_spatial_split" -> {
      val (p, a, t) = (Dedup.HashP, Curation.HashA, Curation.splitThreshold(0.2))
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |idx AS (SELECT o_orderkey, ${geohashIdxSql(4)} FROM pts),
         |g AS (SELECT o_orderkey, ${geohashCharsSql(4)} AS block FROM idx),
         |h AS (SELECT o_orderkey, block, ${portableHashSql("block", 4)} AS bh FROM g)
         |SELECT o_orderkey, block,
         | CASE WHEN (bh * $a) % $p < $t THEN 'val' ELSE 'train' END AS split
         |FROM h""".stripMargin
    },

    // geohash-1 cells + the two-round hash order + the exact integer ceil
    // identity (rank-1)*8 < n*1
    "q_cell_sample" -> {
      val (p, a, b) = (Dedup.HashP, Curation.HashA, Curation.HashB)
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |idx AS (SELECT o_orderkey, ${geohashIdxSql(1)} FROM pts),
         |g AS (SELECT o_orderkey, ${geohashCharsSql(1)} AS cell FROM idx),
         |h AS (SELECT o_orderkey, cell,
         |  ((((o_orderkey % $p) * $a) % $p) * $b) % $p AS hh FROM g),
         |r AS (SELECT o_orderkey, cell,
         |  row_number() OVER (PARTITION BY cell ORDER BY hh, o_orderkey) AS rk,
         |  count(*) OVER (PARTITION BY cell) AS n FROM h)
         |SELECT o_orderkey, cell FROM r WHERE (rk - 1) * 8 < n * 1""".stripMargin
    },

    "q_pack" -> {
      val (p, a) = (Dedup.HashP, Curation.HashA)
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS INTEGER) AS n_tokens
         |  FROM documents),
         |b AS (SELECT doc_id, n_tokens,
         |  CAST(((doc_id % $p) * $a) % $p % 8 AS INTEGER) AS bucket FROM t)
         |SELECT doc_id, bucket,
         | CAST((CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens) // 200 AS BIGINT) AS batch_id
         |FROM b""".stripMargin
    },

    // the same two-round hash order and exact integer ceil quotas per
    // source branch
    "q_mixture_sample" -> {
      val (p, a, b) = (Dedup.HashP, Curation.HashA, Curation.HashB)
      s"""WITH h AS (SELECT doc_id, source,
         |  ((((doc_id % $p) * $a) % $p) * $b) % $p AS hh FROM documents
         |  WHERE source IN ('src0', 'src1', 'src3', 'src5')),
         |r AS (SELECT doc_id, source,
         |  row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rk,
         |  count(*) OVER (PARTITION BY source) AS n FROM h)
         |SELECT doc_id, source FROM r WHERE
         |  (source = 'src0' AND (rk - 1) * 2 < n * 1) OR
         |  (source = 'src1' AND (rk - 1) * 4 < n * 1) OR
         |  (source = 'src3' AND (rk - 1) * 8 < n * 1) OR
         |  (source = 'src5' AND (rk - 1) * 1 < n * 1)""".stripMargin
    },

    // the same affine hash and integer threshold, literally
    "q_importance_sample" -> {
      val (p, a) = (Dedup.HashP, Curation.HashA)
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE ((doc_id % $p) * $a) % $p
         |  < ($p * n_chars) // (SELECT max(n_chars) FROM documents)""".stripMargin
    },

    // the two-round affine hash recomputed literally; ties broken by id
    "q_group_sample" -> {
      val (p, a, b) = (Dedup.HashP, Curation.HashA, Curation.HashB)
      s"""WITH h AS (SELECT doc_id, lang,
         |  ((((doc_id % $p) * $a) % $p) * $b) % $p AS hh FROM documents)
         |SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS r FROM h) t
         |WHERE r <= 7""".stripMargin
    },

    // the CLEAN canonical form built directly from the id arithmetic
    // (lowercase, no www/port/fragment, tracking params gone, survivors
    // sorted: 'a=1' before 'b=K'), plus the q_group_sample hash-order cap
    "q_domain_caps" -> {
      val (p, a, b) = (Dedup.HashP, Curation.HashA, Curation.HashB)
      s"""WITH c AS (SELECT doc_id,
         |  'd' || CAST((doc_id * 2654435761) % 97 AS VARCHAR) || '.example.com' AS domain,
         |  'https://d' || CAST((doc_id * 2654435761) % 97 AS VARCHAR) || '.example.com/p/'
         |    || CAST(doc_id AS VARCHAR) || '?a=1&b=' || CAST(doc_id % 7 AS VARCHAR) AS canon_url
         |  FROM documents),
         |h AS (SELECT doc_id, domain, canon_url,
         |  ((((doc_id % $p) * $a) % $p) * $b) % $p AS hh FROM c)
         |SELECT doc_id, domain, canon_url FROM (
         |  SELECT doc_id, domain, canon_url,
         |    row_number() OVER (PARTITION BY domain ORDER BY hh, doc_id) AS r FROM h) t
         |WHERE r <= 25""".stripMargin
    },

    // the identical rank arithmetic in window form; the one division has
    // identical IEEE operands both sides, zero tolerance
    "q_quantile_norm" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |  row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
        |  count(*) OVER () AS n FROM documents)
        |SELECT doc_id, n_chars,
        |  CASE WHEN n = 1 THEN 0.0
        |       ELSE CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS q
        |FROM r""".stripMargin,

    // each rule's violation predicate recomputed as a CASE sum; UNION ALL
    // branch per rule (text is ASCII here so length() agrees; the engine
    // rule is null-safe the same way)
    "q_validate" -> {
      val rules = Seq(
        "doc_id_null" -> "doc_id IS NULL",
        "text_null" -> "text IS NULL",
        "nchars_mismatch" ->
          "(text IS NOT NULL AND (n_chars IS NULL OR n_chars != length(text)))",
        "lang_unknown" ->
          "(lang IS NULL OR lang NOT IN ('en', 'zh', 'es', 'de', 'fr'))",
        "nchars_range" -> "(n_chars IS NULL OR n_chars < 1 OR n_chars > 100000)")
      rules.map { case (n, pred) =>
        s"""SELECT '$n' AS rule,
           | CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           | count(*) AS n_rows FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    // the same total order (score, event_id), the same per-score min+max
    // rank recovery, the engine's own final expression — three exact
    // integers and one division
    "q_auc" ->
      s"""WITH s AS (SELECT CAST(round(value*100) AS BIGINT) AS sc,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y, event_id
         |  FROM events WHERE value IS NOT NULL),
         |r AS (SELECT sc, y, row_number() OVER (ORDER BY sc, event_id) AS rank FROM s),
         |v AS (SELECT sc, CAST(min(rank) AS BIGINT) AS mn, CAST(max(rank) AS BIGINT) AS mx,
         |        CAST(sum(y) AS BIGINT) AS p, CAST(count(*) AS BIGINT) AS t
         |      FROM r GROUP BY 1),
         |a AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos, CAST(sum(t - p) AS BIGINT) AS n_neg,
         |        CAST(sum(p*(mn+mx)) AS BIGINT) AS r2_pos FROM v)
         |SELECT n_pos, n_neg, r2_pos, ${Evaluation.AucFinalSql} AS auc FROM a""".stripMargin,

    // per-(weekday, score) counts, the within-group prefix window, and
    // the engine's own final expression per segment
    "q_auc_by_day" ->
      s"""WITH s AS (SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS wd,
         |    CAST(round(value*100) AS BIGINT) AS sc,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |c AS (SELECT wd, sc, CAST(count(*) AS BIGINT) AS t, CAST(sum(y) AS BIGINT) AS p
         |      FROM s GROUP BY 1, 2),
         |w AS (SELECT wd, sc, t, p,
         |        CAST(sum(t) OVER (PARTITION BY wd ORDER BY sc
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS BIGINT) AS below
         |      FROM c),
         |a AS (SELECT wd, CAST(sum(p) AS BIGINT) AS n_pos,
         |        CAST(sum(t - p) AS BIGINT) AS n_neg,
         |        CAST(sum(p*(2*below + t + 1)) AS BIGINT) AS r2_pos
         |      FROM w GROUP BY 1)
         |SELECT wd, n_pos, n_neg, r2_pos, ${Evaluation.AucFinalSql} AS auc FROM a""".stripMargin,

    // the same total order per group (a window is fine at oracle scale —
    // the engine's two-pass shape changes the plan, never the rank) and
    // the engine's own percentile text
    "q_group_percentile" ->
      s"""WITH s AS (SELECT event_type, event_id,
         |    CAST(round(value*100) AS BIGINT) AS value_q
         |  FROM events WHERE value IS NOT NULL),
         |r AS (SELECT event_type, event_id AS row_id, value_q,
         |        CAST(row_number() OVER (PARTITION BY event_type
         |          ORDER BY value_q, event_id) AS BIGINT) AS rank,
         |        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_grp
         |      FROM s)
         |SELECT event_type, row_id, value_q, rank, n_grp,
         |  ${Evaluation.PercentileFinalSql} AS pct FROM r""".stripMargin,

    // the identical conditional pivot and the engine's own fixed-order F
    "q_anova" -> {
      val groups = Seq("click", "error", "purchase", "signup", "view")
      val aggs = groups.zipWithIndex.flatMap { case (g, i) => Seq(
        s"CAST(sum(CASE WHEN event_type = '$g' THEN 1 ELSE 0 END) AS BIGINT) AS n_$i",
        s"CAST(sum(CASE WHEN event_type = '$g' THEN y ELSE 0 END) AS BIGINT) AS s_$i",
        s"CAST(sum(CASE WHEN event_type = '$g' THEN y*y ELSE 0 END) AS BIGINT) AS q_$i")
      }.mkString(",\n")
      s"""WITH s AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS y
         |  FROM events WHERE value IS NOT NULL
         |    AND event_type IN (${groups.map(g => s"'$g'").mkString(", ")})),
         |a AS (SELECT
         |$aggs
         |FROM s)
         |SELECT a.*, ${Evaluation.anovaFinalSql(groups.size)} AS f_stat FROM a""".stripMargin
    },

    // the same rank, bin index arithmetic, and rate expression
    "q_calibration" ->
      s"""WITH s AS (SELECT CAST(round(value*100) AS BIGINT) AS sc,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y, event_id
         |  FROM events WHERE value IS NOT NULL),
         |r AS (SELECT y, row_number() OVER (ORDER BY sc, event_id) AS rank FROM s),
         |t AS (SELECT count(*) AS n FROM s),
         |b AS (SELECT ((rank - 1) * 10) // n AS bin, CAST(count(*) AS BIGINT) AS n_rows,
         |        CAST(sum(y) AS BIGINT) AS n_pos
         |      FROM r, t GROUP BY 1, n)
         |SELECT bin, n_rows, n_pos, ${Evaluation.CalibrationRateSql} AS rate FROM b""".stripMargin,

    // the same per-value counts, inclusive-prefix window sums, and max
    // cross-multiplied CDF gap — exact integers and the engine's final
    "q_ks_test" ->
      s"""WITH s AS (SELECT CAST(round(value*100) AS BIGINT) AS v,
         |    CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS y
         |  FROM events WHERE value IS NOT NULL),
         |c AS (SELECT v, CAST(sum(1 - y) AS BIGINT) AS ta, CAST(sum(y) AS BIGINT) AS tb
         |      FROM s GROUP BY 1),
         |p AS (SELECT v, ta, tb,
         |        CAST(sum(ta) OVER w AS BIGINT) AS cuma,
         |        CAST(sum(tb) OVER w AS BIGINT) AS cumb
         |      FROM c WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT CAST(sum(ta) AS BIGINT) AS n_a, CAST(sum(tb) AS BIGINT) AS n_b FROM c),
         |a AS (SELECT t.n_a, t.n_b,
         |        max(abs(p.cuma*t.n_b - p.cumb*t.n_a)) AS d_num
         |      FROM p, t GROUP BY 1, 2)
         |SELECT n_a, n_b, d_num, ${Evaluation.KsFinalSql} AS ks FROM a""".stripMargin,

    // the same one-aggregate-plus-totals arithmetic in SQL; every output
    // an exact integer
    "q_drift" ->
      """WITH c AS (SELECT event_type AS bucket,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb FROM c)
        |SELECT c.bucket, c.n_a, c.n_b, abs(c.n_a*t.tb - c.n_b*t.ta) AS contrib FROM c, t""".stripMargin
  )
}
