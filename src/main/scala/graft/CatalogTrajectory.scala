package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.s2functions._
import graft.operators._
import graft.s2.{S2LatLngRect, S2Region, R1Interval, S1Interval}
import graft.sources.GeoJson

/** Catalog registry — per-entity movement analytics: tracks, stays, trips, anchors, spatio-temporal joins. Entries moved verbatim from SparkEntry
  * (round-3 verdict ask #7: per-domain registries behind the same
  * `queries` map; the 247-row correctness gate pins that nothing moved). */
private[graft] object CatalogTrajectory {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // geofence enter/exit transitions: membership vector per track point
    // (exact kernel refinement against broadcast regions, no join), one
    // window pass comparing to the predecessor; first in-region sighting
    // is an 'enter' (prior state unknown == outside)
    "q_geofence" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Geofence.transitions(pts, "user_id", "ts", "event_id", "lat", "lon", rectRegions)
        .select("user_id", "event_id", "region_id", "transition")
    }),

    // origin-destination flow matrix: consecutive-observation region
    // transitions (incl. to/from the implicit 'none' region), counted —
    // label per row against broadcast regions, one lag window, tiny agg
    // per-user radius of gyration (the mobility-science spread metric)
    // over the int64 centi-degree grid: exact integer numerator
    // n*sum(x^2+y^2) - sum(x)^2 - sum(y)^2 (Konig-Huygens), one hash agg;
    // the double rg is two correctly-rounded IEEE ops on the same
    // integers, bit-equal cross-engine
    "q_rog" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("x", expr("(event_id * 9973 + 12345) % 18000"))
        .withColumn("y", expr("(event_id * 31337 + 54321) % 36000"))
      Trajectories.radiusOfGyration(pts, "user_id", "x", "y")
    }),

    "q_od_flows" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.odFlows(pts, "user_id", "ts", "event_id", "lat", "lon", rectRegions)
        .select("from_region", "to_region", "n_trips")
    }),

    // per-entity minimal wrap-aware bounding rect: lat min/max + the
    // largest-circular-gap lon interval (a ±180°-straddling track gets a
    // narrow wrapping interval, not the naive [-180, 180])
    "q_track_bounds" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.trackBounds(pts, "user_id", "lat", "lon")
        .select("user_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
    }),

    // per-region EXACT distinct visitors via the salted two-level
    // aggregation (ids land in exactly one salt bucket, so the sum of
    // per-bucket distincts is exact): the skew-safe form of
    // COUNT(DISTINCT) a hot region needs — no single reducer ever sees
    // all of a region's visitor ids
    "q_region_visitors" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
        .withColumn("region_id",
          Trajectories.regionLabel("lat", "lon", rectRegions))
      Skew.saltedDistinctCount(pts, "region_id", "user_id")
        .select("region_id", "distinct_n")
    }),

    // visit episodes (gaps-and-islands): maximal same-region runs per
    // entity with first event id, point count, and exact integer-µs dwell
    "q_dwell" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.visitEpisodes(pts, "user_id", "ts", "event_id", "lat", "lon", rectRegions)
        .select("user_id", "region_id", "enter_order", "n_points", "dwell_micros")
    }),

    // --- trajectories (the reference domain's flight-track workload) ---
    // per-entity track stats: per-segment lengths rounded to integer meters
    // (integer meters per segment -> order-independent sums; the
    // OracleMarginSpec-style rounding-boundary margin is asserted in
    // TrajectorySpec so engine and SQL round identically)
    "q_traj_stats" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.trajStats(pts, "user_id", "ts", "event_id", "lat", "lon")
        .select("user_id", "n_points", "track_m", "max_seg_m")
    }),

    // GPS-cleaning teleport flags: integer-exact implied-speed test per
    // segment (340 m/s splits the synthetic fixture's speed distribution
    // near its median, so both flag classes are populated)
    "q_speed_flags" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.speedFlags(pts, "user_id", "ts", "event_id", "lat", "lon",
          maxSpeedMps = 340L)
        .select("user_id", "event_id", "seg_m", "dt_micros", "is_jump")
    }),

    // per-segment compass bearing + signed turn along each user's track:
    // bearing is the great-circle initial heading rounded to WHOLE degrees
    // (the only fp boundary — TrajectorySpec pins the fixture's ~1e-5 deg
    // margin vs ~1e-12 engine/oracle trig divergence); turn is pure
    // integer arithmetic over the rounded bearings, exact by construction
    "q_headings" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.headings(pts, "user_id", "ts", "event_id", "lat", "lon")
        .select("user_id", "event_id", "bearing_deg", "turn_deg")
    }),

    // trajectory-similarity self-join: user pairs within 3400 km symmetric
    // discrete Hausdorff distance (the fixture's tracks are global scatter,
    // so pair distances sit at continental scale; 3400 km splits the
    // distribution). The user subset bounds the BRUTE-FORCE ORACLE's
    // quadratic cost — the operator itself takes the unrestricted table.
    "q_hausdorff_join" -> ((s, dir) => {
      val pts = events(s, dir)
        .where(col("user_id") % 5 === 0)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.hausdorffJoin(pts, "user_id", "lat", "lon",
          maxHausdorffM = 3400000L)
        .select("id_a", "id_b", "haus_m")
    }),

    // away rate: fraction of each user's fixes > 8000 km from their
    // anchor — the roaming metric; exact integer counts, one shared
    // division, anchor table joined back entity-keyed
    "q_away_rate" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.awayRate(pts, "user_id", "lat", "lon", radiusM = 8000000.0)
    }),

    // home drift: per-user anchors for the two January halves + the
    // great-circle distance between them — the relocation/takeover
    // screen; entity-cardinality rows after the ranks
    "q_home_drift" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.anchorDrift(pts, "user_id", "lat", "lon",
        col("ts").cast("timestamp") >= lit("2024-01-16 00:00:00").cast("timestamp"))
    }),

    // per-user anchor point: the coordinate-wise lower-median fix on the
    // micro-degree grid — the robust home-location estimate; per axis one
    // (entity, value) count aggregate + a per-entity sorted-histogram
    // median fold (state = distinct values, not fixes), every output exact
    "q_anchor_points" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.anchorPoints(pts, "user_id", "lat", "lon")
    }),

    // DTW track-similarity join: the alignment-aware sibling of
    // q_hausdorff_join — every user pair's 8-fix signature warped by the
    // classic DP over EXACT 10m-quantized integer local costs, so the
    // whole dynamic hash-matches the oracle's per-anti-diagonal unrolled
    // replay; DtwSpec pins the rounding margins and brute-force paths
    "q_dtw_join" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.dtwJoin(pts, "user_id", "ts", "event_id", "lat", "lon",
        maxPoints = 8, quantMeters = 10.0)
    }),

    // stay-point detection: anchor-walk runs within 4000 km of their first
    // point spanning >= ~13.9 h of event time (both parameters sit far from
    // the fixture's decision boundaries — TrajectorySpec pins the margins)
    "q_staypoints" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.stayPoints(pts, "user_id", "ts", "event_id", "lat", "lon",
          epsMeters = 4000000.0, minDwellMicros = 50000000000L)
        .select("user_id", "enter_order", "exit_order", "n_points", "dwell_micros")
    }),

    // trip segmentation: per-entity time-gap islands (>13.9 h gap starts a
    // new trip) with integer-exact per-trip stats
    "q_trips" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.tripSegments(pts, "user_id", "ts", "event_id", "lat", "lon",
          gapMicros = 50000000000L)
        .select("user_id", "start_order", "end_order", "n_points", "trip_m",
          "duration_micros")
    }),

    // which users' tracks visit each query region (vertex semantics)
    "q_traj_region" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.visitsRegions(pts, "lat", "lon", "user_id", rectRegions)
        .select("region_id", "user_id")
    }),

    // spatio-temporal co-occurrence: event pairs within 1000 km AND 4 h,
    // one composite (cell, time-bucket) equi-join, each pair matched once
    "q_st_join" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      SpatialJoin.spatioTemporalJoin(pts, "event_id", "ts", "lat", "lon",
          radiusM = StJoinRadiusM, windowSec = StJoinWindowSec)
        .select("id_a", "id_b")
    }),

    // co-movement groups (contact-tracing composite): spatio-temporal
    // contact pairs -> distinct user pairs -> connected components. The
    // pair join and the CC operator are each independently oracled; this
    // pins their composition end-to-end. 300 km / 1 h (tighter than
    // q_st_join's constants) keeps the fixture's contact graph structured —
    // 27 components and ~half the users isolated, not one global blob; the
    // radius boundary margin on this fixture is 1.87 m (ContactClustersSpec)
    "q_contact_clusters" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      val contacts = SpatialJoin.spatioTemporalJoin(pts, "event_id", "ts", "lat", "lon",
          radiusM = ContactRadiusM, windowSec = ContactWindowSec)
        .select("id_a", "id_b")
      val ev = events(s, dir).select("event_id", "user_id")
      val userPairs = contacts
        .join(ev.select(col("event_id").as("id_a"), col("user_id").as("__ua")), "id_a")
        .join(ev.select(col("event_id").as("id_b"), col("user_id").as("__ub")), "id_b")
        .where(col("__ua") =!= col("__ub"))
        .select(least(col("__ua"), col("__ub")).as("id_a"),
          greatest(col("__ua"), col("__ub")).as("id_b"))
        .distinct()
      Dedup.duplicateClusters(userPairs)
        .select(col("doc_id").as("user_id"), col("cluster_id"))
    }),

    // HMM map matching (Newson–Krumm shape): per-track Viterbi over
    // (line, edge) states within 150 km — quantized-integer emissions +
    // |Δedge|/line-switch transition costs, so the whole dynamic is
    // hash-exact; the oracle replays the DP as a recursive CTE with
    // path-string accumulation under the identical (cost, line, edge)
    // tie rule. The sequence-aware refinement of q_snap_join
    "q_map_match" -> ((s, dir) =>
      MapMatch.viterbi(mapMatchPoints(s, dir), "user_id", "ts", "event_id",
        "lat", "lon", polylineTable(s, dir), "line_id", "lats", "lons",
        radiusM = PolylineJoinRadiusM)
        .select("user_id", "event_id", "line_id", "edge_idx", "total_cost")),

    // spherical Douglas-Peucker track simplification. Oracled (round-3
    // verdict ask #4): the kept-index set is a pure function of the input
    // (lowest-index farthest tie-break), so the oracle replays the
    // recursion as a recursive CTE over a precomputed per-(lo,hi)
    // farthest-vertex table — the same replay pattern as q_staypoints'
    // anchor walk; SimplifySpec additionally pins the deviation bound
    "q_simplify" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.simplifyTracks(pts, "user_id", "ts", "event_id",
        "lat", "lon", toleranceMeters = 200000.0)
        .select("user_id", "event_id")
    })
  )

  val oracles: Map[String, String] = Map(


    // per-region lag SQL over (user, ts, event_id) order — boundary-safe
    // because the rect bounds sit on .005 offsets no derived point hits
    "q_geofence" -> GeofenceOracleSql,

    // OD flows / dwell episodes: first-match label CASE + lag windows in
    // SQL, integer-exact counts and µs dwell on both sides
    "q_od_flows" -> OdFlowsOracleSql,

    // identical Konig-Huygens integer numerator and the same two IEEE ops
    "q_rog" ->
      """WITH pts AS (SELECT user_id,
        |  (event_id * 9973 + 12345) % 18000 AS x,
        |  (event_id * 31337 + 54321) % 36000 AS y FROM events),
        |g AS (SELECT user_id, count(*) AS n,
        |  CAST(count(*) * sum(x*x + y*y) - sum(x)*sum(x) - sum(y)*sum(y)
        |    AS BIGINT) AS num
        |  FROM pts GROUP BY 1)
        |SELECT user_id, n, num, sqrt(CAST(num AS DOUBLE)) / n AS rg FROM g""".stripMargin,
    "q_dwell" -> DwellOracleSql,

    // salted distinct == plain COUNT(DISTINCT) per label (exactness is the
    // operator's contract: each id lands in exactly one salt bucket)
    "q_region_visitors" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      s"""WITH p AS (SELECT user_id, $evLat AS lat, $evLon AS lon FROM events)
         |SELECT $RegionLabelCaseSql AS region_id, count(DISTINCT user_id) AS distinct_n
         |FROM p GROUP BY 1""".stripMargin
    },

    // wrap-aware bounds: identical largest-circular-gap rule in window SQL
    // (identical doubles in, identical IEEE subtractions, identical
    // tie-break, and the output values are copies of input coordinates)
    "q_track_bounds" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      s"""WITH p AS (SELECT user_id, $evLat AS lat, $evLon AS lon FROM events),
         |lons AS (SELECT DISTINCT user_id, lon FROM p),
         |g AS (SELECT user_id, lon, lead(lon) OVER w AS nxt,
         |  min(lon) OVER (PARTITION BY user_id) AS mn
         |  FROM lons WINDOW w AS (PARTITION BY user_id ORDER BY lon)),
         |g2 AS (SELECT user_id, lon,
         |  CASE WHEN nxt IS NOT NULL THEN nxt - lon ELSE mn + 360 - lon END AS gap,
         |  CASE WHEN nxt IS NOT NULL THEN nxt ELSE mn END AS gend FROM g),
         |r AS (SELECT user_id, gend AS lon_lo, lon AS lon_hi,
         |  row_number() OVER (PARTITION BY user_id ORDER BY gap DESC, lon ASC) AS rn FROM g2),
         |lt AS (SELECT user_id, min(lat) AS lat_lo, max(lat) AS lat_hi FROM p GROUP BY user_id)
         |SELECT lt.user_id, lat_lo, lat_hi, lon_lo, lon_hi
         |FROM lt JOIN r ON lt.user_id = r.user_id AND r.rn = 1""".stripMargin
    },

    "q_traj_stats" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val d = haversineExpr("plat", "plon", "lat", "lon")
      s"""WITH p AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon FROM events),
         |s AS (SELECT user_id, lag(lat) OVER w AS plat, lag(lon) OVER w AS plon, lat, lon
         |      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |d AS (SELECT user_id, CASE WHEN plat IS NULL THEN NULL
         |        ELSE CAST(round($d) AS BIGINT) END AS seg_m FROM s)
         |SELECT user_id, count(*) AS n_points,
         |  CAST(COALESCE(sum(seg_m), 0) AS BIGINT) AS track_m,
         |  COALESCE(max(seg_m), 0) AS max_seg_m
         |FROM d GROUP BY user_id""".stripMargin
    },

    // same integer contract as the engine: rounded-meter segment × 10⁶ vs
    // maxSpeed × exact-µs gap — the only fp input is the haversine, whose
    // rounding-boundary margin TrajectorySpec pins
    "q_speed_flags" -> SpeedFlagsOracleSql,

    // the initial-heading formula, normalized to [0, 360), rounded to whole
    // degrees (boundary margin TrajectorySpec-pinned), then the integer
    // turn arithmetic over the rounded bearings
    "q_headings" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val deg = "degrees(atan2(sin(radians(lon - plon)) * cos(radians(lat)), " +
        "cos(radians(plat)) * sin(radians(lat)) - " +
        "sin(radians(plat)) * cos(radians(lat)) * cos(radians(lon - plon))))"
      s"""WITH p AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon FROM events),
         |s AS (SELECT user_id, ts, event_id, lat, lon,
         |        lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
         |      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |b AS (SELECT user_id, ts, event_id,
         |        CASE WHEN plat IS NULL THEN NULL
         |             ELSE CAST(round((($deg % 360.0) + 360.0) % 360.0) AS BIGINT) % 360
         |        END AS bearing_deg
         |      FROM s),
         |t AS (SELECT user_id, event_id, bearing_deg,
         |        lag(bearing_deg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pb
         |      FROM b)
         |SELECT user_id, event_id, bearing_deg,
         |  CASE WHEN pb IS NULL OR bearing_deg IS NULL THEN NULL
         |       ELSE ((bearing_deg - pb + 540) % 360) - 180 END AS turn_deg
         |FROM t""".stripMargin
    },

    // brute-force symmetric Hausdorff: max-of-min over all cross point
    // pairs per user pair — min/max pick elements, so the only fp-order
    // the anchor replay joined back to every fix, the shared haversine
    // gate, exact counts + the engine's own rate expression
    "q_away_rate" -> {
      val d = haversineExpr("p.lat", "p.lon",
        "a.med_lat_e6 / 1000000.0", "a.med_lon_e6 / 1000000.0")
      s"""WITH pts AS (SELECT user_id, event_id,
         |    ${latSqlFor("event_id")} AS lat, ${lonSqlFor("event_id")} AS lon
         |  FROM events),
         |p6 AS (SELECT user_id,
         |    CAST(round(lat * 1000000) AS BIGINT) AS lat6,
         |    CAST(round(lon * 1000000) AS BIGINT) AS lon6 FROM pts),
         |la AS (SELECT user_id, lat6 AS med_lat_e6 FROM (
         |  SELECT user_id, lat6, row_number() OVER (PARTITION BY user_id ORDER BY lat6) AS r,
         |         count(*) OVER (PARTITION BY user_id) AS n FROM p6) t
         |  WHERE r = (n + 1) // 2),
         |lo AS (SELECT user_id, lon6 AS med_lon_e6 FROM (
         |  SELECT user_id, lon6, row_number() OVER (PARTITION BY user_id ORDER BY lon6) AS r,
         |         count(*) OVER (PARTITION BY user_id) AS n FROM p6) t
         |  WHERE r = (n + 1) // 2),
         |a AS (SELECT la.user_id, la.med_lat_e6, lo.med_lon_e6
         |      FROM la JOIN lo USING (user_id)),
         |g AS (SELECT p.user_id, CASE WHEN $d > 8000000.0 THEN 1 ELSE 0 END AS away
         |      FROM pts p JOIN a ON a.user_id = p.user_id),
         |f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
         |        CAST(sum(away) AS BIGINT) AS n_away FROM g GROUP BY 1)
         |SELECT user_id, n_obs, n_away, ${Trajectories.AwayRateSql} AS away_rate FROM f""".stripMargin
    },

    // both periods' anchor replays joined, the shared haversine text
    // over the reconstructed anchor degrees, rounded to integer meters
    "q_home_drift" -> {
      val d = haversineExpr("la.med_lat_e6 / 1000000.0", "la.med_lon_e6 / 1000000.0",
        "lb.med_lat_e6 / 1000000.0", "lb.med_lon_e6 / 1000000.0")
      def half(name: String, pred: String) =
        s"""p$name AS (SELECT user_id,
           |    CAST(round((${latSqlFor("event_id")}) * 1000000) AS BIGINT) AS lat6,
           |    CAST(round((${lonSqlFor("event_id")}) * 1000000) AS BIGINT) AS lon6
           |  FROM events WHERE $pred),
           |la$name AS (SELECT user_id, lat6 AS med_lat_e6, n FROM (
           |  SELECT user_id, lat6, row_number() OVER (PARTITION BY user_id ORDER BY lat6) AS r,
           |         count(*) OVER (PARTITION BY user_id) AS n FROM p$name) t
           |  WHERE r = (n + 1) // 2),
           |lo$name AS (SELECT user_id, lon6 AS med_lon_e6 FROM (
           |  SELECT user_id, lon6, row_number() OVER (PARTITION BY user_id ORDER BY lon6) AS r,
           |         count(*) OVER (PARTITION BY user_id) AS n FROM p$name) t
           |  WHERE r = (n + 1) // 2),
           |anch$name AS (SELECT la$name.user_id, CAST(la$name.n AS BIGINT) AS n_obs,
           |    la$name.med_lat_e6, lo$name.med_lon_e6
           |  FROM la$name JOIN lo$name USING (user_id))""".stripMargin
      s"""WITH ${half("A", "ts < TIMESTAMP '2024-01-16 00:00:00'")},
         |${half("B", "ts >= TIMESTAMP '2024-01-16 00:00:00'")}
         |SELECT la.user_id, la.n_obs AS n_a, la.med_lat_e6 AS lat_a_e6,
         |  la.med_lon_e6 AS lon_a_e6, lb.n_obs AS n_b,
         |  lb.med_lat_e6 AS lat_b_e6, lb.med_lon_e6 AS lon_b_e6,
         |  CAST(round($d) AS BIGINT) AS drift_m
         |FROM anchA la JOIN anchB lb USING (user_id)""".stripMargin
    },

    // the same micro-degree quantization and lower-median rank selection
    "q_anchor_points" ->
      s"""WITH p AS (SELECT user_id,
         |    CAST(round((${latSqlFor("event_id")}) * 1000000) AS BIGINT) AS lat6,
         |    CAST(round((${lonSqlFor("event_id")}) * 1000000) AS BIGINT) AS lon6
         |  FROM events),
         |la AS (SELECT user_id, lat6 AS med_lat_e6, n FROM (
         |  SELECT user_id, lat6, row_number() OVER (PARTITION BY user_id ORDER BY lat6) AS r,
         |         count(*) OVER (PARTITION BY user_id) AS n FROM p) t
         |  WHERE r = (n + 1) // 2),
         |lo AS (SELECT user_id, lon6 AS med_lon_e6 FROM (
         |  SELECT user_id, lon6, row_number() OVER (PARTITION BY user_id ORDER BY lon6) AS r,
         |         count(*) OVER (PARTITION BY user_id) AS n FROM p) t
         |  WHERE r = (n + 1) // 2)
         |SELECT la.user_id, CAST(la.n AS BIGINT) AS n_obs, la.med_lat_e6, lo.med_lon_e6
         |FROM la JOIN lo USING (user_id)""".stripMargin,

    // the DP unrolled per anti-diagonal: local whole-meter costs from the
    // shared haversine text, then 15 MATERIALIZED diagonal CTEs (each cell
    // takes least() of its up/left/diagonal predecessors, NULLs ignored at
    // the borders) — every cost an exact BIGINT, final cell per pair
    "q_dtw_join" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val hav = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      val diags = (1 to 14).map { d =>
        val zJoin = if (d >= 2)
          s"""
             |  LEFT JOIN d${d - 2} z ON z.ua = l.ua AND z.ub = l.ub
             |    AND z.i = l.i - 1 AND z.j = l.j - 1""".stripMargin
        else ""
        val zArg = if (d >= 2) ", z.cost" else ""
        s""",
           |d$d AS MATERIALIZED (SELECT l.ua, l.ub, l.i, l.j,
           |  l.c + least(x.cost, y.cost$zArg) AS cost
           |  FROM loc l
           |  LEFT JOIN d${d - 1} x ON x.ua = l.ua AND x.ub = l.ub
           |    AND x.i = l.i - 1 AND x.j = l.j
           |  LEFT JOIN d${d - 1} y ON y.ua = l.ua AND y.ub = l.ub
           |    AND y.i = l.i AND y.j = l.j - 1$zJoin
           |  WHERE l.i + l.j = ${d + 2})""".stripMargin
      }.mkString
      val unionAll = (0 to 14).map(d => s"SELECT * FROM d$d").mkString("\nUNION ALL\n")
      s"""WITH pts AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon
         |             FROM events),
         |o AS (SELECT user_id, lat, lon, row_number() OVER (
         |        PARTITION BY user_id ORDER BY ts, event_id) AS i FROM pts),
         |p8 AS MATERIALIZED (SELECT * FROM o WHERE i <= 8),
         |loc AS MATERIALIZED (SELECT a.user_id AS ua, b.user_id AS ub,
         |    a.i AS i, b.i AS j, CAST(round(($hav) / 10.0) AS BIGINT) AS c
         |  FROM p8 a JOIN p8 b ON a.user_id < b.user_id),
         |d0 AS MATERIALIZED (SELECT ua, ub, i, j, c AS cost FROM loc
         |  WHERE i = 1 AND j = 1)$diags,
         |alld AS ($unionAll),
         |nn AS (SELECT user_id, CAST(max(i) AS INTEGER) AS n FROM p8 GROUP BY 1)
         |SELECT al.ua AS id_a, al.ub AS id_b, al.cost AS dtw_cost
         |FROM alld al JOIN nn x ON x.user_id = al.ua JOIN nn y ON y.user_id = al.ub
         |WHERE al.i = x.n AND al.j = y.n""".stripMargin
    },

    // hazard is the final half-meter rounding boundary (margin 2.9e-4 m on
    // this fixture, asserted in TrajectorySpec)
    "q_hausdorff_join" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH p AS (SELECT user_id, event_id, $evLat AS lat, $evLon AS lon
         |           FROM events WHERE user_id % 5 = 0),
         |x AS (SELECT a.user_id ua, b.user_id ub, a.event_id ea, b.event_id eb, $d AS dm
         |      FROM p a JOIN p b ON a.user_id < b.user_id),
         |ab AS (SELECT ua, ub, max(mind) h FROM
         |        (SELECT ua, ub, ea, min(dm) AS mind FROM x GROUP BY 1, 2, 3) GROUP BY 1, 2),
         |ba AS (SELECT ua, ub, max(mind) h FROM
         |        (SELECT ua, ub, eb, min(dm) AS mind FROM x GROUP BY 1, 2, 3) GROUP BY 1, 2)
         |SELECT ab.ua AS id_a, ab.ub AS id_b,
         |  CAST(round(greatest(ab.h, ba.h)) AS BIGINT) AS haus_m
         |FROM ab JOIN ba ON ab.ua = ba.ua AND ab.ub = ba.ub
         |WHERE CAST(round(greatest(ab.h, ba.h)) AS BIGINT) <= 3400000""".stripMargin
    },

    // the anchor walk as a recursive CTE: steps precomputes each anchor's
    // first-exceeding index j and span dwell; the recursion visits exactly
    // the anchors the sequential algorithm visits (jump to j on emit, +1
    // otherwise); emitted rows are the visited anchors whose dwell
    // qualifies. Same eps/minDwell integers as the engine; the eps
    // comparison's fixture margin is 12.6 m (TrajectorySpec).
    "q_staypoints" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH RECURSIVE
         |base AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon FROM events),
         |p AS (SELECT user_id, epoch_us(ts) AS us, event_id, lat, lon,
         |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM base),
         |cnt AS (SELECT user_id, max(rn) AS n FROM p GROUP BY 1),
         |jmp AS (SELECT a.user_id, a.rn AS i,
         |          min(CASE WHEN $d > 4000000.0 THEN b.rn END) AS jraw
         |        FROM p a LEFT JOIN p b ON b.user_id = a.user_id AND b.rn > a.rn
         |        GROUP BY 1, 2),
         |steps AS (SELECT j.user_id, j.i, coalesce(j.jraw, c.n + 1) AS j,
         |            pe.us - pi.us AS dwell,
         |            pi.event_id AS enter_order, pe.event_id AS exit_order
         |          FROM jmp j
         |          JOIN cnt c ON c.user_id = j.user_id
         |          JOIN p pi ON pi.user_id = j.user_id AND pi.rn = j.i
         |          JOIN p pe ON pe.user_id = j.user_id
         |            AND pe.rn = coalesce(j.jraw, c.n + 1) - 1),
         |walk AS (SELECT user_id, 1 AS i FROM cnt
         |         UNION ALL
         |         SELECT w.user_id,
         |           CASE WHEN s.dwell >= 50000000000 THEN s.j ELSE w.i + 1 END
         |         FROM walk w
         |         JOIN steps s ON s.user_id = w.user_id AND s.i = w.i
         |         JOIN cnt c ON c.user_id = w.user_id
         |         WHERE CASE WHEN s.dwell >= 50000000000 THEN s.j ELSE w.i + 1 END <= c.n)
         |SELECT w.user_id, s.enter_order, s.exit_order,
         |  CAST(s.j - w.i AS BIGINT) AS n_points, s.dwell AS dwell_micros
         |FROM walk w JOIN steps s ON s.user_id = w.user_id AND s.i = w.i
         |WHERE s.dwell >= 50000000000""".stripMargin
    },

    // spherical Douglas-Peucker replay: (1) per-(lo,hi) farthest-vertex
    // table — for every candidate split interval, the interior vertex of
    // max point-to-edge distance, ties to the LOWEST index, via the SAME
    // IEEE formula as the kernel (S2EdgeUtil.getDistance with
    // robustCrossProd's (b+a)x(b-a) normal, transcribed term-by-term in
    // evaluation order) — then (2) a recursive interval walk from
    // (1, n): an interval whose farthest distance exceeds the tolerance
    // keeps that vertex and spawns both sub-intervals, exactly the
    // kernel's explicit stack (traversal ORDER is irrelevant to the kept
    // SET, so the stack-vs-breadth difference cannot diverge)
    "q_simplify" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      s"""WITH RECURSIVE
         |base AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon FROM events),
         |p AS (SELECT user_id, event_id,
         |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         |        cos(radians(lat))*cos(radians(lon)) AS px,
         |        cos(radians(lat))*sin(radians(lon)) AS py,
         |        sin(radians(lat)) AS pz
         |      FROM base),
         |cnt AS (SELECT user_id, max(rn) AS n FROM p GROUP BY 1),
         |e1 AS (SELECT a.user_id, a.rn AS lo, b.rn AS hi, v.rn AS w,
         |         v.px AS px, v.py AS py, v.pz AS pz,
         |         a.px AS ax, a.py AS ay, a.pz AS az,
         |         b.px AS bx, b.py AS by, b.pz AS bz,
         |         (b.px+a.px) AS sx, (b.py+a.py) AS sy, (b.pz+a.pz) AS sz,
         |         (b.px-a.px) AS dx, (b.py-a.py) AS dy, (b.pz-a.pz) AS dz
         |       FROM p a
         |       JOIN p b ON b.user_id = a.user_id AND b.rn > a.rn + 1
         |       JOIN p v ON v.user_id = a.user_id AND v.rn > a.rn AND v.rn < b.rn),
         |e2 AS (SELECT *, sy*dz - sz*dy AS nx, sz*dx - sx*dz AS ny, sx*dy - sy*dx AS nz FROM e1),
         |e3 AS (SELECT *, ny*az - nz*ay AS m1x, nz*ax - nx*az AS m1y, nx*ay - ny*ax AS m1z,
         |         by*nz - bz*ny AS m2x, bz*nx - bx*nz AS m2y, bx*ny - by*nx AS m2z FROM e2),
         |e4 AS (SELECT user_id, lo, hi, w,
         |         CASE WHEN px*m1x + py*m1y + pz*m1z > 0 AND px*m2x + py*m2y + pz*m2z > 0
         |           THEN asin(least(1.0, abs(px*nx + py*ny + pz*nz) / sqrt(nx*nx + ny*ny + nz*nz)))
         |           ELSE 2 * asin(least(1.0, 0.5 * sqrt(least(
         |             (px-ax)*(px-ax) + (py-ay)*(py-ay) + (pz-az)*(pz-az),
         |             (px-bx)*(px-bx) + (py-by)*(py-by) + (pz-bz)*(pz-bz)))))
         |         END AS d FROM e3),
         |farthest AS (SELECT user_id, lo, hi, w, d FROM (
         |    SELECT user_id, lo, hi, w, d,
         |      row_number() OVER (PARTITION BY user_id, lo, hi ORDER BY d DESC, w ASC) AS rk
         |    FROM e4) t WHERE rk = 1),
         |walk AS (
         |  SELECT user_id, CAST(1 AS BIGINT) AS lo, CAST(n AS BIGINT) AS hi FROM cnt
         |  UNION ALL
         |  SELECT w.user_id,
         |    CASE s.side WHEN 0 THEN w.lo ELSE CAST(f.w AS BIGINT) END AS lo,
         |    CASE s.side WHEN 0 THEN CAST(f.w AS BIGINT) ELSE w.hi END AS hi
         |  FROM walk w
         |  JOIN farthest f ON f.user_id = w.user_id AND f.lo = w.lo AND f.hi = w.hi
         |    AND f.d > 200000.0 / 6367000.0
         |  CROSS JOIN (SELECT 0 AS side UNION ALL SELECT 1) s),
         |keptrn AS (
         |  SELECT user_id, CAST(1 AS BIGINT) AS rn FROM cnt
         |  UNION ALL SELECT user_id, CAST(n AS BIGINT) AS rn FROM cnt
         |  UNION ALL
         |  SELECT w.user_id, CAST(f.w AS BIGINT) AS rn
         |  FROM walk w
         |  JOIN farthest f ON f.user_id = w.user_id AND f.lo = w.lo AND f.hi = w.hi
         |    AND f.d > 200000.0 / 6367000.0)
         |SELECT DISTINCT k.user_id, p.event_id
         |FROM keptrn k JOIN p ON p.user_id = k.user_id AND p.rn = k.rn""".stripMargin
    },

    // gaps-and-islands with the same integer contracts: exact-µs gap test,
    // rounded-meter within-trip segments (gap-crossing segment excluded)
    "q_trips" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val d = haversineExpr("plat", "plon", "lat", "lon")
      s"""WITH p AS (SELECT user_id, epoch_us(ts) AS us, ts, event_id,
         |             $evLat AS lat, $evLon AS lon FROM events),
         |s AS (SELECT user_id, us, event_id, lat, lon,
         |        lag(us) OVER w AS pus, lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
         |      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |f AS (SELECT *, CASE WHEN pus IS NULL OR us - pus > 50000000000
         |        THEN 1 ELSE 0 END AS chg FROM s),
         |g AS (SELECT *, CASE WHEN chg = 1 THEN NULL
         |        ELSE CAST(round($d) AS BIGINT) END AS seg_m,
         |        sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
         |          ROWS UNBOUNDED PRECEDING) AS island FROM f)
         |SELECT user_id, min(event_id) AS start_order, max(event_id) AS end_order,
         |  count(*) AS n_points, CAST(COALESCE(sum(seg_m), 0) AS BIGINT) AS trip_m,
         |  max(us) - min(us) AS duration_micros
         |FROM g GROUP BY user_id, island""".stripMargin
    },

    "q_traj_region" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT DISTINCT '$rid' AS region_id, user_id FROM p
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH p AS (SELECT user_id, $evLat AS lat, $evLon AS lon FROM events)
         |${branches.mkString("\nUNION ALL\n")}
         |""".stripMargin
    },

    // brute-force spatio-temporal pairs: all-pairs haversine + exact
    // integer-microsecond time-window predicate
    "q_st_join" -> StJoinOracleSql,

    // the contact composite from first principles: the st-join brute force
    // lifted to distinct user pairs, then recursive-CTE reachability with
    // min-id labels (same shape as the q_dup_clusters oracle)
    "q_contact_clusters" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH RECURSIVE
         |pts AS (SELECT event_id AS id, user_id, epoch_us(ts) AS tus,
         |  ${latSqlFor("event_id")} AS lat, ${lonSqlFor("event_id")} AS lon FROM events),
         |up AS (SELECT DISTINCT least(a.user_id, b.user_id) AS s0,
         |         greatest(a.user_id, b.user_id) AS d0
         |       FROM pts a JOIN pts b ON a.id < b.id
         |       WHERE abs(a.tus - b.tus) <= ${ContactWindowSec * 1000000L}
         |         AND $d <= $ContactRadiusM AND a.user_id <> b.user_id),
         |edges AS (SELECT s0 AS s, d0 AS d FROM up UNION SELECT d0, s0 FROM up),
         |reach(src, dst) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.dst)
         |SELECT src AS user_id, min(dst) AS cluster_id FROM reach GROUP BY src""".stripMargin
    },

    // the Viterbi dynamic replayed literally: the same per-edge exact
    // distance branches as q_snap_join over the jittered track fixture,
    // quantized to the same 10 m integer emissions, then a recursive CTE
    // carrying (cost, path-string) per state with arg_min over the
    // zero-padded (cost, line, edge) key — the engine's tie rule as a
    // sortable string. MapMatchSpec pins the radius/quantization margins
    // that make the candidate set and emissions cross-engine identical
    "q_map_match" -> {
      s"""WITH RECURSIVE $mapMatchOracleBase,
         |v AS (
         |  SELECT user_id, step, line, edge, e AS cost,
         |    CAST(line AS VARCHAR) || ':' || CAST(edge AS VARCHAR) AS path
         |  FROM c2 WHERE step = 1
         |  UNION ALL
         |  SELECT c.user_id, c.step, c.line, c.edge,
         |    min(p.cost + $MapMatchTransSql) + c.e AS cost,
         |    arg_min(p.path, ${mapMatchTieKey(s"p.cost + $MapMatchTransSql", "p.line", "p.edge")})
         |      || '|' || CAST(c.line AS VARCHAR) || ':' || CAST(c.edge AS VARCHAR) AS path
         |  FROM v p JOIN c2 c ON c.user_id = p.user_id AND c.step = p.step + 1
         |  GROUP BY c.user_id, c.step, c.line, c.edge, c.e),
         |tail AS (SELECT user_id, max(step) AS n FROM v GROUP BY 1),
         |best AS (SELECT v.user_id, min(v.cost) AS total_cost,
         |    string_split(arg_min(v.path, ${mapMatchTieKey("v.cost", "v.line", "v.edge")}), '|') AS parts
         |  FROM v JOIN tail t ON t.user_id = v.user_id AND v.step = t.n
         |  GROUP BY v.user_id),
         |flat AS (SELECT user_id, total_cost, unnest(parts) AS pe,
         |    unnest(range(1, len(parts) + 1)) AS step FROM best)
         |SELECT st.user_id, st.event_id,
         |  CAST(string_split(f.pe, ':')[1] AS BIGINT) AS line_id,
         |  CAST(string_split(f.pe, ':')[2] AS INTEGER) AS edge_idx,
         |  f.total_cost
         |FROM flat f JOIN steps st ON st.user_id = f.user_id AND st.step = f.step""".stripMargin
    }
  )
}
