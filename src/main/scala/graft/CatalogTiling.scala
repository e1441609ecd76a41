package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.s2functions._
import graft.operators._
import graft.s2.{S2LatLngRect, S2Region, R1Interval, S1Interval}
import graft.sources.GeoJson

/** Catalog registry — tile/raster assignment, coverings, clustered/indexed scans, sketches over tiles. Entries moved verbatim from SparkEntry
  * (round-3 verdict ask #7: per-domain registries behind the same
  * `queries` map; the 247-row correctness gate pins that nothing moved). */
private[graft] object CatalogTiling {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // multi-level tile pyramid in ONE pass (ancestor-chain explode + one
    // partial-combined aggregation); derived oracle exactly like
    // q_tile_counts, per level: every point lands in exactly one valid
    // tile of the right level, and cell counts are monotone in level
    "q_tile_pyramid" -> ((s, dir) => {
      val perLevel = Tiling.tilePyramid(points(s, dir), "lat", "lon", 2, 6)
        .groupBy("level")
        .agg(
          sum("n").as("total_points"),
          count(lit(1)).as("n_cells"),
          sum(when(s2_level(s2_cell_from_token(col("tile_token"))) === col("level"), 1L)
            .otherwise(0L)).as("lvl_ok"))
        .where(col("n_cells") === col("lvl_ok"))
      val w = Window.orderBy("level")
      perLevel
        .withColumn("__finer_cells", lead("n_cells", 1).over(w))
        .where(col("__finer_cells").isNull || col("__finer_cells") >= col("n_cells"))
        .select("level", "total_points")
    }),

    // --- S2 kernel self-consistency over every derived point ---
    "q_tile_roundtrip" -> ((s, dir) => {
      points(s, dir)
        .withColumn("leaf", s2_cell_id(col("lat"), col("lon")))
        .withColumn("t11", s2_parent(col("leaf"), 11))
        .withColumn("t8", s2_parent(col("leaf"), 8))
        .where(
          s2_cell_from_token(s2_token(col("t11"))) === col("t11") &&
          s2_level(col("t11")) === 11 &&
          s2_cell_contains(col("t11"), col("leaf")) &&
          s2_cell_contains(col("t8"), col("t11")) &&
          s2_cell_id(s2_cell_lat(col("leaf")), s2_cell_lon(col("leaf"))) === col("leaf") &&
          s2_ord(s2_range_min(col("t8"))) <= s2_ord(col("leaf")) &&
          s2_ord(s2_range_max(col("t8"))) >= s2_ord(col("leaf")) &&
          // E9: (face, pos, level) decomposition reassembles the same cell
          s2_cell_from_face_pos(
            shiftrightunsigned(col("t8"), 61).cast("int"),
            col("t8").bitwiseAND(lit((1L << 61) - 1)), lit(8)) === col("t8"))
        .select("o_orderkey")
    }),

    // --- neighbor topology (N1/N2/N3) self-checked over every point's
    // level-6 cell: 4 edge neighbors, each symmetric (we are among our
    // neighbor's edge neighbors) and at the same level; 3 or 4 vertex
    // neighbors; GetAllNeighbors appends exactly 8 same-level cells of
    // which 7 are distinct at cube-corner cells (the reference's append
    // semantics duplicates one diagonal there, `S2CellId.cs:813-863`) and
    // 8 elsewhere; the set contains every edge neighbor and never the cell
    // itself. Any violation drops the row -> rows mismatch vs the
    // all-orders oracle.
    "q_neighbors" -> ((s, dir) => {
      val lvl = 6
      points(s, dir)
        .withColumn("c", s2_tile(col("lat"), col("lon"), lvl))
        .withColumn("en", s2_edge_neighbors(col("c")))
        .withColumn("vn", s2_vertex_neighbors(col("c"), lvl))
        .withColumn("an", s2_all_neighbors(col("c"), lvl))
        .where(
          size(col("en")) === 4 &&
          forall(col("en"), n => s2_level(n) === lvl &&
            array_contains(s2_edge_neighbors(n), col("c")) &&
            array_contains(col("an"), n)) &&
          size(col("vn")).isin(3, 4) &&
          size(col("an")) === 8 &&
          size(array_distinct(col("an"))).isin(7, 8) &&
          !array_contains(col("an"), col("c")))
        .select("o_orderkey")
    }),

    // --- tiling: the level-4 token histogram, then self-checked down to a
    // derived oracle: the histogram must cover every input point exactly
    // once (sum(n) == count(orders)), use only valid level-4 tokens that
    // round-trip, and fit in the 6*4^4 = 1536 cells that exist at level 4.
    // Any violation empties the output -> rows mismatch.
    "q_tile_counts" -> ((s, dir) => {
      Tiling.tileStats(points(s, dir), "lat", "lon", 4)
        .agg(
          sum("n").as("total_points"),
          count(lit(1)).as("n_cells"),
          sum(when(s2_level(s2_cell_from_token(col("tile_token"))) === 4, 1L)
            .otherwise(0L)).as("lvl4_cells"))
        .where(col("n_cells") === col("lvl4_cells") && col("n_cells").between(1, 1536))
        .select("total_points")
    }),

    // web-mercator (slippy z/x/y) tile counts at zoom 6 with the Bing
    // quadkey — the serving-side tiling scheme beside S2. The tile indices
    // are floor decisions over an explicit IEEE double sequence mirrored op
    // for op in the oracle (no radians(): the two engines' radians() may
    // associate differently); WebMercatorSpec pins the floor-margin
    // precondition over the full sf0.01 grid
    "q_zxy_tiles" -> ((s, dir) =>
      Tiling.zxyAssign(points(s, dir), "lat", "lon", 6)
        .groupBy("zx", "zy", "quadkey").agg(count(lit(1)).as("n"))),

    // spatial change detection between snapshot A (all orders) and
    // snapshot B (a third deleted, every 5th re-inserted elsewhere):
    // per-tile count diff at zoom 6, changed tiles only. Two partial
    // aggregates + a tile-bounded full-outer join; integer-exact under
    // the pinned zxy floor margin
    "q_tile_diff" -> ((s, dir) => {
      val before = points(s, dir)
      val after = points(s, dir).where(col("o_orderkey") % 3 =!= 0)
        .unionByName(orders(s, dir).where(col("o_orderkey") % 5 === 0)
          .withColumn("lat", expr(latSqlFor("(o_orderkey * 7 + 3)")))
          .withColumn("lon", expr(lonSqlFor("(o_orderkey * 7 + 3)"))))
      Tiling.tileChangeCounts(before.select("lat", "lon"), after.select("lat", "lon"),
        "lat", "lon", 6)
    }),

    // 3x3 neighborhood rollup on the zoom-6 mercator grid (the heatmap
    // convolution): per occupied tile, own count + 9-tile total with
    // antimeridian x-wrap and mercator-cut y-clamp. Counts collapse
    // per-tile BEFORE the x9 explode, so only the bounded tile table ever
    // re-shuffles; same floor-margin precondition as q_zxy_tiles
    "q_zxy_smooth" -> ((s, dir) =>
      Tiling.zxyNeighborhoodCounts(points(s, dir), "lat", "lon", 6)),

    // geohash (precision 5) tile counts — the third public tiling scheme.
    // Unlike q_zxy_tiles the arithmetic is transcendental-free, so the
    // DuckDB replay is bit-exact with no margin precondition; GeohashSpec
    // checks the encoder against an independent interval-halving reference
    "q_geohash" -> ((s, dir) =>
      Tiling.geohashEncode(points(s, dir), "lat", "lon", 5)
        .groupBy("geohash").agg(count(lit(1)).as("n"))),

    // H3-style hexagonal binning (the north rule's hex-grid index): per-hex
    // counts at circumradius 2.5 deg; cube-round is transcendental-free so
    // the oracle replays it bit for bit
    "q_hex_bin" -> ((s, dir) =>
      Tiling.hexBin(points(s, dir), "lat", "lon", 2.5)
        .groupBy("hex_q", "hex_r").agg(count(lit(1)).as("n"))),

    // H3-style k=1 ring rollup: per occupied hex, own + 7-cell counts;
    // the neighbor arithmetic is pure integers on top of the oracled
    // hexBin assignment
    "q_hex_ring" -> ((s, dir) =>
      Tiling.hexRingCounts(points(s, dir), "lat", "lon", 2.5)),

    // geohash-clustered layout, exercised end to end: write the points
    // partitioned by first char + sorted by full geohash (build-once
    // fixture), then a prefix scan that prunes 31 of 32 directories and
    // filters the sorted column; oracle recomputes the geohash per row
    "q_geohash_scan" -> ((s, dir) => {
      val out = fixture(dir, "ghclustered") { p =>
        Tiling.geohashClusteredWrite(points(s, dir).select("o_orderkey", "lat", "lon"),
          "lat", "lon", p, precision = 6, prefixLen = 1)
      }
      Tiling.geohashPrefixScan(s, out, "7", prefixLen = 1)
        .select("o_orderkey", "geohash")
    }),

    // RECTANGLE query over the geohash layout: the geohash polyfill turns
    // the prefix index into a region index — covering prefixes prune
    // directories and row groups, the exact rect test refines; same rows
    // as a full-scan rect filter (the oracle)
    "q_geohash_region" -> ((s, dir) => {
      val out = fixture(dir, "ghclustered") { p =>
        Tiling.geohashClusteredWrite(points(s, dir).select("o_orderkey", "lat", "lon"),
          "lat", "lon", p, precision = 6, prefixLen = 1)
      }
      val (_, latLo, latHi, lonLo, lonHi) = SparkEntryRegions.rectBounds.head // r_europe
      Tiling.geohashRegionScan(s, out, latLo, latHi, lonLo, lonHi, prefixLen = 1)
        .select("o_orderkey")
    }),

    // per-tile freshness: zoom-6 tiles whose latest observation trails
    // the corpus frontier by > 10 days (953 of 3660 at sf0.01) — the
    // refresh-scheduler report; exact integer day arithmetic
    "q_stale_tiles" -> ((s, dir) =>
      Tiling.zxyStaleTiles(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", "ts", z = 6, staleDays = 10L)),

    // coverage gaps: zoom-7 tiles with NO observation in their 3x3
    // neighborhood — the catalog-holes report (143 of 16384 at sf0.01);
    // the grid is executor-generated, the dilation is observed-set-sized
    "q_coverage_gaps" -> ((s, dir) =>
      Tiling.zxyCoverageGaps(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", z = 7)),

    // compact coverage: the observed zoom-5 tile set normalized to the
    // minimal mixed-level quadtree cover (the web-mercator twin of the
    // kernel's CellUnion.Normalize as a distributed query) — 1023 of
    // 1024 tiles observed at sf0.01 collapse to 15 rows, the missing
    // tile's ancestor chain blocking full promotion at every level
    "q_compact_coverage" -> ((s, dir) =>
      Tiling.zxyCompactCoverage(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", z = 5)),

    // local spatial outliers: zoom-4 tiles deviating > 3x MAD from their
    // 3x3 neighborhood median — the robust raster QA gate (34 of 256
    // tiles at sf0.01: the mercator edge pile-ups, exactly what it should
    // catch); zero-filled valid positions, everything integer-exact
    "q_tile_outliers" -> ((s, dir) =>
      Tiling.zxyLocalOutliers(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", z = 4)),

    // seasonal per-tile anomaly gate: each zoom-3 tile's hour-of-day
    // profile vs its own zero-filled lower-median baseline — 2x spike /
    // 2x quiet flags, every comparison an exact integer (34 spikes + 116
    // quiet hours at sf0.01 — non-degenerate both ways); after the one
    // (tile, hour) count pass everything is bounded by 4^z * 24 rows
    "q_tile_anomaly" -> ((s, dir) =>
      Tiling.tileSeasonalAnomalies(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", "ts", z = 3)),

    // spatio-temporal cube over events: per (geohash-3 cell, hour) stats
    // plus all three marginalizations in one pass via native GROUPING SETS
    "q_st_cube" -> ((s, dir) =>
      Tiling.geohashTimeCube(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", 3, "ts", "value")),

    // Gi*-style hotspot z-scores on the zoom-6 mercator grid: every input
    // to the scalar formula is an integer (tile counts + global moments),
    // so gi_z is ONE fixed IEEE expression and the oracle matches it bit
    // for bit; same floor-margin precondition as q_zxy_tiles
    "q_hotspots" -> ((s, dir) =>
      Tiling.hotspotScores(points(s, dir), "lat", "lon", 6)),

    // global Moran's I over the same zoom-6 grid: is the corpus spatially
    // clustered at all? Every formula operand is an integer (tile counts,
    // moments, directed-edge count, adjacency cross/degree sums), so the
    // single output double is bit-exact against the oracle
    "q_morans_i" -> ((s, dir) =>
      Tiling.moransI(points(s, dir), "lat", "lon", 6)),

    // Geary's C — the locally-sensitive sibling over the identical grid
    // and weights, same all-integer-operand bit-exact contract
    "q_gearys_c" -> ((s, dir) =>
      Tiling.gearysC(points(s, dir), "lat", "lon", 6)),

    // Ripley's K at four radii over the customer point pattern: ONE
    // bucketed distance self-join at the largest radius, every radius a
    // conditional sum over the pair table; pair membership is the integer
    // round_m(d) <= r test (margin spec-pinned) and k_est is a fixed IEEE
    // expression over integers — bit-exact oracle
    "q_ripleys_k" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      SpatialJoin.ripleysK(pts, "lat", "lon", "c_custkey", RipleyRadiiM)
    }),

    // --- clustered storage layout, exercised end to end: write the points
    // spatially clustered (hive-partitioned by coarse tile, sorted by leaf
    // cell), read back ONLY the partitions/row-ranges overlapping the
    // r_europe rect covering, refine exactly. Rows can only match the rect
    // oracle if the pruned read kept every relevant partition.
    // coarseLevel 2 -> at most 96 hive directories: partition-directory
    // count must track data volume (a 100-TB table would warrant level 5's
    // 6144 dirs; 15k rows would drown in filesystem metadata at that level)
    "q_clustered_scan" -> ((s, dir) => {
      val out = fixture(dir, "clustered") { p =>
        Tiling.clusteredWrite(points(s, dir).select("o_orderkey", "lat", "lon"),
          "lat", "lon", p, coarseLevel = 2)
      }
      val rect = SparkEntryRegions.rects.head._2 // r_europe
      val (_, latLo, latHi, lonLo, lonHi) = SparkEntryRegions.rectBounds.head
      val cells = new graft.s2.S2RegionCoverer().setMaxCells(64).getCovering(rect)
      Tiling.readClusteredForCells(s, out, cells, coarseLevel = 2)
        .where(col("lat").between(latLo, latHi) && col("lon").between(lonLo, lonHi))
        .select("o_orderkey")
    }),

    // per-file Bloom skipping index: documents hash-routed into 16 files
    // + one bitset per file; the point lookup opens only files whose
    // bitset might contain a probe key (absent keys included to prove
    // false positives never become rows). The fixture write is one-time;
    // the measured query is index read -> file prune -> exact isin scan
    "q_bloom_index_scan" -> ((s, dir) => {
      val out = fixture(dir, "bloomidx") { p =>
        BloomJoin.writeIndexed(documents(s, dir).select("doc_id", "n_chars"),
          "doc_id", p, nFiles = 16)
      }
      BloomJoin.lookupIndexed(s, out, "doc_id", BloomIndexProbeKeys)
        .select("doc_id", "n_chars")
    }),

    // MERGE (upsert) into the clustered layout: keys % 7 == 0 MOVE to new
    // coordinates (old copies are hunted down across partitions by the
    // key-semi-join scan), keys % 11 == 0 spawn inserts with fresh ids;
    // only touched coarse-tile partitions are rewritten (TableMaintenance
    // Spec pins that untouched partition files are byte-identical after).
    // The fixture write is part of the measured op: merge is a mutation,
    // so each invocation starts from a fresh base.
    "q_merge_upsert" -> ((s, dir) => {
      val base = points(s, dir).select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_merge_" +
        java.util.UUID.randomUUID().toString.take(8)
      Tiling.clusteredWrite(base, "lat", "lon", tmp, coarseLevel = 2)
      val upd = orders(s, dir).where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").cast("long"),
          expr(latSqlFor("(o_orderkey * 3 + 1)")).as("lat"),
          expr(lonSqlFor("(o_orderkey * 3 + 1)")).as("lon"))
      val ins = orders(s, dir).where(col("o_orderkey") % 11 === 0)
        .select((col("o_orderkey") + 1000000000L).cast("long").as("o_orderkey"),
          expr(latSqlFor("(o_orderkey * 5 + 2)")).as("lat"),
          expr(lonSqlFor("(o_orderkey * 5 + 2)")).as("lon"))
      Tiling.mergeClustered(s, tmp, upd.unionByName(ins), "o_orderkey", "lat", "lon",
        coarseLevel = 2)
      s.read.parquet(tmp).select("o_orderkey", "lat", "lon")
    }),

    // small-file compaction: a 3-batch fragmented clustered layout is
    // compacted back to one sorted file per partition; rows are the
    // invariant (the layout changes, not the content — same contract as
    // q_bucketed_join), file-count/sort/pruning effects are pinned in
    // TableMaintenanceSpec
    "q_compact_scan" -> ((s, dir) => {
      val base = points(s, dir).select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_compact_" +
        java.util.UUID.randomUUID().toString.take(8)
      base
        .withColumn("__leaf", s2_cell_id(col("lat"), col("lon")))
        .withColumn("coarse_tile", s2_token(s2_parent(col("__leaf"), 2)))
        .withColumn("__leaf_ord", s2_ord(col("__leaf")))
        .drop("__leaf")
        // explicit partition count: AQE would otherwise coalesce the salted
        // shuffle back to one task and nothing would fragment
        .repartition(24, col("coarse_tile"), pmod(col("o_orderkey"), lit(3)))
        .sortWithinPartitions("coarse_tile", "__leaf_ord")
        .write.partitionBy("coarse_tile").parquet(tmp)
      Tiling.compactClustered(s, tmp)
      s.read.parquet(tmp).select("o_orderkey", "lat", "lon")
    }),

    // --- covering PIP joins ---
    // generic two-attribute Z-ORDER layout (the lakehouse ZORDER BY,
    // generalized from the geo layouts): orders clustered by interleaved
    // (totalprice, custkey) bits; a conjunctive box predicate prunes
    // whole z-prefix directories via the driver-side prefix-rectangle
    // intersection (O(64), no data read) + row groups via the sorted __z
    // stats column; the exact filter stays on top, so the layout
    // accelerates and never answers
    "q_zorder_scan" -> ((s, dir) => {
      val (xd, yd) = (ZOrder.Dim("o_totalprice", 0.0, 620000.0),
        ZOrder.Dim("o_custkey", 0.0, 20000.0))
      val out = fixture(dir, "zorder") { p =>
        ZOrder.zorderWrite(orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
          xd, yd, bits = 12, coarseBits = 6, p)
      }
      ZOrder.readForBox(s, out, xd, yd, bits = 12, coarseBits = 6,
          xLo = 100000.0, xHi = 200000.0, yLo = 1.0, yHi = 3000.0)
        .where(col("o_totalprice").between(100000.0, 200000.0) &&
          col("o_custkey").between(1L, 3000L))
        .select("o_orderkey")
    }),

    // region dissolve: merge supplier service circles (R = 300 km) that
    // overlap (center distance <= 2R) into connected blobs — vector
    // dissolve at table scale: pairwise-overlap edges from the
    // neighbor-cell distance self-join (never a cross join), blobs by
    // min-label connected components, singleton circles stay themselves
    "q_dissolve" -> ((s, dir) => {
      val pts = supplier(s, dir).select("s_suppkey")
        .withColumn("lat", expr(latSqlFor("s_suppkey")))
        .withColumn("lon", expr(lonSqlFor("s_suppkey")))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "s_suppkey",
          radiusM = 600000.0)
        .select("id_a", "id_b")
      val cc = Dedup.duplicateClusters(edges)
        .select(col("doc_id").as("id"), col("cluster_id").as("blob_id"))
      val singles = pts.select(col("s_suppkey").as("id"))
        .join(cc.select("id"), Seq("id"), "left_anti")
        .withColumn("blob_id", col("id"))
      cc.unionByName(singles)
    }),

    // STR (sort-tile-recursive) spatial partitioner: equi-DEPTH 8x4 tiles
    // by longitude-rank strips then latitude-rank cuts — the load-balanced
    // partitioner for skewed point sets; both rank levels use the two-pass
    // range-partitioned pattern (no single-task global sort, no driver
    // count), and the floor-rank arithmetic replays exactly in SQL
    "q_str_partition" -> ((s, dir) =>
      SpatialPartition.strAssign(
        points(s, dir).select(col("o_orderkey").as("id"), col("lat"), col("lon")),
        "id", "lon", "lat", sx = 8, sy = 4)
        .select("id", "tx", "ty")),

    // IDW power-2 interpolation of a customer-valued surface at supplier
    // locations: planar wrap-aware metric + explicitly-ordered folds make
    // the float estimate itself bit-reproducible (the oracle replays the
    // same sort + left fold via DuckDB list_reduce)
    "q_idw" -> ((s, dir) => {
      val samples = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
        .withColumn("v", (col("c_custkey") % 97).cast("double"))
      val probes = supplier(s, dir).select("s_suppkey")
        .withColumn("qlat", expr(latSqlFor("s_suppkey")))
        .withColumn("qlon", expr(lonSqlFor("s_suppkey")))
      SpatialJoin.idwInterpolate(samples, "lat", "lon", "v", "c_custkey",
        probes, "s_suppkey", "qlat", "qlon", radiusDeg = 10.0)
    }),

    // distributed vector->raster: a TABLE of 25 rect regions (one wraps
    // the antimeridian) is rasterized executor-side to level-5 cells, the
    // raster equi-joins points on their level-5 tile (disjoint same-level
    // cells -> no pair dedup), and the exact wrap-aware rect predicate
    // refines. No driver loop over regions, no cross join.
    "q_rasterize" -> ((s, dir) => {
      val rects = nation(s, dir)
        .select(col("n_nationkey").cast("long").as("region_id"))
        .withColumn("lat_lo", lit(-66.005) + (col("region_id") % 5).cast("double") * 24.0)
        .withColumn("lat_hi", col("lat_lo") + 10.0)
        .withColumn("lon_lo", lit(-175.005) + col("region_id").cast("double") * 14.0)
        .withColumn("lon_hi",
          when(col("lon_lo") + 25.0 > 180.0, col("lon_lo") + 25.0 - 360.0)
            .otherwise(col("lon_lo") + 25.0))
      val raster = Vectorize.rasterizeRects(rects, "lat_lo", "lat_hi", "lon_lo", "lon_hi",
        level = 5)
      val pts = points(s, dir)
        .select(col("o_orderkey"), col("lat"), col("lon"),
          s2_tile(col("lat"), col("lon"), 5).as("tile"))
      raster.join(pts, raster("cell") === pts("tile"))
        .where(col("lat").between(col("lat_lo"), col("lat_hi")) &&
          (((col("lon_lo") <= col("lon_hi")) && col("lon").between(col("lon_lo"), col("lon_hi"))) ||
            ((col("lon_lo") > col("lon_hi")) && (col("lon") >= col("lon_lo") || col("lon") <= col("lon_hi")))))
        .select("region_id", "o_orderkey")
    }),

    // zonal statistics: per-region point count + integer-exact value sum
    // with the aggregation PUSHED BELOW the join for interior cells —
    // interior points collapse to per-tile partials before any join, only
    // the boundary shell runs the per-point refine
    "q_zonal_stats" -> ((s, dir) =>
      SpatialJoin.zonalStats(points(s, dir).select("o_orderkey", "lat", "lon"),
        "lat", "lon", "o_orderkey",
        hexPolyTable(s, dir), "region_id", "lats", "lons", level = 6)),

    // geospatial x sketch composition: per-geohash-cell distinct-VISITOR
    // HLL — the mobility cube a 100-TB stack maintains. Exact
    // COUNT(DISTINCT device) shuffles every id under its cell; the
    // register table shuffles <= 256 integer rows per cell whatever the
    // traffic, and cells/days merge by register max. Same exact-integer
    // register contract as q_hll_distinct; exact distinct alongside
    "q_cell_visitors_hll" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      val cells = Tiling.geohashEncode(pts, "lat", "lon", 1, out = "cell")
        .select("cell", "user_id")
      val hll = Sketches.hllStats(cells, Seq("cell"), "user_id")
      val exact = cells.distinct()
        .groupBy("cell").agg(count(lit(1)).as("exact_visitors"))
      hll.join(exact, "cell")
    }),

    // INCREMENTAL sketch maintenance: registers built from the two halves
    // of the corpus SEPARATELY (the daily-batch case), merged by
    // (group, bucket) max, summarized. The oracle recomputes from the FULL
    // table — it does not replay the engine's split, it checks the
    // mergeability CLAIM end-to-end: merged-halves == whole, bit for bit
    "q_hll_merge" -> ((s, dir) => {
      val ev = events(s, dir).select("event_type", "user_id", "event_id")
      val a = Sketches.hllRegisters(ev.where(col("event_id") % 2 === 0),
        Seq("event_type"), "user_id")
      val b = Sketches.hllRegisters(ev.where(col("event_id") % 2 === 1),
        Seq("event_type"), "user_id")
      val merged = a.unionByName(b)
        .groupBy("event_type", "bucket").agg(max("register").as("register"))
      Sketches.hllStatsOfRegisters(merged, Seq("event_type"))
    }),

    // mergeable-sketch cardinality: per-language HyperLogLog over distinct
    // text trigrams, surfaced as EXACT INTEGERS (zero-register count + the
    // 2^24-scaled harmonic numerator) so DuckDB replays the registers
    // bit-for-bit; exact distinct alongside for the accuracy story
    "q_hll_distinct" -> ((s, dir) => {
      val sh = Dedup.shingles(documents(s, dir).select("lang", "text"),
        "lang", "text", n = 3)
      val exact = sh.groupBy("lang").agg(count(lit(1)).as("exact_distinct"))
      exact.join(Sketches.hllStats(sh, Seq("lang"), "shingle"), "lang")
        .select("lang", "exact_distinct", "hll_zeros", "hll_harmonic")
    }),

    // k-minimum-values sketch per language over the same trigram space:
    // the k smallest portable hashes (kmv_filled, kth_min are the integer
    // sketch summary the (k-1)*P/kth_min estimator reads)
    "q_kmv_distinct" -> ((s, dir) =>
      Sketches.kmvStats(
        Sketches.kmvSketch(Dedup.shingles(documents(s, dir).select("lang", "text"),
          "lang", "text", n = 3), Seq("lang"), "shingle", k = KmvK),
        Seq("lang"))
        .select("lang", "kmv_filled", "kth_min")),

    // cross-corpus overlap from sketches alone: for every language pair,
    // the k-min union fill and the in-both match count (matches/k estimates
    // trigram Jaccard without ever joining the corpora)
    "q_kmv_overlap" -> ((s, dir) => {
      import s.implicits._
      val sketch = Sketches.kmvSketch(
        Dedup.shingles(documents(s, dir).select("lang", "text"), "lang", "text", n = 3),
        Seq("lang"), "shingle", k = KmvK)
      Sketches.kmvOverlap(sketch, "lang", KmvLangPairs.toDF("ga", "gb"), k = KmvK)
        .select("ga", "gb", "union_filled", "matches")
    }),

    // count-min frequency sketch over event actors: depth-4 x width-256
    // counters, point-queried for the 20-user probe set; integer counter
    // minima replayed exactly by the oracle
    "q_cms_counts" -> ((s, dir) => {
      val counters = Sketches.cmsCounters(events(s, dir).select("user_id"),
        "user_id", depth = CmsDepth, width = CmsWidth)
      val probes = s.range(0, 20).select(col("id").as("user_id"))
      Sketches.cmsEstimate(counters, probes, "user_id",
        depth = CmsDepth, width = CmsWidth)
        .select("user_id", "est_count")
    }),

    // Bloom-pruned exact semi join: lineitem rows whose part key belongs to
    // a selective part subset; the probabilistic prune runs codegen'd over
    // the scan, the exact pass sees only survivors -> result == plain semi
    // join, oracle-checkable
    "q_bloom_semi" -> ((s, dir) =>
      BloomJoin.prunedSemiJoin(
        lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_partkey"),
        part(s, dir).where(col("p_size") === 1), "l_partkey", "p_partkey")
        .select("l_orderkey", "l_linenumber", "l_partkey")),

    // JSON source: the same documents rows round-tripped through a JSONL
    // fixture and read back with an explicit schema (schema-on-read, no
    // inference job), aggregated per language — the oracle reads the
    // parquet original, so the query proves source-format fidelity
    "q_json_scan" -> ((s, dir) => {
      val json = fixture(dir, "docs_jsonl") { p =>
        documents(s, dir).write.mode("overwrite").json(p)
      }
      val schema = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
      s.read.schema(schema).json(json)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    }),

    // GeoJSON-lines source: the points written as RFC 7946 Point features
    // (one per line) and read back with an explicit schema. Jackson writes
    // shortest-roundtrip doubles, so the oracle — the parquet original —
    // matches every coordinate bit for bit: source-format fidelity proved
    // end to end, no tolerance
    "q_geojson_scan" -> ((s, dir) => {
      val gj = fixture(dir, "points_geojsonl") { p =>
        GeoJson.writePoints(points(s, dir).select("o_orderkey", "lat", "lon"),
          "o_orderkey", "lat", "lon", p)
      }
      GeoJson.readPoints(s, gj)
        .select(element_at(col("props"), "id").cast("long").as("o_orderkey"),
          col("lat"), col("lon"))
    }),

    // time-travel read of the lineage-manifested store: two resumable runs
    // commit the lang partitions (run 1 capped at the 2 lexicographically
    // smallest — the write's documented sorted commit order), and the
    // snapshot read at run 1 must see exactly those, with run 2's
    // partitions invisible
    "q_snapshot_read" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "lang")
      val tmp = java.nio.file.Files.createTempDirectory("graft_snapshot").toString + "/t"
      ResumableWrite.write(docs, tmp, "lang", "run_1", input = dir,
        maxPartitionsThisRun = 2)
      ResumableWrite.write(docs, tmp, "lang", "run_2", input = dir)
      ResumableWrite.readSnapshot(s, tmp, "lang", "run_1").select("doc_id", "lang")
    })
  )

  val oracles: Map[String, String] = Map(


    "q_tile_pyramid" ->
      """SELECT CAST(l.level AS INTEGER) AS level, c.total_points
        |FROM (SELECT unnest(generate_series(2, 6)) AS level) l
        |CROSS JOIN (SELECT count(*) AS total_points FROM orders) c""".stripMargin,

    "q_tile_roundtrip" -> "SELECT o_orderkey FROM orders",

    "q_neighbors" -> "SELECT o_orderkey FROM orders",

    "q_tile_counts" -> "SELECT count(*) AS total_points FROM orders",

    // the zxyAssign arithmetic replayed op for op (explicit lat*pi()/180,
    // ln/tan/cos in the identical order, floor then BIGINT clamp) plus the
    // bit-exact quadkey digits; WebMercatorSpec pins the floor margin
    "q_zxy_tiles" -> {
      val quadkey = (5 to 0 by -1).map(i =>
        s"CAST(((zx >> $i) & 1) + ((zy >> $i) & 1) * 2 AS VARCHAR)").mkString("concat(", ", ", ")")
      s"""WITH pts AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |t AS (SELECT
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) AS zx,
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS zy
         | FROM c)
         |SELECT zx, zy, $quadkey AS quadkey, count(*) AS n FROM t GROUP BY 1, 2, 3""".stripMargin
    },

    // the same zoom-6 arithmetic per snapshot CTE, then a COALESCE'd
    // full-outer count diff — the engine's full_outer join replayed as a
    // two-sided aggregate over the unioned labeled counts
    "q_tile_diff" ->
      s"""WITH a AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |b AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders WHERE o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT ${latSqlFor("(o_orderkey * 7 + 3)")} AS lat,
         |    ${lonSqlFor("(o_orderkey * 7 + 3)")} AS lon FROM orders WHERE o_orderkey % 5 = 0),
         |ta AS (SELECT
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) AS zx,
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS zy,
         |  count(*) AS n FROM a GROUP BY 1, 2),
         |tb AS (SELECT
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) AS zx,
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS zy,
         |  count(*) AS n FROM b GROUP BY 1, 2),
         |u AS (SELECT zx, zy, n AS na, CAST(0 AS BIGINT) AS nb FROM ta
         |  UNION ALL SELECT zx, zy, CAST(0 AS BIGINT) AS na, n AS nb FROM tb)
         |SELECT zx, zy, CAST(sum(na) AS BIGINT) AS n_before, CAST(sum(nb) AS BIGINT) AS n_after,
         |  CAST(sum(nb) - sum(na) AS BIGINT) AS delta
         |FROM u GROUP BY 1, 2 HAVING sum(nb) <> sum(na)""".stripMargin,

    // the same zoom-6 tile arithmetic as q_zxy_tiles, then the 3x3
    // neighborhood as a self-join: x adjacency modulo 64 (wrap), y
    // adjacency by abs (clamp falls out — out-of-range rows don't exist)
    "q_zxy_smooth" ->
      s"""WITH pts AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |g AS (SELECT
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) AS zx,
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS zy
         | FROM c),
         |t AS (SELECT zx, zy, count(*) AS n FROM g GROUP BY 1, 2)
         |SELECT a.zx, a.zy, a.n, CAST(sum(b.n) AS BIGINT) AS n_hood
         |FROM t a JOIN t b
         |  ON ((b.zx - a.zx + 64) % 64) IN (0, 1, 63) AND abs(b.zy - a.zy) <= 1
         |GROUP BY a.zx, a.zy, a.n""".stripMargin,

    // hotspotScores replayed bit for bit: the q_zxy_smooth pipeline, then
    // global moments over occupied tiles and the SAME IEEE expression for
    // gi_z — every operand is an exact integer, so no tolerance is needed
    "q_hotspots" -> {
      val mu = "CAST(sn AS DOUBLE) / CAST(tt AS DOUBLE)"
      val sigma = s"sqrt(CAST(snn AS DOUBLE) / CAST(tt AS DOUBLE) - ($mu) * ($mu))"
      s"""WITH pts AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |g AS (SELECT
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) AS zx,
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS zy
         | FROM c),
         |t AS (SELECT zx, zy, count(*) AS n FROM g GROUP BY 1, 2),
         |h AS (SELECT a.zx, a.zy, a.n, CAST(sum(b.n) AS BIGINT) AS n_hood
         |      FROM t a JOIN t b
         |        ON ((b.zx - a.zx + 64) % 64) IN (0, 1, 63) AND abs(b.zy - a.zy) <= 1
         |      GROUP BY a.zx, a.zy, a.n),
         |s AS (SELECT count(*) AS tt, sum(n) AS sn, sum(n * n) AS snn FROM t)
         |SELECT zx, zy, n, n_hood,
         |  CASE WHEN $sigma = 0 THEN NULL
         |       ELSE (CAST(n_hood AS DOUBLE) - ($mu) * 9.0) / (($sigma) * 3.0) END AS gi_z
         |FROM h CROSS JOIN s""".stripMargin
    },

    // moransI replayed bit for bit: per-tile counts, directed queen
    // adjacency over occupied tiles (x wrap, self excluded), then the SAME
    // IEEE expression I = N·(C − 2mD + m²W) / (W·(S2 − N·m²)) — every
    // operand an exact integer, so no tolerance
    "q_morans_i" -> {
      val mu = "CAST(sn AS DOUBLE) / CAST(nt AS DOUBLE)"
      val num = s"CAST(cc AS DOUBLE) - 2.0 * ($mu) * CAST(d AS DOUBLE) + ($mu) * ($mu) * CAST(we AS DOUBLE)"
      val den = s"CAST(snn AS DOUBLE) - CAST(nt AS DOUBLE) * ($mu) * ($mu)"
      s"""WITH pts AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |g AS (SELECT
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) AS zx,
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS zy
         | FROM c),
         |t AS (SELECT zx, zy, count(*) AS n FROM g GROUP BY 1, 2),
         |e AS (SELECT a.n AS na, b.n AS nb FROM t a JOIN t b
         |      ON ((b.zx - a.zx + 64) % 64) IN (0, 1, 63) AND abs(b.zy - a.zy) <= 1
         |         AND NOT (b.zx = a.zx AND b.zy = a.zy)),
         |s AS (SELECT count(*) AS nt, sum(n) AS sn, sum(n * n) AS snn FROM t),
         |w AS (SELECT count(*) AS we, COALESCE(sum(na * nb), 0) AS cc, COALESCE(sum(na), 0) AS d FROM e)
         |SELECT nt AS n_tiles, we AS w_edges,
         |  CASE WHEN we = 0 OR ($den) = 0.0 THEN NULL
         |       ELSE (CAST(nt AS DOUBLE) * ($num)) / (CAST(we AS DOUBLE) * ($den)) END AS morans_i
         |FROM s CROSS JOIN w""".stripMargin
    },

    // gearysC replayed bit for bit: same grid/adjacency CTEs as q_morans_i
    // plus the D2 = Σ deg_i·n_i² integer sum, then the SAME IEEE expression
    // C = (N−1)·(2D2 − 2C) / (2W·(S2 − N·m²))
    "q_gearys_c" -> {
      val mu = "CAST(sn AS DOUBLE) / CAST(nt AS DOUBLE)"
      val num = s"(CAST(nt AS DOUBLE) - 1.0) * (2.0 * CAST(d2 AS DOUBLE) - 2.0 * CAST(cc AS DOUBLE))"
      val den = s"2.0 * CAST(we AS DOUBLE) * (CAST(snn AS DOUBLE) - CAST(nt AS DOUBLE) * ($mu) * ($mu))"
      s"""WITH pts AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |g AS (SELECT
         |  least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) AS zx,
         |  least(63, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT))) AS zy
         | FROM c),
         |t AS (SELECT zx, zy, count(*) AS n FROM g GROUP BY 1, 2),
         |e AS (SELECT a.n AS na, b.n AS nb FROM t a JOIN t b
         |      ON ((b.zx - a.zx + 64) % 64) IN (0, 1, 63) AND abs(b.zy - a.zy) <= 1
         |         AND NOT (b.zx = a.zx AND b.zy = a.zy)),
         |s AS (SELECT count(*) AS nt, sum(n) AS sn, sum(n * n) AS snn FROM t),
         |w AS (SELECT count(*) AS we, COALESCE(sum(na * nb), 0) AS cc,
         |             COALESCE(sum(na * na), 0) AS d2 FROM e)
         |SELECT nt AS n_tiles, we AS w_edges,
         |  CASE WHEN we = 0 OR ($den) = 0.0 THEN NULL
         |       ELSE ($num) / ($den) END AS gearys_c
         |FROM s CROSS JOIN w""".stripMargin
    },

    // ripleysK replayed: all-pairs integer-meter distances (the
    // q_distance_join brute-force shape), per-radius integer counts, and
    // the identical IEEE k_est expression over the shared sphere-area
    // literal
    "q_ripleys_k" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      val a = SpatialJoin.SphereAreaM2
      val branches = RipleyRadiiM.map(r =>
        s"SELECT CAST($r AS BIGINT) AS r_m, (SELECT count(*) FROM d WHERE dm <= $r) AS n_pairs")
        .mkString("\n|", "\n|UNION ALL\n|", "")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |d AS (SELECT CAST(round($d) AS BIGINT) AS dm
         |      FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey),
         |n AS (SELECT count(*) AS nn FROM pts),
         |c AS ($branches)
         |SELECT r_m, n_pairs,
         |  (CAST('$a' AS DOUBLE) * 2.0 * CAST(n_pairs AS DOUBLE)) /
         |  (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) AS k_est
         |FROM c CROSS JOIN n""".stripMargin
    },

    // geohashEncode replayed bit for bit: same floor arithmetic (pure IEEE
    // +, /, * by a power of two — no transcendentals, so no margin needed),
    // same static lon-first bit interleave, same base-32 alphabet lookup
    "q_geohash" ->
      s"""WITH pts AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |idx AS (SELECT ${geohashIdxSql(5)} FROM pts)
         |SELECT ${geohashCharsSql(5)} AS geohash, count(*) AS n FROM idx GROUP BY 1""".stripMargin,

    // hexBin replayed op for op: same axial constants (CAST from the
    // shortest round-trip decimal — identical doubles), same explicit
    // floor(x + 0.5) rounding, same cube-repair CASEs
    "q_hex_bin" -> {
      val c1 = s"CAST('${Tiling.HexC1}' AS DOUBLE)"
      val c2 = s"CAST('${Tiling.HexC2}' AS DOUBLE)"
      val c3 = s"CAST('${Tiling.HexC3}' AS DOUBLE)"
      s"""WITH pts AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |f AS (SELECT ($c1 * lon - $c2 * lat) / 2.5 AS qf, ($c3 * lat) / 2.5 AS rf FROM pts),
         |g AS (SELECT qf, rf, -qf - rf AS yf,
         |        CAST(floor(qf + 0.5) AS BIGINT) AS rx,
         |        CAST(floor(-qf - rf + 0.5) AS BIGINT) AS ry,
         |        CAST(floor(rf + 0.5) AS BIGINT) AS rz FROM f),
         |h AS (SELECT rx, ry, rz,
         |        abs(CAST(rx AS DOUBLE) - qf) AS dx,
         |        abs(CAST(ry AS DOUBLE) - yf) AS dy,
         |        abs(CAST(rz AS DOUBLE) - rf) AS dz FROM g),
         |a AS (SELECT
         |        CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS hex_q,
         |        CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
         |             THEN -rx - ry ELSE rz END AS hex_r FROM h)
         |SELECT hex_q, hex_r, count(*) AS n FROM a GROUP BY 1, 2""".stripMargin
    },

    // the hexBin CTE pipeline, then the 7-cell ring as an integer
    // adjacency self-join (the six axial offsets + self)
    "q_hex_ring" -> {
      val c1 = s"CAST('${Tiling.HexC1}' AS DOUBLE)"
      val c2 = s"CAST('${Tiling.HexC2}' AS DOUBLE)"
      val c3 = s"CAST('${Tiling.HexC3}' AS DOUBLE)"
      s"""WITH pts AS (SELECT $LatSql AS lat, $LonSql AS lon FROM orders),
         |f AS (SELECT ($c1 * lon - $c2 * lat) / 2.5 AS qf, ($c3 * lat) / 2.5 AS rf FROM pts),
         |g AS (SELECT qf, rf, -qf - rf AS yf,
         |        CAST(floor(qf + 0.5) AS BIGINT) AS rx,
         |        CAST(floor(-qf - rf + 0.5) AS BIGINT) AS ry,
         |        CAST(floor(rf + 0.5) AS BIGINT) AS rz FROM f),
         |h AS (SELECT rx, ry, rz,
         |        abs(CAST(rx AS DOUBLE) - qf) AS dx,
         |        abs(CAST(ry AS DOUBLE) - yf) AS dy,
         |        abs(CAST(rz AS DOUBLE) - rf) AS dz FROM g),
         |a AS (SELECT
         |        CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS hex_q,
         |        CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
         |             THEN -rx - ry ELSE rz END AS hex_r FROM h),
         |t AS (SELECT hex_q, hex_r, count(*) AS n FROM a GROUP BY 1, 2)
         |SELECT x.hex_q, x.hex_r, x.n, CAST(sum(y.n) AS BIGINT) AS n_ring
         |FROM t x JOIN t y
         |  ON (y.hex_q - x.hex_q, y.hex_r - x.hex_r) IN
         |     ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1))
         |GROUP BY x.hex_q, x.hex_r, x.n""".stripMargin
    },

    // the pruned prefix read, replayed as a full recompute + LIKE filter
    "q_geohash_scan" ->
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |idx AS (SELECT o_orderkey, ${geohashIdxSql(6)} FROM pts),
         |g AS (SELECT o_orderkey, ${geohashCharsSql(6)} AS geohash FROM idx)
         |SELECT o_orderkey, geohash FROM g WHERE geohash LIKE '7%'""".stripMargin,

    // the polyfill-pruned read must equal the plain rect filter
    "q_geohash_region" -> {
      val (_, latLo, latHi, lonLo, lonHi) = SparkEntryRegions.rectBounds.head
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders)
         |SELECT o_orderkey FROM pts
         |WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
    },

    // geohashTrend replayed exactly: same window bounds, conditional sums,
    // and the identical integer-ratio expression
    // the same per-tile max timestamp, frontier, and integer day gap
    "q_stale_tiles" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val n = 64
      s"""WITH pts AS (SELECT ts, $evLat AS lat, $evLon AS lon FROM events),
         |t AS (SELECT zx, zy, CAST(count(*) AS BIGINT) AS n,
         |    CAST(max(epoch_us(ts)) AS BIGINT) AS last_us FROM (SELECT ts,
         |  least(${n - 1}, greatest(0, CAST(floor((lon + 180.0) / 360.0 * $n.0) AS BIGINT))) AS zx,
         |  least(${n - 1}, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * $n.0) AS BIGINT))) AS zy
         | FROM pts) g GROUP BY 1, 2),
         |f AS (SELECT max(last_us) AS front FROM t)
         |SELECT t.zx, t.zy, t.n, t.last_us,
         |  CAST(f.front // 86400000000 - t.last_us // 86400000000 AS BIGINT) AS silent_days
         |FROM t, f
         |WHERE f.front // 86400000000 - t.last_us // 86400000000 > 10""".stripMargin
    },

    // the same dilation + grid anti-join in SQL (range() cross join grid)
    "q_coverage_gaps" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val n = 128
      s"""WITH pts AS (SELECT $evLat AS lat, $evLon AS lon FROM events),
         |t AS (SELECT DISTINCT
         |  least(${n - 1}, greatest(0, CAST(floor((lon + 180.0) / 360.0 * $n.0) AS BIGINT))) AS zx,
         |  least(${n - 1}, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * $n.0) AS BIGINT))) AS zy
         | FROM pts),
         |o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
         |dil AS (SELECT DISTINCT (t.zx + o.dx + $n) % $n AS zx, t.zy + o.dy AS zy FROM t, o
         |        WHERE t.zy + o.dy >= 0 AND t.zy + o.dy < $n),
         |grid AS (SELECT x.range AS zx, y.range AS zy FROM range($n) x, range($n) y)
         |SELECT g.zx, g.zy FROM grid g
         |LEFT JOIN dil d ON d.zx = g.zx AND d.zy = g.zy WHERE d.zx IS NULL""".stripMargin
    },

    // the same bottom-up promotion unrolled: per level, parents with all
    // 4 children present promote, survivors emit — pure integer div-2
    // arithmetic
    "q_compact_coverage" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val (z, n) = (5, 32)
      val rounds = (z to 1 by -1).map { l =>
        s""",
           |f$l AS (SELECT zx // 2 AS pzx, zy // 2 AS pzy FROM c$l
           |  GROUP BY 1, 2 HAVING count(*) = 4),
           |e$l AS (SELECT $l AS zoom, c.zx, c.zy FROM c$l c
           |  LEFT JOIN f$l f ON f.pzx = c.zx // 2 AND f.pzy = c.zy // 2
           |  WHERE f.pzx IS NULL),
           |c${l - 1} AS (SELECT pzx AS zx, pzy AS zy FROM f$l)""".stripMargin
      }.mkString
      val union = ((z to 1 by -1).map(l => s"SELECT * FROM e$l") :+
        "SELECT 0 AS zoom, zx, zy FROM c0").mkString("\nUNION ALL\n")
      s"""WITH pts AS (SELECT $evLat AS lat, $evLon AS lon FROM events),
         |c$z AS (SELECT DISTINCT
         |  least(${n - 1}, greatest(0, CAST(floor((lon + 180.0) / 360.0 * $n.0) AS BIGINT))) AS zx,
         |  least(${n - 1}, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * $n.0) AS BIGINT))) AS zy
         | FROM pts)$rounds
         |SELECT CAST(zoom AS INTEGER) AS zoom, zx, zy FROM ($union) t""".stripMargin
    },

    // the zoom-4 replay + the same scatter, zero-pad, and list-median
    // arithmetic — every comparison an exact integer
    "q_tile_outliers" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      val n = 16
      s"""WITH pts AS (SELECT $evLat AS lat, $evLon AS lon FROM events),
         |t AS (SELECT zx, zy, CAST(count(*) AS BIGINT) AS n FROM (SELECT
         |  least(${n - 1}, greatest(0, CAST(floor((lon + 180.0) / 360.0 * $n.0) AS BIGINT))) AS zx,
         |  least(${n - 1}, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * $n.0) AS BIGINT))) AS zy
         | FROM pts) g GROUP BY 1, 2),
         |o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
         |sc AS (SELECT (t.zx + o.dx + $n) % $n AS zx2, t.zy + o.dy AS zy2, t.n FROM t, o
         |       WHERE t.zy + o.dy >= 0 AND t.zy + o.dy < $n),
         |nb AS (SELECT zx2 AS zx, zy2 AS zy, list(n) AS vs FROM sc GROUP BY 1, 2),
         |j AS (SELECT t.zx, t.zy, t.n, COALESCE(nb.vs, []) AS vs,
         |        CASE WHEN t.zy = 0 OR t.zy = ${n - 1} THEN 5 ELSE 8 END AS nv
         |      FROM t LEFT JOIN nb ON nb.zx = t.zx AND nb.zy = t.zy),
         |p AS (SELECT zx, zy, n, nv, list_sort(list_concat(vs,
         |        list_transform(range(nv - len(vs)), x -> CAST(0 AS BIGINT)))) AS ps FROM j),
         |m AS (SELECT zx, zy, n, nv, ps, ps[(nv+1)//2] AS med FROM p),
         |q AS (SELECT zx, zy, n, med,
         |        list_sort(list_transform(ps, x -> abs(x - med)))[(nv+1)//2] AS mad FROM m)
         |SELECT zx, zy, n, med, mad FROM q WHERE abs(n - med) > 3*mad""".stripMargin
    },

    // the zoom-3 zxy replay + the same zero-fill index arithmetic on the
    // sorted present-hour counts; every gate comparison an exact integer
    "q_tile_anomaly" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      s"""WITH pts AS (SELECT hour(ts) AS hour, $evLat AS lat, $evLon AS lon FROM events),
         |t AS (SELECT CAST(hour AS BIGINT) AS hour,
         |  least(7, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 8.0) AS BIGINT))) AS zx,
         |  least(7, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)
         |    + 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * 8.0) AS BIGINT))) AS zy
         | FROM pts),
         |c AS (SELECT zx, zy, hour, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1, 2, 3),
         |m AS (SELECT zx, zy, list(n ORDER BY n) AS l, len(list(n)) AS k FROM c GROUP BY 1, 2),
         |m2 AS (SELECT zx, zy,
         |  CAST(CASE WHEN 24 - k > 11 THEN 0 ELSE l[12 - (24 - k)] END AS BIGINT) AS med FROM m)
         |SELECT c.zx, c.zy, c.hour, c.n, m2.med,
         |  CASE WHEN c.n > 2 * m2.med THEN 'spike'
         |       WHEN 2 * c.n < m2.med THEN 'quiet' END AS flag
         |FROM c JOIN m2 USING (zx, zy)
         |WHERE c.n > 2 * m2.med OR 2 * c.n < m2.med""".stripMargin
    },

    // geohashTimeCube replayed exactly: transcendental-free geohash keys,
    // date_trunc hour, min/max value (order-independent exact), native
    // GROUP BY CUBE on both sides
    "q_st_cube" -> {
      val evLat = latSqlFor("event_id")
      val evLon = lonSqlFor("event_id")
      s"""WITH e AS (SELECT $evLat AS lat, $evLon AS lon, ts, value FROM events),
         |idx AS (SELECT ${geohashIdxSql(3)}, ts, value FROM e),
         |g AS (SELECT ${geohashCharsSql(3)} AS geohash,
         |        date_trunc('hour', ts) AS hour, value FROM idx)
         |SELECT geohash, hour, count(*) AS n, min(value) AS min_v, max(value) AS max_v
         |FROM g GROUP BY CUBE (geohash, hour)""".stripMargin
    },

    "q_clustered_scan" -> {
      val (_, latLo, latHi, lonLo, lonHi) = SparkEntryRegions.rectBounds.head // r_europe
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders)
         |SELECT o_orderkey FROM pts
         |WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
    },

    // the layout cannot change the answer: a plain conjunctive range scan
    "q_zorder_scan" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_totalprice BETWEEN 100000.0 AND 200000.0
        |  AND o_custkey BETWEEN 1 AND 3000""".stripMargin,

    // min-label connected components as a recursive CTE over the
    // symmetric overlap closure (the q_dbscan pattern), singletons glued
    // back as their own blob
    "q_dissolve" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH RECURSIVE
         |pts AS (SELECT s_suppkey AS id, ${latSqlFor("s_suppkey")} AS lat,
         |  ${lonSqlFor("s_suppkey")} AS lon FROM supplier),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         |  FROM pts a JOIN pts b ON a.id < b.id WHERE $d <= 600000.0),
         |e AS (SELECT id_a AS s, id_b AS dd FROM p UNION SELECT id_b, id_a FROM p),
         |reach(src, dst) AS (
         |  SELECT s, s FROM e
         |  UNION
         |  SELECT r.src, e.dd FROM reach r JOIN e ON e.s = r.dst),
         |cc AS (SELECT src AS id, min(dst) AS blob_id FROM reach GROUP BY src)
         |SELECT id, blob_id FROM cc
         |UNION ALL
         |SELECT id, id FROM pts WHERE id NOT IN (SELECT s FROM e)""".stripMargin
    },

    // the same two-level floor-rank arithmetic in window form (the oracle
    // may use the single-task windows the engine avoids)
    "q_str_partition" ->
      s"""WITH pts AS (SELECT o_orderkey AS id, $LatSql AS lat, $LonSql AS lon FROM orders),
         |r1 AS (SELECT id, lat, row_number() OVER (ORDER BY lon, id) AS r,
         |  count(*) OVER () AS n FROM pts),
         |s AS (SELECT id, lat, CAST(((r - 1) * 8) // n AS BIGINT) AS tx FROM r1),
         |r2 AS (SELECT id, tx, row_number() OVER (PARTITION BY tx ORDER BY lat, id) AS r,
         |  count(*) OVER (PARTITION BY tx) AS m FROM s)
         |SELECT id, tx, CAST(((r - 1) * 4) // m AS BIGINT) AS ty FROM r2""".stripMargin,

    // idwInterpolate replayed bit for bit: identical planar d2 arithmetic
    // (pure +,-,*,/ — no transcendentals), identical (d2, v, id) sort
    // order, identical left fold (list_reduce starts at the first term;
    // Spark starts at 0.0 — IEEE-equal since 0.0 + x == x)
    "q_idw" -> {
      val c = "0.7071067811865476" // SpatialJoin.IdwLonScale, same literal
      s"""WITH s AS (SELECT c_custkey AS id, CAST(c_custkey % 97 AS DOUBLE) AS v,
         |            $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |q AS (SELECT s_suppkey AS qid, ${latSqlFor("s_suppkey")} AS qlat,
         |            ${lonSqlFor("s_suppkey")} AS qlon FROM supplier),
         |p AS (SELECT q.qid, s.v, s.id,
         |        (q.qlat - s.lat) * (q.qlat - s.lat)
         |        + (least(abs(q.qlon - s.lon), 360.0 - abs(q.qlon - s.lon)) * $c)
         |        * (least(abs(q.qlon - s.lon), 360.0 - abs(q.qlon - s.lon)) * $c) AS d2
         |      FROM q, s),
         |f AS (SELECT * FROM p WHERE d2 > 0.0 AND d2 <= 100.0),
         |g AS (SELECT qid, count(*) AS n_neighbors,
         |        list(v / d2 ORDER BY d2, v, id) AS nums,
         |        list(CAST(1.0 AS DOUBLE) / d2 ORDER BY d2, v, id) AS dens
         |      FROM f GROUP BY qid)
         |SELECT qid, n_neighbors,
         |  list_reduce(nums, (a, b) -> a + b) / list_reduce(dens, (a, b) -> a + b) AS est
         |FROM g""".stripMargin
    },

    // the same rect-bound arithmetic and wrap-aware containment, brute
    // force over all (region, point) pairs
    "q_rasterize" ->
      s"""WITH r AS (SELECT CAST(n_nationkey AS BIGINT) AS region_id,
         |  -66.005 + CAST(n_nationkey % 5 AS DOUBLE) * 24.0 AS lat_lo,
         |  -66.005 + CAST(n_nationkey % 5 AS DOUBLE) * 24.0 + 10.0 AS lat_hi,
         |  -175.005 + CAST(n_nationkey AS DOUBLE) * 14.0 AS lon_lo,
         |  CASE WHEN -175.005 + CAST(n_nationkey AS DOUBLE) * 14.0 + 25.0 > 180.0
         |    THEN -175.005 + CAST(n_nationkey AS DOUBLE) * 14.0 + 25.0 - 360.0
         |    ELSE -175.005 + CAST(n_nationkey AS DOUBLE) * 14.0 + 25.0 END AS lon_hi
         |  FROM nation),
         |pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders)
         |SELECT region_id, o_orderkey FROM r, pts
         |WHERE lat BETWEEN lat_lo AND lat_hi
         |  AND ((lon_lo <= lon_hi AND lon BETWEEN lon_lo AND lon_hi)
         |    OR (lon_lo > lon_hi AND (lon >= lon_lo OR lon <= lon_hi)))""".stripMargin,

    // merge simulated in SQL: base rows whose key is NOT updated, plus the
    // updated rows, plus the inserts — lat/lon are pure integer-rational
    // arithmetic (no trig), so Spark and DuckDB produce bit-identical
    // doubles
    "q_merge_upsert" ->
      s"""WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         |    $LatSql AS lat, $LonSql AS lon FROM orders),
         |upd AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         |    ${latSqlFor("(o_orderkey * 3 + 1)")} AS lat,
         |    ${lonSqlFor("(o_orderkey * 3 + 1)")} AS lon
         |  FROM orders WHERE o_orderkey % 7 = 0),
         |ins AS (SELECT CAST(o_orderkey + 1000000000 AS BIGINT) AS o_orderkey,
         |    ${latSqlFor("(o_orderkey * 5 + 2)")} AS lat,
         |    ${lonSqlFor("(o_orderkey * 5 + 2)")} AS lon
         |  FROM orders WHERE o_orderkey % 11 = 0)
         |SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
         |UNION ALL SELECT * FROM upd
         |UNION ALL SELECT * FROM ins""".stripMargin,

    // run 1 committed the 2 lexicographically smallest lang partitions
    "q_snapshot_read" ->
      """SELECT doc_id, lang FROM documents
        |WHERE lang IN (SELECT lang FROM (
        |  SELECT DISTINCT lang FROM documents ORDER BY lang LIMIT 2))""".stripMargin,

    // compaction changes the file layout, never the rows
    "q_compact_scan" ->
      s"""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         |  $LatSql AS lat, $LonSql AS lon FROM orders""".stripMargin,

    // coordinate/id fidelity through the GeoJSON-lines roundtrip: the
    // oracle reads the parquet original — exact, no tolerance
    "q_geojson_scan" ->
      s"SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders",

    // q_poly_table_join's membership rows grouped per region: count +
    // integer-exact key sum (the interior-pushdown plan changes the
    // shuffle, never the rows)
    "q_zonal_stats" -> {
      val branches = HexPolys.map { case (k, verts, center) =>
        s"""SELECT CAST($k AS BIGINT) AS region_id, o_orderkey FROM xyz
           | WHERE ${convexLoopSql(verts, center)}""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts),
         |hits AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT region_id, count(*) AS n_points,
         |  CAST(sum(o_orderkey) AS BIGINT) AS sum_value
         |FROM hits GROUP BY region_id""".stripMargin
    },

    // HLL registers replayed literally: same portable hash fold, bucket =
    // h mod 256, rank = 1 + leading zeros of the 23-bit remainder (exact
    // via bin()-length, the same derivation the engine uses), harmonic
    // numerator as an exact integer — no floating estimate crosses the gate
    // the bit-exact geohash-1 interleave feeding the same register replay
    // as q_hll_distinct, keyed by cell; the value hash folds the DECIMAL
    // string of user_id on both sides (Spark's long->string cast == CAST
    // AS VARCHAR)
    "q_cell_visitors_hll" ->
      s"""WITH pts AS (SELECT user_id, ${latSqlFor("event_id")} AS lat,
         |  ${lonSqlFor("event_id")} AS lon FROM events),
         |idx AS (SELECT user_id, ${geohashIdxSql(1)} FROM pts),
         |cells AS (SELECT ${geohashCharsSql(1)} AS cell, user_id FROM idx),
         |vals AS (SELECT DISTINCT cell, CAST(user_id AS VARCHAR) AS v FROM cells),
         |hashed AS (SELECT cell, $SketchValueHashSql AS h FROM vals),
         |fin AS (SELECT cell, ${Sketches.finalizeSqlOf("h")} AS h FROM hashed),
         |regs AS (SELECT cell, h % 256 AS bucket,
         |  max(CASE WHEN h // 256 = 0 THEN 24 ELSE 24 - length(bin(h // 256)) END) AS register
         |  FROM fin GROUP BY 1, 2),
         |hstats AS (SELECT cell, 256 - count(*) AS hll_zeros,
         |  CAST(sum(CAST(pow(2, 24 - register) AS BIGINT))
         |    + (256 - count(*)) * 16777216 AS BIGINT) AS hll_harmonic
         |  FROM regs GROUP BY 1),
         |ex AS (SELECT cell, count(DISTINCT user_id) AS exact_visitors FROM cells GROUP BY 1)
         |SELECT ex.cell, hstats.hll_zeros, hstats.hll_harmonic, ex.exact_visitors
         |FROM ex JOIN hstats ON ex.cell = hstats.cell""".stripMargin,

    // FULL-table register replay against the engine's split-then-merge —
    // the mergeability claim is the thing under test
    "q_hll_merge" ->
      s"""WITH vals AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS v FROM events),
         |hashed AS (SELECT event_type, $SketchValueHashSql AS h FROM vals),
         |fin AS (SELECT event_type, ${Sketches.finalizeSqlOf("h")} AS h FROM hashed),
         |regs AS (SELECT event_type, h % 256 AS bucket,
         |  max(CASE WHEN h // 256 = 0 THEN 24 ELSE 24 - length(bin(h // 256)) END) AS register
         |  FROM fin GROUP BY 1, 2)
         |SELECT event_type, 256 - count(*) AS hll_zeros,
         |  CAST(sum(CAST(pow(2, 24 - register) AS BIGINT))
         |    + (256 - count(*)) * 16777216 AS BIGINT) AS hll_harmonic
         |FROM regs GROUP BY 1""".stripMargin,

    "q_hll_distinct" ->
      s"""WITH $SketchHashCte,
         |regs AS (SELECT lang, h % 256 AS bucket,
         |  max(CASE WHEN h // 256 = 0 THEN 24 ELSE 24 - length(bin(h // 256)) END) AS register
         |  FROM sfin GROUP BY 1, 2),
         |hstats AS (SELECT lang, 256 - count(*) AS hll_zeros,
         |  CAST(sum(CAST(pow(2, 24 - register) AS BIGINT))
         |    + (256 - count(*)) * 16777216 AS BIGINT) AS hll_harmonic
         |  FROM regs GROUP BY 1),
         |ex AS (SELECT lang, count(DISTINCT shingle) AS exact_distinct FROM stri GROUP BY 1)
         |SELECT ex.lang, ex.exact_distinct, hstats.hll_zeros, hstats.hll_harmonic
         |FROM ex JOIN hstats ON ex.lang = hstats.lang""".stripMargin,

    // k smallest distinct hashes per language, ranked identically (hashes
    // are distinct within a language, so the order-by is tie-free)
    "q_kmv_distinct" ->
      s"""WITH $SketchHashCte,
         |ranked AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rnk
         |  FROM (SELECT DISTINCT lang, h FROM sfin) t)
         |SELECT lang, count(*) AS kmv_filled, max(h) AS kth_min
         |FROM ranked WHERE rnk <= $KmvK GROUP BY lang""".stripMargin,

    // the k-min-of-union intersection estimator replayed on the same kept
    // sets for the same literal language pairs
    "q_kmv_overlap" -> {
      val pairValues = KmvLangPairs.map { case (a, b) => s"('$a', '$b')" }.mkString(", ")
      s"""WITH $SketchHashCte,
         |ranked AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rnk
         |  FROM (SELECT DISTINCT lang, h FROM sfin) t),
         |kept AS (SELECT lang, h FROM ranked WHERE rnk <= $KmvK),
         |pairs AS (SELECT * FROM (VALUES $pairValues) p(ga, gb)),
         |u AS (SELECT p.ga, p.gb, k.h,
         |  max(CASE WHEN k.lang = p.ga THEN 1 ELSE 0 END) AS in_a,
         |  max(CASE WHEN k.lang = p.gb THEN 1 ELSE 0 END) AS in_b
         |  FROM pairs p JOIN kept k ON k.lang = p.ga OR k.lang = p.gb GROUP BY 1, 2, 3),
         |r AS (SELECT u.*, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rnk2 FROM u)
         |SELECT ga, gb, count(*) AS union_filled, CAST(sum(in_a * in_b) AS BIGINT) AS matches
         |FROM r WHERE rnk2 <= $KmvK GROUP BY 1, 2""".stripMargin
    },

    // count-min counters rebuilt cell by cell with the shared affine
    // family, probes point-queried with the same min-over-rows
    "q_cms_counts" -> {
      val P = Dedup.HashP
      def cellRows(src: String, hCol: String, extra: String) =
        (0 until CmsDepth).map { i =>
          val (a, b) = Dedup.gCoeffs(i)
          s"SELECT $extra$i AS r, (($a * $hCol + $b) % $P) % $CmsWidth AS c FROM $src"
        }.mkString("\nUNION ALL\n")
      s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
         |evh AS (SELECT $SketchValueHashSql AS h FROM ev),
         |cells AS (${cellRows("evh", "h", "")}),
         |counters AS (SELECT r, c, count(*) AS cnt FROM cells GROUP BY 1, 2),
         |probes AS (SELECT range AS user_id, CAST(range AS VARCHAR) AS v FROM range(0, 20)),
         |ph AS (SELECT user_id, $SketchValueHashSql AS h FROM probes),
         |pcells AS (${cellRows("ph", "h", "user_id, ")})
         |SELECT p.user_id, min(c2.cnt) AS est_count
         |FROM pcells p JOIN counters c2 ON p.r = c2.r AND p.c = c2.c
         |GROUP BY 1""".stripMargin
    },

    // the Bloom prune is cost-only: the exact pass makes the result a
    // plain semi join
    "q_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)""".stripMargin,

    // the skipping index is exact by construction: same rows as the
    // plain IN filter (absent probe keys return nothing)
    "q_bloom_index_scan" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE doc_id IN (${BloomIndexProbeKeys.mkString(", ")})""".stripMargin,

    // oracle reads the parquet original: the JSONL round trip must not
    // change a single aggregated value
    "q_json_scan" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY lang""".stripMargin
  )
}
