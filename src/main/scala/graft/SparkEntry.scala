package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.s2functions._
import graft.operators._
import graft.s2.{S2LatLngRect, S2Region, R1Interval, S1Interval}
import graft.sources.GeoJson

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md section 2), with DuckDB oracle SQL wherever the semantics are
  * ANSI-SQL-expressible; geometry-kernel conformance beyond SQL reach is
  * covered bit-for-bit by the ScalaTest suite against the reference's
  * golden vectors. */
object SparkEntry {

  /** Deterministic lat/lon derivation from an integer key — the ONE
    * definition of the synthetic-coordinate arithmetic, shared by every
    * Spark query and DuckDB oracle (and by the specs, so they cannot
    * drift). */
  private[graft] def latSqlFor(key: String): String =
    s"CAST(($key * 9973 + 12345) % 18000 AS DOUBLE) / CAST(100 AS DOUBLE) - CAST(90 AS DOUBLE)"
  private[graft] def lonSqlFor(key: String): String =
    s"CAST(($key * 31337 + 54321) % 36000 AS DOUBLE) / CAST(100 AS DOUBLE) - CAST(180 AS DOUBLE)"

  private val LatSql = latSqlFor("o_orderkey")
  private val LonSql = lonSqlFor("o_orderkey")

  /** Fixed BM25 query set (terms from the synthetic corpus vocabulary) —
    * one definition shared by q_bm25 and its oracle SQL. */
  private val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join"),
    1L -> Seq("window", "batch"),
    2L -> Seq("customer", "merge", "slow"))

  /** KMV sketch size and the fixed language-pair probe set of
    * q_kmv_overlap (the harness corpus languages; literal, like
    * [[Bm25Queries]], so the oracle can inline the same pairs). */
  private val KmvK = 128
  private val KmvLangs = Seq("de", "en", "es", "fr", "zh")
  private val KmvLangPairs: Seq[(String, String)] =
    for { a <- KmvLangs; b <- KmvLangs if a < b } yield (a, b)

  /** Count-min geometry of q_cms_counts, shared with its oracle. */
  private val CmsDepth = 4
  private val CmsWidth = 256

  /** DuckDB replay of `Tiling.geohashEncode`'s axis indices: emits
    * `... AS li, ... AS ti` over columns named lat/lon. Pure floor
    * arithmetic, so the replay is bit-exact at any precision. */
  private def geohashIdxSql(precision: Int): String = {
    val total = 5 * precision
    val lonBits = (total + 1) / 2
    val latBits = total / 2
    s"""least(${(1L << lonBits) - 1}, greatest(0,
       |    CAST(floor((lon + 180.0) / 360.0 * ${(1L << lonBits).toDouble}) AS BIGINT))) AS li,
       |  least(${(1L << latBits) - 1}, greatest(0,
       |    CAST(floor((lat + 90.0) / 180.0 * ${(1L << latBits).toDouble}) AS BIGINT))) AS ti""".stripMargin
  }

  /** The matching base-32 char interleave over the li/ti columns. */
  private def geohashCharsSql(precision: Int): String = {
    val total = 5 * precision
    val lonBits = (total + 1) / 2
    val latBits = total / 2
    (0 until precision).map { c =>
      val bits = (0 until 5).map { t =>
        val j = 5 * c + t
        val (axis, bit) =
          if (j % 2 == 0) ("li", lonBits - 1 - j / 2) else ("ti", latBits - 1 - j / 2)
        s"((($axis >> $bit) & 1) << ${4 - t})"
      }.mkString(" + ")
      s"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST($bits AS INTEGER) + 1, 1)"
    }.mkString("concat(", ", ", ")")
  }

  /** The q_geo_image_neardup population: originals, colocated patched
    * copies (key % 40, +1e8), antipodally-relocated byte copies
    * (key % 60, +4e8 — dhash hamming 0 but never spatially adjacent).
    * ONE definition shared by the catalog query and
    * GeoImageNearDupSpec's oracle-precondition checks, so the certified
    * population can never drift from the queried one. */
  private[graft] def geoImagePopulation(keys: DataFrame): DataFrame = {
    val images = ImagePayload.synthesize(keys, "p_partkey")
    val key = col("p_partkey")
    val planted = ImagePayload.withPatch(images.where(key % 40 === 0), 2, 2, 1)
      .withColumn("p_partkey", key + 100000000L)
    val far = images.where(key % 60 === 0)
      .withColumn("p_partkey", key + 400000000L)
      .withColumn("lat", -col("lat"))
      .withColumn("lon",
        when(col("lon") >= 0, col("lon") - lit(180.0)).otherwise(col("lon") + lit(180.0)))
    images.unionByName(planted).unionByName(far)
  }

  /** DuckDB replay of [[Dedup.portableHashOf]] for a FIXED-length string
    * expression: the stepwise (h*131 + codepoint) mod P fold, unrolled.
    * Base-32 geohash chars are ASCII, so `ascii()` == the code point. */
  private def portableHashSql(strExpr: String, len: Int): String =
    (1 to len).foldLeft("0") { (acc, i) =>
      s"(($acc) * 131 + ascii(substr($strExpr, $i, 1))) % ${Dedup.HashP}"
    }

  private[graft] def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")

  private[graft] def points(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .withColumn("lat", expr(LatSql))
      .withColumn("lon", expr(LonSql))

  private def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  private def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  private def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  private def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  private def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  private def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
  private def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Embedding dimensionality of the harness tables (all scale factors) —
    * threaded into the ANN operators so no query fires a driver-side
    * `head()` job just to discover the vector width. */
  private val EmbeddingDim = 64

  /** Ripley's-K radii of q_ripleys_k (meters), shared with the oracle. */
  private val RipleyRadiiM: Seq[Long] = Seq(125000L, 250000L, 500000L, 1000000L)

  /** Shared oracle of q_poly_table_join and its GeoJSON-driven twin
    * q_geojson_poly_join (the roundtrip preserves every coordinate bit,
    * so the same inlined edge-plane SQL answers both). */
  private lazy val PolyTableOracleSql: String = {
    val branches = HexPolys.map { case (k, verts, center) =>
      s"""SELECT CAST($k AS BIGINT) AS region_id, o_orderkey FROM xyz
         | WHERE ${convexLoopSql(verts, center)}""".stripMargin
    }
    s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
       |xyz AS (SELECT o_orderkey,
       |  cos(radians(lat))*cos(radians(lon)) AS px,
       |  cos(radians(lat))*sin(radians(lon)) AS py,
       |  sin(radians(lat)) AS pz FROM pts)
       |${branches.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Variance-of-Laplacian gate for q_image_sharpness, in (integer-luma)²
    * units (luma = 299r+587g+114b). Pinned between the measured
    * populations — sharp independent-pixel noise ~5e10, bilinear low-pass
    * copies orders of magnitude below — with >= 4x clearance on both
    * sides (ImageSharpnessSpec). */
  val SharpnessThreshold: Double = 3e9

  /** Colorfulness gate threshold: gray rasters score exactly 0, the
    * synthetic noise population ~150 (margin spec-pinned). */
  val ColorfulnessThreshold: Double = 10.0

  /** Build-once fixture for queries whose point is the READ path over a
    * persisted layout (clustered table, IVF index): the layout is written
    * the first time a query needs it for a given sf dir and reused after,
    * so benchmark timings measure the pruned scan — not a re-write of the
    * storage it scans (round-2 verdict: q_clustered_scan's bench entry
    * measured write+read). Inputs are deterministic per dir, so presence
    * of the marker is a sufficient validity check. */
  private def fixture(dir: String, name: String)(build: String => Unit): String = {
    // FixtureVersion is part of the path: bump it whenever a fixture's
    // layout or producing code changes, or a stale /tmp fixture from an
    // earlier build would silently feed the new reader
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${FixtureVersion}_${new java.io.File(dir).getName}"
    val marker = new java.io.File(path, "_GRAFT_FIXTURE_READY")
    this.synchronized {
      if (!marker.exists()) { build(path); marker.createNewFile() }
    }
    path
  }

  private val FixtureVersion = "r3a"

  /** q_bloom_index_scan probe set: seven present doc ids + two absent
    * ones (the absent probes prove Bloom false positives never become
    * result rows — only possibly extra files). Shared verbatim by the
    * oracle's IN list. */
  private val BloomIndexProbeKeys: Seq[Long] =
    Seq(3L, 57L, 111L, 222L, 333L, 444L, 499L, 100001L, 999999L)

  /** PageRank oracle (shared by q_pagerank and q_pagerank_resume): the 3
    * rounds unrolled as CTEs in the identical scaled integer arithmetic. */
  private lazy val PageRankOracleSql: String = {
    val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
    val round = (i: Int) =>
      s"""s$i AS (SELECT a.dst AS id, sum(r.pr // d.deg) AS s FROM adj a
         |  JOIN deg d ON a.src = d.src JOIN r${i - 1} r ON r.id = a.src GROUP BY 1),
         |r$i AS (SELECT d.src AS id,
         |  CAST(150000000000 + (coalesce(s.s, 0) * 17) // 20 AS BIGINT) AS pr
         |  FROM deg d LEFT JOIN s$i s ON s.id = d.src)""".stripMargin
    s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
       |e AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
       |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
       |  WHERE $d <= 500000.0),
       |adj AS (SELECT id_a AS src, id_b AS dst FROM e
       |  UNION ALL SELECT id_b, id_a FROM e),
       |deg AS (SELECT src, count(*) AS deg FROM adj GROUP BY 1),
       |r0 AS (SELECT src AS id, CAST(1000000000000 AS BIGINT) AS pr FROM deg),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT id, pr FROM r3""".stripMargin
  }

  /** HITS oracle: two unrolled (authority, hub) half-step pairs with the
    * identical scaled-integer max normalization (`raw * scale // max`,
    * scalar-subquery maxima) over the distinct user→cell edge set. */
  private lazy val HitsOracleSql: String = {
    val cell =
      "least(63, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT))) * 64 + " +
        "least(63, greatest(0, CAST(floor((1.0 - ln(tan(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0) " +
        "+ 1.0 / cos(least(85.05112878, greatest(-85.05112878, lat)) * pi() / 180.0)) / pi()) / 2.0 * 64.0) AS BIGINT)))"
    val round = (i: Int) =>
      s"""ar$i AS (SELECT e.dst AS id, sum(h.h) AS raw FROM e JOIN h${i - 1} h ON h.id = e.src GROUP BY 1),
         |a$i AS (SELECT id, CAST(raw * 1000000 // (SELECT max(raw) FROM ar$i) AS BIGINT) AS a FROM ar$i),
         |hr$i AS (SELECT e.src AS id, sum(a.a) AS raw FROM e JOIN a$i a ON a.id = e.dst GROUP BY 1),
         |h$i AS (SELECT id, CAST(raw * 1000000 // (SELECT max(raw) FROM hr$i) AS BIGINT) AS h FROM hr$i)""".stripMargin
    s"""WITH pts AS (SELECT user_id, ${latSqlFor("event_id")} AS lat, ${lonSqlFor("event_id")} AS lon FROM events),
       |e AS (SELECT DISTINCT user_id AS src, $cell AS dst FROM pts),
       |h0 AS (SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS h FROM e),
       |${round(1)},
       |${round(2)}
       |SELECT 'hub' AS role, id, h AS score FROM h2
       |UNION ALL SELECT 'authority' AS role, id, a AS score FROM a2""".stripMargin
  }

  /** Fixed k-means seeds (cluster_id, x, y) on the [0,18000]x[0,36000]
    * centi-degree grid — THE single definition shared by the q_kmeans
    * query and its oracle VALUES list so they cannot drift. */
  private val KMeansSeeds: Seq[(Int, Long, Long)] = Seq(
    (0, 3000L, 6000L), (1, 3000L, 18000L), (2, 3000L, 30000L),
    (3, 9000L, 12000L), (4, 9000L, 24000L),
    (5, 15000L, 6000L), (6, 15000L, 18000L), (7, 15000L, 30000L))

  /** Integer-Lloyd oracle: 3 unrolled (assign, update) round pairs; the
    * row_number tie rule (distance, then cluster id) mirrors the engine's
    * min-struct, and `//` on non-negative sums mirrors `div`. */
  private lazy val KMeansOracleSql: String = {
    val values = KMeansSeeds.map { case (i, x, y) => s"($i, 0, $x, $y)" }.mkString(", ")
    val round = (i: Int) =>
      s"""a$i AS (SELECT __id, x, y, cluster_id FROM (
         |  SELECT p.__id, p.x, p.y, c.cluster_id,
         |    row_number() OVER (PARTITION BY p.__id ORDER BY
         |      (p.x-c.cx)*(p.x-c.cx) + (p.y-c.cy)*(p.y-c.cy), c.cluster_id) AS rn
         |  FROM pts p, c${i - 1} c) t WHERE rn = 1),
         |g$i AS (SELECT cluster_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy
         |  FROM a$i GROUP BY 1),
         |c$i AS (SELECT c.cluster_id, coalesce(g.n, 0) AS n,
         |  CAST(CASE WHEN g.n IS NULL THEN c.cx ELSE g.sx // g.n END AS BIGINT) AS cx,
         |  CAST(CASE WHEN g.n IS NULL THEN c.cy ELSE g.sy // g.n END AS BIGINT) AS cy
         |  FROM c${i - 1} c LEFT JOIN g$i g USING (cluster_id))""".stripMargin
    s"""WITH c0(cluster_id, n, cx, cy) AS (SELECT * FROM (VALUES $values) v),
       |pts AS (SELECT o_orderkey AS __id,
       |  (o_orderkey * 9973 + 12345) % 18000 AS x,
       |  (o_orderkey * 31337 + 54321) % 36000 AS y FROM orders),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT cluster_id, n, cx, cy FROM c3""".stripMargin
  }

  /** TextRank keyword oracle: unrolled scaled-integer PageRank rounds in
    * the [[PageRankOracleSql]] style, but WEIGHTED by the bigram
    * co-occurrence counts (`pr * w // wdeg` per directed edge) over the
    * word graph (adjacent whitespace tokens, canonical pair, hapax
    * filter), finished with the (pr DESC, word ASC) top-20 cut. */
  private lazy val TextRankOracleSql: String = {
    val round = (i: Int) =>
      s"""s$i AS (SELECT a.dst AS id, sum((r.pr * a.w) // d.wdeg) AS s FROM adj a
         |  JOIN deg d ON a.src = d.src JOIN r${i - 1} r ON r.id = a.src GROUP BY 1),
         |r$i AS (SELECT d.src AS id,
         |  CAST(150000000 + (coalesce(s.s, 0) * 17) // 20 AS BIGINT) AS pr
         |  FROM deg d LEFT JOIN s$i s ON s.id = d.src)""".stripMargin
    raw"""WITH docs AS (SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
       |big AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM docs, unnest(range(1, len(toks))) AS t(i)),
       |e AS (SELECT least(w1, w2) AS id_a, greatest(w1, w2) AS id_b, count(*) AS w FROM big
       |  WHERE w1 <> w2 GROUP BY 1, 2 HAVING count(*) >= 2),
       |adj AS (SELECT id_a AS src, id_b AS dst, w FROM e
       |  UNION ALL SELECT id_b, id_a, w FROM e),
       |deg AS (SELECT src, sum(w) AS wdeg FROM adj GROUP BY 1),
       |r0 AS (SELECT src AS id, CAST(1000000000 AS BIGINT) AS pr FROM deg),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT id AS word, pr FROM r3 ORDER BY pr DESC, id LIMIT 20""".stripMargin
  }

  /** The three lat/lng-rect query regions of the rect PIP join (one wraps
    * the antimeridian); bounds sit on .005 offsets so no derived point can
    * land within fp distance of a boundary. */
  private def rectRegions: Seq[(String, S2Region)] = SparkEntryRegions.rects

  private val RectOracleSql = {
    val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
      s"""SELECT '$rid' AS region_id, o_orderkey FROM pts
         | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
    }
    s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders)
       |${branches.mkString("\nUNION ALL\n")}
       |""".stripMargin
  }

  /** Shell+hole diamond polygon (`S2Polygon.cs:944-964` containment
    * semantics). Both loops are convex, so spherical containment IS
    * ANSI-expressible: inside iff the point's unit vector lies on the
    * interior side of every edge's great-circle plane — see
    * [[convexLoopSql]]. The reference's candy-cane loop (non-convex,
    * full-longitude) stays covered by the ScalaTest brute-force comparison
    * (OperatorSpec / PipJoinExecSpec). */
  private[graft] val DiamondShell = Seq((0.0, -30.0), (30.0, 0.0), (0.0, 30.0), (-30.0, 0.0))
  private[graft] val DiamondHole = Seq((0.0, -10.0), (10.0, 0.0), (0.0, 10.0), (-10.0, 0.0))

  private def polygonRegions: Seq[(String, S2Region)] = {
    import graft.s2.TextShapes
    def loopText(vs: Seq[(Double, Double)]) = vs.map { case (la, lo) => s"$la:$lo" }.mkString(", ")
    Seq("p_diamond_holed" ->
      TextShapes.polygon(s"${loopText(DiamondShell)}; ${loopText(DiamondHole)}"))
  }

  /** 25 deterministic convex hexagon loops keyed by n_nationkey — the
    * polygon-TABLE fixture of q_poly_table_join. Vertices are computed
    * driver-side in doubles and joined onto `nation` as data (a production
    * polygon catalog IS data read from storage, not formulas), so the
    * engine kernels and the oracle's inlined edge-plane normals consume
    * bit-identical coordinates — no Spark-vs-DuckDB trig to reconcile.
    * Centers stay within |lat| < 55 and |lon| < 170 so every hexagon is
    * spherically convex and clear of poles/antimeridian; convexity, CCW
    * orientation and the oracle's edge-plane margin are asserted in
    * PolygonTableJoinSpec. Each tuple is (regionId, verts(lat,lon) CCW,
    * center(lat,lon)). */
  private[graft] lazy val HexPolys: Seq[(Long, Seq[(Double, Double)], (Double, Double))] =
    (0L until 25L).map { k =>
      val clat = ((k * 7919 + 1234) % 11000) / 100.0 - 55.0
      val clon = ((k * 104729 + 5678) % 34000) / 100.0 - 170.0
      val r = 2.0 + (k % 3).toDouble
      val verts = (0 until 6).map { i =>
        val th = 2.0 * math.Pi * i.toDouble / 6.0 + 0.3
        (clat + r * math.sin(th), clon + 1.35 * r * math.cos(th))
      }
      (k, verts.toSeq, (clat, clon))
    }

  /** The HexPolys fixture as a polygon-table DataFrame anchored on the
    * nation parquet: (region_id, lats, lons) with parallel vertex arrays. */
  private[graft] def hexPolyTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hexDf = HexPolys
      .map { case (k, vs, _) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("region_id", "lats", "lons")
    nation(s, dir).select(col("n_nationkey").cast("long").as("region_id"))
      .join(hexDf, "region_id")
  }

  /** 25 deterministic diamond-with-hole polygons keyed by n_nationkey — the
    * MULTI-LOOP polygon-table fixture of q_holed_table_join (same design
    * rules as [[HexPolys]]: driver-exact doubles, mid-latitude, clear of
    * the antimeridian; both loops convex so the oracle stays
    * edge-plane-expressible). Each tuple is (regionId, loops (shell then
    * hole, each CCW (lat,lon) verts), center(lat,lon) — inside the hole,
    * usable as the orientation resolver for BOTH convex loops). */
  private[graft] lazy val HoledPolys: Seq[(Long, Seq[Seq[(Double, Double)]], (Double, Double))] =
    (0L until 25L).map { k =>
      // centers sit 0.0037/0.0041 OFF the 0.01-degree derived-point grid:
      // diamond vertices are axis-aligned with their center, so an
      // on-grid center would put vertices exactly on reachable point
      // coordinates and a vertex-coincident point has zero edge-plane
      // margin (the hexagons are immune via their irrational sin/cos
      // offsets; these need the nudge)
      val clat = ((k * 6133 + 2718) % 11000) / 100.0 - 55.0037
      val clon = ((k * 93911 + 3141) % 34000) / 100.0 - 170.0041
      val r = 3.0 + (k % 2).toDouble
      val w = 1.3 * r
      def diamond(rr: Double, ww: Double) = Seq(
        (clat, clon + ww), (clat + rr, clon), (clat, clon - ww), (clat - rr, clon))
      (k, Seq(diamond(r, w), diamond(r / 3.0, w / 3.0)), (clat, clon))
    }

  /** The HoledPolys fixture as a multi-loop polygon-table DataFrame
    * anchored on the nation parquet: (region_id, loop_lats, loop_lons)
    * with nested vertex arrays (loop 0 shell, loop 1 hole). */
  private[graft] def holedPolyTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = HoledPolys.map { case (k, loops, _) =>
      (k, loops.map(_.map(_._1).toArray).toArray, loops.map(_.map(_._2).toArray).toArray)
    }.toDF("region_id", "loop_lats", "loop_lons")
    nation(s, dir).select(col("n_nationkey").cast("long").as("region_id"))
      .join(df, "region_id")
  }

  /** 25 deterministic convex hexagons with DELIBERATELY heterogeneous radii
    * (0.45..7.05 degrees, ~250x area spread) — the fixture of
    * q_poly_adaptive_join, where each row must pick its own covering level.
    * Same design rules as [[HexPolys]]. */
  private[graft] lazy val HexPolysVar: Seq[(Long, Seq[(Double, Double)], (Double, Double))] =
    (0L until 25L).map { k =>
      val clat = ((k * 8377 + 401) % 11000) / 100.0 - 55.0
      val clon = ((k * 99371 + 6029) % 34000) / 100.0 - 170.0
      val r = 0.45 + (k % 12).toDouble * 0.6
      val verts = (0 until 6).map { i =>
        val th = 2.0 * math.Pi * i.toDouble / 6.0 + 0.7
        (clat + r * math.sin(th), clon + 1.35 * r * math.cos(th))
      }
      (k, verts.toSeq, (clat, clon))
    }

  private[graft] def hexPolyVarTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hexDf = HexPolysVar
      .map { case (k, vs, _) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("region_id", "lats", "lons")
    nation(s, dir).select(col("n_nationkey").cast("long").as("region_id"))
      .join(hexDf, "region_id")
  }

  /** 25 deterministic 3-vertex polylines keyed by n_nationkey — the
    * polyline-table fixture of q_polyline_join (same design rules as
    * [[HexPolys]]: driver-exact doubles, mid-latitude, clear of the
    * antimeridian; the distance classification's exactness precondition —
    * no point within fp distance of the radius boundary — is asserted in
    * PolylineJoinSpec). */
  private[graft] lazy val FixturePolylines: Seq[(Long, Seq[(Double, Double)])] =
    (0L until 25L).map { k =>
      val clat = ((k * 4733 + 911) % 10000) / 100.0 - 50.0
      val clon = ((k * 88811 + 77) % 33000) / 100.0 - 165.0
      (k, Seq((clat, clon), (clat + 2.2, clon + 3.1), (clat - 1.7, clon + 6.3)))
    }

  /** Dense deterministic route fixture for the polyline CROSSING join:
    * 25 three-vertex chains, centers confined to a 12x16 degree box with
    * varied headings so pairs genuinely cross (18 of 300 do; minimum
    * |triple-product| over every edge-pair sign decision is 4.7e-6 — eleven
    * orders above fp noise, so engine and oracle decide identically). */
  private[graft] lazy val FixtureRoutes: Seq[(Long, Seq[(Double, Double)])] =
    (0L until 25L).map { k =>
      val clat = ((k * 3571 + 101) % 1200) / 100.0 - 6.0
      val clon = ((k * 9241 + 53) % 1600) / 100.0 - 8.0
      val ang = ((k * 47) % 360) * math.Pi / 180.0
      val (d1, d2) = (3.0, 2.5)
      (k, Seq(
        (clat, clon),
        (clat + d1 * math.cos(ang), clon + d1 * math.sin(ang)),
        (clat + d1 * math.cos(ang) + d2 * math.cos(ang + 0.7),
          clon + d1 * math.sin(ang) + d2 * math.sin(ang + 0.7))))
    }

  /** FixtureRoutes as a chain-table DataFrame anchored on the nation
    * parquet: (line_id, lats, lons). */
  private[graft] def routeTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = FixtureRoutes
      .map { case (k, vs) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("line_id", "lats", "lons")
    nation(s, dir).select(col("n_nationkey").cast("long").as("line_id"))
      .join(df, "line_id")
  }

  private[graft] val PolylineJoinRadiusM = 150000.0
  private[graft] val KnnRegionsRadiusM = 500000.0
  private[graft] val DbscanEpsM = 300000.0
  private[graft] val DbscanMinPts = 3
  private[graft] val StJoinRadiusM = 1000000.0
  private[graft] val StJoinWindowSec = 14400L
  private[graft] val ContactRadiusM = 300000.0
  private[graft] val ContactWindowSec = 3600L
  private[graft] val KnnPolylinesRadiusM = 800000.0

  /** The FixturePolylines fixture as a polyline-table DataFrame anchored on
    * the nation parquet: (line_id, lats, lons). */
  private[graft] def polylineTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = FixturePolylines
      .map { case (k, vs) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("line_id", "lats", "lons")
    nation(s, dir).select(col("n_nationkey").cast("long").as("line_id"))
      .join(df, "line_id")
  }

  /** Track-point fixture for map matching: each event pins to a fixture
    * vertex (event_id % 75) and jitters ±0.15° around it — every fix sits
    * well inside [[PolylineJoinRadiusM]] of its line, with per-user
    * sequences long enough that the Viterbi transition term decides real
    * choices. The jitter arithmetic is integer-then-one-division, shared
    * verbatim with the oracle. */
  private[graft] def mapMatchPoints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val verts = FixturePolylines.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case ((la, lo), i) => (k * 3 + i, la, lo) }
    }.toDF("__vi", "__vlat", "__vlon")
    events(s, dir)
      .withColumn("__vi", col("event_id") % 75)
      .join(broadcast(verts), "__vi")
      .withColumn("lat", col("__vlat") +
        ((col("event_id") * 131 + 17) % 301 - 150).cast("double") / 1000.0)
      .withColumn("lon", col("__vlon") +
        ((col("event_id") * 577 + 29) % 301 - 150).cast("double") / 1000.0)
      .select("user_id", "ts", "event_id", "lat", "lon")
  }

  /** Shared CTEs of the LPA-family oracles (q_lpa / q_modularity): the
    * 500 km proximity pair join `e`, its directed adjacency, and the
    * three synchronous mode-label rounds ending at `l3`. */
  private def proximityLpaCtes: String = {
    val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
    val round = (i: Int) =>
      s"""cnt$i AS (SELECT a.dst AS id, l.label, count(*) AS c FROM adj a
         |  JOIN l${i - 1} l ON l.id = a.src GROUP BY 1, 2),
         |l$i AS (SELECT id, label FROM (SELECT id, label,
         |  row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rn
         |  FROM cnt$i) t WHERE rn = 1)""".stripMargin
    s"""pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
       |e AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
       |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
       |  WHERE $d <= 500000.0),
       |adj AS (SELECT id_a AS src, id_b AS dst FROM e
       |  UNION ALL SELECT id_b, id_a FROM e),
       |l0 AS (SELECT DISTINCT src AS id, src AS label FROM adj),
       |${round(1)},
       |${round(2)},
       |${round(3)}""".stripMargin
  }

  /** Shared CTE prefix of the two map-match oracles (q_map_match /
    * q_map_match_stream): the jittered track fixture, per-edge exact
    * distances, 10 m quantized emissions within the radius, the step
    * numbering, and the step-joined candidate states — everything up to
    * the DP itself. Callers append their own recursive dynamic. */
  private def mapMatchOracleBase: String = {
    val vertRows = FixturePolylines.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case ((la, lo), i) => s"(${k * 3 + i}, $la, $lo)" }
    }.mkString(", ")
    val branches = FixturePolylines.flatMap { case (k, verts) =>
      val pts = verts.map { case (la, lo) => graft.s2.S2LatLng.fromDegrees(la, lo).toPoint }
      pts.indices.dropRight(1).map { i =>
        s"""SELECT user_id, ts, event_id, CAST($k AS BIGINT) AS line,
           | CAST($i AS INTEGER) AS edge,
           | ${edgeDistSql(pts(i), pts(i + 1))} * 6367000.0 AS d FROM xyz""".stripMargin
      }
    }
    s"""pts AS (
       |  SELECT user_id, ts, event_id,
       |    v.vlat + CAST((event_id * 131 + 17) % 301 - 150 AS DOUBLE) / 1000.0 AS lat,
       |    v.vlon + CAST((event_id * 577 + 29) % 301 - 150 AS DOUBLE) / 1000.0 AS lon
       |  FROM events JOIN (VALUES $vertRows) v(vi, vlat, vlon) ON event_id % 75 = v.vi),
       |xyz AS (SELECT user_id, ts, event_id,
       |  cos(radians(lat))*cos(radians(lon)) AS px,
       |  cos(radians(lat))*sin(radians(lon)) AS py,
       |  sin(radians(lat)) AS pz FROM pts),
       |cand0 AS (${branches.mkString("\nUNION ALL\n")}),
       |cand AS (SELECT user_id, ts, event_id, line, edge,
       |    CAST(round(d / 10.0) AS BIGINT) AS e
       |  FROM cand0 WHERE d <= 150000.0),
       |steps AS (SELECT user_id, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step
       |  FROM (SELECT DISTINCT user_id, ts, event_id FROM cand) t),
       |c2 AS (SELECT c.user_id, s.step, c.line, c.edge, c.e
       |  FROM cand c JOIN steps s USING (user_id, event_id))""".stripMargin
  }

  /** The (cost, line, edge) tie rule as one zero-pad-sortable string. */
  private def mapMatchTieKey(c: String, l: String, e: String): String =
    s"lpad(CAST($c AS VARCHAR), 19, '0') || lpad(CAST($l AS VARCHAR), 10, '0') || " +
      s"lpad(CAST($e AS VARCHAR), 5, '0')"

  private val MapMatchTransSql =
    "CASE WHEN p.line = c.line THEN abs(p.edge - c.edge) * 100 ELSE 20000 END"

  /** Literal SQL transcription of the kernel's point-to-edge distance
    * (`S2EdgeUtil.GetDistance`, S2EdgeUtil.scala:91-98) over a unit vector
    * (px, py, pz), in RADIANS: interior case asin(|p.n|/|n|) guarded by the
    * two simpleCcw sign tests ((n x a).p > 0 and (b x n).p > 0, the triple-
    * product rewrites of simpleCcw(n,a,p) / simpleCcw(p,b,n)), endpoint
    * case 2 asin(min-chord/2). All edge constants are kernel-computed
    * doubles inlined as exact literals, so engine and oracle agree to fp
    * rounding of the SAME formula — PolylineJoinSpec pins that no derived
    * point sits within 1e-3 m of the radius boundary. */
  private def edgeDistSql(aP: graft.s2.S2Point, bP: graft.s2.S2Point): String = {
    import graft.s2.S2Predicates
    val n = S2Predicates.robustCrossProd(aP, bP)
    val m1 = n.cross(aP)
    val m2 = bP.cross(n)
    val nn = n.norm
    s"""(CASE WHEN (px*(${m1.x}) + py*(${m1.y}) + pz*(${m1.z}) > 0)
       |        AND (px*(${m2.x}) + py*(${m2.y}) + pz*(${m2.z}) > 0)
       |  THEN asin(least(1.0, abs(px*(${n.x}) + py*(${n.y}) + pz*(${n.z})) / $nn))
       |  ELSE 2 * asin(least(1.0, 0.5 * sqrt(least(
       |    (px-(${aP.x}))*(px-(${aP.x})) + (py-(${aP.y}))*(py-(${aP.y})) + (pz-(${aP.z}))*(pz-(${aP.z})),
       |    (px-(${bP.x}))*(px-(${bP.x})) + (py-(${bP.y}))*(py-(${bP.y})) + (pz-(${bP.z}))*(pz-(${bP.z}))))))
       |  END)""".stripMargin
  }

  /** Exact spherical containment for a CONVEX loop as an ANSI-SQL predicate
    * over a unit vector (px, py, pz): strictly inside every edge plane
    * v_i x v_{i+1}. The plane normals are computed here with the very same
    * double arithmetic as the kernel (`S2LatLng.toPoint`, `S2Point.cross`)
    * and inlined as exact round-trip literals, so engine and oracle evaluate
    * the sign of the same determinant `(v_i x v_{i+1}) . p` that
    * `RobustCcw` decides (`S2.cs` RobustCcw); they can only disagree for
    * points within ~1e-15 of an edge plane, while the nearest derived grid
    * point sits >= ~1e-8 rad away (asserted in OracleMarginSpec).
    * Orientation (which side is "inside") is resolved against a known
    * interior point, so the emitted predicate does not depend on the listed
    * vertex order. */
  private def convexLoopSql(vertsLatLon: Seq[(Double, Double)],
                            interiorLatLon: (Double, Double)): String = {
    import graft.s2.S2LatLng
    val pts = vertsLatLon.map { case (la, lo) => S2LatLng.fromDegrees(la, lo).toPoint }
    val c = S2LatLng.fromDegrees(interiorLatLon._1, interiorLatLon._2).toPoint
    val normals = pts.indices.map(i => pts(i).cross(pts((i + 1) % pts.size)))
    val insidePositive = normals.map(n => c.dot(n) > 0)
    require(insidePositive.distinct.size == 1, s"loop not convex around $interiorLatLon")
    val op = if (insidePositive.head) ">" else "<"
    normals
      .map(n => s"(px*(${n.x}) + py*(${n.y}) + pz*(${n.z}) $op 0)")
      .mkString("(", " AND ", ")")
  }

  private val CircleRadiusM = 2500000.0
  private val CircleBandM = 50.0

  /** Shared oracle of q_geofence and q_geofence_stream: per-region lag SQL
    * over (user, ts, event_id) order. */
  private lazy val GeofenceOracleSql = {
    val evLat = latSqlFor("event_id")
    val evLon = lonSqlFor("event_id")
    val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
      s"""SELECT '$rid' AS region_id, user_id, event_id,
         |  CASE WHEN inr THEN 'enter' ELSE 'exit' END AS transition FROM (
         |  SELECT user_id, event_id, inr,
         |    lag(inr) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pinr
         |  FROM (SELECT user_id, ts, event_id,
         |    (${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}) AS inr FROM p) x) t
         |WHERE inr <> COALESCE(pinr, FALSE)""".stripMargin
    }
    s"""WITH p AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon FROM events)
       |${branches.mkString("\nUNION ALL\n")}
       |""".stripMargin
  }

  /** First-match region label in rectBounds order, else 'none' — the SQL
    * twin of Trajectories.regionLabel (same order rule, same wrap-aware
    * rect predicate). */
  private lazy val RegionLabelCaseSql = {
    val whens = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
      s"WHEN ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)} THEN '$rid'"
    }.mkString(" ")
    s"CASE $whens ELSE 'none' END"
  }

  private lazy val OdFlowsOracleSql = {
    val evLat = latSqlFor("event_id")
    val evLon = lonSqlFor("event_id")
    s"""WITH p AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon FROM events),
       |lab AS (SELECT user_id, ts, event_id, $RegionLabelCaseSql AS region FROM p),
       |f AS (SELECT region, lag(region) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM lab)
       |SELECT prev AS from_region, region AS to_region, count(*) AS n_trips
       |FROM f WHERE prev IS NOT NULL AND prev <> region
       |GROUP BY 1, 2""".stripMargin
  }

  private lazy val DwellOracleSql = {
    val evLat = latSqlFor("event_id")
    val evLon = lonSqlFor("event_id")
    s"""WITH p AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon FROM events),
       |lab AS (SELECT user_id, ts, event_id, $RegionLabelCaseSql AS region FROM p),
       |d AS (SELECT *, CASE WHEN region IS DISTINCT FROM lag(region)
       |  OVER (PARTITION BY user_id ORDER BY ts, event_id) THEN 1 ELSE 0 END AS chg FROM lab),
       |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |  ROWS UNBOUNDED PRECEDING) AS island FROM d)
       |SELECT user_id, min(region) AS region_id, min(event_id) AS enter_order,
       | count(*) AS n_points, epoch_us(max(ts)) - epoch_us(min(ts)) AS dwell_micros
       |FROM i GROUP BY user_id, island
       |HAVING min(region) <> 'none'""".stripMargin
  }

  /** Shared oracle of q_pip_circle and q_pip_circle_sql: exact haversine
    * radius test with the 50 m exclusion band both engine paths apply. */
  private lazy val CircleOracleSql = {
    val d = haversineExpr("lat", "lon", "10.0", "20.0")
    s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders)
       |SELECT 'c_2500km' AS region_id, o_orderkey FROM pts
       |WHERE $d < ${CircleRadiusM - CircleBandM}""".stripMargin
  }

  private def haversineExpr(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val rl1 = s"(($lat1) * (pi() / 180))"
    val rl2 = s"(($lat2) * (pi() / 180))"
    val rg1 = s"(($lon1) * (pi() / 180))"
    val rg2 = s"(($lon2) * (pi() / 180))"
    val hx = s"(power(sin(0.5 * ($rl2 - $rl1)), 2) + power(sin(0.5 * ($rg2 - $rg1)), 2) * cos($rl1) * cos($rl2))"
    s"2 * atan2(sqrt($hx), sqrt(greatest(0.0, 1.0 - $hx))) * 6367000.0"
  }

  private val KnnQueries = Seq(
    ("q_vienna", 48.2, 16.37),
    ("q_sydney", -33.87, 151.2),
    ("q_lima", -12.05, -77.05))

  // ---------------------------------------------------------------------------

  /** Flagship on sf0.001: synthesize the image+caption table, tile-assign,
    * covering PIP join, verify payload invariants. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val images = ImagePayload.synthesize(part(spark, dir).select("p_partkey"), "p_partkey")
    val verified = ImagePayload.verifyPayload(images, "p_partkey")
      .where(col("psnr_ok") && col("caption_ok"))
    val tiled = Tiling.tileAssign(verified, "lat", "lon", 8)
    SpatialJoin.pipJoin(tiled, "lat", "lon", rectRegions)
      .select("region_id", "image_id", "tile_token", "lat", "lon")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // the live twin: per-event (level, trend) forecast state from an O(1)
    // keyed fold with the identical IEEE step trees; the oracle replays
    // every prefix with the same transformed list_reduce
    "q_holt_stream" -> ((s, dir) =>
      graft.streaming.EventStreams.holtStream(events(s, dir),
        "user_id", "ts", "event_id", "value",
        alpha = 0.25, beta = 0.125).toDF()),

    // per-user lag-1 autocorrelation of event values on the centi-unit
    // integer grid: exact int64 aggregates (n, Σw, Σw², Σ lag-products,
    // head/tail), ONE key exchange shared by the sort window and the hash
    // aggregate, and a single fixed IEEE final expression the oracle
    // replays verbatim (TimeSeries.acfFinalSql is the shared text)
    "q_acf" -> ((s, dir) =>
      TimeSeries.lagAutocorr(events(s, dir), "user_id", "ts", "event_id", "value")),

    // the streaming running-acf twin over the batch table through the
    // SAME flatMapGroupsWithState fold: one (event_id, n_obs, acf) row
    // per event, six exact int64 accumulators per key; the oracle replays
    // the per-row prefix aggregates in SQL windows and the shared final
    // expression
    "q_acf_stream" -> ((s, dir) =>
      graft.streaming.EventStreams.acfStream(events(s, dir), "user_id", "ts",
        "event_id", "value").toDF()),

    // per-user OLS value-vs-time trend on the (minute, centi-unit)
    // integer grid: ONE map + ONE hash aggregate (no window — OLS needs
    // no ordering), exact int64 sums, slope/intercept each a single
    // fixed IEEE expression shared verbatim with the oracle
    "q_ols" -> ((s, dir) =>
      TimeSeries.linearTrend(events(s, dir), "user_id", "ts", "value",
        originMicros = 1704067200000000L, stepMicros = 60000000L)),

    // the streaming running-OLS twin through the same
    // flatMapGroupsWithState fold: five exact int64 accumulators per
    // key, per-event (slope, intercept) over the prefix; the oracle
    // replays prefix windows + the shared final expressions
    "q_ols_stream" -> ((s, dir) =>
      graft.streaming.EventStreams.olsStream(events(s, dir), "user_id", "ts",
        "event_id", "value",
        originMicros = 1704067200000000L, stepMicros = 60000000L).toDF()),

    // per-user Mann–Kendall monotone-trend test: S = Σ sign-of-pair and
    // the tie-corrected 18·variance, BOTH exact int64 — the rank-based
    // robust sibling of q_ols. The engine computes the inversion count in
    // one mapGroups Fenwick pass (O(n log n) per entity, never a pair
    // join); the oracle replays the O(n²) pair definition in SQL
    "q_mann_kendall" -> ((s, dir) =>
      TimeSeries.mannKendall(events(s, dir), "user_id", "ts", "event_id", "value")),

    // the live twin: per-event running (S, var18) from O(distinct-values)
    // keyed state — the tie term updates by the telescoped 6·(k²−1)
    // increment; the oracle replays every prefix via a pair join + two
    // window sums, all exact int64
    "q_mann_kendall_stream" -> ((s, dir) =>
      graft.streaming.EventStreams.mannKendallStream(events(s, dir),
        "user_id", "ts", "event_id", "value").toDF()),

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

    // the streaming CUSUM twin run over the batch table through the SAME
    // flatMapGroupsWithState function: one (event_id, s, alarm) row per
    // gap; the oracle replays per-row s via the prefix-min identity (the
    // sequential recurrence the stream folds directly)
    "q_cusum_stream" -> ((s, dir) =>
      graft.streaming.EventStreams.cusumStream(events(s, dir), "user_id", "ts", "event_id",
        k = 40000000000L, h = 200000000000L).toDF()),

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

    // per-user EXACT squared diameter on the same centi-degree grid:
    // convex hull + pairwise-over-hull inside one typed Aggregator
    // (buffers compact to their own hull — O(hull) state, never O(n));
    // the O(n²) SQL self-join is an exact integer oracle
    "q_diameter" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("x", expr("(event_id * 9973 + 12345) % 18000"))
        .withColumn("y", expr("(event_id * 31337 + 54321) % 36000"))
      Trajectories.spatialDiameter(pts, "user_id", "x", "y")
    }),

    // cell co-visitation affinity ("users who visit A also visit B"):
    // top-30 10-degree-cell pairs by exact scaled-integer Jaccard over
    // distinct visitors — cell ids derive from event_id in pure int64 so
    // both engines quantize identically; the per-entity fan guard raises
    // loudly instead of silently truncating wedges
    "q_covisit" -> ((s, dir) => {
      val cellSql = "(((event_id * 9973 + 12345) % 18000) div 1000) * 100 + " +
        "(((event_id * 31337 + 54321) % 36000) div 1000)"
      val visits = events(s, dir).withColumn("cell", expr(cellSql))
      Trajectories.coVisitation(visits, "user_id", "cell",
        minCommon = 2, maxCellsPerEntity = 512, k = 30)
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

    // the stateful streaming geofence run over the SAME batch input (like
    // q_sessionize, this exercises the flatMapGroupsWithState operator in
    // its batch mode) — identical semantics, identical oracle
    "q_geofence_stream" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      graft.streaming.EventStreams
        .geofenceTransitions(pts, "user_id", "ts", "event_id", "lat", "lon", rectRegions)
        .select(col("entity_id").as("user_id"), col("order").as("event_id"),
          col("region_id"), col("transition"))
    }),

    // the stateful streaming region-hop feed aggregated into the SAME OD
    // flow matrix (batch-mode run of the flatMapGroupsWithState operator,
    // like q_geofence_stream) — identical semantics, identical oracle
    "q_od_flows_stream" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      graft.streaming.EventStreams
        .regionHops(pts, "user_id", "ts", "event_id", "lat", "lon", rectRegions)
        .groupBy("from_region", "to_region")
        .agg(count(lit(1)).as("n_trips"))
    }),

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

    // the streaming twin of q_speed_flags, run in batch mode over the SAME
    // input — identical semantics (first-sighting null rows included),
    // identical oracle
    "q_speed_flags_stream" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      graft.streaming.EventStreams
        .speedFlagsStream(pts, "user_id", "ts", "event_id", "lat", "lon",
          maxSpeedMps = 340L)
        .select(col("entity_id").as("user_id"), col("order").as("event_id"),
          col("seg_m"), col("dt_micros"), col("is_jump"))
    }),

    // which users' tracks visit each query region (vertex semantics)
    "q_traj_region" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      Trajectories.visitsRegions(pts, "lat", "lon", "user_id", rectRegions)
        .select("region_id", "user_id")
    }),

    // --- streaming-equivalent sessionization (batch window-function form) ---
    "q_sessionize" -> ((s, dir) =>
      graft.streaming.EventStreams.sessionizeBatch(events(s, dir), gapMillis = 30 * 60 * 1000L)
        .select("user_id", "session_start", "session_end", "n_events")),

    // streaming spatial aggregation (same transform batch/stream): per-tile
    // windowed counts, self-checked down to a derived oracle exactly like
    // q_tile_counts — every event lands in exactly one (hour, level-4 tile)
    // bucket with a valid token, so per-window totals must equal the plain
    // per-hour event counts
    "q_stream_tile_counts" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      graft.streaming.EventStreams.tiledWindowCounts(ev, "lat", "lon", level = 4)
        .groupBy("window_start")
        .agg(
          sum("n").as("total_events"),
          count(lit(1)).as("n_tiles"),
          sum(when(s2_level(s2_cell_from_token(col("tile_token"))) === 4, 1L)
            .otherwise(0L)).as("lvl4"))
        .where(col("n_tiles") === col("lvl4") && col("n_tiles").between(1, 1536))
        .select("window_start", "total_events")
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

    // emerging hotspots: per geohash-2 cell, first-half vs second-half
    // January counts and the relative change — integer-exact, one pass
    "q_trend" -> ((s, dir) =>
      Tiling.geohashTrend(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", 2, "ts", "2024-01-01", "2024-01-16", "2024-01-31")),

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

    // HITS hubs/authorities over the bipartite user→cell visit graph
    // (zoom-6): L∞-normalized scaled-integer half-steps (the classic L2
    // norm is transcendental; max-normalization keeps every op in int64),
    // 2 rounds, hash-exact vs the unrolled-CTE replay — hub users visit
    // authority places, authority places attract hub users
    "q_hits" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      val edges = Tiling.zxyAssign(pts, "lat", "lon", 6)
        .select(col("user_id").as("src"), (col("zx") * 64L + col("zy")).as("dst"))
        .distinct()
      Graphs.hitsScaled(edges, rounds = 2)
    }),

    "q_kanon_release" -> ((s, dir) =>
      Tiling.kAnonymousTileDays(
        events(s, dir)
          .withColumn("lat", expr(latSqlFor("event_id")))
          .withColumn("lon", expr(lonSqlFor("event_id"))),
        "lat", "lon", "user_id", "ts", z = 4, k = 5)),

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

    "q_pip_rect" -> ((s, dir) =>
      SpatialJoin.pipJoin(points(s, dir), "lat", "lon", rectRegions)
        .select("region_id", "o_orderkey")),

    // same join through the custom physical operator (S2PipJoinExec)
    "q_pip_rect_exec" -> ((s, dir) =>
      graft.plans.S2PipJoin.pipJoinExec(points(s, dir), "lat", "lon", rectRegions)
        .select("region_id", "o_orderkey")),

    // LEFT OUTER pip join: every point survives — matched points keep one
    // row per containing region, unmatched points keep region_id '-' (the
    // enrichment-join shape: the big side must never lose rows). Composed
    // as the inner covering join LEFT-joined back onto the points by key
    "q_pip_outer" -> ((s, dir) => {
      val matches = SpatialJoin.pipJoin(points(s, dir), "lat", "lon", rectRegions)
        .select(col("o_orderkey"), col("region_id"))
      points(s, dir).select("o_orderkey")
        .join(matches, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"), coalesce(col("region_id"), lit("-")).as("region_id"))
    }),

    "q_pip_polygon" -> ((s, dir) =>
      SpatialJoin.pipJoin(points(s, dir), "lat", "lon", polygonRegions)
        .select("region_id", "o_orderkey")),

    // the same rect PIP join written as PURE SQL text against the
    // registered s2_* function surface: the literal-arg s2_rect_covering
    // CONSTANT-FOLDS at plan time, so the covering prefilter costs one
    // array_contains per row with zero per-row covering work; the exact
    // bounds refine makes the conjunction equal the rect oracle
    "q_pip_rect_sql" -> ((s, dir) => {
      graft.functions.s2functions.registerAll(s)
      points(s, dir).createOrReplaceTempView("pts_sql_v")
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, o_orderkey
           |FROM (SELECT o_orderkey, lat, lon,
           |        s2_parent(s2_cell_id(lat, lon), 4) AS c4 FROM pts_sql_v)
           |WHERE array_contains(
           |        s2_rect_covering(CAST($latLo AS DOUBLE), CAST($latHi AS DOUBLE),
           |                         CAST($lonLo AS DOUBLE), CAST($lonHi AS DOUBLE), 4), c4)
           |  AND ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s.sql(branches.mkString("\nUNION ALL\n"))
    }),

    // 2500-vertex geodesic circle: refinement runs through the per-loop
    // edge index (>= 2000 vertices). Both engine and oracle exclude a 50 m
    // band around the radius, which dwarfs the ~2 m chord-vs-arc gap of the
    // inscribed 2500-gon (R*(pi/n)^2/2), so the haversine-radius oracle is
    // exact for ANY input data, not just the current derivation constants.
    "q_pip_circle" -> ((s, dir) => {
      val circle = graft.s2.TextShapes.circle(10.0, 20.0,
        CircleRadiusM / graft.s2.S2LatLng.EarthRadiusMeters, 2500)
      SpatialJoin.pipJoin(points(s, dir), "lat", "lon", Seq("c_2500km" -> circle))
        .where(abs(s2_distance_m(col("lat"), col("lon"), lit(10.0), lit(20.0))
          - CircleRadiusM) > CircleBandM)
        .select("region_id", "o_orderkey")
    }),

    // the circle query as PURE SQL: constant-folded cap covering prefilter
    // + the kernel haversine (s2_distance_m) as the exact predicate — the
    // same d < R - band condition the q_pip_circle oracle states
    "q_pip_circle_sql" -> ((s, dir) => {
      graft.functions.s2functions.registerAll(s)
      points(s, dir).createOrReplaceTempView("pts_circle_v")
      s.sql(
        s"""SELECT 'c_2500km' AS region_id, o_orderkey
           |FROM (SELECT o_orderkey, lat, lon,
           |        s2_parent(s2_cell_id(lat, lon), 4) AS c4 FROM pts_circle_v)
           |WHERE array_contains(s2_cap_covering(10.0D, 20.0D, ${CircleRadiusM}D, 4), c4)
           |  AND s2_distance_m(lat, lon, 10.0D, 20.0D) < ${CircleRadiusM - CircleBandM}D""".stripMargin)
    }),

    "q_doughnut" -> ((s, dir) =>
      SpatialJoin.doughnutJoin(points(s, dir), "lat", "lon",
        Seq(("d_vienna", 10.0, 20.0, 3000000.0, 1000000.0)))
        .select("region_id", "o_orderkey")),

    "q_knn" -> ((s, dir) =>
      Knn.knnJoin(points(s, dir), "lat", "lon", Seq("o_orderkey"),
        KnnQueries, k = 5, startLevel = 4)
        .select("query_id", "o_orderkey")),

    // all-pairs kNN self-join: every customer's 5 nearest other customers,
    // exact via escalating neighbor-ring resolution (KnnSelfJoinSpec pins
    // brute-force equality and the rank-gap margin that makes the oracle
    // fp-safe: min adjacent-rank gap 4.7 m vs ~1e-9 m cross-engine noise)
    "q_knn_self" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      Knn.knnSelfJoin(pts, "c_custkey", "lat", "lon", k = 5)
        .select("id", "neighbor_id", "rank")
    }),

    // region-region intersection join: one ~3 deg x 4 deg rect per customer
    // (wrapping the antimeridian where the center is near +-180), pairs of
    // intersecting rects via fixed-level covering-cell buckets + exact
    // closed-interval refinement; oracle transcribes the kernel's
    // R1/S1Interval.intersects rules literally over the same derived bounds
    "q_rect_join" -> ((s, dir) => {
      val rects = customer(s, dir).select(col("c_custkey"),
        expr(RectLatLoSql).as("lat_lo"), expr(RectLatHiSql).as("lat_hi"),
        expr(RectLonLoSql).as("lon_lo"), expr(RectLonHiSql).as("lon_hi"))
      SpatialJoin.rectIntersectJoin(rects, "c_custkey",
        "lat_lo", "lat_hi", "lon_lo", "lon_hi", level = 5)
        .select("id_a", "id_b")
    }),

    // distance self-join (pairs within 500 km) via neighbor-cell bucketing —
    // no cross join; oracle is the brute-force haversine over all pairs
    "q_distance_join" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
    }),

    // bichromatic distance join: customer × supplier pairs within
    // 1000 km — the two-table sibling of q_distance_join (left explodes
    // ≤9 neighbor buckets, right keeps its own cell, exact haversine
    // refine; 1780 pairs at sf0.01). Ids only: the membership test is
    // boundary-exact, the raw doubles stay engine-side
    "q_distance_between" -> ((s, dir) => {
      val cust = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val supp = supplier(s, dir).select("s_suppkey")
        .withColumn("lat", expr(latSqlFor("s_suppkey")))
        .withColumn("lon", expr(lonSqlFor("s_suppkey")))
      SpatialJoin.distanceJoinBetween(cust, "c_custkey", "lat", "lon",
        supp, "s_suppkey", "lat", "lon", radiusM = 1000000.0)
        .select("id_left", "id_right")
    }),

    // nearest supplier within 1000 km per customer (min distance, ties
    // by smaller id): bucketed candidates + ONE exact min_by aggregate —
    // the facility-assignment join; 1031 of 1500 customers match at
    // sf0.01, the rest legitimately have no supplier in range
    "q_nearest_join" -> ((s, dir) => {
      val cust = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val supp = supplier(s, dir).select("s_suppkey")
        .withColumn("lat", expr(latSqlFor("s_suppkey")))
        .withColumn("lon", expr(lonSqlFor("s_suppkey")))
      SpatialJoin.nearestJoin(cust, "c_custkey", "lat", "lon",
        supp, "s_suppkey", "lat", "lon", radiusM = 1000000.0)
        .select("id_left", "id_right")
    }),

    // spatial isolation: customers with NO other customer within 300 km
    // (753 of 1500 at sf0.01 — non-degenerate both ways). Same bucketed
    // pair join as q_distance_join, then ids-only union-distinct and one
    // left-anti; the oracle is the NOT EXISTS brute force over the same
    // haversine
    "q_isolated" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      SpatialJoin.isolatedPoints(pts, "lat", "lon", "c_custkey", radiusM = 300000.0)
    }),

    // per-node triangle counts over the 500 km proximity graph — the
    // clique-ness QA signal for dedup/contact graphs; degree-ordered
    // orientation bounds the wedge stage at O(m^1.5) however hubby the
    // graph, and changes the plan, never the count
    "q_triangles" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.triangleCounts(edges)
    }),

    // Newman modularity of the LPA partition over the same proximity
    // graph — the "did community detection find structure?" gate: exact
    // integer Q·4m² = Σ_c (4m·e_c − d_c²), ONE shared final division
    "q_modularity" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
        .localCheckpoint()
      Graphs.modularity(edges, Graphs.labelPropagation(edges, rounds = 3))
    }),

    // per-edge triangle support over the proximity graph (the k-truss
    // filter): node counts cannot see a zero-support bridge between two
    // cliques — this names it; exact integers, same wedge bound
    "q_truss_support" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.edgeTriangleSupport(edges, minSupport = 2L)
    }),

    // global transitivity of the proximity graph: 3·triangles/wedges as
    // 2·t3/w2 over two exact integers — the one-number density summary
    "q_transitivity" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.transitivity(edges)
    }),

    // degree assortativity of the proximity graph: hubs-to-hubs or
    // hubs-to-leaves — the symmetric edge-direction trick makes Pearson a
    // sqrt-free ratio of exact int64 moments
    "q_assortativity" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.degreeAssortativity(edges)
    }),

    // per-node local clustering coefficient over the same proximity graph:
    // the per-node clique-ness score — exact integer (deg, triangles) plus
    // ONE shared IEEE final expression (Graphs.clusteringFinalSql), so the
    // doubles hash-match the oracle bit-for-bit; triangle-free nodes 0,
    // degree-1 nodes NULL (no closing edge is even possible)
    "q_clustering_coeff" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.clusteringCoefficient(edges)
    }),

    // 8-core of the proximity graph: the density filter that keeps the
    // mutually-linked community and peels star boilerplate — bounded
    // confluent peel, converges in 5 rounds at sf0.01, hash-exact vs a
    // 6-round unrolled replay (extra rounds past the fixpoint are no-ops)
    "q_kcore" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.kCore(edges, k = 8, maxRounds = 12)
    }),

    // synchronous label propagation (3 rounds) over the same proximity
    // graph: every node adopts its neighbors' MODE label under the
    // deterministic (count DESC, label ASC) tie rule — the fixed round
    // count makes the whole dynamic hash-exact vs the unrolled replay
    "q_lpa" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.labelPropagation(edges, rounds = 3)
    }),

    // damped PageRank (3 rounds) over the same proximity graph, in scaled
    // INTEGER arithmetic — shuffle-order-independent, so the iterative
    // operator is hash-exact against an unrolled-CTE SQL replay instead
    // of tolerance-checked; per round: one adjacency equi-join + one hash
    // aggregate, 16-byte rank rows only
    "q_pagerank" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.pageRankScaled(edges, rounds = 3)
    }),

    // the CHECKPOINTED iteration exercised through a real crash: run one
    // committed round, abandon the session state, resume from the durable
    // round-1 manifest to completion — final ranks must be hash-identical
    // to the one-shot oracle (integer rounds make resume bit-safe)
    "q_pagerank_resume" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      val state = java.nio.file.Files.createTempDirectory("graft_pr_state_").toString
      Graphs.pageRankCheckpointed(edges, rounds = 3, state, maxRoundsThisRun = 1)
      Graphs.pageRankCheckpointed(edges, rounds = 3, state)
    }),

    // gaps-and-islands coverage: each event opens a 300 s presence
    // interval; overlapping-or-touching intervals merge into maximal
    // islands per user — per-user online-time accounting in exact
    // integer microseconds, one key shuffle, two window frames, no
    // self-join
    "q_islands" -> ((s, dir) => {
      val iv = events(s, dir).select(col("user_id"),
          // ts is TIMESTAMP_NTZ; the UTC session makes the cast the
          // identity DuckDB's epoch_us applies to the naive value
          unix_micros(col("ts").cast("timestamp")).as("s"))
        .withColumn("e", col("s") + 300000000L)
      IntervalJoin.mergeIslands(iv, Seq("user_id"), "s", "e")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("island_end") - col("island_start")).as("covered_us"))
    }),

    // link prediction over the 500 km proximity graph: NON-adjacent
    // customer pairs sharing >= 3 common neighbors, with the exact count
    // — wedge join at the center node + one hash aggregate + one
    // left-anti join against the edges; the wedge volume is the answer's
    // own size (every common neighbor is a wedge), not a plan artifact
    "q_link_predict" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
      Graphs.commonNeighborPairs(edges, minCommon = 3)
    }),

    // mutual-kNN graph: pairs where EACH point is in the other's exact
    // 5-NN — the noise-robust proximity graph clustering/SemDeDup-style
    // pipelines build (one-sided kNN edges to a dense hub are dropped).
    // The exact all-pairs kNN is computed once and pinned; mutuality is
    // one equi-join of that (id, neighbor) table with itself
    "q_mutual_knn" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val knn = Knn.knnSelfJoin(pts, "c_custkey", "lat", "lon", k = 5)
        .select(col("id"), col("neighbor_id")).localCheckpoint()
      knn.as("a").join(knn.as("b"),
          col("a.id") === col("b.neighbor_id") && col("a.neighbor_id") === col("b.id"))
        .where(col("a.id") < col("a.neighbor_id"))
        .select(col("a.id").as("id_a"), col("a.neighbor_id").as("id_b"))
    }),

    // record linkage / entity resolution: customers vs a synthesized
    // noisy registration table (name formatting drift, ~1-2 km location
    // jitter, occasional wrong nation, plus far-away same-name imposters
    // that must NOT link). Blocking equi-join on the normalized name,
    // integer Fellegi-Sunter-style score (close-within-5km=3 +
    // nation-agrees=2, accept >= 5): drifted true matches link, the
    // wrong-nation and imposter rows are rejected by score — all
    // replayable in SQL, no float tolerance
    "q_record_linkage" -> ((s, dir) => {
      val cust = customer(s, dir).select("c_custkey", "c_name", "c_nationkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val regs = cust.select(
        (col("c_custkey") + 1000000L).as("reg_id"),
        when(col("c_custkey") % 3 === 0, lower(col("c_name")))
          .when(col("c_custkey") % 3 === 1,
            regexp_replace(col("c_name"), "Customer#", "CUSTOMER #"))
          .otherwise(col("c_name")).as("reg_name"),
        (col("lat") + (col("c_custkey") % 7 - 3) * 0.003).as("rlat"),
        (col("lon") + (col("c_custkey") % 11 - 5) * 0.003).as("rlon"),
        when(col("c_custkey") % 50 === 0, col("c_nationkey") + 1)
          .otherwise(col("c_nationkey")).as("reg_nation"))
      val imposters = cust.where(col("c_custkey") % 10 === 0).select(
        (col("c_custkey") + 2000000L).as("reg_id"),
        col("c_name").as("reg_name"),
        (-col("lat")).as("rlat"),
        when(col("lon") >= 0, col("lon") - 180.0)
          .otherwise(col("lon") + 180.0).as("rlon"),
        col("c_nationkey").as("reg_nation"))
      RecordLinkage.link(
        cust, "c_custkey", "c_name", "lat", "lon", "c_nationkey",
        regs.unionByName(imposters), "reg_id", "reg_name", "rlat", "rlon", "reg_nation",
        maxDistM = 5000.0, wClose = 3, wAttr = 2, minScore = 5)
    }),

    // bounded-hop SSSP: exact <= 4-hop shortest distances from the
    // max-degree hub of the proximity graph, integer edge weights (pure
    // id arithmetic — float-derived weights would make the truncation
    // engine-dependent), min-plus Bellman-Ford rounds that are hash-exact
    // against an unrolled-CTE replay; seed selection stays plan-side
    "q_sssp" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      val edges = SpatialJoin.distanceJoin(pts, "lat", "lon", "c_custkey", radiusM = 500000.0)
        .select("id_a", "id_b")
        .withColumn("w", (col("id_a") * 31 + col("id_b") * 17) % 1000 + 1)
      val hub = Graphs.degrees(edges)
        .orderBy(col("deg").desc, col("src").asc).limit(1)
        .select(col("src").as("id"))
      Graphs.boundedSssp(edges, hub, hops = 4)
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

    // map matching: k nearest polylines within 800 km of each point,
    // ranked per point by (distance, line_id)
    "q_knn_polylines" -> ((s, dir) =>
      SpatialJoin.nearestPolylinesJoin(points(s, dir), "o_orderkey", "lat", "lon",
          polylineTable(s, dir), "line_id", "lats", "lons",
          radiusM = KnnPolylinesRadiusM, k = 2)
        .select(col("line_id"), col("o_orderkey"), col("rank"))),

    // which routes properly cross: shared-covering-cell candidates at
    // level 5, pair dedup, exact robust-crossing refine over edge pairs
    "q_polyline_cross_join" -> ((s, dir) =>
      SpatialJoin.polylineCrossJoin(routeTable(s, dir), "line_id",
          "lats", "lons", level = 5)
        .select("id_a", "id_b")),

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

    // the stream-stream join twin over the SAME batch input (the watermark
    // node is eliminated on batch; the event-time range condition replaces
    // the ±1 time-bucket explode) — identical semantics, identical oracle
    "q_st_join_stream" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      graft.streaming.EventStreams.spatioTemporalPairs(pts, "event_id", "ts",
          "lat", "lon", radiusM = StJoinRadiusM, windowSec = StJoinWindowSec)
        .select("id_a", "id_b")
    }),

    // density clustering (DBSCAN, exact): eps-graph from the bucketed
    // distance self-join, cores by degree, clusters = min-label connected
    // components of the core-core graph, borders -> min core-neighbor
    // cluster; noise rows absent
    // seeded integer-Lloyd k-means (3 rounds, k=8): squared-L2 assignment
    // and sum-div-n centroid updates in pure int64, so the distributed
    // iteration is hash-exact vs the unrolled-CTE replay — float Lloyd
    // would depend on partial-agg addition order; centroids stay a
    // broadcast plan-side table, never a driver collect
    "q_kmeans" -> ((s, dir) => {
      val pts = orders(s, dir)
        .withColumn("x", expr("(o_orderkey * 9973 + 12345) % 18000"))
        .withColumn("y", expr("(o_orderkey * 31337 + 54321) % 36000"))
      Clustering.kMeansScaled(pts, "o_orderkey", "x", "y", KMeansSeeds, rounds = 3)
    }),

    "q_dbscan" -> ((s, dir) => {
      val pts = customer(s, dir).select("c_custkey")
        .withColumn("lat", expr(CustLatSql))
        .withColumn("lon", expr(CustLonSql))
      Clustering.dbscan(pts, "c_custkey", "lat", "lon",
          epsM = DbscanEpsM, minPts = DbscanMinPts)
        .select("id", "cluster_id", "is_core")
    }),

    // --- dedup family over documents (augmented with planted duplicates) ---
    "q_exact_dedup" -> ((s, dir) =>
      Dedup.exactDedup(documents(s, dir), "doc_id", Seq("text"))
        .select("doc_id", "dup_count")),

    // LSH is the recall stage (bands of 2 rows: P(miss | jaccard >= 0.9)
    // ~ (1 - 0.81)^16 ~ 3e-12); exact n-gram Jaccard verification runs on
    // exact-dup representatives only, then expands (Dedup.nearDupPairs).
    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.nearDupPairs(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
        numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
        .select("id_a", "id_b")),

    "q_simhash_pairs" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b")
    }),

    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.nearDupPairs(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
        numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
        .select("id_a", "id_b", "jaccard")),

    // sorted-neighborhood near-dup (merge/purge — the third candidate
    // family next to blocking and LSH): one range sort + a constant
    // n*(window-1) candidate explode — never data-dependent — then exact
    // trigram-Jaccard verify; w=10 recovers this corpus's full LSH answer
    "q_snm_pairs" -> ((s, dir) =>
      SortedNeighborhood.snmNearDupPairs(documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", window = 10, minJaccard = 0.9)
        .select("id_a", "id_b", "jaccard")),

    // EXACT all-pairs set-cosine self-join (AllPairs/PPJoin prefix
    // filtering — the ground-truth counterpart of the LSH family): every
    // trigram-set pair with cosine^2 >= 49/100, integer predicate, no
    // recall knob, no bucket cap
    "q_allpairs_cosine" -> ((s, dir) =>
      AllPairs.cosineSelfJoin(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
        t2Num = 49, t2Den = 100)),

    // substring-level exact dedup: pairs sharing any verbatim >= 8-token
    // span (inverted n-gram-fingerprint join + exact set verification)
    "q_substring_dups" -> ((s, dir) =>
      Dedup.substringDups(documents(s, dir).select("doc_id", "text"), "doc_id", "text", n = 8)
        .select("id_a", "id_b")),

    // incremental corpus dedup: a new batch (doc_id % 10 == 0) deduped
    // against the standing corpus WITHOUT re-pairing the corpus with
    // itself. The corpus signature table is a build-once fixture (the
    // ingest-time persisted layout), so the measured run computes
    // signatures for the BATCH only and probes stored ones — corpus text
    // is read just for candidate verification
    "q_incremental_dedup" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      val sigDir = fixture(dir, "corpus_sigs") { p =>
        Dedup.minhashBandedSignatures(corpus, "doc_id", "text", numHashes = 32, bands = 16)
          .write.mode("overwrite").parquet(p)
      }
      Dedup.incrementalNearDupStored(
        s.read.parquet(sigDir), corpus,
        batch = docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", numHashes = 32, bands = 16,
        minJaccard = 0.9, minEstJaccard = 0.5)
        .select("id_a", "id_b")
    }),

    // decontamination: corpus docs sharing any verbatim >= 4-token span
    // with the eval set (doc_id % 25 == 0 plays the benchmark suite);
    // asymmetric fingerprint probe — the corpus is never self-paired.
    // n = 4 (not the production-default 8) because the synthetic corpus
    // draws from a ~40-word vocabulary, where 4-gram overlap plays the
    // role 8-13-gram overlap plays on real text
    "q_decontaminate" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      Dedup.decontaminate(
        docs.where(col("doc_id") % 25 =!= 0),
        docs.where(col("doc_id") % 25 === 0),
        "doc_id", "text", n = 4)
        .select("doc_id", "eval_id")
    }),

    // duplicate clusters: connected components over the verified near-dup
    // pair graph; cluster_id = canonical (minimum) doc id per component
    "q_dup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Dedup.nearDupPairs(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
          numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
          .select("id_a", "id_b"))
        .select("doc_id", "cluster_id")),

    // the dedup report: cluster-size histogram + exact redundancy counts
    // over the same connected components — "how much would dedup save?",
    // the summary a pipeline logs before committing its keep list
    "q_dedup_report" -> ((s, dir) =>
      Dedup.clusterSizeReport(
        Dedup.duplicateClusters(
          Dedup.nearDupPairs(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
            numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
            .select("id_a", "id_b"))
          .select("doc_id", "cluster_id"))),

    // deduplicated-corpus keep list: the dedup pipeline's actual output —
    // every doc that is a singleton or its cluster's canonical (min) id;
    // non-canonical near-dup cluster members are dropped via one anti join
    "q_dedup_keep" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      Dedup.dedupKeep(docs, "doc_id",
        Dedup.nearDupPairs(docs, "doc_id", "text",
          numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
          .select("id_a", "id_b"))
        .select("doc_id")
    }),

    // END-TO-END curation pipeline — the composition showcase: language
    // gate (predicted en) -> minimum-length gate (>= 20 tokens) ->
    // exact-dup collapse (min doc_id per raw text) -> near-dup keep list
    // (LSH + exact trigram verify + connected components) -> token-budget
    // packing of the survivors. Every stage is an already-oracled
    // operator; the chain replays as ONE CTE pipeline, hash-exact —
    // proving the library COMPOSES, not just that each piece works
    "q_pipeline_keep" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      val en = docs.join(
        TextAnalysis.langId(docs, "doc_id", "text")
          .where(col("lang_pred") === "en").select("doc_id"), "doc_id")
      val sized = en.withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .where(col("n_tokens") >= 20)
      val reps = sized.groupBy("text")
        .agg(min("doc_id").as("doc_id"), max("n_tokens").as("n_tokens"))
      val repDocs = reps.select("doc_id", "text")
      val keep = Dedup.dedupKeep(repDocs, "doc_id",
        Dedup.nearDupPairs(repDocs, "doc_id", "text",
          numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
          .select("id_a", "id_b"))
      val kept = reps.join(keep.select("doc_id"), "doc_id").select("doc_id", "n_tokens")
      Curation.packByBudget(kept, "doc_id", "n_tokens", budgetTokens = 200, buckets = 8)
        .select("doc_id", "n_tokens", "bucket", "batch_id")
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

    // characteristic terms per doc (tf-idf with an integer-exact rank
    // contract: tf DESC, df ASC, term ASC)
    "q_top_terms" -> ((s, dir) =>
      TextAnalysis.topTerms(documents(s, dir), "doc_id", "text", k = 3)),

    // Heaps-law vocabulary-growth curve: per corpus decile, exact integer
    // (n_tokens, new_types, cum_types) — the dedup/boilerplate health
    // probe (a flat tail = duplicate mass, a linear tail = id junk);
    // one token explode, two-pass doc rank, bucket-cardinality cumulative.
    // This synthetic corpus mints its whole 31-term vocabulary in decile
    // 0 — exactly the flat-tail signature the probe exists to flag
    // (VocabGrowthSpec plants a genuinely growing corpus)
    "q_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(documents(s, dir), "doc_id", "text", buckets = 10)),

    // corpus-level phrase mining: top-20 bigram collocations by PMI with
    // the integer-exact scaled-quotient score (same rank as PMI — the
    // N^2/B factor is a corpus constant); hapax filter c_xy >= 5
    "q_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(documents(s, dir), "text", minCount = 5, k = 20)),

    // TextRank keyword extraction: damped scaled-INTEGER PageRank over the
    // adjacent-token co-occurrence graph, WEIGHTED by bigram counts (the
    // word graph is near-complete, so weights carry the signal), top-20
    // under (pr DESC, word ASC) — hash-exact vs the unrolled-CTE replay
    "q_keywords" -> ((s, dir) =>
      TextAnalysis.textRankKeywords(documents(s, dir), "text",
        minCount = 2, rounds = 3, k = 20)),

    // BM25 full-text retrieval: top-5 docs per query, inverted-index shape
    // (vocabulary filter inside the scan, only (id, dl, term) shuffles,
    // ordered-fold score so the float is bit-reproducible); rank-only
    // contract — the oracle replays the identical addition order, and
    // RetrievalSpec pins the adjacent-rank margin that makes ranks stable
    // under cross-engine ln/division ulps
    "q_bm25" -> ((s, dir) =>
      Retrieval.bm25TopK(documents(s, dir), "doc_id", "text", Bm25Queries, k = 5)),

    // distributed BPE tokenizer training (3 merges for the oracle; the
    // spec trains 8 against a driver-side reference): corpus scanned once
    // into the distinct-word freq table, each round = one pair count +
    // TakeOrdered argmax + one map. Integer counts + lexicographic ties —
    // exact, no floats
    "q_bpe_train" -> ((s, dir) =>
      Bpe.train(documents(s, dir), "text", numMerges = 3)),

    // BPE encoding under the 3 learned merges: per-doc token count — the
    // number that prices a document into a training budget. The merge
    // list is driver state from train; the encode is a scan-stage map +
    // one aggregate
    "q_bpe_encode" -> ((s, dir) => {
      val merges = Bpe.train(documents(s, dir), "text", numMerges = 3)
        .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.encodeCounts(documents(s, dir), "doc_id", "text", merges)
    }),

    // context-window chunking (50 tokens, overlap 10): array transform +
    // explode inside the scan, no UDF, text never shuffles; integer
    // boundaries and space-rejoined slices are mirrored exactly in SQL
    "q_chunks" -> ((s, dir) =>
      Curation.chunkDocs(documents(s, dir).select("doc_id", "text"), "text",
          maxTokens = 50, overlap = 10)
        .select("doc_id", "chunk_idx", "n_tokens", "chunk")),

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

    // fastText-shaped multinomial Naive Bayes classifier (closed-form
    // counts training — nothing iterative or order-dependent): trained on
    // the lang labels, predicts every doc; argmax-only contract, per-doc
    // class margins spec-pinned over the gate population
    "q_nb_classify" -> ((s, dir) =>
      NaiveBayes.trainPredict(documents(s, dir), "doc_id", "text", "lang")),

    // CCNet-style LM perplexity quality filter: bigram model trained ON
    // the corpus, worst-50 documents by avg negative log-likelihood.
    // Ordered-fold float discipline + rank-only contract (the q_bm25
    // rules); LanguageModelSpec pins the adjacent-rank margin that makes
    // ranks stable under cross-engine ln ulps
    "q_lm_perplexity" -> ((s, dir) =>
      LanguageModel.perplexityWorstK(documents(s, dir), "doc_id", "text", k = 50)),

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

    // PIP join against a TABLE of polygons (vs q_pip_polygon's driver-side
    // Seq): 25 convex hexagon loops live as (region_id, lats, lons) rows,
    // are rasterized executor-side to level-6 cells with interior flags,
    // equi-join points on their level-6 tile, and only boundary-cell hits
    // run the exact s2_loop_contains refinement — vertex arrays are nulled
    // on interior cells so they never shuffle for fast-path rows
    "q_poly_table_join" -> ((s, dir) =>
      SpatialJoin.polygonPipJoin(points(s, dir), "lat", "lon",
          hexPolyTable(s, dir), "region_id", "lats", "lons", level = 6)
        .select("region_id", "o_orderkey")),

    // PIP ANTI join: points contained by NO polygon of the table (the
    // exclusion-zone curation filter) — exact complement of
    // q_poly_table_join over o_orderkey
    "q_pip_anti" -> ((s, dir) =>
      SpatialJoin.polygonPipAntiJoin(
          points(s, dir).select("o_orderkey", "lat", "lon"),
          "o_orderkey", "lat", "lon",
          hexPolyTable(s, dir), "region_id", "lats", "lons", level = 6)
        .select("o_orderkey")),

    // zonal statistics: per-region point count + integer-exact value sum
    // with the aggregation PUSHED BELOW the join for interior cells —
    // interior points collapse to per-tile partials before any join, only
    // the boundary shell runs the per-point refine
    "q_zonal_stats" -> ((s, dir) =>
      SpatialJoin.zonalStats(points(s, dir).select("o_orderkey", "lat", "lon"),
        "lat", "lon", "o_orderkey",
        hexPolyTable(s, dir), "region_id", "lats", "lons", level = 6)),

    // k nearest REGIONS within 500 km of each point (0 inside, boundary
    // distance outside): the region form of kNN, ranked per point by
    // (distance, region_id)
    "q_knn_regions" -> ((s, dir) => {
      val catalog = hexPolyTable(s, dir).unionByName(
        hexPolyVarTable(s, dir).withColumn("region_id", col("region_id") + 100L))
      SpatialJoin.nearestRegionsJoin(points(s, dir), "o_orderkey", "lat", "lon",
          catalog, "region_id", "lats", "lons",
          radiusM = KnnRegionsRadiusM, k = 3)
        .select(col("region_id"), col("o_orderkey"), col("rank"))
    }),

    // region-region intersection over a TABLE of arbitrary convex loops
    // (the polygon generalization of q_rect_join): both hexagon fixtures
    // as one 50-region catalog, candidates share a level-5 covering cell,
    // pair-id dedup, exact loop-interior refine
    "q_loop_intersect_join" -> ((s, dir) => {
      val a = hexPolyTable(s, dir)
      val b = hexPolyVarTable(s, dir)
        .withColumn("region_id", col("region_id") + 100L)
      SpatialJoin.loopIntersectJoin(a.unionByName(b), "region_id", "lats", "lons",
        level = 5)
    }),

    // distributed raster->vector: level-4 tiles grouped under their level-2
    // ancestor are assembled into outline polygons ON THE EXECUTORS
    // (mapGroups — no driver geometry), then gated executor-side: every
    // member tile's center must fall INSIDE its group's polygon and every
    // non-member edge-neighbor's center OUTSIDE (vector output reproduces
    // raster membership exactly, over- and under-coverage both fatal);
    // only points of fully-passing groups count, so the single-row total
    // equals the plain point count — the q_tile_counts derived-oracle
    // pattern
    "q_vectorize_dist" -> ((s, dir) => {
      val members = points(s, dir).select(
          s2_token(s2_parent(s2_cell_id(col("lat"), col("lon")), 2)).as("grp"),
          s2_tile(col("lat"), col("lon"), 4).as("tile"))
        .groupBy("grp", "tile").agg(count(lit(1)).as("pts"))
      // materialize: two gates consume the polygons; without this the
      // mapGroups assembly would run once per gate
      val polys = Vectorize.vectorizeGroupsDistributed(members, "grp", "tile")
        .localCheckpoint()
      val memberGate = members.join(polys, "grp")
        .groupBy("grp").agg(sum("pts").as("pts"), count(lit(1)).as("n"),
          sum(when(s2_polygon_contains(col("loop_lats"), col("loop_lons"),
            s2_cell_lat(col("tile")), s2_cell_lon(col("tile"))), 1L).otherwise(0L))
            .as("n_inside"))
      val nbrGate = members
        .select(col("grp"), explode(s2_edge_neighbors(col("tile"))).as("nbr"))
        .join(members.select(col("grp"), col("tile").as("nbr")), Seq("grp", "nbr"),
          "left_anti")
        .join(polys, "grp")
        .groupBy("grp").agg(count(lit(1)).as("m"),
          sum(when(!s2_polygon_contains(col("loop_lats"), col("loop_lons"),
            s2_cell_lat(col("nbr")), s2_cell_lon(col("nbr"))), 1L).otherwise(0L))
            .as("m_outside"))
      memberGate.join(nbrGate, Seq("grp"), "left")
        .where(col("n") === col("n_inside") &&
          (col("m").isNull || col("m") === col("m_outside")))
        .agg(sum("pts").cast("long").as("total_points"))
    }),

    // the size-ADAPTIVE polygon-table join: radii span ~250x in area, so
    // each row picks its own covering level from the quantized menu —
    // results are level-independent, only the plan changes
    "q_poly_adaptive_join" -> ((s, dir) =>
      SpatialJoin.polygonPipJoinAdaptive(points(s, dir), "lat", "lon",
          hexPolyVarTable(s, dir), "region_id", "lats", "lons",
          targetCells = 32, quantizeLevels = Seq(4, 6, 8))
        .select("region_id", "o_orderkey")),

    // points within 150 km of any of a TABLE of polylines (map-matching
    // prefilter): executor-side chain coverings + neighbor-ring buckets at
    // the radius-derived level, single-cell point probe, exact
    // min-over-edges refine
    "q_polyline_join" -> ((s, dir) =>
      SpatialJoin.polylineDistanceJoin(points(s, dir), "lat", "lon",
          polylineTable(s, dir), "line_id", "lats", "lons", PolylineJoinRadiusM)
        .select("line_id", "o_orderkey")),

    // map-matching snap: nearest line within 150 km per point + nearest
    // edge index on it (which road, which segment). Candidates from the
    // polyline raster join, rank-1 window per point, one nearest-edge
    // refinement per match. SnapJoinSpec pins the margins (winner gap,
    // radius boundary, edge gap) that make the argmin cross-engine exact
    "q_snap_join" -> ((s, dir) =>
      SpatialJoin.snapToPolylines(points(s, dir), "o_orderkey", "lat", "lon",
          polylineTable(s, dir), "line_id", "lats", "lons", PolylineJoinRadiusM)
        .select("o_orderkey", "line_id", "edge_idx")),

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

    // ONLINE map matching: the streaming twin run over the batch table —
    // per fix, the forward-frontier argmin (the live filter view, before
    // future fixes retro-smooth); O(frontier) state per track, candidate
    // raster is a stream-static broadcast join. Cross-batch MemoryStream
    // behavior spec-pinned in MapMatchStreamSpec
    "q_map_match_stream" -> ((s, dir) =>
      graft.streaming.MapMatchStream.matchStream(mapMatchPoints(s, dir),
        "user_id", "ts", "event_id", "lat", "lon",
        polylineTable(s, dir), "line_id", "lats", "lons",
        radiusM = PolylineJoinRadiusM).toDF()),

    // the multi-loop (shell + hole) variant: XOR-parity containment at
    // table granularity — covering cells inside the hole never exist, the
    // refine is the exact S2Polygon parity test
    "q_holed_table_join" -> ((s, dir) =>
      SpatialJoin.multiPolygonPipJoin(points(s, dir), "lat", "lon",
          holedPolyTable(s, dir), "region_id", "loop_lats", "loop_lons", level = 6)
        .select("region_id", "o_orderkey")),

    // co-located bucketed join: both sides pre-hashed into 8 buckets on
    // the customer key, so the join itself plans with NO Exchange on
    // either side (asserted in BucketingSpec); only the tiny per-segment
    // aggregation shuffles
    "q_bucketed_join" -> ((s, dir) => {
      val tag = new java.io.File(dir).getName.replace('.', '_')
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_${FixtureVersion}_$tag"
      Bucketing.ensureBucketed(s, orders(s, dir), s"g_orders_$tag", "o_custkey", 8,
        s"$base/orders")
      Bucketing.ensureBucketed(s, customer(s, dir), s"g_customer_$tag", "c_custkey", 8,
        s"$base/customer")
      Bucketing.bucketedJoin(s, s"g_orders_$tag", "o_custkey", s"g_customer_$tag", "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), countDistinct("o_custkey").as("n_custs"),
          min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"))
    }),

    // exact frequent trigrams (contamination/boilerplate screen):
    // space-saving candidate pass + exact verification; only candidates
    // ever shuffle
    "q_heavy_hitters" -> ((s, dir) =>
      HeavyHitters.frequentNgrams(documents(s, dir), "text", n = 3,
        minFraction = 0.0002)
        .select("gram", "cnt")),

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

    // the STREAMING twin: per-cell register state folded across
    // micro-batches (256 bytes per cell, never an id set) — batch-mode run
    // of the flatMapGroupsWithState operator, same register replay oracle;
    // StreamingSketchesSpec pins cross-batch == batch and replay
    // idempotence on a MemoryStream
    "q_cell_visitors_hll_stream" -> ((s, dir) => {
      val pts = events(s, dir)
        .withColumn("lat", expr(latSqlFor("event_id")))
        .withColumn("lon", expr(lonSqlFor("event_id")))
      val cells = Tiling.geohashEncode(pts, "lat", "lon", 1, out = "cell")
        .select("cell", "user_id")
      graft.streaming.StreamingSketches.cellVisitorsHll(cells, "cell", "user_id").toDF()
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

    // Bloom-pruned exact semi join: lineitem rows whose part key belongs to
    // a selective part subset; the probabilistic prune runs codegen'd over
    // the scan, the exact pass sees only survivors -> result == plain semi
    // join, oracle-checkable
    "q_bloom_semi" -> ((s, dir) =>
      BloomJoin.prunedSemiJoin(
        lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_partkey"),
        part(s, dir).where(col("p_size") === 1), "l_partkey", "p_partkey")
        .select("l_orderkey", "l_linenumber", "l_partkey")),

    // one-scan data profiling: per-column null/distinct/extreme stats over
    // the documents table (exact distincts -> DuckDB-checkable)
    "q_profile" -> ((s, dir) =>
      Profiling.profile(documents(s, dir),
        numericCols = Seq("doc_id", "n_chars"), stringCols = Seq("lang", "source"))),

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

    // GeoJSON polygons DRIVE the real join: the hexagon catalog roundtrips
    // through Polygon features (closed rings on disk, reopened by the
    // reader) and feeds polygonPipJoin — bit-identical coordinates, so the
    // q_poly_table_join oracle applies verbatim
    "q_geojson_poly_join" -> ((s, dir) => {
      val gj = fixture(dir, "hex_geojsonl") { p =>
        GeoJson.writePolygons(
          hexPolyTable(s, dir).select(col("region_id"),
            array(col("lats")).as("latss"), array(col("lons")).as("lonss")),
          "region_id", "latss", "lonss", p)
      }
      val polys = GeoJson.readPolygons(s, gj)
        .select(element_at(col("props"), "id").cast("long").as("region_id"),
          element_at(col("latss"), 1).as("lats"),
          element_at(col("lonss"), 1).as("lons"))
      SpatialJoin.polygonPipJoin(points(s, dir), "lat", "lon",
          polys, "region_id", "lats", "lons", level = 6)
        .select("region_id", "o_orderkey")
    }),

    // image metadata gate: every 25th row claims a wrong width — the gate
    // must flag exactly those (decoded dims vs cataloged columns)
    "q_image_meta_gate" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val mislabeled = images.withColumn("w",
        when(col("p_partkey") % 25 === 0, col("w") + 1).otherwise(col("w")))
      ImagePayload.metaGate(mislabeled)
        .select(col("p_partkey"), col("meta_ok"))
    }),

    // --- similarity search over embeddings ---
    "q_ann_brute" -> ((s, dir) =>
      Similarity.bruteForceTopK(embeddings(s, dir), "vec_id", "embedding",
        queryIds = 0L until 10L, k = 5)
        .select("query_id", "neighbor_id")),

    // k-NN majority-vote classification: each probe labeled by its 5
    // exact nearest neighbors under the deterministic (votes DESC, label
    // ASC) rule — integer votes over q_ann_brute's pinned ranking, so the
    // whole result is hash-exact; probes 0..39 give a non-unanimous mix
    "q_knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(embeddings(s, dir), "vec_id", "embedding", "label",
        queryIds = 0L until 40L, k = 5)),

    // hard-negative mining: per anchor, the 5 most-similar CROSS-label
    // rows (the contrastive-training negatives that sit just across the
    // decision boundary); q_ann_brute's shape plus the label predicate
    "q_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(embeddings(s, dir), "vec_id", "embedding", "label",
        queryIds = 0L until 10L, k = 5)
        .select("query_id", "neighbor_id")),

    "q_ann_bucketed" -> ((s, dir) =>
      Similarity.bucketedAnn(embeddings(s, dir), "vec_id", "embedding",
        queryIds = 0L until 10L, k = 5, dim = EmbeddingDim)
        .select("query_id", "neighbor_id")),

    // IVF coarse-quantizer ANN through the PERSISTED index: the quantizer
    // trains and assigns once (fixture); the measured query is the
    // partition-pruned probe (approximate by design -> rows-only here;
    // recall >= 0.9 vs brute force is pinned by EmbeddingRecallSpec)
    // PQ ANN: asymmetric-distance shortlist over m-byte codes + exact
    // re-rank — the compressed-scan member of the ANN family (rows-only
    // here; recall >= 0.9 is EmbeddingRecallSpec-pinned like the others)
    "q_ann_pq" -> ((s, dir) =>
      Similarity.pqAnn(embeddings(s, dir), "vec_id", "embedding",
        queryIds = 0L until 10L, k = 5)
        .select("query_id", "neighbor_id", "rank")),

    "q_ann_ivf" -> ((s, dir) => {
      val idx = fixture(dir, "ivf_index") { p =>
        Similarity.buildIvfIndex(embeddings(s, dir), "vec_id", "embedding", p)
      }
      Similarity.queryIvf(s, idx,
        embeddings(s, dir).where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id")
    }),

    // IVF-PQ: the two persisted-index halves composed (FAISS-IVFPQ shape) —
    // partition-pruned probe of nprobe lists, vector-free ADC shortlist
    // over the m-int codes, exact re-rank within the pruned partitions.
    // Rows-only; recall >= 0.9 and both plan contracts (partition pruning,
    // codes-not-vec shortlist schema) are EmbeddingRecallSpec-pinned
    "q_ann_ivfpq" -> ((s, dir) => {
      val idx = fixture(dir, "ivfpq_index") { p =>
        Similarity.buildIvfPqIndex(embeddings(s, dir), "vec_id", "embedding", p)
      }
      Similarity.queryIvfPq(s, idx,
        embeddings(s, dir).where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "rank")
    }),

    // embedding-cosine near-duplicate pairs: exact all-pairs form (small
    // vector tables; oracle-checked) and the LSH-bucketed scale path
    "q_embed_neardup" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      // spread the streamed side of the cartesian across cores (the table
      // is one parquet file = one input split)
      val a = emb.repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id").as("id_a"), col("embedding").as("vec_a"),
        Similarity.norm(col("embedding")).as("na"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"),
        Similarity.norm(col("embedding")).as("nb"))
      a.crossJoin(b)
        .where(col("id_a") < col("id_b"))
        .where(Similarity.cosineFast(col("vec_a"), col("vec_b"), col("na"), col("nb")) >= 0.3)
        .select("id_a", "id_b")
    }),

    "q_embed_neardup_lsh" -> ((s, dir) =>
      Similarity.embeddingNearDup(embeddings(s, dir), "vec_id", "embedding", minCosine = 0.3,
        dim = EmbeddingDim)
        .select("id_a", "id_b")),

    // SemDeDup-style semantic keep list: connected components over the
    // exact embedding-cosine near-dup graph (the oracle-grade pair path of
    // q_embed_neardup), keep each cluster's canonical (min) vec_id plus
    // all singletons. At 100 TB the same dedupKeep composes with the LSH
    // pair path (q_embed_neardup_lsh) instead of the cartesian baseline
    "q_semantic_keep" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val a = emb.repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id").as("id_a"), col("embedding").as("vec_a"),
          Similarity.norm(col("embedding")).as("na"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"),
        Similarity.norm(col("embedding")).as("nb"))
      val pairs = a.crossJoin(b)
        .where(col("id_a") < col("id_b"))
        .where(Similarity.cosineFast(col("vec_a"), col("vec_b"), col("na"), col("nb")) >= 0.3)
        .select("id_a", "id_b")
      Dedup.dedupKeep(emb.select("vec_id"), "vec_id", pairs)
    }),

    "q_embed_stats" -> ((s, dir) =>
      embeddings(s, dir)
        .groupBy("label")
        .agg(count(lit(1)).as("cnt"),
          min(element_at(col("embedding"), 1)).as("min_e1"),
          max(element_at(col("embedding"), 1)).as("max_e1"))
        .orderBy("label")),

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
        col("event_type") === "purchase", col("event_id"), bins = 10)),

    // --- text analysis ---
    "q_text_stats" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"),
          length(col("text")).as("n_chars_m"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))),

    // PII scrub: plant emails/phones/URLs/IPs deterministically (the
    // synthetic corpus has none), then count + replace with typed tags;
    // clean_text string-equality and integer counts are both oracle-exact
    "q_pii_scrub" -> ((s, dir) => {
      val planted = documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 20 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com or +1 555 123 4567 see https://ex.com/p"), col("doc_id")))
            .otherwise(lit("")),
          when(col("doc_id") % 30 === 0,
            concat(lit(" node 10.0."), col("doc_id") % 256, lit(".7")))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.scrubPii(planted, "doc_id", "text")
    }),

    // within-doc repetition signals (Gopher-rules family): integer
    // token/bigram multiplicity counts — pure per-row expressions, no
    // shuffle; the repetitive-doc ratios derive from these exactly
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(documents(s, dir), "doc_id", "text")),

    "q_lang_agg" -> ((s, dir) =>
      documents(s, dir).groupBy("lang").agg(count(lit(1)).as("cnt")).orderBy("lang")),

    "q_langid_pred" -> ((s, dir) =>
      TextAnalysis.langId(documents(s, dir), "doc_id", "text")
        .select("doc_id", "lang_pred")),

    "q_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(documents(s, dir), "doc_id", "text")
        .select("doc_id", "n_tokens", "quality")),

    "q_fingerprint_dups" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
        .select("doc_id", "dup_count")),

    // --- image payload (synthesize + verify the north-rule invariants) ---
    "q_image_payload" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      ImagePayload.verifyPayload(images, "p_partkey")
        .where(col("psnr_ok") && col("caption_ok"))
        .select("p_partkey")
    }),

    // variance-of-Laplacian blur gate: every 8th image is replaced by its
    // bilinear low-pass copy and the gate must flag exactly those — a
    // planted-id oracle, exact because the sharp (independent-pixel noise)
    // and blurred (piecewise-linear) populations straddle the threshold
    // with >= 4x margin on both sides (ImageSharpnessSpec)
    // grayscale/low-color gate (the LAION-style colorfulness filter):
    // every 12th image arrives DECOLORIZED on the real pixel path
    // (decode -> luminance collapse -> re-encode); the Hasler–Süsstrunk
    // score separates them from the colored population by a spec-pinned
    // margin (gray == exactly 0), so the planted ids are the exact answer
    "q_image_gray" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val mixed = images.where(col("p_partkey") % 12 =!= 0)
        .unionByName(ImagePayload.withGrayscale(images.where(col("p_partkey") % 12 === 0)))
      ImagePayload.withColorfulness(mixed)
        .select(col("p_partkey"),
          (col("colorfulness") > lit(ColorfulnessThreshold)).as("colorful"))
    }),

    "q_image_sharpness" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val mixed = images.where(col("p_partkey") % 8 =!= 0)
        .unionByName(ImagePayload.withBlur(images.where(col("p_partkey") % 8 === 0)))
      ImagePayload.withSharpness(mixed)
        .select(col("p_partkey"), (col("sharpness") > lit(SharpnessThreshold)).as("sharp"))
    }),

    // real PNG decode + feature extraction must succeed for every row
    "q_image_features" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      ImagePayload.featureGate(images)
        .where(col("features_ok"))
        .select("p_partkey")
    }),

    // perceptual-hash image near-dup: plant single-pixel-patched copies of
    // every 40th image, find them by dhash banding. The planted set is
    // deterministic (p_partkey % 40 == 0 <-> key + 10^8) and unrelated
    // rasters sit at ~32 hamming bits, so the planted pairs ARE the exact
    // answer — oracled as such; ImageNearDupSpec asserts the full sf0.01
    // population has no natural <= 3-bit dhash collision, which is what
    // makes the planted-pair SQL exact rather than merely expected
    "q_image_neardup" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val planted = ImagePayload.withPatch(images.where(col("p_partkey") % 40 === 0), 2, 2, 1)
        .withColumn("p_partkey", col("p_partkey") + 100000000L)
      ImagePayload.imageNearDup(images.unionByName(planted), "p_partkey")
        .select("id_a", "id_b")
    }),

    // ROTATION-invariant near-dup: plant 90-deg-rotated re-uploads of
    // every 40th image; the orientation-canonical (D4-minimum) dhash puts
    // each rotated copy at hamming 0 from its source — rotation
    // invariance is EXACT, a pixel permutation, not approximate — while
    // unrelated canonical hashes stay ~32 bits apart (RotNearDupSpec pins
    // no natural <= 3-bit collision over the full population), so the
    // planted pairs ARE the exact answer
    "q_image_rot_neardup" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val planted = ImagePayload.withRotation(images.where(col("p_partkey") % 40 === 0), 1)
        .withColumn("p_partkey", col("p_partkey") + 100000000L)
      ImagePayload.rotImageNearDup(images.unionByName(planted), "p_partkey")
        .select("id_a", "id_b")
    }),

    // SSIM pixel-verify stage over a candidate-pair table: every 40th key
    // pairs with its corner-patched copy (true near-dup, SSIM ~1), every
    // (40k+20)th with its NEIGHBOR key's unrelated raster (decoy, SSIM ~0).
    // The 0.8 gate keeps exactly the planted copies; ImageSsimSpec pins
    // the two-sided margin that makes the planted rule the exact answer
    "q_image_ssim" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val src = images.select(col("p_partkey").as("id_a"), col("bytes").as("__ba"))
      val trueB = ImagePayload.withPatch(images.where(col("p_partkey") % 40 === 0), 2, 2, 1)
        .select(col("p_partkey").as("id_a"),
          (col("p_partkey") + 100000000L).as("id_b"), col("bytes").as("__bb"))
      val decoyB = images.select((col("p_partkey") - 1).as("id_a"),
          (col("p_partkey") + 200000000L).as("id_b"), col("bytes").as("__bb"))
        .where(pmod(col("id_a"), lit(40)) === 20)
      ImagePayload.ssimGate(
          src.join(trueB.unionByName(decoyB), "id_a"), "__ba", "__bb", tau = 0.8)
        .select("id_a", "id_b")
    }),

    // GEO-constrained image near-dup: patched near-copies planted AT their
    // source's location must pair; byte-identical copies relocated to the
    // ANTIPODE (dhash hamming 0 but 180 deg away — level-6 cells are
    // ~1.3 deg, so never same-or-adjacent) must NOT. The oracle is exactly
    // the colocated planted set: ImageNearDupSpec pins the preconditions
    // (no natural <= 3-bit collision in the population; patches stay
    // within 3 bits of their source), and the spatial constraint can only
    // REMOVE pairs from the globally-exact q_image_neardup answer
    "q_geo_image_neardup" -> ((s, dir) =>
      ImagePayload.geoImageNearDup(
        geoImagePopulation(part(s, dir).select("p_partkey")),
        "p_partkey", "lat", "lon", level = 6)
        .select("id_a", "id_b")),

    // per-REGION duplicate rate — the geo x dedup composition a corpus
    // health dashboard runs: PIP-label the certified geo-image population,
    // flag members of the geo-constrained dup-pair set, count per region.
    // Exact because both inputs are certified exact (q_pip_rect's join,
    // q_geo_image_neardup's planted pairs)
    "q_region_dup_rate" -> ((s, dir) => {
      val pop = geoImagePopulation(part(s, dir).select("p_partkey"))
      val pairs = ImagePayload.geoImageNearDup(pop, "p_partkey", "lat", "lon", level = 6)
      val dupIds = pairs
        .select(explode(array(col("id_a"), col("id_b"))).as("p_partkey")).distinct()
        .withColumn("is_dup", lit(1L))
      SpatialJoin.pipJoin(pop.select("p_partkey", "lat", "lon"), "lat", "lon",
          SparkEntryRegions.rects)
        .join(dupIds, Seq("p_partkey"), "left")
        .groupBy("region_id")
        .agg(count(lit(1)).as("n_images"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_members"))
    }),

    // cross-modal caption consistency: among caption-sharing images, split
    // true re-posts (near-identical pixels) from caption collisions with
    // divergent pixels. Planted structure: every 30th image gets a
    // byte-identical re-post (same caption, id + 2*10^8); every 45th gets
    // a FRESH unrelated raster wearing its caption (id + 3*10^8) — exact
    // oracle because captions embed the unique image id (no natural
    // caption groups) and unrelated 16x16 renders sit ~32 dhash bits
    // apart (CaptionConsistencySpec asserts the planted rasters clear the
    // <= 3-bit line with margin)
    "q_caption_consistency" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val key = col("p_partkey")
      val reposts = images.where(key % 30 === 0)
        .withColumn("p_partkey", key + 200000000L)
      val base = images.where(key % 45 === 0)
      val mislabeled = ImagePayload.synthesize(
          base.select((key + 300000000L).as("p_partkey")), "p_partkey")
        .drop("caption")
        .join(base.select((key + 300000000L).as("p_partkey"), col("caption")), "p_partkey")
      ImagePayload.captionConsistency(
        images.unionByName(reposts).unionByName(mislabeled), "p_partkey")
        .select("id_a", "id_b", "same_image")
    }),

    // real WAV decode (javax.sound, zero external codecs): container parse,
    // PCM decode, exact-sample equality and feature sanity must hold for
    // every row — any failure drops rows vs the all-parts oracle
    "q_audio_features" -> ((s, dir) => {
      val audio = AudioPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      AudioPayload.featureGate(audio, "p_partkey")
        .where(col("features_ok"))
        .select("p_partkey")
    }),

    // temporal audio near-dup: planted re-uploads (every 25th clip copied
    // under id+10^9 at gain 0.9 with analysis window 1 silenced — every
    // byte differs) recovered by same-position spectral-fingerprint
    // equality. The fingerprint is exactly gain-invariant, so a planted
    // pair shares all 7 un-muted window positions; AudioPayloadSpec pins
    // the no-natural-collision precondition (zero base-population pairs
    // even at minShared=1), making the planted set THE exact answer
    "q_audio_neardup" -> ((s, dir) => {
      val audio = AudioPayload.synthesizeTonalReposts(
        part(s, dir).select("p_partkey"), "p_partkey")
      AudioPayload.audioNearDup(audio, "p_partkey", minShared = 6)
    }),

    // real VIDEO parse + decode over the GRFV1 container (length-prefixed
    // real PNG frames, see VideoPayload): header fields, full-decode
    // validity, and the exact static/dynamic classification (motion == 0
    // iff all frame buffers equal frame 0's). Every 20th video is planted
    // static, every 33rd has a truncated last frame (frames_ok false,
    // is_static unknowable -> null); all three rules are integer-exact, so
    // the oracle recomputes them from p_partkey alone — VideoPayloadSpec
    // pins the no-natural-static precondition that makes it exact
    "q_video_meta" -> ((s, dir) => {
      val videos = VideoPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      VideoPayload.metaGate(videos)
        .select("p_partkey", "n_frames", "fps", "frames_ok", "is_static")
    }),

    // frame SAMPLING gate: reads + decodes ONLY frames 0, 2, 4, ... —
    // skipped frames are never copied out of the buffer (the 100-TB
    // sampling contract). The planted corruption sits in the LAST frame,
    // sampled iff (n_frames - 1) is even, so sampled_ok flips exactly on
    // the corrupt videos whose stride lands on the damage — the oracle
    // replays that parity rule in integer SQL
    "q_video_frames" -> ((s, dir) => {
      val videos = VideoPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      VideoPayload.sampledGate(videos, every = 2)
        .select("p_partkey", "n_sampled", "sampled_ok")
    }),

    // temporal video near-dup: planted re-posts (every 25th decodable video
    // copied under id+10^9 with frame 1 corner-patched) recovered by
    // same-position frame-dhash equality. Frame 1 is never sampled at
    // stride 2, so a planted pair shares ALL its sampled positions —
    // shared == n_sampled(src) — and VideoPayloadSpec asserts the base
    // population has no natural same-position dhash collision reaching
    // minShared, which makes the planted set THE exact answer
    "q_video_neardup" -> ((s, dir) => {
      val videos = VideoPayload.synthesizeReposts(part(s, dir).select("p_partkey"), "p_partkey")
      VideoPayload.videoNearDup(videos, "p_partkey", every = 2, minShared = 2)
    }),

    // video -> image-operator bridge: sampled frames exploded to rows and
    // run through the REAL image feature gate (one PNG decode per sampled
    // frame). Readable sampled frames pass; frames the truncation damaged
    // never appear — the survivors are an integer stride/parity rule
    "q_video_frame_features" -> ((s, dir) => {
      val videos = VideoPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val frames = VideoPayload.explodeSampledFrames(videos, every = 2)
        .withColumnRenamed("frame", "bytes")
      ImagePayload.featureGate(frames)
        .where(col("features_ok"))
        .select("p_partkey", "frame_idx")
    }),

    // geo x video: the metadata gate's outputs aggregated per spatial
    // region through the covering PIP join — videos carry the same
    // key-derived lat/lon as images, so the rect-branch oracle composes
    // with the integer gate rules
    "q_video_region_stats" -> ((s, dir) => {
      val videos = VideoPayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val gated = VideoPayload.metaGate(videos)
      SpatialJoin.pipJoin(gated, "lat", "lon", rectRegionsForParts)
        .groupBy("region_id")
        .agg(count(lit(1)).as("n_videos"),
          sum(when(col("is_static"), 1L).otherwise(0L)).as("n_static"),
          sum(when(col("frames_ok"), 0L).otherwise(1L)).as("n_bad"))
    }),

    "q_image_tile_join" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val tiled = Tiling.tileAssign(images, "lat", "lon", 8)
      SpatialJoin.pipJoin(tiled, "lat", "lon", rectRegionsForParts)
        .select("region_id", "image_id")
    }),

    // per-tile image mosaic (the atlas preview): every image REALLY
    // decoded scan-side, mercator zoom-5 rollup. The oracle checks tile
    // membership and that n_decoded == n_images (a decode failure shows
    // up as a count mismatch); the mosaic's average colors are pinned bit
    // for bit against the raster formula by ImageMosaicSpec
    "q_image_mosaic" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      ImagePayload.tileMosaic(images, "lat", "lon", 5)
        .select("zx", "zy", "n_images", "n_decoded")
    }),

    // mosaic PYRAMID: one decode pass at z=5, ancestor levels 2..5 by
    // integer tile-index shifts on the bounded per-tile table. The oracle
    // gates membership + counts per (z, zx, zy) — a decode regression
    // breaks n_decoded at every level; the average colors are pinned bit
    // for bit (incl. the rollup identity) by ImageMosaicSpec
    "q_mosaic_pyramid" -> ((s, dir) => {
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      ImagePayload.tileMosaicPyramid(images, "lat", "lon", 2, 5)
        .select("z", "zx", "zy", "n_images", "n_decoded")
    }),

    // per-REGION histogram quantiles: the spatial label join feeds the
    // mergeable sketch — p50/p95 order value in cents per query region,
    // fixed-size state, exact integer contract (the sketch + PIP
    // composition a per-region SLO dashboard runs at 100 TB)
    "q_region_quantile" -> ((s, dir) => {
      val hq = udaf(new graft.functions.Sketches.HistQuantile(
        0L, 1000000L, 60, Seq(0.5, 0.95)))
      val pts = points(s, dir).select(col("o_orderkey"), col("o_totalprice"),
        col("lat"), col("lon"))
      SpatialJoin.pipJoin(pts, "lat", "lon", rectRegions)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .groupBy("region_id")
        .agg(hq(col("cents")).as("qa"))
        .select(col("region_id"),
          element_at(col("qa"), 1).as("p50_c"),
          element_at(col("qa"), 2).as("p95_c"))
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
    }),

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
    }),

    // image duplicate CLUSTERS: two differently-patched copies per planted
    // original; dhash banding pairs each copy with its original and CC
    // closes the transitive cluster {k, k+1e8, k+2e8} with min label k.
    // Oracle is the planted structure — exact because ImageNearDupSpec
    // asserts the 3-population has no cross-cluster <= 3-bit pair
    "q_image_dup_clusters" -> ((s, dir) => {
      val originals = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val sel = originals.where(col("p_partkey") % 40 === 0)
      val copy1 = ImagePayload.withPatch(sel, 2, 2, 1)
        .withColumn("p_partkey", col("p_partkey") + 100000000L)
      val copy2 = ImagePayload.withPatch(sel, 3, 3, 1)
        .withColumn("p_partkey", col("p_partkey") + 200000000L)
      val pairs = ImagePayload.imageNearDup(
        originals.unionByName(copy1).unionByName(copy2), "p_partkey")
        .select("id_a", "id_b")
      Dedup.duplicateClusters(pairs)
        .select(col("doc_id").as("image_key"), col("cluster_id"))
    }),

    // STREAMING image dedup: patched re-uploads of every 40th image arrive
    // over a real 2-batch MemoryStream (batch 2 re-posts batch 1's patched
    // raster under a new id); each micro-batch's signatures probe the
    // persisted dhash store and are folded in. The accumulated pairs must
    // be exactly the planted structure: each copy pairs with its corpus
    // source (<= 3 bits, ImageNearDupSpec-pinned) and batch 2's copy pairs
    // with batch 1's (identical bytes, hamming 0) — a CROSS-BATCH discovery
    // only the store probe can make; bytes never enter the store or a join
    "q_stream_image_dedup" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val images = ImagePayload.synthesize(part(s, dir).select("p_partkey"), "p_partkey")
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft_stream_imgdedup").toString
      graft.streaming.StreamingImageDedup.initStore(s, storeDir, images, "p_partkey")
      val planted = ImagePayload.withPatch(images.where(col("p_partkey") % 40 === 0), 2, 2, 1)
      val rows = planted.select(col("p_partkey"), col("bytes"))
        .as[(Long, Array[Byte])].collect()
      val batch1 = rows.map { case (k, bs) => (k + 100000000L, bs) }
      val batch2 = rows.map { case (k, bs) => (k + 200000000L, bs) }
      val acc = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, Array[Byte])]
      val q = graft.streaming.StreamingImageDedup.nearDupStream(
        input.toDF().toDF("p_partkey", "bytes"), storeDir, "p_partkey",
        (pairs, _) => acc.synchronized {
          acc ++= pairs.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
        })
      try {
        input.addData(batch1.toSeq)
        q.processAllAvailable()
        input.addData(batch2.toSeq)
        q.processAllAvailable()
      } finally q.stop()
      acc.toSeq.toDF("id_a", "id_b")
    }),

    // STREAMING video near-dedup vs the growing frame-signature store:
    // two MemoryStream batches of patched re-posts (+10^9, then +2*10^9)
    // probe the corpus store and each other — batch1-source pairs at
    // batch 1, batch2-source AND batch2-batch1 pairs at batch 2 (the
    // second only findable through the store fold). Exact planted oracle
    "q_stream_video_dedup" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val keys = part(s, dir).select("p_partkey")
      val corpus = VideoPayload.synthesize(keys, "p_partkey")
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft_stream_viddedup").toString
      graft.streaming.StreamingVideoDedup.initStore(s, storeDir, corpus, "p_partkey")
      def reposts(offset: Long): Array[(Long, Array[Byte])] =
        VideoPayload.synthesizeReposts(keys, "p_partkey", idOffset = offset)
          .where(col("p_partkey") >= offset)
          .select(col("p_partkey"), col("bytes"))
          .as[(Long, Array[Byte])].collect()
      val acc = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, Array[Byte])]
      val q = graft.streaming.StreamingVideoDedup.nearDupStream(
        input.toDF().toDF("p_partkey", "bytes"), storeDir, "p_partkey",
        (pairs, _) => acc.synchronized {
          acc ++= pairs.select("id_a", "id_b", "shared").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        })
      try {
        input.addData(reposts(1000000000L).toSeq)
        q.processAllAvailable()
        input.addData(reposts(2000000000L).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      acc.toSeq.toDF("id_a", "id_b", "shared")
    }),

    // STREAMING corpus dedup: the %10==0 docs arrive over a real 2-batch
    // MemoryStream; each micro-batch probes the persisted signature store
    // and is folded in, so the accumulated pair stream must equal the
    // one-shot incremental batch run — same oracle as q_incremental_dedup
    "q_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val docs = documents(s, dir).select("doc_id", "text")
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      // the store MUTATES during the run — a fresh dir per invocation, not
      // a shared fixture
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft_stream_dedup").toString
      graft.streaming.StreamingDedup.initStore(s, storeDir, corpus, "doc_id", "text")
      val streamed = docs.where(col("doc_id") % 10 === 0)
        .select("doc_id", "text").as[(Long, String)].collect()
      val (batch1, batch2) = streamed.partition { case (id, _) => (id / 10) % 2 == 0 }
      val acc = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup.nearDupStream(
        input.toDF().toDF("doc_id", "text"), storeDir, "doc_id", "text",
        (pairs, _) => acc.synchronized {
          acc ++= pairs.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
        })
      try {
        input.addData(batch1.toSeq)
        q.processAllAvailable()
        input.addData(batch2.toSeq)
        q.processAllAvailable()
      } finally q.stop()
      acc.toSeq.toDF("id_a", "id_b")
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
    }),

    // streaming CDC upsert into the clustered store: batch 1 moves keys
    // % 7 == 0, batch 2 moves them AGAIN (cross-batch last-wins) and
    // carries an in-batch superseded event per key (within-batch
    // last-wins by seq) plus fresh inserts for keys % 11 == 0; the final
    // table must equal the one simulated merge in the oracle
    "q_stream_upsert" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val base = points(s, dir)
        .select(col("o_orderkey").cast("long"), col("lat"), col("lon"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_upsert").toString
      Tiling.clusteredWrite(base, "lat", "lon", tmp, coarseLevel = 2)
      def rowsOf(df: DataFrame): Seq[(Long, Double, Double, Long)] =
        df.as[(Long, Double, Double, Long)].collect().toSeq
      val updKeys = orders(s, dir).where(col("o_orderkey") % 7 === 0)
      val batch1 = rowsOf(updKeys.select(col("o_orderkey").cast("long"),
        expr(latSqlFor("(o_orderkey * 3 + 1)")).as("lat"),
        expr(lonSqlFor("(o_orderkey * 3 + 1)")).as("lon"), lit(1L).as("seq")))
      // batch 2: a superseded event (seq 2) and the winner (seq 3) per key
      val batch2 = rowsOf(updKeys.select(col("o_orderkey").cast("long"),
        expr(latSqlFor("(o_orderkey * 9 + 4)")).as("lat"),
        expr(lonSqlFor("(o_orderkey * 9 + 4)")).as("lon"), lit(2L).as("seq"))) ++
        rowsOf(updKeys.select(col("o_orderkey").cast("long"),
          expr(latSqlFor("(o_orderkey * 13 + 5)")).as("lat"),
          expr(lonSqlFor("(o_orderkey * 13 + 5)")).as("lon"), lit(3L).as("seq"))) ++
        rowsOf(orders(s, dir).where(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + 1000000000L).cast("long").as("o_orderkey"),
            expr(latSqlFor("(o_orderkey * 5 + 2)")).as("lat"),
            expr(lonSqlFor("(o_orderkey * 5 + 2)")).as("lon"), lit(2L).as("seq")))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, Double, Double, Long)]
      val q = graft.streaming.StreamingUpsert.upsertStream(
        input.toDF().toDF("o_orderkey", "lat", "lon", "seq"),
        tmp, "o_orderkey", "lat", "lon", "seq", coarseLevel = 2)
      try {
        input.addData(batch1)
        q.processAllAvailable()
        input.addData(batch2)
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(tmp).select("o_orderkey", "lat", "lon")
    })
  )

  /** Rect regions for the part-key-derived image points (same bounds). */
  private def rectRegionsForParts: Seq[(String, S2Region)] = rectRegions

  private val PartLatSql = latSqlFor("p_partkey")
  private val PartLonSql = lonSqlFor("p_partkey")
  private val CustLatSql = latSqlFor("c_custkey")
  private val CustLonSql = lonSqlFor("c_custkey")

  /** Rect bounds for q_rect_join, ONE definition shared by the Spark query
    * (expr) and the DuckDB oracle so both sides compute bit-identical
    * doubles. Half-sizes carry a .005 fraction while centers are multiples
    * of 0.01, so no derived bound can land exactly on +-180 (where the
    * kernel identifies -pi with pi but naive degree SQL would not). */
  private val RectLatLoSql = s"greatest(-89.995, ($CustLatSql) - 1.505)"
  private val RectLatHiSql = s"least(89.995, ($CustLatSql) + 1.505)"
  private val RectLonLoSql =
    s"CASE WHEN ($CustLonSql) - 2.005 < -180.0 THEN ($CustLonSql) - 2.005 + 360.0 ELSE ($CustLonSql) - 2.005 END"
  private val RectLonHiSql =
    s"CASE WHEN ($CustLonSql) + 2.005 > 180.0 THEN ($CustLonSql) + 2.005 - 360.0 ELSE ($CustLonSql) + 2.005 END"

  /** Shared CTE prefix (docs + distinct word-trigram sets) and Jaccard
    * expression for the trigram-oracle family: q_minhash_pairs,
    * q_ngram_jaccard, q_dup_clusters and q_split_leakfree MUST stay
    * bit-identical on this derivation for their equivalence arguments to
    * hold — so it exists exactly once. Plain (non-interpolated) string:
    * the `\s+` must reach DuckDB with a single backslash. */
  private def triCteOver(src: String): String =
    s"""docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks FROM $src),
       |tri AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
       |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tg FROM docs)""".stripMargin

  private val TriCte = triCteOver("documents")

  private val TriJaccard =
    "CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) / len(list_distinct(a.tg || b.tg))"

  /** Shared CTE prefix of the sketch oracles (q_hll_distinct,
    * q_kmv_distinct, q_kmv_overlap): distinct per-LANGUAGE word trigrams,
    * their portable hashes — the same trigram derivation as [[TriCte]]
    * keyed by lang instead of doc_id, hash fold identical to the simhash
    * oracle's — and the finalized hashes (`sfin`) whose two-round
    * square+affine arithmetic comes from [[Sketches.finalizeSqlOf]], the
    * one definition. Prefix is a plain string: `\s+` stays literal. */
  private val SketchHashCte =
    """sdocs AS (SELECT lang, list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks FROM documents),
      |stri AS (SELECT DISTINCT lang, shingle FROM (
      |  SELECT lang, unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
      |    i -> array_to_string(list_filter([toks[i], toks[i+1], toks[i+2]], t -> t IS NOT NULL), ' '))) AS shingle
      |  FROM sdocs) q),
      |shashed AS (SELECT lang, shingle, list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(shingle) + 1),
      |  i -> CAST(ascii(substr(shingle, i, 1)) AS BIGINT)), (h, c) -> (h * 131 + c) % 2147483647) AS h FROM stri)""".stripMargin +
    s""",
      |sfin AS (SELECT lang, shingle, ${Sketches.finalizeSqlOf("h")} AS h FROM shashed)""".stripMargin

  /** The portable-hash fold over a VARCHAR column named `v` (DuckDB form
    * of [[Dedup.portableHashOf]]), for oracles hashing non-shingle values. */
  private val SketchValueHashSql =
    """list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(v) + 1),
      |  i -> CAST(ascii(substr(v, i, 1)) AS BIGINT)), (h, c) -> (h * 131 + c) % 2147483647)""".stripMargin

  /** Recursive-CTE connected components over the >= `minJ` trigram-jaccard
    * pair graph, ending in a `cc(doc_id, cluster_id)` CTE. */
  /** Brute-force spatio-temporal pairs: all-pairs haversine + exact
    * integer-microsecond time-window predicate. Shared by q_st_join and
    * its stream-stream twin q_st_join_stream. */
  /** Shared oracle of q_speed_flags and its streaming twin. */
  private lazy val SpeedFlagsOracleSql: String = {
    val evLat = latSqlFor("event_id")
    val evLon = lonSqlFor("event_id")
    val d = haversineExpr("plat", "plon", "lat", "lon")
    s"""WITH p AS (SELECT user_id, ts, event_id, $evLat AS lat, $evLon AS lon FROM events),
       |s AS (SELECT user_id, event_id,
       |        lag(lat) OVER w AS plat, lag(lon) OVER w AS plon, lat, lon,
       |        epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_micros
       |      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, event_id,
       |  CASE WHEN plat IS NULL THEN NULL
       |       ELSE CAST(round($d) AS BIGINT) END AS seg_m,
       |  dt_micros,
       |  COALESCE(CASE WHEN plat IS NULL THEN NULL
       |       ELSE CAST(round($d) AS BIGINT) END * 1000000 > 340 * dt_micros,
       |    false) AS is_jump
       |FROM s""".stripMargin
  }

  private lazy val StJoinOracleSql: String = {
    val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
    s"""WITH pts AS (SELECT event_id AS id, epoch_us(ts) AS tus,
       |  ${latSqlFor("event_id")} AS lat, ${lonSqlFor("event_id")} AS lon FROM events)
       |SELECT a.id AS id_a, b.id AS id_b
       |FROM pts a JOIN pts b ON a.id < b.id
       |WHERE abs(a.tus - b.tus) <= ${StJoinWindowSec * 1000000L}
       |  AND $d <= $StJoinRadiusM""".stripMargin
  }

  private def ccCte(minJ: Double): String =
    s"""p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM tri a JOIN tri b ON a.doc_id < b.doc_id
       |  WHERE $TriJaccard >= $minJ),
       |edges AS (SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
       |reach(src, dst) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.dst),
       |cc AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)""".stripMargin

  def oracleSql: Map[String, String] = Map(
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

    // per-prefix replay of the same fold: slice the ordered value list at
    // each row's index, the identical transformed list_reduce trees
    "q_holt_stream" ->
      """WITH o AS (SELECT event_id, user_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
        |  FROM events WHERE value IS NOT NULL),
        |v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        |      FROM events WHERE value IS NOT NULL GROUP BY 1),
        |f AS (SELECT o.user_id AS entity_id, o.event_id, CAST(o.i AS BIGINT) AS n_obs,
        |  list_reduce(list_transform(v.vals[1:o.i], x -> [x, 0.0]),
        |    (a, x) -> [0.25*x[1] + 0.75*(a[1]+a[2]),
        |               0.125*((0.25*x[1] + 0.75*(a[1]+a[2])) - a[1]) + 0.875*a[2]]) AS lb
        |  FROM o JOIN v USING (user_id))
        |SELECT entity_id, event_id, n_obs, lb[1] AS level, lb[2] AS trend FROM f""".stripMargin,

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

    // per-row prefix replay of the streaming fold: the same quantization,
    // prefix-window exact integers (hk = first value, tk = current), and
    // the shared final-coefficient text
    "q_acf_stream" ->
      s"""WITH s AS (SELECT user_id, CAST(round(value*100) AS BIGINT) AS w, ts, event_id
         |           FROM events WHERE value IS NOT NULL),
         |p AS (SELECT user_id, event_id, ts, w,
         |        lag(w) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS wp FROM s),
         |a AS (SELECT user_id, event_id,
         |        CAST(row_number() OVER w AS BIGINT) AS n,
         |        CAST(sum(w) OVER w AS BIGINT) AS sw,
         |        CAST(sum(w*w) OVER w AS BIGINT) AS s2,
         |        CAST(sum(CASE WHEN wp IS NULL THEN 0 ELSE wp*w END) OVER w AS BIGINT) AS sp,
         |        first_value(w) OVER w AS hk, w AS tk
         |      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT user_id AS entity_id, event_id, n AS n_obs,
         |  ${TimeSeries.acfFinalSql(1)} AS acf FROM a""".stripMargin,

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

    // per-row prefix replay of the streaming fold with the same shared
    // final expressions
    "q_ols_stream" ->
      s"""WITH s AS (SELECT user_id, event_id, ts,
         |    (epoch_us(ts) - 1704067200000000) // 60000000 AS x,
         |    CAST(round(value*100) AS BIGINT) AS y
         |  FROM events WHERE value IS NOT NULL),
         |a AS (SELECT user_id, event_id,
         |        CAST(row_number() OVER w AS BIGINT) AS n,
         |        CAST(sum(x) OVER w AS BIGINT) AS sx, CAST(sum(y) OVER w AS BIGINT) AS sy,
         |        CAST(sum(x*x) OVER w AS BIGINT) AS sxx, CAST(sum(x*y) OVER w AS BIGINT) AS sxy
         |      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT user_id AS entity_id, event_id, n AS n_obs,
         |  ${TimeSeries.trendSlopeSql} AS slope,
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

    // every prefix replayed: delta_i from the prior-rows pair join, S and
    // the telescoped tie term as running window sums — exact integers
    "q_mann_kendall_stream" ->
      """WITH s AS (SELECT user_id, CAST(round(value*100) AS BIGINT) AS w, ts, event_id
        |           FROM events WHERE value IS NOT NULL),
        |o AS (SELECT user_id, w, event_id,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i FROM s),
        |d AS (SELECT a.user_id, a.event_id, a.i, a.w,
        |        CAST(COALESCE(sum(CASE WHEN a.w > b.w THEN 1 WHEN a.w < b.w THEN -1 ELSE 0 END), 0) AS BIGINT) AS delta
        |      FROM o a LEFT JOIN o b ON b.user_id = a.user_id AND b.i < a.i
        |      GROUP BY a.user_id, a.event_id, a.i, a.w),
        |r AS (SELECT user_id, event_id, CAST(i AS BIGINT) AS n,
        |        CAST(sum(delta) OVER wi AS BIGINT) AS s_stat,
        |        CAST(sum(6*(tv*tv - 1)) OVER wi AS BIGINT) AS tie18
        |      FROM (SELECT d.*, CAST(row_number() OVER (
        |              PARTITION BY d.user_id, d.w ORDER BY d.i) AS BIGINT) AS tv FROM d) t
        |      WINDOW wi AS (PARTITION BY user_id ORDER BY i
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id AS entity_id, event_id, n AS n_obs, s_stat,
        |  n*(n-1)*(2*n+5) - tie18 AS var18 FROM r""".stripMargin,

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

    // per-row prefix-min replay of the sequential recurrence the stream
    // folds (same gap series, same constants)
    "q_cusum_stream" ->
      """WITH t AS (SELECT user_id, ts, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS gap FROM events),
        |p AS (SELECT user_id, ts, event_id,
        |  sum(gap - 40000000000) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM t WHERE gap IS NOT NULL),
        |c AS (SELECT user_id AS entity_id, event_id,
        |  CAST(p - least(min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS s
        |  FROM p)
        |SELECT entity_id, event_id, s, s > 200000000000 AS alarm FROM c""".stripMargin,

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

    "q_stream_tile_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, count(*) AS total_events
        |FROM events GROUP BY 1""".stripMargin,

    // per-region lag SQL over (user, ts, event_id) order — boundary-safe
    // because the rect bounds sit on .005 offsets no derived point hits
    "q_geofence" -> GeofenceOracleSql,

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

    // the O(n²) brute force IS exact here: pure integer squared
    // distances, so hull+calipers must reproduce it bit for bit
    "q_diameter" ->
      """WITH pts AS (SELECT user_id,
        |  (event_id * 9973 + 12345) % 18000 AS x,
        |  (event_id * 31337 + 54321) % 36000 AS y FROM events)
        |SELECT a.user_id, CAST(max((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) AS BIGINT) AS diam_sq
        |FROM pts a JOIN pts b USING (user_id) GROUP BY 1""".stripMargin,

    // identical int64 cell quantization, distinct-visitor wedge join, and
    // scaled-quotient Jaccard rank (common*10^12 // (da+db-common))
    "q_covisit" ->
      """WITH v AS (SELECT DISTINCT user_id AS e,
        |  (((event_id * 9973 + 12345) % 18000) // 1000) * 100
        |    + (((event_id * 31337 + 54321) % 36000) // 1000) AS c FROM events),
        |deg AS (SELECT c, count(*) AS d FROM v GROUP BY 1),
        |w AS (SELECT x.c AS cell_a, y.c AS cell_b FROM v x JOIN v y
        |  ON x.e = y.e AND x.c < y.c),
        |cm AS (SELECT cell_a, cell_b, count(*) AS common FROM w
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT cm.cell_a, cm.cell_b, cm.common, a.d AS da, b.d AS db,
        |  (cm.common * 1000000000000) // (a.d + b.d - cm.common) AS score
        |FROM cm JOIN deg a ON cm.cell_a = a.c JOIN deg b ON cm.cell_b = b.c
        |ORDER BY score DESC, cm.cell_a, cm.cell_b LIMIT 30""".stripMargin,
    "q_od_flows_stream" -> OdFlowsOracleSql,
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

    // same answer through the stateful streaming operator's batch mode
    "q_geofence_stream" -> GeofenceOracleSql,

    "q_tile_pyramid" ->
      """SELECT CAST(l.level AS INTEGER) AS level, c.total_points
        |FROM (SELECT unnest(generate_series(2, 6)) AS level) l
        |CROSS JOIN (SELECT count(*) AS total_points FROM orders) c""".stripMargin,

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

    // the streaming twin has identical semantics, so the identical oracle
    "q_speed_flags_stream" -> SpeedFlagsOracleSql,

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

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT user_id, ts,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid FROM x)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        |FROM y GROUP BY user_id, sid""".stripMargin,

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

    "q_pip_rect" -> RectOracleSql,

    "q_pip_rect_exec" -> RectOracleSql,

    // inner matches UNION the anti side labeled '-'
    "q_pip_outer" ->
      s"""WITH m AS ($RectOracleSql)
         |SELECT o_orderkey, region_id FROM m
         |UNION ALL
         |SELECT o_orderkey, '-' AS region_id FROM orders
         |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM m)""".stripMargin,

    // identical answer through the pure-SQL surface (covering prefilter is
    // complete, bounds refine is exact)
    "q_pip_rect_sql" -> RectOracleSql,

    "q_pip_circle" -> CircleOracleSql,

    // same answer through the pure-SQL surface: the cap covering prefilter
    // is complete (a contained point's level-4 cell intersects the cap) and
    // the refine predicate is the identical kernel haversine
    "q_pip_circle_sql" -> CircleOracleSql,

    // exact spherical PIP for the convex shell+hole diamond: the point is in
    // the polygon iff inside the shell's edge planes and not inside the
    // hole's (see convexLoopSql for why this matches the kernel bit-for-bit
    // away from a ~1e-15 edge-plane band no derived point enters)
    "q_pip_polygon" -> {
      val shell = convexLoopSql(DiamondShell, (0.0, 0.0))
      val hole = convexLoopSql(DiamondHole, (0.0, 0.0))
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts)
         |SELECT 'p_diamond_holed' AS region_id, o_orderkey FROM xyz
         |WHERE $shell AND NOT $hole""".stripMargin
    },

    "q_doughnut" -> {
      val d = haversineExpr("lat", "lon", "10.0", "20.0")
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders)
         |SELECT 'd_vienna' AS region_id, o_orderkey FROM pts
         |WHERE $d <= 3000000.0 AND $d > 1000000.0""".stripMargin
    },

    "q_knn" -> {
      val cases = KnnQueries.map { case (qid, qlat, qlon) =>
        val d = haversineExpr("lat", "lon", qlat.toString, qlon.toString)
        s"""SELECT '$qid' AS query_id, o_orderkey FROM (
           | SELECT o_orderkey, row_number() OVER (ORDER BY $d, o_orderkey) AS rnk FROM pts) t
           |WHERE rnk <= 5""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders)
         |${cases.mkString("\nUNION ALL\n")}""".stripMargin
    },

    "q_knn_self" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer)
         |SELECT id, neighbor_id, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT a.c_custkey AS id, b.c_custkey AS neighbor_id,
         |    row_number() OVER (PARTITION BY a.c_custkey ORDER BY $d, b.c_custkey) AS rnk
         |  FROM pts a JOIN pts b ON a.c_custkey <> b.c_custkey) t
         |WHERE rnk <= 5""".stripMargin
    },

    // literal transcription of R1Interval.intersects (closed, lat) and
    // S1Interval.intersects (closed, wrap-aware: lo > hi == inverted) in
    // degrees — the radians conversion is monotone, so every comparison
    // decides identically
    "q_rect_join" ->
      s"""WITH r AS (SELECT c_custkey,
         |  $RectLatLoSql AS lat_lo, $RectLatHiSql AS lat_hi,
         |  $RectLonLoSql AS lon_lo, $RectLonHiSql AS lon_hi FROM customer)
         |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         |FROM r a JOIN r b ON a.c_custkey < b.c_custkey
         |WHERE a.lat_lo <= b.lat_hi AND b.lat_lo <= a.lat_hi
         |  AND (CASE
         |    WHEN a.lon_lo > a.lon_hi AND b.lon_lo > b.lon_hi THEN TRUE
         |    WHEN a.lon_lo > a.lon_hi THEN (b.lon_lo <= a.lon_hi OR b.lon_hi >= a.lon_lo)
         |    WHEN b.lon_lo > b.lon_hi THEN (a.lon_lo <= b.lon_hi OR a.lon_hi >= b.lon_lo)
         |    ELSE (b.lon_lo <= a.lon_hi AND b.lon_hi >= a.lon_lo)
         |  END)""".stripMargin,

    "q_distance_join" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer)
         |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         |FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
         |WHERE $d <= 500000.0""".stripMargin
    },

    // the plain two-table brute force over the identical haversine
    "q_distance_between" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH a AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |b AS (SELECT s_suppkey, ${latSqlFor("s_suppkey")} AS lat, ${lonSqlFor("s_suppkey")} AS lon FROM supplier)
         |SELECT a.c_custkey AS id_left, b.s_suppkey AS id_right
         |FROM a JOIN b ON $d <= 1000000.0""".stripMargin
    },

    // brute-force argmin with the same (distance, id) tie order
    "q_nearest_join" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH a AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |b AS (SELECT s_suppkey, ${latSqlFor("s_suppkey")} AS lat, ${lonSqlFor("s_suppkey")} AS lon FROM supplier),
         |p AS (SELECT a.c_custkey AS id_left, b.s_suppkey AS id_right, $d AS dm
         |  FROM a JOIN b ON $d <= 1000000.0),
         |r AS (SELECT id_left, id_right,
         |  row_number() OVER (PARTITION BY id_left ORDER BY dm, id_right) AS rn FROM p)
         |SELECT id_left, id_right FROM r WHERE rn = 1""".stripMargin
    },

    // isolation as NOT EXISTS over the identical haversine — the
    // double-complement of the pair join (lat/lon are verbatim input
    // copies, so the doubles match trivially)
    "q_isolated" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer)
         |SELECT a.c_custkey, a.lat, a.lon FROM pts a
         |WHERE NOT EXISTS (SELECT 1 FROM pts b
         |  WHERE b.c_custkey <> a.c_custkey AND $d <= 300000.0)""".stripMargin
    },

    // the brute-force pair graph, then the plain a<b<c triple join — the
    // degree orientation is the engine's plan choice, not a semantic one
    "q_triangles" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |pairs AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
         |  WHERE $d <= 500000.0),
         |t AS (SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c FROM pairs p1
         |  JOIN pairs p2 ON p2.id_a = p1.id_b
         |  JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
         |n AS (SELECT a AS id FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
         |SELECT id, count(*) AS triangles FROM n GROUP BY id""".stripMargin
    },

    // same pair join; degrees and the a<b<c triple-join triangle counts
    // left-joined per node, then the engine's own final-coefficient text
    "q_clustering_coeff" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |pairs AS MATERIALIZED (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
         |  WHERE $d <= 500000.0),
         |dg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs) t GROUP BY 1),
         |t AS (SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c FROM pairs p1
         |  JOIN pairs p2 ON p2.id_a = p1.id_b
         |  JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
         |tr AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM (
         |  SELECT a AS id FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t) n
         |  GROUP BY id),
         |j AS (SELECT dg.id, dg.deg, COALESCE(tr.triangles, 0) AS triangles
         |  FROM dg LEFT JOIN tr ON tr.id = dg.id)
         |SELECT id, deg, triangles, ${Graphs.clusteringFinalSql} AS clustering FROM j""".stripMargin
    },

    // the peel unrolled to 6 rounds (fixpoint at 4 changing rounds at
    // sf0.01; peeling is confluent so extra rounds are idempotent)
    "q_kcore" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      // every CTE MATERIALIZED: each ei references its predecessor three
      // times (via di twice), so default inlining re-expands the base
      // pair join ~3^6 times — enough reopened parquet scans to exhaust
      // file handles before it exhausts patience
      val base =
        s"""WITH pts AS MATERIALIZED (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
           |e0 AS MATERIALIZED (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
           |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
           |  WHERE $d <= 500000.0)""".stripMargin
      val rounds = (1 to 6).map { i =>
        s""",
           |d${i - 1} AS MATERIALIZED (SELECT id, count(*) AS c FROM (
           |  SELECT id_a AS id FROM e${i - 1} UNION ALL SELECT id_b FROM e${i - 1}) t
           |  GROUP BY 1),
           |e$i AS MATERIALIZED (SELECT e.id_a, e.id_b FROM e${i - 1} e
           |  JOIN d${i - 1} x ON x.id = e.id_a AND x.c >= 8
           |  JOIN d${i - 1} y ON y.id = e.id_b AND y.c >= 8)""".stripMargin
      }.mkString
      base + rounds +
        """
          |SELECT id, count(*) AS core_deg FROM (
          |  SELECT id_a AS id FROM e6 UNION ALL SELECT id_b FROM e6) t
          |GROUP BY 1""".stripMargin
    },

    // the 3 PageRank rounds unrolled as CTEs in the identical scaled
    // integer arithmetic (// == Spark's div on positive int64); sums pass
    // through HUGEINT in DuckDB, the final CAST pins int64
    // same proximity edges; each round a (node, label) count CTE + the
    // row_number (c DESC, label ASC) argmax mirroring the min-struct
    "q_lpa" -> s"""WITH $proximityLpaCtes
         |SELECT id, label FROM l3""".stripMargin,

    // the LPA replay's l3 labels fed into the exact integer modularity
    // identity Q·4m² = Σ_c (4m·e_c − d_c²); isolated labels contribute
    // −d_c² through the outer join, and the only float is the engine's
    // own final division
    "q_modularity" -> {
      s"""WITH $proximityLpaCtes,
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
         |dg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT id_a AS id FROM e UNION ALL SELECT id_b FROM e) t GROUP BY 1),
         |dc AS (SELECT l.label, CAST(sum(dg.deg) AS BIGINT) AS dcs
         |  FROM dg JOIN l3 l ON l.id = dg.id GROUP BY 1),
         |ec AS (SELECT la.label, CAST(count(*) AS BIGINT) AS ecs
         |  FROM e JOIN l3 la ON la.id = e.id_a JOIN l3 lb ON lb.id = e.id_b
         |  WHERE la.label = lb.label GROUP BY 1),
         |j AS (SELECT COALESCE(dc.label, ec.label) AS label,
         |    COALESCE(dc.dcs, 0) AS dcs, COALESCE(ec.ecs, 0) AS ecs
         |  FROM dc FULL OUTER JOIN ec ON ec.label = dc.label),
         |a AS (SELECT max(mm.m) AS m,
         |    CAST(sum(4*mm.m*j.ecs - j.dcs*j.dcs) AS BIGINT) AS q_num
         |  FROM j, mm)
         |SELECT m, q_num, ${Graphs.ModularityFinalSql} AS modularity FROM a""".stripMargin
    },

    // the a<b<c triple join exploded to its three edges, counted per edge
    "q_truss_support" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |e AS MATERIALIZED (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
         |  WHERE $d <= 500000.0),
         |t AS (SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c FROM e p1
         |  JOIN e p2 ON p2.id_a = p1.id_b
         |  JOIN e p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
         |ed AS (SELECT a AS id_a, b AS id_b FROM t
         |  UNION ALL SELECT a, c FROM t UNION ALL SELECT b, c FROM t)
         |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS support
         |FROM ed GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
    },

    // the triple-join triangle count and degree sums reduced to the two
    // integers, then the engine's own final text
    "q_transitivity" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |e AS MATERIALIZED (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
         |  WHERE $d <= 500000.0),
         |dg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT id_a AS id FROM e UNION ALL SELECT id_b FROM e) t GROUP BY 1),
         |t AS (SELECT p1.id_a AS a FROM e p1
         |  JOIN e p2 ON p2.id_a = p1.id_b
         |  JOIN e p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b),
         |a AS (SELECT (SELECT CAST(sum(deg*(deg-1)) AS BIGINT) FROM dg) AS w2,
         |        (SELECT CAST(COALESCE(3*count(*), 0) AS BIGINT) FROM t) AS t3)
         |SELECT w2, t3, ${Graphs.TransitivityFinalSql} AS transitivity FROM a""".stripMargin
    },

    // the same endpoint-degree attachment and the sqrt-free symmetric
    // Pearson ratio over exact integer moments
    "q_assortativity" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |e AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
         |  WHERE $d <= 500000.0),
         |dg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT id_a AS id FROM e UNION ALL SELECT id_b FROM e) t GROUP BY 1),
         |w AS (SELECT x.deg AS da, y.deg AS db FROM e
         |  JOIN dg x ON x.id = e.id_a JOIN dg y ON y.id = e.id_b),
         |a AS (SELECT CAST(2*count(*) AS BIGINT) AS m2,
         |    CAST(sum(da + db) AS BIGINT) AS sx,
         |    CAST(sum(da*da + db*db) AS BIGINT) AS sxx,
         |    CAST(2*sum(da*db) AS BIGINT) AS sxy FROM w)
         |SELECT m2, sx, sxx, sxy, ${Graphs.AssortativityFinalSql} AS assortativity FROM a""".stripMargin
    },

    "q_pagerank" -> PageRankOracleSql,
    "q_hits" -> HitsOracleSql,

    // identical scaled-integer rounds over the word co-occurrence graph;
    // the whitespace tokenizer and hapax filter mirror the Spark side
    "q_keywords" -> TextRankOracleSql,

    // SAME oracle: a crash-resumed checkpointed run must be hash-identical
    // to the one-shot iteration (the integer arithmetic makes that a fair
    // contract across different shuffle layouts)
    "q_pagerank_resume" -> PageRankOracleSql,

    // the same two window frames over exact integer microseconds
    // (epoch_us == Spark's unix_micros); touching intervals merge
    // (new island iff s > running max end, strictly)
    "q_islands" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
        |  FROM events),
        |m AS (SELECT user_id, s, e, max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv),
        |n AS (SELECT user_id, s, e,
        |  CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nw FROM m),
        |i AS (SELECT user_id, s, e, sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
        |  ROWS UNBOUNDED PRECEDING) AS isl FROM n),
        |g AS (SELECT user_id, isl, min(s) AS st, max(e) AS en FROM i GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(en - st) AS BIGINT) AS covered_us
        |FROM g GROUP BY 1""".stripMargin,

    // the same wedge-at-center counting over the brute-force pair CTE;
    // non-adjacency as NOT EXISTS against the edges
    "q_link_predict" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |pairs AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
         |  WHERE $d <= 500000.0),
         |adj AS (SELECT id_a AS c, id_b AS n FROM pairs
         |  UNION ALL SELECT id_b AS c, id_a AS n FROM pairs),
         |g AS (SELECT x.n AS id_a, y.n AS id_b, count(*) AS common
         |  FROM adj x JOIN adj y ON x.c = y.c AND x.n < y.n
         |  GROUP BY 1, 2 HAVING count(*) >= 3)
         |SELECT g.id_a, g.id_b, g.common FROM g
         |WHERE NOT EXISTS (SELECT 1 FROM pairs p
         |  WHERE p.id_a = g.id_a AND p.id_b = g.id_b)""".stripMargin
    },

    // the exact 5-NN relation built once, mutuality as a self-join —
    // identical tie rule (distance, then id) to q_knn_self
    "q_mutual_knn" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |r AS (SELECT a.c_custkey AS id, b.c_custkey AS nb,
         |  row_number() OVER (PARTITION BY a.c_custkey ORDER BY $d, b.c_custkey) AS rnk
         |  FROM pts a JOIN pts b ON a.c_custkey <> b.c_custkey),
         |k AS (SELECT id, nb FROM r WHERE rnk <= 5)
         |SELECT x.id AS id_a, x.nb AS id_b FROM k x
         |JOIN k y ON x.id = y.nb AND x.nb = y.id
         |WHERE x.id < x.nb""".stripMargin
    },

    // the same synthesis + normalization (regexp_replace with the 'g'
    // flag — DuckDB replaces first-only by default) + blocking join +
    // integer score threshold
    "q_record_linkage" -> {
      val d = haversineExpr("l.lat", "l.lon", "r.rlat", "r.rlon")
      s"""WITH cust AS (SELECT c_custkey, c_name, c_nationkey,
         |  $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |regs AS (
         |  SELECT c_custkey + 1000000 AS reg_id,
         |    CASE WHEN c_custkey % 3 = 0 THEN lower(c_name)
         |         WHEN c_custkey % 3 = 1 THEN replace(c_name, 'Customer#', 'CUSTOMER #')
         |         ELSE c_name END AS reg_name,
         |    lat + (c_custkey % 7 - 3) * 0.003 AS rlat,
         |    lon + (c_custkey % 11 - 5) * 0.003 AS rlon,
         |    CASE WHEN c_custkey % 50 = 0 THEN c_nationkey + 1 ELSE c_nationkey END AS reg_nation
         |  FROM cust
         |  UNION ALL
         |  SELECT c_custkey + 2000000, c_name, -lat,
         |    CASE WHEN lon >= 0 THEN lon - 180.0 ELSE lon + 180.0 END, c_nationkey
         |  FROM cust WHERE c_custkey % 10 = 0),
         |ln AS (SELECT c_custkey, c_nationkey, lat, lon,
         |  regexp_replace(regexp_replace(lower(c_name), '[^a-z0-9#]', '', 'g'),
         |    '#0+', '#', 'g') AS blk FROM cust),
         |rn AS (SELECT reg_id, reg_nation, rlat, rlon,
         |  regexp_replace(regexp_replace(lower(reg_name), '[^a-z0-9#]', '', 'g'),
         |    '#0+', '#', 'g') AS blk FROM regs),
         |scored AS (SELECT l.c_custkey, r.reg_id,
         |  (CASE WHEN $d <= 5000.0 THEN 3 ELSE 0 END
         |   + CASE WHEN l.c_nationkey = r.reg_nation THEN 2 ELSE 0 END) AS score
         |  FROM ln l JOIN rn r ON l.blk = r.blk)
         |SELECT c_custkey, reg_id, score FROM scored WHERE score >= 5""".stripMargin
    },

    // the 4 min-plus rounds unrolled; the hub seed replays as an
    // ORDER BY deg DESC, src LIMIT 1 CTE
    "q_sssp" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      val round = (i: Int) =>
        s"""d$i AS (SELECT id, min(dist) AS dist FROM (
           |  SELECT id, dist FROM d${i - 1}
           |  UNION ALL
           |  SELECT a.dst, p.dist + a.w FROM d${i - 1} p JOIN adj a ON a.src = p.id)
           |GROUP BY id)""".stripMargin
      s"""WITH pts AS (SELECT c_custkey, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |e AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         |  (a.c_custkey * 31 + b.c_custkey * 17) % 1000 + 1 AS w
         |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
         |  WHERE $d <= 500000.0),
         |adj AS (SELECT id_a AS src, id_b AS dst, w FROM e
         |  UNION ALL SELECT id_b, id_a, w FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM adj GROUP BY src),
         |d0 AS (SELECT src AS id, CAST(0 AS BIGINT) AS dist FROM deg
         |  ORDER BY deg DESC, src LIMIT 1),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)}
         |SELECT id, dist FROM d4""".stripMargin
    },

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

    // per-line distance = min over the chain's edges of the kernel-
    // transcribed distance CASE; rank per point by (dist, line_id) —
    // KnnPolylinesSpec pins radius-boundary and pairwise rank margins
    "q_knn_polylines" -> {
      val branches = FixturePolylines.map { case (k, verts) =>
        val pts = verts.map { case (la, lo) => graft.s2.S2LatLng.fromDegrees(la, lo).toPoint }
        val edges = pts.indices.dropRight(1).map(i => edgeDistSql(pts(i), pts(i + 1)))
        s"""SELECT o_orderkey, CAST($k AS BIGINT) AS line_id,
           | least(${edges.mkString(",\n  ")}) * 6367000.0 AS dist
           |FROM xyz""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts),
         |d AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT line_id, o_orderkey, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT line_id, o_orderkey,
         |    row_number() OVER (PARTITION BY o_orderkey ORDER BY dist, line_id) AS rnk
         |  FROM d WHERE dist <= $KnnPolylinesRadiusM) t
         |WHERE rnk <= 2""".stripMargin
    },

    // proper spherical crossing from first principles: the kernel's
    // RobustCrossing sign conditions as four inlined-unit-vector triple
    // products per edge pair (general-position fixture: min |sign| 4.7e-6,
    // so the robust fallback never fires and plain IEEE signs decide)
    "q_polyline_cross_join" -> {
      val edges = FixtureRoutes.flatMap { case (k, vs) =>
        val pts = vs.map { case (la, lo) => graft.s2.S2LatLng.fromDegrees(la, lo).toPoint }
        pts.indices.dropRight(1).map { i =>
          val (a, b) = (pts(i), pts(i + 1))
          s"(CAST($k AS BIGINT), ${a.x}, ${a.y}, ${a.z}, ${b.x}, ${b.y}, ${b.z})"
        }
      }
      s"""WITH e(lid, ax, ay, az, bx, by, bz) AS (VALUES
         |${edges.mkString(",\n")}),
         |s AS (SELECT a.lid AS id_a, b.lid AS id_b,
         |  a.ay*a.bz - a.az*a.by AS abx, a.az*a.bx - a.ax*a.bz AS aby,
         |  a.ax*a.by - a.ay*a.bx AS abz,
         |  b.ay*b.bz - b.az*b.by AS cdx, b.az*b.bx - b.ax*b.bz AS cdy,
         |  b.ax*b.by - b.ay*b.bx AS cdz,
         |  -(abx*b.ax + aby*b.ay + abz*b.az) AS acb,
         |   (abx*b.bx + aby*b.by + abz*b.bz) AS bda,
         |  -(cdx*a.bx + cdy*a.by + cdz*a.bz) AS cbd,
         |   (cdx*a.ax + cdy*a.ay + cdz*a.az) AS dac
         | FROM e a JOIN e b ON a.lid < b.lid)
         |SELECT DISTINCT id_a, id_b FROM s
         |WHERE acb * bda > 0 AND acb * cbd > 0 AND acb * dac > 0""".stripMargin
    },

    // brute-force spatio-temporal pairs: all-pairs haversine + exact
    // integer-microsecond time-window predicate
    "q_st_join" -> StJoinOracleSql,

    // the streaming twin has identical semantics, so the identical oracle
    "q_st_join_stream" -> StJoinOracleSql,

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

    // brute-force DBSCAN from first principles: all-pairs eps-graph, degree
    // cores (count includes the point itself), recursive-CTE components of
    // the core-core graph seeded (id, id) so singleton cores label
    // themselves, borders = non-core with a core neighbor -> min cluster
    "q_kmeans" -> KMeansOracleSql,

    "q_dbscan" -> {
      val d = haversineExpr("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH RECURSIVE
         |pts AS (SELECT c_custkey AS id, $CustLatSql AS lat, $CustLonSql AS lon FROM customer),
         |p AS (SELECT a.id AS id_a, b.id AS id_b
         |  FROM pts a JOIN pts b ON a.id < b.id WHERE $d <= $DbscanEpsM),
         |edges AS (SELECT id_a AS s, id_b AS dd FROM p UNION SELECT id_b, id_a FROM p),
         |core AS (SELECT s AS id FROM edges GROUP BY s HAVING count(*) + 1 >= $DbscanMinPts),
         |ce AS (SELECT e.s, e.dd FROM edges e
         |  JOIN core c1 ON e.s = c1.id JOIN core c2 ON e.dd = c2.id),
         |reach(src, dst) AS (
         |  SELECT id, id FROM core
         |  UNION
         |  SELECT r.src, e.dd FROM reach r JOIN ce e ON e.s = r.dst),
         |cc AS (SELECT src AS id, min(dst) AS cluster_id FROM reach GROUP BY src),
         |border AS (SELECT e.s AS id, min(cc.cluster_id) AS cluster_id
         |  FROM edges e JOIN cc ON e.dd = cc.id
         |  WHERE e.s NOT IN (SELECT id FROM core) GROUP BY e.s)
         |SELECT id, cluster_id, TRUE AS is_core FROM cc
         |UNION ALL SELECT id, cluster_id, FALSE AS is_core FROM border""".stripMargin
    },

    "q_exact_dedup" ->
      "SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY text",

    "q_minhash_pairs" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE $TriJaccard >= 0.9""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $TriJaccard AS jaccard
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE $TriJaccard >= 0.9""".stripMargin,

    // the identical SNM pipeline: same normalized key, same total order,
    // same rank-window arithmetic, same trigram-Jaccard verify — the
    // single-node window here is the oracle's privilege; the engine's
    // rank is the two-pass range-partitioned one
    "q_snm_pairs" ->
      s"""WITH $TriCte,
         |k AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS key FROM documents),
         |r AS (SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS rnk FROM k),
         |cand AS (SELECT least(a.doc_id, b.doc_id) AS id_a, greatest(a.doc_id, b.doc_id) AS id_b
         |         FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 9)
         |SELECT c.id_a, c.id_b, $TriJaccard AS jaccard
         |FROM cand c JOIN tri a ON c.id_a = a.doc_id JOIN tri b ON c.id_b = b.doc_id
         |WHERE $TriJaccard >= 0.9""".stripMargin,

    // the identical integer cosine predicate over the shared trigram
    // derivation: t2Den*ov^2 >= t2Num*na*nb with t^2 = 49/100 — the
    // all-pairs SQL here is the ground truth the prefix filter must equal
    // exactly (completeness is the operator's contract, so the oracle is
    // the full quadratic, confined to oracle scale)
    "q_allpairs_cosine" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.tg, b.tg)) AS BIGINT) AS overlap,
         |  CAST(len(a.tg) AS BIGINT) AS na, CAST(len(b.tg) AS BIGINT) AS nb
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE 100 * CAST(len(list_intersect(a.tg, b.tg)) AS BIGINT) * len(list_intersect(a.tg, b.tg))
         |  >= 49 * CAST(len(a.tg) AS BIGINT) * len(b.tg)""".stripMargin,

    // verbatim >= 8-token spans: a pair shares a span iff their distinct
    // 8-gram sets intersect; mirrored with the null-filtered token-window
    // pattern so sub-8-token docs emit one short gram exactly like the
    // engine's slice()
    "q_substring_dups" -> {
      val win = (0 until 8).map(j => s"toks[i+$j]").mkString("[", ", ", "]")
      s"""WITH docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks FROM documents),
         |og AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 7, 1) + 1),
         |  i -> array_to_string(list_filter($win, t -> t IS NOT NULL), ' '))) AS g FROM docs)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM og a JOIN og b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.g, b.g)) > 0""".stripMargin
    },

    // incremental dedup == the full pair set restricted to pairs touching
    // the batch (the engine must find exactly these without generating any
    // corpus-corpus pair)
    "q_incremental_dedup" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE $TriJaccard >= 0.9
         |  AND (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)""".stripMargin,

    // decontamination == the substring-overlap pair set restricted to
    // (corpus doc, eval doc) pairs; same null-filtered token-window gram
    // construction as q_substring_dups
    "q_decontaminate" -> {
      val win = (0 until 4).map(j => s"toks[i+$j]").mkString("[", ", ", "]")
      s"""WITH docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks FROM documents),
         |og AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 3, 1) + 1),
         |  i -> array_to_string(list_filter($win, t -> t IS NOT NULL), ' '))) AS g FROM docs)
         |SELECT d.doc_id, e.doc_id AS eval_id
         |FROM og d JOIN og e ON d.doc_id % 25 <> 0 AND e.doc_id % 25 = 0
         |WHERE len(list_intersect(d.g, e.g)) > 0""".stripMargin
    },

    // connected components in SQL: reachability closure via a recursive CTE
    // over the symmetrized true-trigram-jaccard pair graph, then min
    // reachable id per source — exactly the engine's min-label fixpoint
    "q_dup_clusters" ->
      s"""WITH RECURSIVE $TriCte,
         |${ccCte(0.9)}
         |SELECT doc_id, cluster_id FROM cc""".stripMargin,

    // the same reachability closure, then two aggregates to the size
    // histogram — every output an exact integer
    "q_dedup_report" ->
      s"""WITH RECURSIVE $TriCte,
         |${ccCte(0.9)},
         |s AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |      FROM cc GROUP BY 1)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
         |  CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_redundant
         |FROM s GROUP BY 1""".stripMargin,

    // keep list = corpus minus non-canonical cluster members, over the same
    // reachability closure as q_dup_clusters
    "q_dedup_keep" ->
      s"""WITH RECURSIVE $TriCte,
         |${ccCte(0.9)}
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)""".stripMargin,

    // the END-TO-END pipeline as ONE CTE chain: the q_langid_pred vote,
    // the token gate, the exact-text collapse, the trigram-CC keep rule
    // (triCteOver/ccCte — the same shared derivations), then the q_pack
    // bucket + cumulative-batch arithmetic on the survivors
    "q_pipeline_keep" -> {
      val dictVals = TextAnalysis.Stopwords.toSeq.sortBy(_._1).flatMap {
        case (lang, ws) => ws.map(w => s"('$w','$lang')")
      }.mkString(", ")
      val (p, a) = (Dedup.HashP, Curation.HashA)
      s"""WITH RECURSIVE dict(tok, cand_lang) AS (VALUES $dictVals),
         |ltoks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |  x -> len(x) > 0)) AS tok FROM documents),
         |votes AS (SELECT doc_id, cand_lang, count(*) AS cnt
         |  FROM ltoks JOIN dict USING (tok) GROUP BY 1, 2),
         |best AS (SELECT doc_id, max(printf('%010d|%s', cnt, cand_lang)) AS key
         |  FROM votes GROUP BY 1),
         |en AS (SELECT d.doc_id, d.text FROM documents d JOIN best b USING (doc_id)
         |  WHERE split_part(b.key, '|', 2) = 'en'),
         |sized AS (SELECT doc_id, text,
         |  CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS INTEGER) AS n_tokens
         |  FROM en),
         |szf AS (SELECT * FROM sized WHERE n_tokens >= 20),
         |reps AS (SELECT min(doc_id) AS doc_id, max(n_tokens) AS n_tokens, text FROM szf GROUP BY text),
         |${triCteOver("reps")},
         |${ccCte(0.9)},
         |kept AS (SELECT r.doc_id, r.n_tokens FROM reps r
         |  WHERE r.doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)),
         |bk AS (SELECT doc_id, n_tokens,
         |  CAST(((doc_id % $p) * $a) % $p % 8 AS INTEGER) AS bucket FROM kept)
         |SELECT doc_id, n_tokens, bucket,
         | CAST((CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens) // 200 AS BIGINT) AS batch_id
         |FROM bk""".stripMargin
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

    // the same whitespace tokenizer, rank, min-rank first occurrences,
    // decile index arithmetic, and bucket self-join cumulative
    "q_vocab_growth" ->
      """WITH r AS (SELECT row_number() OVER (ORDER BY doc_id) AS rank, text FROM documents),
        |t AS (SELECT count(*) AS d FROM r),
        |tk AS (SELECT r.rank, unnest(list_filter(string_split_regex(lower(r.text), '\s+'),
        |  x -> len(x) > 0)) AS tok FROM r),
        |occ AS (SELECT ((rank - 1) * 10) // d AS bucket, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM tk, t GROUP BY 1),
        |nt AS (SELECT ((fr - 1) * 10) // d AS bucket, CAST(count(*) AS BIGINT) AS new_types
        |  FROM (SELECT tok, min(rank) AS fr FROM tk GROUP BY 1) f, t GROUP BY 1),
        |j AS (SELECT occ.bucket, occ.n_tokens, COALESCE(nt.new_types, 0) AS new_types
        |  FROM occ LEFT JOIN nt ON nt.bucket = occ.bucket)
        |SELECT a.bucket, a.n_tokens, a.new_types, CAST(sum(b.new_types) AS BIGINT) AS cum_types
        |FROM j a JOIN j b ON b.bucket <= a.bucket GROUP BY 1, 2, 3""".stripMargin,

    // same tokenizer as q_langid_pred ([^a-z]+ == Spark's [^\p{L}]+ on
    // this corpus); the rank is pure integer comparison, no float score
    "q_top_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |  x -> len(x) > 0)) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, term, tf, df FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS r
        |  FROM tf JOIN df USING (term)) t
        |WHERE r <= 3""".stripMargin,

    // identical integer arithmetic: scaled quotient c_xy*10^12 // (c_x*c_y)
    // (PMI rank — N^2/B is a corpus constant, so the quotient order IS the
    // PMI order), whitespace tokenizer of the trigram family, total order
    // (score DESC, w1, w2) so the top-20 cut is deterministic both sides
    "q_collocations" ->
      """WITH docs AS (SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |uni AS (SELECT unnest(toks) AS w FROM docs),
        |ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        |big AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM docs, unnest(range(1, len(toks))) AS t(i)),
        |bcnt AS (SELECT w1, w2, count(*) AS cxy FROM big GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT b.w1, b.w2, b.cxy, ua.c AS cx, ub.c AS cy,
        |  (b.cxy * 1000000000000) // (ua.c * ub.c) AS score
        |FROM bcnt b JOIN ucnt ua ON b.w1 = ua.w JOIN ucnt ub ON b.w2 = ub.w
        |ORDER BY score DESC, b.w1, b.w2 LIMIT 20""".stripMargin,

    // identical BM25 formula with the identical addition order: per-term
    // contributions folded in sorted-term order (list(... ORDER BY term)
    // mirrors Spark's sort_array(collect_list) fold), k1/b spelled as the
    // same literals so both engines derive the same IEEE constants; the
    // rank is stable under cross-engine ln ulps by the RetrievalSpec
    // margin precondition (ties only between docs with identical integer
    // inputs, which tie identically in both engines and fall to doc_id)
    "q_bm25" -> {
      val vocab = Bm25Queries.flatMap(_._2).distinct.sorted
      val inList = vocab.map(t => s"'$t'").mkString(", ")
      val qRows = Bm25Queries.flatMap { case (qid, ts) =>
        ts.map(t => s"(CAST($qid AS BIGINT), '$t')")
      }.mkString(", ")
      s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |  x -> len(x) > 0)) AS term FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         |q(query_id, term) AS (VALUES $qRows),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ($inList) GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |contrib AS (SELECT tf.doc_id, tf.term,
         |  ln(1.0 + (CAST(stats.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
         |    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
         |    / (CAST(tf.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl.dl AS DOUBLE)
         |        / (CAST(stats.sumdl AS DOUBLE) / CAST(stats.n AS DOUBLE)))) AS c
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
         |scored AS (SELECT q.query_id, contrib.doc_id,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(contrib.c ORDER BY contrib.term)),
         |    (a, b) -> a + b) AS score
         |  FROM contrib JOIN q USING (term) GROUP BY 1, 2)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id FROM (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM scored) t
         |WHERE rank <= 5""".stripMargin
    },

    // the 3 merge rounds unrolled: pair counts from the double-delimited
    // symbol string, argmax by (cnt DESC, l, r), greedy merge application
    // as replace(R, '|l||r|', '|lr|') — boundary-safe (symbols never
    // contain '|', the pattern's outer bars pin true symbol boundaries)
    // and run-correct (adjacent matches don't share delimiter chars), so
    // SQL's left-to-right non-overlapping replace IS BPE's greedy rule
    "q_bpe_train" -> {
      def sy(r: String) = s"list_filter(string_split($r, '||'), x -> len(x) > 0)"
      def pairs(r: String) =
        s"list_transform(range(1, len(${sy(r)})), i -> struct_pack(l := ${sy(r)}[i], r := ${sy(r)}[i + 1]))"
      def pcnt(it: String, r: String) =
        s"SELECT u.p.l AS l, u.p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM $it, UNNEST(${pairs(r)}) AS u(p) GROUP BY 1, 2"
      def argmax(p: String) = s"SELECT l, r FROM $p ORDER BY cnt DESC, l ASC, r ASC LIMIT 1"
      def apply(it: String, r: String, m: String, out: String) =
        s"SELECT replace($r, '|' || $m.l || '||' || $m.r || '|', '|' || $m.l || $m.r || '|') AS $out, freq FROM $it CROSS JOIN $m"
      s"""WITH w AS (SELECT t AS word, count(*) AS freq FROM (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0)) AS t FROM documents) u GROUP BY 1),
         |it0 AS (SELECT '||' || array_to_string(
         |    list_transform(range(1, len(word) + 1), i -> word[i:i]), '||') || '||' AS r0,
         |  freq FROM w),
         |p1 AS (${pcnt("it0", "r0")}),
         |m1 AS (${argmax("p1")}),
         |it1 AS (${apply("it0", "r0", "m1", "r1")}),
         |p2 AS (${pcnt("it1", "r1")}),
         |m2 AS (${argmax("p2")}),
         |it2 AS (${apply("it1", "r1", "m2", "r2")}),
         |p3 AS (${pcnt("it2", "r2")}),
         |m3 AS (${argmax("p3")})
         |SELECT CAST(1 AS INTEGER) AS rank, l AS "left", r AS "right" FROM m1
         |UNION ALL SELECT CAST(2 AS INTEGER), l, r FROM m2
         |UNION ALL SELECT CAST(3 AS INTEGER), l, r FROM m3""".stripMargin
    },

    // the same trained merges applied per (doc, word) with the same
    // double-delimiter replace chain, token counts summed per doc
    "q_bpe_encode" -> {
      def sy(r: String) = s"list_filter(string_split($r, '||'), x -> len(x) > 0)"
      def pairs(r: String) =
        s"list_transform(range(1, len(${sy(r)})), i -> struct_pack(l := ${sy(r)}[i], r := ${sy(r)}[i + 1]))"
      def pcnt(it: String, r: String) =
        s"SELECT u.p.l AS l, u.p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM $it, UNNEST(${pairs(r)}) AS u(p) GROUP BY 1, 2"
      def argmax(p: String) = s"SELECT l, r FROM $p ORDER BY cnt DESC, l ASC, r ASC LIMIT 1"
      def apply(it: String, r: String, m: String, out: String, keep: String) =
        s"SELECT replace($r, '|' || $m.l || '||' || $m.r || '|', '|' || $m.l || $m.r || '|') AS $out$keep FROM $it CROSS JOIN $m"
      s"""WITH w AS (SELECT t AS word, count(*) AS freq FROM (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0)) AS t FROM documents) u GROUP BY 1),
         |it0 AS (SELECT '||' || array_to_string(
         |    list_transform(range(1, len(word) + 1), i -> word[i:i]), '||') || '||' AS r0,
         |  freq FROM w),
         |p1 AS (${pcnt("it0", "r0")}),
         |m1 AS (${argmax("p1")}),
         |it1 AS (${apply("it0", "r0", "m1", "r1", ", freq")}),
         |p2 AS (${pcnt("it1", "r1")}),
         |m2 AS (${argmax("p2")}),
         |it2 AS (${apply("it1", "r1", "m2", "r2", ", freq")}),
         |p3 AS (${pcnt("it2", "r2")}),
         |m3 AS (${argmax("p3")}),
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |  x -> len(x) > 0)) AS word FROM documents),
         |d0 AS (SELECT doc_id, '||' || array_to_string(
         |    list_transform(range(1, len(word) + 1), i -> word[i:i]), '||') || '||' AS r0 FROM dw),
         |d1 AS (${apply("d0", "r0", "m1", "r1", ", doc_id")}),
         |d2 AS (${apply("d1", "r1", "m2", "r2", ", doc_id")}),
         |d3 AS (${apply("d2", "r2", "m3", "r3", ", doc_id")})
         |SELECT doc_id, CAST(sum(len(${sy("r3")})) AS BIGINT) AS n_bpe_tokens
         |FROM d3 GROUP BY 1""".stripMargin
    },

    // identical slice boundaries (1-based inclusive list slicing == Spark
    // slice(arr, i+1, max)), same single-space rejoin
    "q_chunks" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |  x -> len(x) > 0) AS toks FROM documents)
        |SELECT doc_id, CAST(i // 40 AS INTEGER) AS chunk_idx,
        | CAST(least(50, len(toks) - i) AS INTEGER) AS n_tokens,
        | array_to_string(toks[i + 1 : i + 50], ' ') AS chunk
        |FROM tk, UNNEST(range(0, CAST(len(toks) AS BIGINT), 40)) AS r(i)
        |WHERE len(toks) >= 1""".stripMargin,

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

    // identical NB arithmetic: sparse sorted-token fold of m*ln(cnt+1)
    // (absent class-token pairs contribute ln(1)=0, so the sparse join IS
    // the dense model), then score = fold - len*lnz + lnprior assembled in
    // the same order; argmax with the same (score DESC, label ASC) window
    "q_nb_classify" ->
      """WITH tk AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\s+'),
        |  x -> len(x) > 0) AS toks FROM documents),
        |v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(toks) AS t FROM tk) u),
        |doctok AS (SELECT doc_id, t AS token, count(*) AS m
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM tk) x GROUP BY 1, 2),
        |clstok AS (SELECT lang AS label, t AS token, count(*) AS cnt
        |  FROM (SELECT lang, unnest(toks) AS t FROM tk) x GROUP BY 1, 2),
        |clsstats AS (SELECT lang AS label, ln(CAST(count(*) AS DOUBLE)) AS lnprior,
        |  ln(CAST(CAST(sum(len(toks)) AS BIGINT) + (SELECT v FROM v) AS DOUBLE)) AS lnz
        |  FROM tk GROUP BY 1),
        |folds AS (SELECT doc_id, label,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(m AS DOUBLE) * ln(CAST(cnt + 1 AS DOUBLE)) ORDER BY token)),
        |    (a, b) -> a + b) AS fold
        |  FROM doctok JOIN clstok USING (token) GROUP BY 1, 2),
        |lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM tk),
        |scores AS (SELECT lens.doc_id, clsstats.label,
        |  coalesce(folds.fold, 0.0) - CAST(lens.len AS DOUBLE) * clsstats.lnz
        |    + clsstats.lnprior AS score
        |  FROM lens CROSS JOIN clsstats
        |  LEFT JOIN folds ON folds.doc_id = lens.doc_id AND folds.label = clsstats.label)
        |SELECT doc_id, label AS pred FROM (
        |  SELECT doc_id, label, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rk FROM scores) t
        |WHERE rk = 1""".stripMargin,

    // identical bigram model (add-one smoothing, same casts and ln-ratio
    // arithmetic) with the per-doc fold replayed in the same sorted
    // (w1, w2) order; rank-only output, margin spec-pinned
    "q_lm_perplexity" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |  x -> len(x) > 0) AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM tk, UNNEST(range(1, len(toks))) AS r(i) WHERE len(toks) >= 2),
        |docbg AS (SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY 1, 2, 3),
        |cnt AS (SELECT w1, w2, sum(m) AS cb FROM docbg GROUP BY 1, 2),
        |ctx AS (SELECT w1, sum(m) AS cc FROM docbg GROUP BY 1),
        |v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(toks) AS t FROM tk) u),
        |contrib AS (SELECT docbg.doc_id, docbg.w1, docbg.w2, docbg.m,
        |  CAST(docbg.m AS DOUBLE)
        |    * ln(CAST(cnt.cb + 1 AS DOUBLE) / CAST(ctx.cc + v.v AS DOUBLE)) AS c
        |  FROM docbg JOIN cnt USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
        |scored AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
        |  -list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY w1, w2)),
        |    (a, b) -> a + b) / CAST(sum(m) AS DOUBLE) AS avg_nll
        |  FROM contrib GROUP BY 1)
        |SELECT CAST(rank AS INTEGER) AS rank, doc_id, n_bigrams FROM (
        |  SELECT doc_id, n_bigrams,
        |    row_number() OVER (ORDER BY avg_nll DESC, doc_id ASC) AS rank
        |  FROM scored) t
        |WHERE rank <= 50""".stripMargin,

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

    // the two streamed batches collapse to one simulated merge: updated
    // keys end at their LAST event's coordinates (batch 2, seq 3), the
    // batch-1 and seq-2 positions must be gone, inserts appear once
    "q_stream_upsert" ->
      s"""WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         |    $LatSql AS lat, $LonSql AS lon FROM orders),
         |upd AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         |    ${latSqlFor("(o_orderkey * 13 + 5)")} AS lat,
         |    ${lonSqlFor("(o_orderkey * 13 + 5)")} AS lon
         |  FROM orders WHERE o_orderkey % 7 = 0),
         |ins AS (SELECT CAST(o_orderkey + 1000000000 AS BIGINT) AS o_orderkey,
         |    ${latSqlFor("(o_orderkey * 5 + 2)")} AS lat,
         |    ${lonSqlFor("(o_orderkey * 5 + 2)")} AS lon
         |  FROM orders WHERE o_orderkey % 11 = 0)
         |SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
         |UNION ALL SELECT * FROM upd
         |UNION ALL SELECT * FROM ins""".stripMargin,

    // compaction changes the file layout, never the rows
    "q_compact_scan" ->
      s"""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         |  $LatSql AS lat, $LonSql AS lon FROM orders""".stripMargin,

    // one convex edge-plane branch per hexagon (same exactness argument as
    // q_pip_polygon: normals are kernel-computed doubles inlined as
    // literals; PolygonTableJoinSpec pins the margin precondition)
    "q_poly_table_join" -> PolyTableOracleSql,

    // bit-identical polygon coordinates after the GeoJSON roundtrip
    // (shortest-roundtrip doubles, GeoJsonSpec-pinned), so the identical
    // oracle applies
    "q_geojson_poly_join" -> PolyTableOracleSql,

    // coordinate/id fidelity through the GeoJSON-lines roundtrip: the
    // oracle reads the parquet original — exact, no tolerance
    "q_geojson_scan" ->
      s"SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders",

    // the planted wrong-width set IS the exact answer
    "q_image_meta_gate" ->
      "SELECT p_partkey, (p_partkey % 25 <> 0) AS meta_ok FROM part",

    // exact complement of q_poly_table_join: in NO hexagon (same inlined
    // edge-plane normals, same margin precondition)
    "q_pip_anti" -> {
      val disjuncts = HexPolys.map { case (_, verts, center) => convexLoopSql(verts, center) }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts)
         |SELECT o_orderkey FROM xyz
         | WHERE NOT (${disjuncts.mkString("\n  OR ")})""".stripMargin
    },

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

    // per-region distance = 0 inside the convex loop (edge-plane test),
    // else the min over its edges of the kernel-transcribed distance CASE
    // (same machinery as q_polyline_join); rank per point by (dist,
    // region_id) — KnnRegionsMarginSpec pins radius-boundary and pairwise
    // rank-separation margins
    "q_knn_regions" -> {
      val regions = HexPolys.map(t => (t._1, t._2, t._3)) ++
        HexPolysVar.map(t => (t._1 + 100L, t._2, t._3))
      val branches = regions.map { case (k, verts, center) =>
        val pts = verts.map { case (la, lo) => graft.s2.S2LatLng.fromDegrees(la, lo).toPoint }
        val edges = pts.indices.map(i => edgeDistSql(pts(i), pts((i + 1) % pts.size)))
        s"""SELECT o_orderkey, CAST($k AS BIGINT) AS region_id,
           | CASE WHEN ${convexLoopSql(verts, center)} THEN 0.0
           |   ELSE least(${edges.mkString(",\n  ")}) * 6367000.0 END AS dist
           |FROM xyz""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts),
         |d AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT region_id, o_orderkey, CAST(rnk AS INTEGER) AS rank FROM (
         |  SELECT region_id, o_orderkey,
         |    row_number() OVER (PARTITION BY o_orderkey ORDER BY dist, region_id) AS rnk
         |  FROM d WHERE dist <= $KnnRegionsRadiusM) t
         |WHERE rnk <= 3""".stripMargin
    },

    // convex-loop intersection from first principles, set-based: loops
    // intersect iff a vertex of one is strictly inside the other (all six
    // edge planes positive) or some edge pair properly crosses (the
    // SimpleCrossing sign-product test, S2.cs:180-197). Vertex unit
    // vectors are kernel-computed doubles inlined as literals and every
    // predicate below is pure +/*/- on them, so DuckDB's IEEE arithmetic
    // reproduces the engine's classification bit-for-bit — no trig, no
    // margin argument needed (LoopIntersectSpec additionally pins the SQL
    // logic against the kernel over all 1225 pairs)
    "q_loop_intersect_join" -> {
      val all = HexPolys.map(t => (t._1, t._2)) ++
        HexPolysVar.map(t => (t._1 + 100L, t._2))
      val values = all.flatMap { case (id, vs) =>
        vs.zipWithIndex.map { case ((la, lo), k) =>
          val p = graft.s2.S2LatLng.fromDegrees(la, lo).toPoint
          s"($id, $k, ${p.x}, ${p.y}, ${p.z})"
        }
      }.mkString(",\n")
      s"""WITH v(rid, k, x, y, z) AS (VALUES
         |$values),
         |e AS (SELECT a.rid, a.k,
         |  a.x AS ax, a.y AS ay, a.z AS az, b.x AS bx, b.y AS by, b.z AS bz,
         |  a.y*b.z - a.z*b.y AS nx, a.z*b.x - a.x*b.z AS ny, a.x*b.y - a.y*b.x AS nz
         |  FROM v a JOIN v b ON a.rid = b.rid AND b.k = (a.k + 1) % 6),
         |vin AS (SELECT DISTINCT ra, rb FROM (
         |  SELECT va.rid AS ra, va.k AS ka, eb.rid AS rb,
         |    min(eb.nx*va.x + eb.ny*va.y + eb.nz*va.z) AS mn
         |  FROM v va JOIN e eb ON va.rid <> eb.rid
         |  GROUP BY va.rid, va.k, eb.rid) t WHERE mn > 0),
         |xing AS (SELECT DISTINCT ea.rid AS ra, eb.rid AS rb
         |  FROM e ea JOIN e eb ON ea.rid <> eb.rid
         |  WHERE ((-(ea.nx*eb.ax + ea.ny*eb.ay + ea.nz*eb.az))
         |          * (-(eb.nx*ea.bx + eb.ny*ea.by + eb.nz*ea.bz)) > 0)
         |    AND ((-(eb.nx*ea.bx + eb.ny*ea.by + eb.nz*ea.bz))
         |          * (ea.nx*eb.bx + ea.ny*eb.by + ea.nz*eb.bz) > 0)
         |    AND ((ea.nx*eb.bx + ea.ny*eb.by + ea.nz*eb.bz)
         |          * (eb.nx*ea.ax + eb.ny*ea.ay + eb.nz*ea.az) > 0)),
         |cand AS (SELECT * FROM vin UNION SELECT * FROM xing)
         |SELECT DISTINCT CAST(least(ra, rb) AS BIGINT) AS id_a,
         |  CAST(greatest(ra, rb) AS BIGINT) AS id_b FROM cand""".stripMargin
    },

    // every point lands in exactly one (group, tile); the engine-side
    // geometric gates pass for every group iff the vectorized outlines are
    // exact, so the surviving total is the plain point count
    "q_vectorize_dist" -> "SELECT count(*) AS total_points FROM orders",

    // identical machinery to q_poly_table_join's oracle — the adaptive
    // level menu changes the PLAN, never the contained set
    "q_poly_adaptive_join" -> {
      val branches = HexPolysVar.map { case (k, verts, center) =>
        s"""SELECT CAST($k AS BIGINT) AS region_id, o_orderkey FROM xyz
           | WHERE ${convexLoopSql(verts, center)}""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts)
         |${branches.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // min over the chain's edges of the kernel-transcribed distance CASE,
    // classified against the same radius
    "q_polyline_join" -> {
      val branches = FixturePolylines.map { case (k, verts) =>
        val pts = verts.map { case (la, lo) => graft.s2.S2LatLng.fromDegrees(la, lo).toPoint }
        val edges = pts.indices.dropRight(1).map(i => edgeDistSql(pts(i), pts(i + 1)))
        s"""SELECT CAST($k AS BIGINT) AS line_id, o_orderkey FROM xyz
           | WHERE least(${edges.mkString(",\n  ")}) * 6367000.0 <= $PolylineJoinRadiusM""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts)
         |${branches.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // per-(line, edge) distance rows (same inlined-constant edge formula
    // as q_polyline_join), global argmin per point by (d, line_id,
    // edge_idx) — the engine's two-stage argmin (nearest line by
    // (min-dist, line_id), then first-smallest edge) decides identically
    // because SnapJoinSpec pins strict winner/edge gaps and the
    // radius-boundary margin
    "q_snap_join" -> {
      val branches = FixturePolylines.flatMap { case (k, verts) =>
        val pts = verts.map { case (la, lo) => graft.s2.S2LatLng.fromDegrees(la, lo).toPoint }
        pts.indices.dropRight(1).map { i =>
          s"""SELECT o_orderkey, CAST($k AS BIGINT) AS line_id,
             | CAST($i AS INTEGER) AS edge_idx,
             | ${edgeDistSql(pts(i), pts(i + 1))} * 6367000.0 AS d FROM xyz""".stripMargin
        }
      }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts),
         |cand AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT o_orderkey, line_id, edge_idx FROM (
         |  SELECT o_orderkey, line_id, edge_idx, d, row_number() OVER (
         |    PARTITION BY o_orderkey ORDER BY d ASC, line_id ASC, edge_idx ASC) AS rk
         |  FROM cand) t
         |WHERE rk = 1 AND d <= $PolylineJoinRadiusM""".stripMargin
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
    },

    // the online twin: the same forward DP, but emitting each STEP's
    // frontier argmin (cost, line, edge) — the filter view, no
    // backtracking, no path strings
    "q_map_match_stream" -> {
      s"""WITH RECURSIVE $mapMatchOracleBase,
         |v AS (
         |  SELECT user_id, step, line, edge, e AS cost FROM c2 WHERE step = 1
         |  UNION ALL
         |  SELECT c.user_id, c.step, c.line, c.edge,
         |    min(p.cost + $MapMatchTransSql) + c.e AS cost
         |  FROM v p JOIN c2 c ON c.user_id = p.user_id AND c.step = p.step + 1
         |  GROUP BY c.user_id, c.step, c.line, c.edge, c.e),
         |b AS (SELECT user_id, step, CAST(min(cost) AS BIGINT) AS cost,
         |    string_split(arg_min(CAST(line AS VARCHAR) || ':' || CAST(edge AS VARCHAR),
         |      ${mapMatchTieKey("cost", "line", "edge")}), ':') AS le
         |  FROM v GROUP BY 1, 2)
         |SELECT st.user_id AS track_id, st.event_id,
         |  CAST(b.le[1] AS BIGINT) AS line_id,
         |  CAST(b.le[2] AS INTEGER) AS edge_idx, b.cost
         |FROM b JOIN steps st ON st.user_id = b.user_id AND st.step = b.step""".stripMargin
    },

    // shell-minus-hole edge-plane branches per region (both loops convex;
    // same inlined-normal exactness argument as q_poly_table_join)
    "q_holed_table_join" -> {
      val branches = HoledPolys.map { case (k, loops, center) =>
        val shell = convexLoopSql(loops(0), center)
        val hole = convexLoopSql(loops(1), center)
        s"""SELECT CAST($k AS BIGINT) AS region_id, o_orderkey FROM xyz
           | WHERE $shell AND NOT $hole""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, $LatSql AS lat, $LonSql AS lon FROM orders),
         |xyz AS (SELECT o_orderkey,
         |  cos(radians(lat))*cos(radians(lon)) AS px,
         |  cos(radians(lat))*sin(radians(lon)) AS py,
         |  sin(radians(lat)) AS pz FROM pts)
         |${branches.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // the bucketed layout changes the plan, not the rows
    "q_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | count(DISTINCT o_custkey) AS n_custs,
        | min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // brute-force trigram frequency with the same tokenizer/windowing as
    // the engine's candidates-then-verify path; the threshold is the same
    // ceil(fraction * total) double arithmetic
    "q_heavy_hitters" ->
      """WITH docs AS (SELECT list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks FROM documents),
        |g AS (SELECT unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |  i -> array_to_string(list_filter([toks[i], toks[i+1], toks[i+2]], t -> t IS NOT NULL), ' '))) AS gram FROM docs),
        |tot AS (SELECT count(*) AS n FROM g)
        |SELECT gram, count(*) AS cnt FROM g, tot
        |GROUP BY gram, n HAVING count(*) >= ceil(0.0002 * n)""".stripMargin,

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

    // the same register replay without the exact column — the streaming
    // operator's whole point is never materializing the id sets
    "q_cell_visitors_hll_stream" ->
      s"""WITH pts AS (SELECT user_id, ${latSqlFor("event_id")} AS lat,
         |  ${lonSqlFor("event_id")} AS lon FROM events),
         |idx AS (SELECT user_id, ${geohashIdxSql(1)} FROM pts),
         |cells AS (SELECT ${geohashCharsSql(1)} AS cell, user_id FROM idx),
         |vals AS (SELECT DISTINCT cell, CAST(user_id AS VARCHAR) AS v FROM cells),
         |hashed AS (SELECT cell, $SketchValueHashSql AS h FROM vals),
         |fin AS (SELECT cell, ${Sketches.finalizeSqlOf("h")} AS h FROM hashed),
         |regs AS (SELECT cell, h % 256 AS bucket,
         |  max(CASE WHEN h // 256 = 0 THEN 24 ELSE 24 - length(bin(h // 256)) END) AS register
         |  FROM fin GROUP BY 1, 2)
         |SELECT cell, 256 - count(*) AS hll_zeros,
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

    "q_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val
           |FROM documents""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val
           |FROM documents""".stripMargin
      Seq(num("doc_id"), num("n_chars"), str("lang"), str("source"))
        .mkString("\nUNION ALL\n")
    },

    // oracle reads the parquet original: the JSONL round trip must not
    // change a single aggregated value
    "q_json_scan" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY lang""".stripMargin,

    // SimHash recomputed bit-for-bit in SQL: Dedup.portableHash is the
    // polynomial char-code fold (h*131 + c) mod 2^31-1, and bit i of the
    // signature is the majority vote of g_i(h) = (a_i*h + b_i) mod P over
    // the doc's distinct trigrams (same a_i/b_i from Dedup.gCoeffs). The
    // engine's banded join is exact for hamming <= 3 (pigeonhole over four
    // 16-bit bands), so it must equal this all-pairs hamming filter.
    "q_simhash_pairs" -> {
      val P = Dedup.HashP
      val bitSums = (0 until 64).map { i =>
        val (a, b) = Dedup.gCoeffs(i)
        s"sum(CASE WHEN (($a * h + $b) % $P) * 2 < $P THEN 1 ELSE -1 END) AS s$i"
      }.mkString(", ")
      val bitsSel = (0 until 64).map(i => s"(CASE WHEN s$i > 0 THEN 1 ELSE 0 END) AS t$i").mkString(", ")
      val hammingExpr = (0 until 64).map(i => s"(CASE WHEN x.t$i <> y.t$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS toks FROM documents),
         |tri AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
         |  i -> array_to_string(list_filter([toks[i], toks[i+1], toks[i+2]], t -> t IS NOT NULL), ' ')))) AS shingle FROM docs),
         |hashed AS (SELECT doc_id, list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(shingle) + 1),
         |  i -> CAST(ascii(substr(shingle, i, 1)) AS BIGINT)), (h, c) -> (h * 131 + c) % $P) AS h FROM tri),
         |sums AS (SELECT doc_id, $bitSums FROM hashed GROUP BY doc_id),
         |bits AS (SELECT doc_id, $bitsSel FROM sums)
         |SELECT x.doc_id AS id_a, y.doc_id AS id_b
         |FROM bits x JOIN bits y ON x.doc_id < y.doc_id
         |WHERE $hammingExpr <= 3""".stripMargin
    },

    "q_ann_brute" ->
      """SELECT query_id, neighbor_id FROM (
        | SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id) AS rnk
        | FROM embeddings e, embeddings q
        | WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id) t WHERE rnk <= 5""".stripMargin,

    // q_ann_brute's pinned top-5 ranking + integer votes + the same
    // (votes DESC, label ASC) row_number argmax
    "q_knn_classify" ->
      """WITH nn AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id) AS rnk
        |  FROM embeddings e, embeddings q
        |  WHERE q.vec_id < 40 AND e.vec_id <> q.vec_id) t WHERE rnk <= 5),
        |v AS (SELECT nn.query_id, l.label AS lbl, CAST(count(*) AS BIGINT) AS votes
        |  FROM nn JOIN embeddings l ON l.vec_id = nn.neighbor_id
        |  WHERE l.label IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT query_id, lbl AS pred_label, votes FROM (
        |  SELECT query_id, lbl, votes, row_number() OVER (
        |    PARTITION BY query_id ORDER BY votes DESC, lbl ASC) AS rk FROM v) t
        |WHERE rk = 1""".stripMargin,

    // q_ann_brute's oracle restricted to cross-label rows
    "q_hard_negatives" ->
      """SELECT query_id, neighbor_id FROM (
        | SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id) AS rnk
        | FROM embeddings e, embeddings q
        | WHERE q.vec_id < 10 AND e.label <> q.label) t WHERE rnk <= 5""".stripMargin,

    "q_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.3""".stripMargin,

    "q_embed_stats" ->
      """SELECT label, count(*) AS cnt, min(embedding[1]) AS min_e1, max(embedding[1]) AS max_e1
        |FROM embeddings GROUP BY label""".stripMargin,

    // the q_embed_neardup pair graph closed into components (reachability
    // CTE, same shape as the q_dup_clusters oracle), keep list = corpus
    // minus non-canonical members
    "q_semantic_keep" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3),
        |edges AS (SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
        |reach(src, dst) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.dst),
        |cc AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM cc WHERE vec_id <> cluster_id)""".stripMargin,

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
        |SELECT c.bucket, c.n_a, c.n_b, abs(c.n_a*t.tb - c.n_b*t.ta) AS contrib FROM c, t""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars_m,
        | CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS INTEGER) AS n_tokens
        |FROM documents""".stripMargin,

    // PII scrub mirrored with RE2: same planted suffixes, same patterns in
    // the same replacement order ('g' flag: DuckDB replaces first-only by
    // default, Spark replaces all)
    "q_pii_scrub" -> {
      val patterns = graft.operators.TextAnalysis.PiiPatterns
      val cleanSql = patterns.foldLeft("text") { case (c, (_, pat, rep)) =>
        s"regexp_replace($c, '$pat', '$rep', 'g')"
      }
      val countSql = patterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS INTEGER) AS n_$name"
      }.mkString(",\n ")
      s"""WITH p AS (SELECT doc_id, text ||
         | CASE WHEN doc_id % 20 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
         |   || '@example.com or +1 555 123 4567 see https://ex.com/p' || CAST(doc_id AS VARCHAR)
         |   ELSE '' END ||
         | CASE WHEN doc_id % 30 = 0 THEN ' node 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
         |   ELSE '' END AS text FROM documents)
         |SELECT doc_id, $cleanSql AS clean_text,
         | $countSql
         |FROM p""".stripMargin
    },

    // repetition signals mirrored with DuckDB list functions; the engine's
    // "one short gram for sub-2-token docs" rule does NOT apply to bigrams
    // here (n_bigrams is 0 for 0/1-token docs on both sides)
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |b AS (SELECT doc_id, toks, CASE WHEN len(toks) >= 2
        |  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |  ELSE CAST([] AS VARCHAR[]) END AS big FROM t)
        |SELECT doc_id,
        | CAST(len(toks) AS INTEGER) AS n_tokens,
        | CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
        | CAST(len(big) AS INTEGER) AS n_bigrams,
        | CAST(len(list_distinct(big)) AS INTEGER) AS n_distinct_bigrams,
        | CAST(coalesce(list_max(list_transform(list_distinct(big), x -> len(list_filter(big, y -> y = x)))), 0) AS INTEGER) AS top_bigram_count
        |FROM b""".stripMargin,

    "q_lang_agg" -> "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",

    // quality-score formula mirrored in SQL; on this corpus (no punctuation
    // or uppercase) the punct/upper penalty terms are exactly zero
    "q_quality" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS INTEGER) AS ntok,
        |  CAST(length(text) AS DOUBLE) AS nchars FROM documents),
        |g AS (SELECT doc_id, ntok,
        |  nchars / greatest(ntok, 1) AS mwl FROM f)
        |SELECT doc_id, ntok AS n_tokens,
        |  round(CASE WHEN ntok < 5 THEN 0.0 ELSE greatest(0.0,
        |    1.0 - (CASE WHEN mwl > 12 THEN (mwl - 12) * 0.05 ELSE 0.0 END)
        |        - (CASE WHEN mwl < 3 THEN (3 - mwl) * 0.2 ELSE 0.0 END)) END, 6) AS quality
        |FROM g""".stripMargin,

    // heuristic language id replicated in SQL; the corpus is pure ASCII so
    // the [^a-z]+ tokenizer matches Spark's [^\p{L}]+ exactly
    "q_langid_pred" ->
      """WITH dict(tok, cand_lang) AS (VALUES ('the','en'),('and','en'),('of','en'),('to','en'),('in','en'),('is','en'),('that','en'),('for','en'),('with','en'),('was','en'),('der','de'),('die','de'),('und','de'),('das','de'),('ist','de'),('nicht','de'),('mit','de'),('ein','de'),('von','de'),('für','de'),('le','fr'),('la','fr'),('et','fr'),('les','fr'),('des','fr'),('est','fr'),('pas','fr'),('pour','fr'),('dans','fr'),('que','fr'),('el','es'),('la','es'),('que','es'),('los','es'),('una','es'),('por','es'),('con','es'),('para','es'),('como','es'),('más','es'),('il','it'),('che','it'),('di','it'),('la','it'),('per','it'),('una','it'),('sono','it'),('non','it'),('con','it'),('del','it')),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |  x -> len(x) > 0)) AS tok FROM documents),
        |votes AS (SELECT doc_id, cand_lang, count(*) AS cnt
        |  FROM toks JOIN dict USING (tok) GROUP BY 1, 2),
        |best AS (SELECT doc_id, max(printf('%010d|%s', cnt, cand_lang)) AS key
        |  FROM votes GROUP BY 1)
        |SELECT d.doc_id, CASE WHEN b.key IS NULL THEN 'und' ELSE split_part(b.key, '|', 2) END AS lang_pred
        |FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN best b USING (doc_id)""".stripMargin,

    // fingerprint groups == normalized-text groups (64-bit hash collisions
    // are vanishingly unlikely at this cardinality and would fail loudly)
    "q_fingerprint_dups" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents
        |GROUP BY regexp_replace(lower(text), '\s+', ' ', 'g')""".stripMargin,

    "q_image_payload" -> "SELECT p_partkey FROM part",

    "q_image_features" -> "SELECT p_partkey FROM part",

    // the planted blur set IS the exact answer: ImageSharpnessSpec pins the
    // >= 4x threshold clearance of both populations
    "q_image_sharpness" -> "SELECT p_partkey, (p_partkey % 8 <> 0) AS sharp FROM part",

    "q_image_gray" -> "SELECT p_partkey, (p_partkey % 12 <> 0) AS colorful FROM part",

    "q_audio_features" -> "SELECT p_partkey FROM part",

    // the planted re-upload set IS the exact answer: 8 analysis windows,
    // window 1 muted in the copy -> 7 shared positions; gain invariance is
    // exact (energy-ratio bits) and the no-natural-collision precondition
    // is spec-asserted over the full sf0.01 key population
    "q_audio_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 1000000000 AS id_b,
        | CAST(7 AS BIGINT) AS shared
        |FROM part WHERE p_partkey % 25 = 0""".stripMargin,

    // all three gate columns are integer rules of p_partkey (header fields
    // from the synthesis rule; frames_ok = not corrupted; is_static known
    // only when decodable) — VideoPayloadSpec pins the no-natural-static
    // precondition that makes the planted classification THE exact answer
    "q_video_meta" ->
      """SELECT p_partkey,
        | CAST(3 + p_partkey % 4 AS INTEGER) AS n_frames,
        | CAST(2 + p_partkey % 3 AS INTEGER) AS fps,
        | (p_partkey % 33 <> 0) AS frames_ok,
        | CASE WHEN p_partkey % 33 = 0 THEN NULL ELSE (p_partkey % 20 = 0) END AS is_static
        |FROM part""".stripMargin,

    // n_sampled = floor((n_frames-1)/2)+1; the truncated LAST frame (index
    // n_frames-1 = 2 + key%4) is sampled iff that index is even, i.e. iff
    // key%4 is even — the stride-lands-on-the-damage parity rule
    "q_video_frames" ->
      """SELECT p_partkey,
        | CAST((2 + p_partkey % 4) // 2 + 1 AS INTEGER) AS n_sampled,
        | (p_partkey % 33 <> 0 OR (p_partkey % 4) % 2 <> 0) AS sampled_ok
        |FROM part""".stripMargin,

    // the accumulated pair stream is exactly the three planted relations
    // per decodable re-posted key, each with shared = n_sampled(source)
    "q_stream_video_dedup" ->
      """WITH k AS (SELECT p_partkey AS src,
        |  CAST((2 + p_partkey % 4) // 2 + 1 AS BIGINT) AS shared
        | FROM part WHERE p_partkey % 25 = 0 AND p_partkey % 33 <> 0)
        |SELECT src AS id_a, src + 1000000000 AS id_b, shared FROM k
        |UNION ALL
        |SELECT src AS id_a, src + 2000000000 AS id_b, shared FROM k
        |UNION ALL
        |SELECT src + 1000000000 AS id_a, src + 2000000000 AS id_b, shared FROM k""".stripMargin,

    // the planted re-post set IS the exact answer (VideoPayloadSpec pins
    // the no-natural-collision precondition); shared = n_sampled of the
    // source because the patched frame (idx 1) is never sampled at stride 2
    "q_video_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 1000000000 AS id_b,
        | CAST((2 + p_partkey % 4) // 2 + 1 AS BIGINT) AS shared
        |FROM part WHERE p_partkey % 25 = 0 AND p_partkey % 33 <> 0""".stripMargin,

    // survivors = even frame indices below n_frames, minus the damaged
    // last frame (idx n-1 = 2 + key%4) of corrupt videos when the stride
    // lands on it
    "q_video_frame_features" ->
      """SELECT p_partkey, CAST(f.idx AS INTEGER) AS frame_idx
        |FROM part, UNNEST(range(0, CAST(3 + p_partkey % 4 AS BIGINT), 2)) AS f(idx)
        |WHERE NOT (p_partkey % 33 = 0 AND f.idx = 2 + p_partkey % 4)""".stripMargin,

    // rect-branch region label + the q_video_meta integer gate rules
    "q_video_region_stats" -> {
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, p_partkey FROM pts
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH pts AS (SELECT p_partkey,
         |  $PartLatSql AS lat, $PartLonSql AS lon FROM part),
         |labeled AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT region_id, count(*) AS n_videos,
         |  CAST(sum(CASE WHEN p_partkey % 33 = 0 THEN 0
         |           WHEN p_partkey % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_static,
         |  CAST(sum(CASE WHEN p_partkey % 33 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
         |FROM labeled GROUP BY 1""".stripMargin
    },

    // the gate keeps exactly the true planted pairs (two-sided SSIM margin
    // spec-pinned over the full population)
    "q_image_ssim" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // exact: the engine must recover precisely the planted patched copies
    // (no natural pair exists within hamming 3 — spec-asserted over the
    // whole population, see q_image_neardup comment)
    "q_image_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // exact: rotated re-uploads sit at canonical hamming 0, nothing else
    // within 3 bits (precondition spec-asserted over the population)
    "q_image_rot_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // exact: only the colocated planted pairs survive the spatial
    // constraint — the antipodal byte-copies (hamming 0, never adjacent)
    // are precisely what this query must exclude vs q_image_neardup
    "q_geo_image_neardup" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // the certified population's three branches with their literal lat/lon
    // derivations, the planted dup-member set (%40 originals + copies),
    // and the same rect predicates as q_image_tile_join
    "q_region_dup_rate" -> {
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, id FROM pop
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH pop AS (
         |  SELECT p_partkey AS id, $PartLatSql AS lat, $PartLonSql AS lon FROM part
         |  UNION ALL
         |  SELECT p_partkey + 100000000, $PartLatSql, $PartLonSql FROM part WHERE p_partkey % 40 = 0
         |  UNION ALL
         |  SELECT p_partkey + 400000000, -($PartLatSql),
         |    CASE WHEN $PartLonSql >= 0 THEN $PartLonSql - 180.0 ELSE $PartLonSql + 180.0 END
         |  FROM part WHERE p_partkey % 60 = 0),
         |dups AS (
         |  SELECT p_partkey AS id FROM part WHERE p_partkey % 40 = 0
         |  UNION ALL
         |  SELECT p_partkey + 100000000 FROM part WHERE p_partkey % 40 = 0),
         |lab AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT region_id, count(*) AS n_images,
         |  CAST(sum(CASE WHEN id IN (SELECT id FROM dups) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_members
         |FROM lab GROUP BY 1""".stripMargin
    },

    // planted caption groups: {orig, re-post} pairs are same_image, any
    // pair involving the fresh-raster mislabel is not; keys % 90 carry
    // all three members, hence the third branch
    "q_caption_consistency" ->
      """SELECT p_partkey AS id_a, p_partkey + 200000000 AS id_b, TRUE AS same_image
        |FROM part WHERE p_partkey % 30 = 0
        |UNION ALL
        |SELECT p_partkey, p_partkey + 300000000, FALSE FROM part WHERE p_partkey % 45 = 0
        |UNION ALL
        |SELECT p_partkey + 200000000, p_partkey + 300000000, FALSE FROM part WHERE p_partkey % 90 = 0""".stripMargin,

    "q_image_tile_join" -> {
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, image_id FROM pts
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH pts AS (SELECT printf('img%012d', p_partkey) AS image_id,
         |  $PartLatSql AS lat, $PartLonSql AS lon FROM part)
         |${branches.mkString("\nUNION ALL\n")}
         |""".stripMargin
    },

    // the zoom-5 mercator arithmetic over the part-key grid; n_decoded is
    // asserted equal to n_images by construction — any decode regression
    // breaks the count equality, which is exactly what this row gates
    "q_image_mosaic" ->
      s"""WITH pts AS (SELECT $PartLatSql AS lat, $PartLonSql AS lon FROM part),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |g AS (SELECT
         |  least(31, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 32.0) AS BIGINT))) AS zx,
         |  least(31, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 32.0) AS BIGINT))) AS zy
         | FROM c)
         |SELECT zx, zy, count(*) AS n_images, count(*) AS n_decoded
         |FROM g GROUP BY 1, 2""".stripMargin,

    // the z=5 mercator arithmetic once, then each coarser level is integer
    // division of the tile indices (zx >= 0, so // == the engine's
    // shiftright); counts gate the decode at every level
    "q_mosaic_pyramid" -> {
      val levels = (2 to 5).map { z =>
        val d = 1 << (5 - z)
        s"""SELECT $z AS z, zx // $d AS zx, zy // $d AS zy,
           | count(*) AS n_images, count(*) AS n_decoded FROM g GROUP BY 2, 3""".stripMargin
      }
      s"""WITH pts AS (SELECT $PartLatSql AS lat, $PartLonSql AS lon FROM part),
         |c AS (SELECT least(85.05112878, greatest(-85.05112878, lat)) AS latc, lon FROM pts),
         |g AS (SELECT
         |  least(31, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 32.0) AS BIGINT))) AS zx,
         |  least(31, greatest(0, CAST(floor((1.0 - ln(tan(latc * pi() / 180.0)
         |    + 1.0 / cos(latc * pi() / 180.0)) / pi()) / 2.0 * 32.0) AS BIGINT))) AS zy
         | FROM c)
         |${levels.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // the PIP label branches feed the exact histogram-quantile replay
    // (same bucket clamp, same max(1, ceil(q*n)) threshold — identical
    // IEEE operands both sides, zero tolerance)
    "q_region_quantile" -> {
      val branches = SparkEntryRegions.rectBounds.map { case (rid, latLo, latHi, lonLo, lonHi) =>
        s"""SELECT '$rid' AS region_id, o_totalprice FROM pts
           | WHERE ${SparkEntryRegions.rectPredSql(latLo, latHi, lonLo, lonHi)}""".stripMargin
      }
      s"""WITH pts AS (SELECT o_orderkey, o_totalprice, $LatSql AS lat, $LonSql AS lon FROM orders),
         |lab AS (${branches.mkString("\nUNION ALL\n")}),
         |x AS (SELECT region_id,
         |  LEAST(59, GREATEST(0, CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT) / 1000000.0) AS BIGINT))) AS b
         | FROM lab),
         |c AS (SELECT region_id, b, count(*) AS cnt FROM x GROUP BY 1, 2),
         |w AS (SELECT region_id, b,
         |        SUM(cnt) OVER (PARTITION BY region_id ORDER BY b) AS cum,
         |        SUM(cnt) OVER (PARTITION BY region_id) AS n FROM c)
         |SELECT region_id,
         |  CAST(MIN(CASE WHEN cum >= GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT)) THEN b * 1000000 END) AS BIGINT) AS p50_c,
         |  CAST(MIN(CASE WHEN cum >= GREATEST(1, CAST(ceil(0.95 * n) AS BIGINT)) THEN b * 1000000 END) AS BIGINT) AS p95_c
         |FROM w GROUP BY 1""".stripMargin
    },

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
        |FROM w GROUP BY 1""".stripMargin,

    // planted cluster structure (see q_image_dup_clusters comment): each
    // selected original k forms the component {k, k+1e8, k+2e8}, min
    // label k; singleton (unpaired) images never enter the pair list
    "q_image_dup_clusters" ->
      """SELECT p_partkey AS image_key, p_partkey AS cluster_id
        |FROM part WHERE p_partkey % 40 = 0
        |UNION ALL
        |SELECT p_partkey + 100000000 AS image_key, p_partkey AS cluster_id
        |FROM part WHERE p_partkey % 40 = 0
        |UNION ALL
        |SELECT p_partkey + 200000000 AS image_key, p_partkey AS cluster_id
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // the planted re-upload structure IS the exact answer (the
    // q_image_neardup preconditions — no natural <= 3-bit collision,
    // patches within 3 bits of their source — plus hamming-0 byte-identity
    // between the two re-posts of each source)
    "q_stream_image_dedup" ->
      """SELECT p_partkey AS id_a, p_partkey + 100000000 AS id_b
        |FROM part WHERE p_partkey % 40 = 0
        |UNION ALL
        |SELECT p_partkey, p_partkey + 200000000 FROM part WHERE p_partkey % 40 = 0
        |UNION ALL
        |SELECT p_partkey + 100000000, p_partkey + 200000000
        |FROM part WHERE p_partkey % 40 = 0""".stripMargin,

    // identical pair semantics to q_incremental_dedup by construction
    // (2-batch stream == one-shot incremental batch), identical oracle
    "q_stream_dedup" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE $TriJaccard >= 0.9
         |  AND (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)""".stripMargin
  )
}
