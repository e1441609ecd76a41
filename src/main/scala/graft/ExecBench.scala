package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin
import graft.plans.S2PipJoin
object ExecBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").config("spark.driver.host","localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pts = spark.range(100000000L, 200000000L, 1, 64)
      .withColumn("lat", ((col("id") * 9973 + 12345) % 18000).cast("double") / lit(100.0) - lit(90.0))
      .withColumn("lon", ((col("id") * 31337 + 54321) % 36000).cast("double") / lit(100.0) - lit(180.0))
    // args = substring filters: run only the entries whose name matches one
    val filters = args.toSeq
    def t(name: String)(mk: => Long): Unit = tn(name, 100000000L)(mk)
    // explicit processed-row count (entries whose mk returns a result
    // cardinality, or that process a non-100M input)
    def tn(name: String, rows: Long)(mk: => Long): Unit = {
      if (filters.nonEmpty && !filters.exists(f => name.trim.contains(f))) return
      mk // warm
      var best = Double.MaxValue
      var n = 0L
      for (_ <- 0 until 2) { val t0=System.nanoTime(); n = mk; best = math.min(best,(System.nanoTime()-t0)/1e9) }
      println(f"$name: ${rows/best/1e6}%.1f M rows/s (n=$n)")
    }
    t("declarative pipJoin ") { SpatialJoin.pipJoin(pts.toDF(), "lat", "lon", SparkEntryRegions.rects).count() }
    t("custom S2PipJoinExec") { S2PipJoin.pipJoinExec(pts.toDF(), "lat", "lon", SparkEntryRegions.rects).count() }
    // the table-driven region joins at the same 100M-point scale: region
    // TABLES (not driver Seqs) rasterized executor-side, points probing on
    // scan-computed cells
    import spark.implicits._
    val hexDf = SparkEntry.HexPolys
      .map { case (k, vs, _) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("region_id", "lats", "lons")
    t("polygonPipJoin 25  ") {
      SpatialJoin.polygonPipJoin(pts.toDF(), "lat", "lon",
        hexDf, "region_id", "lats", "lons", level = 6).count()
    }
    val hexVarDf = SparkEntry.HexPolysVar
      .map { case (k, vs, _) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("region_id", "lats", "lons")
    t("adaptive (menu 4/6/8)") {
      SpatialJoin.polygonPipJoinAdaptive(pts.toDF(), "lat", "lon",
        hexVarDf, "region_id", "lats", "lons",
        targetCells = 32, quantizeLevels = Seq(4, 6, 8)).count()
    }
    val lineDf = SparkEntry.FixturePolylines
      .map { case (k, vs) => (k, vs.map(_._1).toArray, vs.map(_._2).toArray) }
      .toDF("line_id", "lats", "lons")
    t("polylineDistJoin 25") {
      SpatialJoin.polylineDistanceJoin(pts.toDF(), "lat", "lon",
        lineDf, "line_id", "lats", "lons", SparkEntry.PolylineJoinRadiusM).count()
    }
    // mobility ops at the same scale: 1M entities x 100 points, one
    // entity-shuffle window each (the claimed scale shape)
    import graft.operators.Trajectories
    def trk = spark.range(0L, 100000000L, 1, 64)
      .withColumn("user_id", col("id") % 1000000L)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + (col("id") / lit(1000000L)).cast("long")))
      .withColumn("lat", ((col("id") * 9973 + 12345) % 18000).cast("double") / lit(100.0) - lit(90.0))
      .withColumn("lon", ((col("id") * 31337 + 54321) % 36000).cast("double") / lit(100.0) - lit(180.0))
    t("odFlows 1M ents   ") {
      Trajectories.odFlows(trk.toDF(), "user_id", "ts", "id", "lat", "lon",
        SparkEntryRegions.rects).count()
    }
    t("visitEpisodes     ") {
      Trajectories.visitEpisodes(trk.toDF(), "user_id", "ts", "id", "lat", "lon",
        SparkEntryRegions.rects).count()
    }
    t("trackBounds       ") {
      Trajectories.trackBounds(trk.toDF(), "user_id", "lat", "lon").count()
    }
    // wave-5/6 additions at the same 100M-point scale
    import graft.operators.Tiling
    t("zonalStats 25     ") {
      SpatialJoin.zonalStats(pts.toDF(), "lat", "lon", "id",
        hexDf, "region_id", "lats", "lons", level = 6).count()
    }
    t("pipAntiJoin 25    ") {
      SpatialJoin.polygonPipAntiJoin(pts.toDF(), "id", "lat", "lon",
        hexDf, "region_id", "lats", "lons", level = 6).count()
    }
    t("zxyAssign z12     ") {
      Tiling.zxyAssign(pts.toDF(), "lat", "lon", 12)
        .agg(sum(col("zx") + col("zy")), sum(length(col("quadkey")))).collect(); 100000000L
    }
    t("geohashEncode p6  ") {
      Tiling.geohashEncode(pts.toDF(), "lat", "lon", 6)
        .agg(sum(length(col("geohash")))).collect(); 100000000L
    }
    t("zxySmooth z10     ") {
      Tiling.zxyNeighborhoodCounts(pts.toDF(), "lat", "lon", 10).count()
    }
    t("hexBin 0.25deg    ") {
      Tiling.hexBin(pts.toDF(), "lat", "lon", 0.25)
        .agg(sum(col("hex_q") + col("hex_r"))).collect(); 100000000L
    }
    t("hexRing 0.25deg   ") {
      Tiling.hexRingCounts(pts.toDF(), "lat", "lon", 0.25).count()
    }
    t("stCube gh3/hour   ") {
      Tiling.geohashTimeCube(trk.toDF(), "lat", "lon", 3, "ts", "id").count()
    }
    // wave-6 curation ops at the same scale: the split is a pure row-local
    // column (zero exchanges), the sample is one per-cell window pass
    import graft.operators.Curation
    t("spatialSplit gh4  ") {
      Curation.spatialBlockSplit(pts.toDF(), "lat", "lon", 4, 0.2)
        .agg(sum(when(col("split") === "val", 1L).otherwise(0L))).collect(); 100000000L
    }
    t("cellSample gh2 1/8") {
      val cells = Tiling.geohashEncode(pts.toDF(), "lat", "lon", 2, out = "cell")
      Curation.proportionalGroupSample(cells, Seq("cell"), "id", 1, 8).count()
    }
    // wave-8 additions at the same scale: Moran's I is one point shuffle +
    // bounded-grid arithmetic; headings is one entity shuffle + two windows
    t("moransI z10       ") {
      graft.operators.Tiling.moransI(pts.toDF(), "lat", "lon", 10).count(); 100000000L
    }
    t("headings 1M ents  ") {
      Trajectories.headings(trk.toDF(), "user_id", "ts", "id", "lat", "lon")
        .agg(sum("bearing_deg"), sum("turn_deg")).collect(); 100000000L
    }
    // wave 16-22 additions at the same scale: snap is the polyline join +
    // a rank-1 window; the behavior ops are one key-shuffle each; the
    // curation ops are pure scan-stage maps/filters
    import graft.operators.Sequences
    def evs = trk.withColumn("event_type",
      element_at(array(lit("view"), lit("click"), lit("purchase"),
        lit("signup"), lit("error")), (pmod(col("id") * 7919L, lit(5)) + 1).cast("int")))
    t("snapToPolylines 25") {
      SpatialJoin.snapToPolylines(pts.toDF(), "id", "lat", "lon",
        lineDf, "line_id", "lats", "lons", SparkEntry.PolylineJoinRadiusM).count()
    }
    t("transitions 1M ent") {
      Sequences.transitionCounts(evs.toDF(), "user_id", "ts", "event_type", "id").count()
      100000000L
    }
    t("funnel fold 1M ent") {
      Sequences.funnelDepths(evs.toDF(), "user_id", "ts", "event_type", "id",
        Seq("view", "click", "purchase")).count(); 100000000L
    }
    t("retention 1M ents ") {
      Sequences.cohortRetention(evs.toDF(), "user_id", "ts").count(); 100000000L
    }
    t("importanceSample  ") {
      Curation.importanceSample(
        pts.withColumn("w", pmod(col("id"), lit(400L)) + 1L).toDF(), "id", "w", 400L)
        .count(); 100000000L
    }
    // wave 37/38/35 additions at the same scale. globalRank carries its own
    // exactness assert: sum(rank) over 100M rows must be exactly n(n+1)/2
    // whatever the range sampler did — a bit-level correctness check AT the
    // benchmark scale, not just at spec scale.
    import graft.operators.{SortedNeighborhood, Graphs, Sketches}
    t("globalRank 100M   ") {
      val keyed = spark.range(0L, 100000000L, 1, 64)
        .withColumn("key", pmod(col("id") * 2654435761L, lit(1000003L)))
      val s = SortedNeighborhood.globalRank(keyed.toDF(), col("key"), col("id"))
        .agg(sum("rank")).head().getLong(0)
      require(s == 5000000050000000L, s"rank sum broken: $s")
      100000000L
    }
    t("triangles 20M edge") {
      // ladder graph: edges (i,i+1) and (i,i+2) -> every interior node in
      // 1-3 triangles; counts verified closed-form at spec scale
      val n = 10000000L
      val ids = spark.range(0L, n, 1, 64)
      val e1 = ids.select(col("id").as("id_a"), (col("id") + 1).as("id_b")).where(col("id_b") < n)
      val e2 = ids.select(col("id").as("id_a"), (col("id") + 2).as("id_b")).where(col("id_b") < n)
      Graphs.triangleCounts(e1.unionAll(e2).toDF()).count()
    }
    t("hllRegisters 100M ") {
      Sketches.hllStats(
        pts.withColumn("g", pmod(col("id"), lit(32L))).toDF(), Seq("g"), "id")
        .count(); 100000000L
    }
    // wave 45/47/48/53 additions at the same scale. skyline carries its own
    // soundness assert at benchmark scale: every returned row must beat the
    // strict-prefix bucket max, so a broken prune would trip the require.
    import graft.operators.{Skyline, SpatialPartition, ZOrder}
    t("skyline 100M      ") {
      val xy = spark.range(0L, 100000000L, 1, 64)
        .withColumn("x", pmod(col("id") * 7919L, lit(1000003L)).cast("double"))
        .withColumn("y", pmod(col("id") * 104729L, lit(999983L)).cast("double"))
      val sk = Skyline.skyline2d(xy.toDF(), "id", "x", "y", bucketWidth = 1000.0)
      val n = sk.count()
      require(n >= 1 && n < 100000L, s"degenerate skyline: $n")
      100000000L
    }
    t("strAssign 100M    ") {
      val a = SpatialPartition.strAssign(pts.toDF(), "id", "lon", "lat", 16, 16)
        .groupBy("tx", "ty").count().agg(min("count"), max("count"), count(lit(1))).head()
      require(a.getLong(2) == 256 && a.getLong(1) - a.getLong(0) <= 2,
        s"balance broken: ${a.getLong(0)}..${a.getLong(1)} over ${a.getLong(2)} tiles")
      100000000L
    }
    t("pageRank 10Mn 3rnd") {
      // ladder graph (i,i+1)+(i,i+2): 10M nodes / 20M edges, 3 integer
      // rounds — the per-round join+agg shape at graph scale
      val n = 10000000L
      val ids = spark.range(0L, n, 1, 64)
      val e1 = ids.select(col("id").as("id_a"), (col("id") + 1).as("id_b")).where(col("id_b") < n)
      val e2 = ids.select(col("id").as("id_a"), (col("id") + 2).as("id_b")).where(col("id_b") < n)
      Graphs.pageRankScaled(e1.unionAll(e2).toDF(), rounds = 3,
        scale = 100000000L, maxNodes = 20000000L).count()
    }
    // wave 59-72 additions at the same scale: cusum/acf are one entity
    // exchange shared by their window frames and aggregate; lpa/kCore run
    // the per-round join+agg shape on a 20M-edge circular ladder (every
    // node degree 4, so the k=3 peel STABILIZES in one round — the entry
    // times the per-round cost, not a degenerate full cascade); the
    // streaming fold drives flatMapGroupsWithState's typed path at 10M
    import graft.operators.TimeSeries
    t("cusum 1M ents     ") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("id").asc)
      val gaps = trk
        .withColumn("__t", unix_micros(col("ts")))
        .withColumn("gap", col("__t") - lag(col("__t"), 1).over(w))
        .where(col("gap").isNotNull)
      Sequences.cusumAlarms(gaps.toDF(), "user_id", "ts", "id", "gap",
        k = 1000000L, h = 5000000L).count(); 100000000L
    }
    t("lagAutocorr 1M ent") {
      val vals = trk.withColumn("value",
        pmod(col("id") * 7919L, lit(40001L)).cast("double") / lit(100.0))
      TimeSeries.lagAutocorr(vals.toDF(), "user_id", "ts", "id", "value")
        .count(); 100000000L
    }
    t("lpa 10Mn 3 rounds ") {
      val n = 10000000L
      val ids = spark.range(0L, n, 1, 64)
      val e1 = ids.select(col("id").as("id_a"), pmod(col("id") + 1, lit(n)).as("id_b"))
      val e2 = ids.select(col("id").as("id_a"), pmod(col("id") + 2, lit(n)).as("id_b"))
      Graphs.labelPropagation(e1.unionAll(e2).toDF(), rounds = 3).count()
    }
    t("kCore k3 20M edges") {
      val n = 10000000L
      val ids = spark.range(0L, n, 1, 64)
      val e1 = ids.select(col("id").as("id_a"), pmod(col("id") + 1, lit(n)).as("id_b"))
      val e2 = ids.select(col("id").as("id_a"), pmod(col("id") + 2, lit(n)).as("id_b"))
      val c = Graphs.kCore(e1.unionAll(e2).toDF(), k = 3).count()
      require(c == n, s"circular ladder 3-core must keep all nodes: $c")
      c
    }
    t("acfStream 10M fold") {
      val vals = spark.range(0L, 10000000L, 1, 64)
        .withColumn("user_id", col("id") % 100000L)
        .withColumn("ts", timestamp_seconds(lit(1700000000L) +
          (col("id") / lit(100000L)).cast("long")))
        .withColumn("value",
          pmod(col("id") * 7919L, lit(40001L)).cast("double") / lit(100.0))
      graft.streaming.EventStreams.acfStream(vals.toDF(), "user_id", "ts", "id", "value")
        .toDF().count(); 10000000L
    }
    // wave 73-82 additions at the same scale. Isolation runs at 1 km so
    // the candidate-pair volume stays genuine-neighborhood-bounded on a
    // uniform 100M-point globe (~0.6 neighbors/point); nearestJoin probes
    // 10k facilities (broadcast side) from the full 100M; gini ranks the
    // ~1M-group zoom-10 tile distribution end to end; ols/hhi/diameter
    // are the one-exchange per-entity shapes at 1M entities
    // isolation is a monochromatic self-join — BOTH sides are the table,
    // so the 9× exploded exchange is unavoidable and the honest scale
    // knob is partition sizing: 20M points / 180M exploded rows at 128
    // shuffle partitions (a first attempt at 100M×3 reps with 32
    // partitions was a ~28M-rows-per-task sort — a guaranteed heap
    // cliff; partitions-per-volume is the 100-TB lesson here).
    // nearestJoin is the contrast: exploding the SMALL side makes it a
    // broadcast join and the 100M points never shuffle at all.
    def withPartitions(n: Int)(body: => Unit): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val pts20 = spark.range(100000000L, 120000000L, 1, 64)
      .withColumn("lat", ((col("id") * 9973 + 12345) % 18000).cast("double") / lit(100.0) - lit(90.0))
      .withColumn("lon", ((col("id") * 31337 + 54321) % 36000).cast("double") / lit(100.0) - lit(180.0))
    withPartitions(128) {
      t("isolated 20M 500m ") {
        SpatialJoin.isolatedPoints(pts20.toDF(), "lat", "lon", "id", radiusM = 500.0)
          .count(); 20000000L
      }
    }
    t("nearestJoin 100Mx10k") {
      val fac = spark.range(0L, 10000L, 1, 8)
        .withColumn("lat", ((col("id") * 6007 + 991) % 18000).cast("double") / lit(100.0) - lit(90.0))
        .withColumn("lon", ((col("id") * 21001 + 77) % 36000).cast("double") / lit(100.0) - lit(180.0))
      SpatialJoin.nearestJoin(pts.toDF(), "id", "lat", "lon",
        fac.toDF(), "id", "lat", "lon", radiusM = 100000.0,
        explodeRight = true).count(); 100000000L
    }
    t("gini z10 100M     ") {
      val tiles = Tiling.zxyAssign(pts.toDF(), "lat", "lon", 10)
        .groupBy("zx", "zy").agg(count(lit(1)).as("x"))
        .withColumn("t", col("zx") * 1024L + col("zy"))
      // the hash grid clamps high-latitude rows under mercator: ~35k
      // non-empty zoom-10 tiles carry the full 100M-point distribution
      val r = graft.operators.Profiling.giniIndex(tiles, "x", "t").head()
      require(r.getLong(0) > 10000L, s"degenerate tile count: ${r.getLong(0)}")
      100000000L
    }
    t("hhi 1M ents       ") {
      val cells = Tiling.zxyAssign(trk.toDF(), "lat", "lon", 6)
        .withColumn("cell", col("zx") * 64L + col("zy"))
      Trajectories.visitConcentration(cells, "user_id", "cell").count(); 100000000L
    }
    t("ols 1M ents       ") {
      val vals = trk.withColumn("value",
        pmod(col("id") * 7919L, lit(40001L)).cast("double") / lit(100.0))
      TimeSeries.linearTrend(vals.toDF(), "user_id", "ts", "value",
        originMicros = 1700000000000000L, stepMicros = 1000000L).count(); 100000000L
    }
    t("diameter 1M ents  ") {
      val grid = trk
        .withColumn("x", (col("id") * 9973 + 12345) % 18000)
        .withColumn("y", (col("id") * 31337 + 54321) % 36000)
      Trajectories.spatialDiameter(grid.toDF(), "user_id", "x", "y")
        .count(); 100000000L
    }
    t("hits 10M edges 2rnd") {
      val e = spark.range(0L, 10000000L, 1, 64)
        .select((col("id") % 1000000L).as("src"),
          (pmod(col("id") * 7919L, lit(64L)) + 2000000L).as("dst"))
        .distinct()
      Graphs.hitsScaled(e.toDF(), rounds = 2).count()
    }
    // wave 83-90 additions. mannKendall/holt drive the typed per-entity
    // folds (Fenwick inversion count; sorted-list two-state fold) at 1M
    // entities; mapMatch runs the per-edge raster join + per-track DP at
    // 10M fixes / 100k tracks on the 25-line network; dtw pairs 100k
    // 8-fix signatures along a blocked chain (the all-pairs default is
    // an oracle-scale baseline, not a fleet shape); tileAnomaly and
    // tvDrift are one-count-pass + bounded-state summaries
    t("mannKendall 1M ent") {
      val vals = trk.withColumn("value",
        pmod(col("id") * 7919L, lit(40001L)).cast("double") / lit(100.0))
      TimeSeries.mannKendall(vals.toDF(), "user_id", "ts", "id", "value")
        .count(); 100000000L
    }
    t("holt 1M ents      ") {
      val vals = trk.withColumn("value",
        pmod(col("id") * 7919L, lit(40001L)).cast("double") / lit(100.0))
      Sequences.holt(vals.toDF(), "user_id", "ts", "id", "value",
        alpha = 0.25, beta = 0.125).count(); 100000000L
    }
    t("tvDrift 1k buckets") {
      graft.operators.Validation.tvDrift(trk.toDF(),
        pmod(col("id") * 2654435761L, lit(1000L)), col("id") % 2 === 0)
        .count(); 100000000L
    }
    t("tileAnomaly z8    ") {
      val spread = pts.withColumn("ts",
        timestamp_seconds(lit(1700000000L) + pmod(col("id"), lit(2592000L))))
      Tiling.tileSeasonalAnomalies(spread.toDF(), "lat", "lon", "ts", z = 8)
        .count(); 100000000L
    }
    import graft.operators.MapMatch
    val vertsDf = SparkEntry.FixturePolylines.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case ((la, lo), i) => (k * 3 + i, la, lo) }
    }.toDF("__vi", "__vlat", "__vlon")
    def fixes10M = spark.range(0L, 10000000L, 1, 64)
      .withColumn("track", col("id") % 100000L)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) +
        (col("id") / lit(100000L)).cast("long")))
      .withColumn("__vi", col("id") % 75)
      .join(broadcast(vertsDf), "__vi")
      .withColumn("lat", col("__vlat") +
        ((col("id") * 131 + 17) % 301 - 150).cast("double") / 1000.0)
      .withColumn("lon", col("__vlon") +
        ((col("id") * 577 + 29) % 301 - 150).cast("double") / 1000.0)
      .drop("__vi", "__vlat", "__vlon")
    t("mapMatch 10M fixes") {
      MapMatch.viterbi(fixes10M.toDF(), "track", "ts", "id", "lat", "lon",
        lineDf, "line_id", "lats", "lons", SparkEntry.PolylineJoinRadiusM)
        .count(); 10000000L
    }
    t("dtw 100k trk chain") {
      val chain = spark.range(0L, 99999L, 1, 8)
        .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
      Trajectories.dtwJoin(fixes10M.toDF(), "track", "ts", "id", "lat", "lon",
        maxPoints = 8, quantMeters = 10.0, pairs = Some(chain.toDF()))
        .count(); 10000000L
    }
    t("clustCoef 20M edge") {
      val n = 10000000L
      val ids = spark.range(0L, n, 1, 64)
      val e1 = ids.select(col("id").as("id_a"), (col("id") + 1).as("id_b")).where(col("id_b") < n)
      val e2 = ids.select(col("id").as("id_a"), (col("id") + 2).as("id_b")).where(col("id_b") < n)
      Graphs.clusteringCoefficient(e1.unionAll(e2).toDF()).count()
    }
    // wave 91-96 additions: auc/calibration drive the two-pass global
    // rank at 100M scored rows; modularity/assortativity run the
    // label/degree join+agg shapes on the 20M-edge ladder (modularity
    // takes an arbitrary 1k-way hash partition — it measures the metric,
    // not the community detector); mkStream drives the map-state typed
    // fold at 10M rows
    import graft.operators.Evaluation
    t("auc 100M scored   ") {
      val scored = spark.range(0L, 100000000L, 1, 64)
        .withColumn("score", pmod(col("id") * 7919L, lit(100000L)))
        .withColumn("label", pmod(col("id") * 104729L, lit(7L)) === 0L)
      Evaluation.aucStats(scored.toDF(), col("score"), col("label"))
        .count(); 100000000L
    }
    t("calibration 100M  ") {
      val scored = spark.range(0L, 100000000L, 1, 64)
        .withColumn("score", pmod(col("id") * 7919L, lit(100000L)))
        .withColumn("label", pmod(col("id") * 104729L, lit(7L)) === 0L)
      Evaluation.calibrationBins(scored.toDF(), col("score"), col("label"),
        col("id")).count(); 100000000L
    }
    t("modularity 20M edg") {
      val n = 10000000L
      val ids = spark.range(0L, n, 1, 64)
      val e1 = ids.select(col("id").as("id_a"), (col("id") + 1).as("id_b")).where(col("id_b") < n)
      val e2 = ids.select(col("id").as("id_a"), (col("id") + 2).as("id_b")).where(col("id_b") < n)
      val labels = ids.select(col("id"), pmod(col("id"), lit(1000L)).as("label"))
      Graphs.modularity(e1.unionAll(e2).toDF(), labels.toDF()).count(); 20000000L
    }
    t("assortativity 20M ") {
      val n = 10000000L
      val ids = spark.range(0L, n, 1, 64)
      val e1 = ids.select(col("id").as("id_a"), (col("id") + 1).as("id_b")).where(col("id_b") < n)
      val e2 = ids.select(col("id").as("id_a"), (col("id") + 2).as("id_b")).where(col("id_b") < n)
      Graphs.degreeAssortativity(e1.unionAll(e2).toDF()).count(); 20000000L
    }
    t("anchors 1M ents   ") {
      Trajectories.anchorPoints(trk.toDF(), "user_id", "lat", "lon")
        .count(); 100000000L
    }
    t("awayRate 1M ents  ") {
      Trajectories.awayRate(trk.toDF(), "user_id", "lat", "lon",
        radiusM = 8000000.0).count(); 100000000L
    }
    t("ksTest 100M       ") {
      val scored = spark.range(0L, 100000000L, 1, 64)
        .withColumn("v", pmod(col("id") * 7919L, lit(100000L)))
        .withColumn("p", pmod(col("id") * 104729L, lit(2L)) === 0L)
      Evaluation.ksTest(scored.toDF(), col("v"), col("p")).count(); 100000000L
    }
    t("mkStream 10M fold ") {
      val vals = spark.range(0L, 10000000L, 1, 64)
        .withColumn("user_id", col("id") % 100000L)
        .withColumn("ts", timestamp_seconds(lit(1700000000L) +
          (col("id") / lit(100000L)).cast("long")))
        .withColumn("value",
          pmod(col("id") * 7919L, lit(4001L)).cast("double") / lit(100.0))
      graft.streaming.EventStreams.mannKendallStream(vals.toDF(), "user_id", "ts",
        "id", "value").toDF().count(); 10000000L
    }
    // z-order: layout written ONCE (100M rows — at 20M both reads are
    // footer/listing-overhead-bound and the comparison is meaningless),
    // then the pruned box read is timed against the same predicate over a
    // plain unclustered copy
    val zdir = s"${System.getProperty("java.io.tmpdir")}/graft_execbench_zorder"
    val pdir = s"${System.getProperty("java.io.tmpdir")}/graft_execbench_plain"
    val (zx, zy) = (ZOrder.Dim("x", 0.0, 1000003.0), ZOrder.Dim("y", 0.0, 999983.0))
    if (filters.isEmpty || filters.exists(f => "zorder".contains(f))) {
      val xy = spark.range(0L, 100000000L, 1, 64)
        .withColumn("x", pmod(col("id") * 7919L, lit(1000003L)).cast("double"))
        .withColumn("y", pmod(col("id") * 104729L, lit(999983L)).cast("double"))
      ZOrder.zorderWrite(xy.toDF(), zx, zy, bits = 12, coarseBits = 6, zdir)
      xy.write.mode("overwrite").parquet(pdir)
    }
    t("zorder pruned read") {
      val c = ZOrder.readForBox(spark, zdir, zx, zy, 12, 6, 0.0, 100000.0, 0.0, 100000.0)
        .where(col("x") <= 100000.0 && col("y") <= 100000.0).count()
      require(c > 0, "empty box"); 100000000L
    }
    t("plain filter read ") {
      spark.read.parquet(pdir)
        .where(col("x") <= 100000.0 && col("y") <= 100000.0).count(); 100000000L
    }
    // sequence-family hot-key hardening at scale (round-4): 100M events
    // on ONE key. The plain operators sort/fold the whole key in one
    // task; the bucketed two-pass spreads it over (key, bucket) units —
    // same answers (SequenceSkewSpec pins equality), here the
    // wall-clock demonstration at the size where one-task shapes die
    import graft.operators.Sequences
    def hotSeq = spark.range(0L, 100000000L, 1, 128)
      .withColumn("user_id", lit(1L))
      .withColumn("ts", col("id"))
      .withColumn("event_id", col("id"))
      .withColumn("event_type",
        element_at(array(lit("view"), lit("click"), lit("cart"), lit("buy")),
          (pmod(col("id") * 2654435761L, lit(97L)) % 4 + 1).cast("int")))
    // bucket width is task-sizing: the fold variants (funnel/ewma)
    // collect a bucket's rows into one list, so ~100k rows/bucket keeps
    // every aggregation buffer in the tens of MB (1M-row buckets OOM'd
    // the partial collect at this scale); the window variants (paths/
    // transitions) only sort per bucket and tolerate much larger ones
    val dailyBkt: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => floor(c.cast("long") / lit(100000L)).cast("long") // 1000 buckets of 100k
    t("topPathsBkt 100M    ") {
      Sequences.topPathsBucketed(hotSeq.toDF(), "user_id", "ts", "event_type",
        "event_id", len = 3, topK = 20, dailyBkt).count(); 100000000L
    }
    t("topPaths plain 1key") {
      Sequences.topPaths(hotSeq.toDF(), "user_id", "ts", "event_type",
        "event_id", len = 3, topK = 20).count(); 100000000L
    }
    tn("funnelBkt 20M 1key ", 20000000L) {
      Sequences.funnelDepthsBucketed(hotSeq.where(col("id") < 20000000L).toDF(),
        "user_id", "ts", "event_type",
        "event_id", Seq("view", "click", "buy"), dailyBkt).count()
    }
    spark.stop()
  }
}
