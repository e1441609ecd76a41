package graft.operators

import org.apache.spark.sql.DataFrame

import graft.s2._

/** Raster -> vector: turn a set of S2 cells (tiles) back into the polygon
  * outlining their union — the inverse of tile assignment, completing the
  * north rule's "raster<->vector" pair.
  *
  * Mechanics: every cell contributes its 4-vertex CCW boundary loop to a
  * DirectedXor polygon builder; edges shared by two adjacent cells appear in
  * opposite directions and cancel, leaving exactly the outline
  * (`S2PolygonBuilder.cs:74-142` XOR semantics). */
object Vectorize {

  /** Vector -> raster at TABLE granularity: rasterize a whole DataFrame of
    * lat/lng rects — one row per region, `(regionIdCol, latLo, latHi,
    * lonLo, lonHi)` in degrees — into `(region_id, cell)` rows at a fixed
    * level. The covering flood fill runs EXECUTOR-side per row (the
    * `s2_rect_covering` expression's non-foldable path), so a 10^6-region
    * catalog rasterizes as an ordinary distributed projection + explode:
    * no driver loop, no collect. This is the other direction of the
    * raster<->vector pair from [[cellsToPolygon]], and the layout step of
    * a many-region spatial join: rasterized regions equi-join points on
    * the level-L tile (disjoint same-level cells -> at most one candidate
    * cell per (point, region), no pair dedup needed), then the exact rect
    * predicate refines. */
  def rasterizeRects(rects: DataFrame,
                     latLoCol: String, latHiCol: String,
                     lonLoCol: String, lonHiCol: String, level: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.s2functions._
    require(!rects.columns.contains("cell"), "rasterizeRects: input already has a 'cell' column")
    rects.select(col("*"),
      explode(s2_rect_covering(
        col(latLoCol), col(latHiCol), col(lonLoCol), col(lonHiCol), level)).as("cell"))
  }

  /** Vector -> raster for a TABLE of single-loop POLYGONS — one row per
    * region with parallel vertex-array columns `(latsCol, lonsCol)` in
    * degrees, enclosed region on the left (CCW) — into
    * `(input cols..., cell, interior)` rows at a fixed level. Like
    * [[rasterizeRects]] the covering flood fill runs EXECUTOR-side per row
    * (the `s2_polygon_covering` expression), so a 10^6-polygon catalog
    * rasterizes with no driver loop; `interior = true` cells are fully
    * inside the loop, letting a downstream PIP join skip exact refinement
    * for points landing there. */
  def rasterizePolygons(polys: DataFrame, latsCol: String, lonsCol: String,
                        level: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.s2functions._
    require(!polys.columns.contains("cell") && !polys.columns.contains("interior"),
      "rasterizePolygons: input already has a 'cell' or 'interior' column")
    polys.select(col("*"),
        explode(s2_polygon_covering(col(latsCol), col(lonsCol), level)).as("__rc"))
      .withColumn("cell", col("__rc.cell"))
      .withColumn("interior", col("__rc.interior"))
      .drop("__rc")
  }

  /** Outline polygon of a cell set (driver-side; tile sets per region are
    * small — for huge unions, pre-merge with [[graft.s2.S2CellUnion]]
    * normalization first). */
  def cellsToPolygon(cells: Iterable[Long]): S2Polygon = {
    val builder = new S2PolygonBuilder(S2PolygonBuilderOptions.DirectedXor)
    val union = S2CellUnion.normalized(cells)
    if (union.size == 0) return new S2Polygon(Nil)
    // cells must all sit at ONE level: a coarse cell adjacent to two finer
    // cells shares only part of its edge, which directed-XOR cannot cancel
    // (different vertex pairs). Denormalizing to the finest level present
    // makes every shared edge an exact vertex-pair match.
    val maxLevel = union.cellIds.map(S2CellId.level).max
    for (id <- union.denormalize(maxLevel, 1))
      builder.addLoop(S2Loop.fromCell(S2Cell(id)))
    builder.assemblePolygon()._1
  }

  /** [[vectorizeGroups]] with the polygon assembly on the EXECUTORS: each
    * group's (small — it's a covering) tile set is gathered by a
    * `groupByKey.mapGroups` and assembled into its outline polygon inside
    * the task, so a million-group raster->vector pass never routes
    * geometry through the driver (the Map-returning variant stays for
    * driver-side callers that want [[graft.s2.S2Polygon]] objects).
    * Oversized groups fail their task loudly instead of silently OOM-ing.
    *
    * @return one row per group: (groupCol, loop_lats, loop_lons) with the
    *         outline's loops as nested vertex arrays (degrees) — the same
    *         encoding [[SpatialJoin.multiPolygonPipJoin]] consumes, so a
    *         vectorized layer can be joined right back. */
  def vectorizeGroupsDistributed(df: DataFrame, groupCol: String, tileCol: String,
                                 maxTilesPerGroup: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(groupCol).cast("string"),
        org.apache.spark.sql.functions.col(tileCol).cast("long")).distinct()
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val tiles = it.map(_._2).toArray
        require(tiles.length <= maxTilesPerGroup,
          s"vectorizeGroupsDistributed: group '$g' has ${tiles.length} tiles " +
            s"(> $maxTilesPerGroup) — coarsen the tiling or raise the cap explicitly")
        val poly = cellsToPolygon(tiles)
        val lats = Array.tabulate(poly.numLoops) { i =>
          val lp = poly.loop(i)
          Array.tabulate(lp.numVertices)(j => S2LatLng.fromPoint(lp.vertex(j)).latDegrees)
        }
        val lons = Array.tabulate(poly.numLoops) { i =>
          val lp = poly.loop(i)
          Array.tabulate(lp.numVertices)(j => S2LatLng.fromPoint(lp.vertex(j)).lngDegrees)
        }
        (g, lats, lons)
      }
      .toDF(groupCol, "loop_lats", "loop_lons")
  }

  /** Vectorize each group's tiles: collects (group, tile) pairs — tile sets
    * per group are coverings, i.e. tiny — and assembles one polygon per
    * group on the driver.
    *
    * Driver-assembly is by design (polygon building is inherently global
    * per group), so the collect is guarded: group sizes are counted
    * executor-side first and any group above `maxTilesPerGroup` fails
    * loudly BEFORE anything is collected, instead of silently OOM-ing the
    * driver on a runaway tile set. */
  def vectorizeGroups(df: DataFrame, groupCol: String, tileCol: String,
                      maxTilesPerGroup: Int = 100000): Map[String, S2Polygon] = {
    import org.apache.spark.sql.functions._
    // persisted: the guard aggregation and the collect share one scan
    val distinctTiles = df.select(groupCol, tileCol).distinct().persist()
    try {
      val oversized = distinctTiles.groupBy(col(groupCol))
        .agg(count(lit(1)).as("__n"))
        .where(col("__n") > maxTilesPerGroup)
        .limit(5)
        .collect()
      require(oversized.isEmpty,
        s"vectorizeGroups: groups exceed maxTilesPerGroup=$maxTilesPerGroup: " +
          oversized.map(r => s"${r.get(0)}=${r.getLong(1)}").mkString(", ") +
          " — coarsen the tiling (lower level) or raise the cap explicitly")
      distinctTiles.collect()
        .groupBy(_.get(0).toString)
        .map { case (g, rows) => g -> cellsToPolygon(rows.map(_.getLong(1))) }
    } finally distinctTiles.unpersist()
  }
}
