package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.s2functions._

/** Raster-tile assignment: every row gets its S2 cell at a target level —
  * the distributed form of the reference's `CellIDForCoordinates`
  * (`Extensions/OpenSkyS2.cs:43-48`). One codegen'd expression inside the
  * scan stage; zero exchanges. */
object Tiling {

  /** Adds `tile` (LongType cell id) and `tile_token` columns. */
  def tileAssign(df: DataFrame, latCol: String, lonCol: String, level: Int): DataFrame =
    df.withColumn("tile", s2_tile(col(latCol), col(lonCol), level))
      .withColumn("tile_token", s2_token(col("tile")))

  /** Per-tile statistics: a single hash aggregation with map-side partials.
    * At cluster scale the input table is written clustered by a coarse
    * `s2_parent(tile, K)` so this groupBy shuffles pre-combined partials. */
  def tileStats(df: DataFrame, latCol: String, lonCol: String, level: Int,
                aggs: Seq[Column] = Seq(count(lit(1)).as("n"))): DataFrame =
    tileAssign(df, latCol, lonCol, level)
      .groupBy("tile_token")
      .agg(aggs.head, aggs.tail: _*)

  /** Multi-level tile pyramid: per-tile counts at every level in
    * [minLevel, maxLevel] in ONE pass — each row explodes into its
    * ancestor chain (maxLevel - minLevel + 1 rows, a map-side constant)
    * and a single hash aggregation with partial combine produces every
    * zoom level at once, instead of (levels) separate scans. This is the
    * map-tile rollup a rendering pipeline precomputes: level L's
    * histogram is exactly level L+1's rolled up by `s2_parent`, which
    * TilingPyramidSpec pins. */
  def tilePyramid(df: DataFrame, latCol: String, lonCol: String,
                  minLevel: Int, maxLevel: Int): DataFrame = {
    require(0 <= minLevel && minLevel <= maxLevel && maxLevel <= 30)
    df.withColumn("__leaf", s2_cell_id(col(latCol), col(lonCol)))
      .select(explode(array((minLevel to maxLevel).map(l =>
        struct(lit(l).as("level"),
          s2_token(s2_parent(col("__leaf"), l)).as("tile_token"))): _*)).as("__lt"))
      .groupBy(col("__lt.level").as("level"), col("__lt.tile_token").as("tile_token"))
      .agg(count(lit(1)).as("n"))
  }

  /** Write the table spatially clustered: hive-partitioned by the coarse
    * tile token at `coarseLevel` and sorted within files by the unsigned
    * leaf cell id (SURVEY.md sections 2.9/4.2). Spatial predicates then
    * prune whole partition directories (coarse tile equality from
    * `s2_parent`) and parquet row groups (leaf-cell min/max stats on the
    * sorted `__leaf_ord` column). */
  def clusteredWrite(df: DataFrame, latCol: String, lonCol: String,
                     outDir: String, coarseLevel: Int = 5): Unit = {
    df.withColumn("__leaf", s2_cell_id(col(latCol), col(lonCol)))
      .withColumn("coarse_tile", s2_token(s2_parent(col("__leaf"), coarseLevel)))
      .withColumn("__leaf_ord", s2_ord(col("__leaf")))
      .repartition(col("coarse_tile"))
      .sortWithinPartitions("coarse_tile", "__leaf_ord")
      .drop("__leaf")
      .write.mode("overwrite")
      .partitionBy("coarse_tile")
      .parquet(outDir)
  }

  /** Read a clustered table restricted to the cells of a covering: the
    * coarse-tile IN-list prunes partition directories before any file is
    * opened; the `__leaf_ord` range conjuncts reach parquet row-group
    * stats. */
  def readClusteredForCells(spark: SparkSession, dir: String,
                            cells: Seq[Long], coarseLevel: Int = 5): DataFrame = {
    import graft.s2.S2CellId
    val coarse = cells
      .flatMap { c =>
        // every coarse tile overlapping the cell
        if (S2CellId.level(c) >= coarseLevel) Seq(S2CellId.parentForLevel(c, coarseLevel))
        else {
          var id = S2CellId.childBeginForLevel(c, coarseLevel)
          val end = S2CellId.childEndForLevel(c, coarseLevel)
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (id != end) { out += id; id = S2CellId.next(id) }
          out
        }
      }
      .distinct.map(S2CellId.toToken)
    val rangePred = cells.map { c =>
      col("__leaf_ord").between(
        S2CellId.rangeMin(c) ^ Long.MinValue, S2CellId.rangeMax(c) ^ Long.MinValue)
    }.reduce(_ || _)
    spark.read.parquet(dir)
      .where(col("coarse_tile").isin(coarse: _*))
      .where(rangePred)
  }
}
