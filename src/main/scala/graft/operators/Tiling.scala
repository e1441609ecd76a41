package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
