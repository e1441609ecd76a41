package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.s2.S2Region

/** Geofencing: enter/exit transition detection for entity tracks against a
  * set of query regions — the canonical flight-tracking workload on the
  * reference's domain (aircraft crossing airspace boundaries).
  *
  * Distributed shape: region membership evaluates per row against the
  * BROADCAST region list (the same exact kernel refinement as the covering
  * PIP join, one closure call per row — no join, no shuffle for the
  * flags); transition detection is one shuffle by entity + one window
  * pass comparing each row's membership vector to its predecessor's. The
  * first observation of an entity inside a region emits `enter` (prior
  * state unknown == outside, the standard geofence convention). */
object Geofence {

  /** Working/output column names the implementation owns; input columns
    * may not collide (same guard discipline as [[AsOfJoin]]). */
  private val Reserved =
    Seq("__flags", "__prev", "__pos", "__in", "__was", "region_id", "transition")

  /** @return (idCol, orderCol, region_id, transition) with transition in
    *         {"enter", "exit"}, one row per membership change, ordered
    *         per entity by (tsCol, orderCol) */
  def transitions(points: DataFrame, idCol: String, tsCol: String, orderCol: String,
                  latCol: String, lonCol: String,
                  regions: Seq[(String, S2Region)]): DataFrame = {
    require(regions.nonEmpty)
    val clash = points.columns.filter(Reserved.contains)
    require(clash.isEmpty,
      s"transitions reserves column names ${Reserved.mkString(", ")}; rename input columns: " +
        clash.mkString(", "))
    val regs = regions // serializable: captured in the UDF closure (broadcast by Spark)
    val flagsUdf = udf { (lat: Double, lon: Double) =>
      regs.map { case (_, r) => SpatialJoin.regionContains(r, lat, lon) }
    }
    val names = array(regions.map { case (rid, _) => lit(rid) }: _*)
    val w = Window.partitionBy(idCol).orderBy(col(tsCol), col(orderCol))
    points
      .withColumn("__flags", flagsUdf(col(latCol), col(lonCol)))
      .withColumn("__prev", lag(col("__flags"), 1).over(w))
      .select(col(idCol), col(orderCol),
        posexplode(col("__flags")).as(Seq("__pos", "__in")),
        col("__prev"))
      .withColumn("__was",
        coalesce(element_at(col("__prev"), col("__pos") + 1), lit(false)))
      .where(col("__in") =!= col("__was"))
      .select(col(idCol), col(orderCol),
        element_at(names, col("__pos") + 1).as("region_id"),
        when(col("__in"), lit("enter")).otherwise(lit("exit")).as("transition"))
  }
}
