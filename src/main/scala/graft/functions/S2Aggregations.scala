package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.s2.{S2Cell, S2CellId, S2LatLng, S2Point}

/** Custom typed aggregations over cell-id columns (SURVEY.md section 2.9:
  * the engine-side form of the reference's sequential area/centroid sums,
  * `S2Polygon.cs:447-469`, `S2CellUnion.cs:39-111`). */
object S2Aggregations {

  /** Mutable-free buffer: accumulated steradians + area-weighted centroid
    * vector (the true centroid premultiplied by area sums linearly,
    * `S2.cs:396-424`). */
  final case class AreaCentroidBuffer(area: Double, x: Double, y: Double, z: Double)

  final case class AreaCentroid(areaSteradians: Double, latDeg: Double, lonDeg: Double)

  /** Aggregates cell ids into total approximate area + area-weighted
    * centroid. Partial buffers merge associatively, so Spark runs it with
    * map-side partial aggregation like any built-in agg. */
  val cellAreaCentroid: Aggregator[Long, AreaCentroidBuffer, AreaCentroid] =
    new Aggregator[Long, AreaCentroidBuffer, AreaCentroid] {
      def zero: AreaCentroidBuffer = AreaCentroidBuffer(0, 0, 0, 0)

      def reduce(b: AreaCentroidBuffer, cellId: Long): AreaCentroidBuffer = {
        val cell = S2Cell(cellId)
        val area = cell.approxArea
        val c = S2Point.normalize(S2CellId.toPoint(cellId)) * area
        AreaCentroidBuffer(b.area + area, b.x + c.x, b.y + c.y, b.z + c.z)
      }

      def merge(a: AreaCentroidBuffer, b: AreaCentroidBuffer): AreaCentroidBuffer =
        AreaCentroidBuffer(a.area + b.area, a.x + b.x, a.y + b.y, a.z + b.z)

      def finish(b: AreaCentroidBuffer): AreaCentroid = {
        if (b.area == 0) return AreaCentroid(0, 0, 0)
        val centroid = S2Point.normalize(S2Point(b.x, b.y, b.z))
        val ll = S2LatLng.fromPoint(centroid)
        AreaCentroid(b.area, ll.latDegrees, ll.lngDegrees)
      }

      def bufferEncoder: Encoder[AreaCentroidBuffer] = Encoders.product[AreaCentroidBuffer]
      def outputEncoder: Encoder[AreaCentroid] = Encoders.product[AreaCentroid]
    }

  /** Leaf-cells-covered aggregation: the size measure of a covering
    * (`S2CellUnion.cs:39-52`) as a typed Aggregator. */
  val leafCellsCovered: Aggregator[Long, Long, Long] =
    new Aggregator[Long, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, cellId: Long): Long =
        b + (1L << ((S2CellId.MaxLevel - S2CellId.level(cellId)) << 1))
      def merge(a: Long, b: Long): Long = a + b
      def finish(b: Long): Long = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
