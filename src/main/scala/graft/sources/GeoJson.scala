package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoJSON-lines source/sink — one RFC 7946 Feature per line (the
  * newline-delimited "GeoJSONL" flavor geo pipelines actually exchange,
  * and the only one that scales: a single FeatureCollection document
  * cannot split across tasks, one-feature-per-line parallelizes like any
  * text source).
  *
  * Contracts: schema-on-read with EXPLICIT schemas (no inference job over
  * a 100-TB dump); Jackson serializes doubles at shortest-roundtrip
  * precision, so coordinates survive write+read BIT FOR BIT (the
  * q_geojson_scan oracle is exact, no tolerance — GeoJsonSpec pins the
  * roundtrip); axis order is RFC 7946 [lon, lat]; polygon rings carry the
  * RFC-required closing vertex on disk, which the reader drops to yield
  * the open-loop layout the polygon-table joins consume. */
object GeoJson {

  private val PointSchema =
    "type STRING, properties MAP<STRING,STRING>, " +
      "geometry STRUCT<type: STRING, coordinates: ARRAY<DOUBLE>>"
  private val PolygonSchema =
    "type STRING, properties MAP<STRING,STRING>, " +
      "geometry STRUCT<type: STRING, coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>>"

  /** Point features → (props MAP, lat, lon). Rows of other geometry types
    * are dropped — a mixed dump routes each type through its own reader
    * (both readers scan the same text with their own pushed schema). */
  def readPoints(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(PointSchema).json(path)
      .where(col("type") === "Feature" && col("geometry.type") === "Point")
      .select(col("properties").as("props"),
        element_at(col("geometry.coordinates"), 2).as("lat"),
        element_at(col("geometry.coordinates"), 1).as("lon"))

  /** Write (id, lat, lon) rows as Point features (id under properties.id). */
  def writePoints(df: DataFrame, idCol: String, latCol: String, lonCol: String,
                  path: String): Unit =
    df.select(to_json(struct(
        lit("Feature").as("type"),
        map(lit("id"), col(idCol).cast("string")).as("properties"),
        struct(lit("Point").as("type"),
          array(col(lonCol), col(latCol)).as("coordinates")).as("geometry")))
      .as("value"))
      .write.mode("overwrite").text(path)

  /** Polygon features → (props, latss, lonss): ALL rings (exterior first,
    * holes after, per RFC) as parallel nested vertex arrays with each
    * ring's closing vertex dropped — element 1 of latss/lonss feeds
    * [[graft.operators.SpatialJoin.polygonPipJoin]] directly; the full
    * nesting feeds the multi-loop (holed) join layout. */
  def readPolygons(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(PolygonSchema).json(path)
      .where(col("type") === "Feature" && col("geometry.type") === "Polygon")
      .select(col("properties").as("props"),
        transform(col("geometry.coordinates"),
          ring => transform(slice(ring, lit(1), size(ring) - 1),
            v => element_at(v, 2))).as("latss"),
        transform(col("geometry.coordinates"),
          ring => transform(slice(ring, lit(1), size(ring) - 1),
            v => element_at(v, 1))).as("lonss"))

  /** Write (id, latss, lonss) nested-ring rows as Polygon features, each
    * ring re-closed with a copy of its first vertex (RFC 7946). */
  def writePolygons(df: DataFrame, idCol: String, latssCol: String, lonssCol: String,
                    path: String): Unit = {
    val rings = zip_with(col(latssCol), col(lonssCol), (lats, lons) =>
      concat(
        zip_with(lons, lats, (lo, la) => array(lo, la)),
        array(array(element_at(lons, 1), element_at(lats, 1)))))
    df.select(to_json(struct(
        lit("Feature").as("type"),
        map(lit("id"), col(idCol).cast("string")).as("properties"),
        struct(lit("Polygon").as("type"), rings.as("coordinates")).as("geometry")))
      .as("value"))
      .write.mode("overwrite").text(path)
  }
}
