package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density clustering of geotagged rows — distributed DBSCAN.
  *
  * The eps-neighborhood graph comes from [[SpatialJoin.distanceJoin]]
  * (neighbor-cell buckets at the radius-derived level — never a cross
  * join), the cluster cores from the same min-label + pointer-jumping
  * connected components that power duplicate clustering
  * ([[Dedup.duplicateClusters]]). Everything that shuffles is (id, id)
  * pairs or (id, label) rows; coordinates stay on the scan side.
  */
object Clustering {

  /** DBSCAN over a point table, exact and deterministic.
    *
    * Definitions (classic, with a deterministic border rule):
    *   - core: |N_eps(p)| >= minPts, counting p itself;
    *   - cluster: connected component of the core-core eps-graph, labeled
    *     by its minimum core id (a singleton core is its own cluster);
    *   - border: non-core point with >= 1 core eps-neighbor, assigned the
    *     MINIMUM cluster id among its core neighbors (plain DBSCAN leaves
    *     border assignment scan-order-dependent; min is order-free);
    *   - noise: everything else — absent from the output.
    *
    * Scale shape: one bucketed distance self-join builds the eps-graph
    * (localCheckpointed — it is the expensive part and is read three
    * times), then a degree aggregation, O(log diameter) label-propagation
    * rounds, and one anti/semi-join pass for borders. No step is driver-side
    * and no step carries coordinates past the distance join.
    *
    * @return (id, cluster_id, is_core) for core and border points only
    */
  def dbscan(points: DataFrame, idCol: String, latCol: String, lonCol: String,
             epsM: Double, minPts: Int): DataFrame = {
    require(minPts >= 2,
      s"dbscan: minPts must be >= 2 (minPts = 1 makes every point a singleton core), got $minPts")
    val pairs = SpatialJoin.distanceJoin(points, latCol, lonCol, idCol, epsM)
      .select("id_a", "id_b").localCheckpoint()
    val edges = pairs.unionByName(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val core = edges.groupBy(col("id_a").as("id")).agg(count(lit(1)).as("__deg"))
      .where(col("__deg") + lit(1L) >= minPts).select("id")
    val corePairs = pairs
      .join(core.select(col("id").as("id_a")), "id_a")
      .join(core.select(col("id").as("id_b")), "id_b")
    val cc = Dedup.duplicateClusters(corePairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    val coreClusters = core.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"),
        lit(true).as("is_core"))
    val borderClusters = edges
      .join(coreClusters.select(col("id").as("id_b"), col("cluster_id")), "id_b")
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .groupBy(col("id_a").as("id")).agg(min("cluster_id").as("cluster_id"))
      .withColumn("is_core", lit(false))
    coreClusters.unionByName(borderClusters)
  }
}
