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

  /** Lloyd k-means over non-negative INTEGER grid coordinates with FIXED
    * caller-chosen seeds and a FIXED round count — every operand is int64
    * (squared-L2 assignment, `sum div n` centroid update), so the whole
    * iteration is shuffle-order independent and hash-exact against an
    * unrolled-CTE SQL replay: the distributed-k-means determinism story
    * (float Lloyd depends on partial-agg addition order; seeded integer
    * Lloyd does not). Assignment ties fall to the smaller cluster id; an
    * empty cluster keeps its previous centroid (never NaN, never a
    * driver-side reseed). Returns the k rows (cluster_id, n, cx, cy) of
    * the final update — n = 0 marks a cluster that ended empty.
    *
    * Shape at scale: the centroid table is k rows and stays PLAN-SIDE
    * (broadcast cross join — never a driver collect), so each round is
    * one broadcast join producing k candidates per point, one min-struct
    * hash agg picking the assignment, and one k-row hash agg for the
    * update; points are pinned once and never reshuffled. Overflow
    * contract: 0 ≤ coord ≤ `maxCoord` (LOUD filter-side raise_error)
    * bounds the distance at 2·maxCoord² and the centroid sums at
    * n·maxCoord ≤ 2^63 for any real n. Non-negative coords keep Spark's
    * truncating `div` == DuckDB's flooring `//`. */
  def kMeansScaled(points: DataFrame, idCol: String, xCol: String, yCol: String,
                   seeds: Seq[(Int, Long, Long)], rounds: Int,
                   maxCoord: Long = 1000000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(seeds.map(_._1).distinct.size == seeds.size, "duplicate seed cluster ids")
    require(seeds.forall { case (_, x, y) => x >= 0 && y >= 0 &&
      x <= maxCoord && y <= maxCoord }, s"seed outside [0, $maxCoord]")
    require(maxCoord >= 1 && maxCoord <= 2000000000L,
      s"2*maxCoord^2 can overflow int64: $maxCoord")
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(col(idCol).as("__id"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .withColumn("__ok",
        when(col("__x").between(0L, maxCoord) && col("__y").between(0L, maxCoord), true)
          .otherwise(raise_error(concat(
            lit(s"kMeansScaled: coordinate outside [0, $maxCoord]: ("),
            col("__x"), lit(", "), col("__y"), lit(")")))))
      .where(col("__ok")).select("__id", "__x", "__y")
      .localCheckpoint()
    var cents = seeds.toDF("cluster_id", "cx", "cy")
      .select(col("cluster_id"), col("cx").cast("long"), col("cy").cast("long"))
      .localCheckpoint()
    var last: DataFrame = null
    for (_ <- 1 to rounds) {
      val assigned = pts.crossJoin(broadcast(cents))
        .withColumn("__d",
          (col("__x") - col("cx")) * (col("__x") - col("cx")) +
            (col("__y") - col("cy")) * (col("__y") - col("cy")))
        .groupBy("__id", "__x", "__y")
        .agg(min(struct(col("__d"), col("cluster_id"))).as("__m"))
        .select(col("__id"), col("__x"), col("__y"),
          col("__m.cluster_id").as("cluster_id"))
      val upd = assigned.groupBy("cluster_id")
        .agg(count(lit(1)).as("n"), sum("__x").as("__sx"), sum("__y").as("__sy"))
      last = cents.select(col("cluster_id"),
          col("cx").as("__pcx"), col("cy").as("__pcy"))
        .join(upd, Seq("cluster_id"), "left")
        .select(col("cluster_id"), coalesce(col("n"), lit(0L)).as("n"),
          when(col("n").isNull, col("__pcx"))
            .otherwise(expr("__sx div n")).as("cx"),
          when(col("n").isNull, col("__pcy"))
            .otherwise(expr("__sy div n")).as("cy"))
        .localCheckpoint()
      cents = last.select("cluster_id", "cx", "cy")
    }
    last
  }
}
