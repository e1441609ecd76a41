package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via Spark native bucketed tables — the storage-level
  * answer to "this join runs every day on the same key": both sides are
  * written pre-hashed into the same number of buckets on the join key, so
  * the join reads bucket i against bucket i with NO Exchange on either
  * side (at 100 TB, the shuffle a bucketed layout removes is usually the
  * whole cost of the join).
  *
  * This engine's spatial layout (`Tiling.clusteredWrite`) is the same idea
  * keyed by Hilbert prefix; `Bucketing` is the general-key variant using
  * Spark's own bucket metadata, which survives in the plan as
  * `SelectedBucketsCount` and absent `Exchange` nodes (asserted in
  * BucketingSpec).
  *
  * Bucketed tables need a catalog entry; the session catalog here is
  * in-memory, so [[ensureBucketed]] (re)registers the table per session
  * with the data files at an explicit external `path` — re-registration
  * is metadata-only, the files are written once.
  */
object Bucketing {

  /** Register `df` as a bucketed external table (write files if the table
    * is not yet in this session's catalog). Sorted within buckets by the
    * key, so downstream sort-merge joins skip their sorts too. */
  def ensureBucketed(spark: SparkSession, df: => DataFrame, table: String,
                     keyCol: String, nBuckets: Int, path: String): Unit = {
    if (!spark.catalog.tableExists(table)) {
      df.write
        .bucketBy(nBuckets, keyCol)
        .sortBy(keyCol)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    }
  }

  /** Equi-join two same-bucketed tables on their bucket keys. The `merge`
    * hint pins a SortMergeJoin — the join shape the layout was built for:
    * with equal bucket counts its children are bare bucketed scans, no
    * Exchange on either side. (Without the hint, a side small enough to
    * broadcast at TEST scale would broadcast and the planner would
    * rightly ignore the bucketing — at the layout's design scale neither
    * side broadcasts.) */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                   rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
