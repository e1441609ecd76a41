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

  /** Register `df` as a bucketed external table, writing the files when
    * the table is not yet in this session's catalog (a fresh session over
    * existing files re-writes them — the in-memory catalog cannot adopt
    * bucket metadata from disk). Sorted within buckets by the key, so
    * downstream sort-merge joins skip their sorts too.
    *
    * A table that already exists is validated against the requested
    * layout (key, bucket count, location) and reused — `df` is NOT
    * re-evaluated; asking for a DIFFERENT layout under the same name
    * fails loudly instead of silently serving the old files. */
  def ensureBucketed(spark: SparkSession, df: => DataFrame, table: String,
                     keyCol: String, nBuckets: Int, path: String): Unit = {
    if (!spark.catalog.tableExists(table)) {
      df.write
        .bucketBy(nBuckets, keyCol)
        .sortBy(keyCol)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    } else {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      val spec = meta.bucketSpec
      require(spec.exists(s => s.numBuckets == nBuckets &&
          s.bucketColumnNames == Seq(keyCol)),
        s"ensureBucketed: table '$table' exists with bucket spec $spec, " +
          s"not the requested ($nBuckets buckets on $keyCol)")
      val existing = meta.location.getPath.stripSuffix("/")
      val asked = new java.io.File(path).toURI.getPath.stripSuffix("/")
      require(existing == asked,
        s"ensureBucketed: table '$table' exists at $existing, not the requested $asked")
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
