package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort-Tile-Recursive (STR) spatial partitioning — the load-balanced
  * alternative to fixed grids when point density is wildly uneven (every
  * fixed-cell scheme puts Tokyo and the Pacific in same-sized cells; STR
  * gives every partition the same ROW count by construction): slice the
  * data into `sx` equi-depth vertical strips by longitude rank, then cut
  * each strip into `sy` equi-depth tiles by latitude rank. The classic
  * R-tree packing recipe (Leutenegger/Lopez/Edgington, ICDE'97) used as a
  * partitioner, like Sedona's STRTree partitioning — but built on rank
  * arithmetic so the assignment is deterministic and replays in ANSI SQL.
  *
  * Scale shape: NO single-task global sort anywhere. Both levels use the
  * [[SortedNeighborhood.globalRank]] two-pass pattern, generalized to
  * per-group ranks: range-repartition on (group, key, tie), local
  * row_number per (range-partition, group), then one bounded
  * (group x partition)-count aggregate whose per-group running sum
  * broadcasts back as offsets. The per-group totals ride the same
  * broadcast, so tile indices need zero extra scans, zero driver
  * collects, and no count() job.
  *
  * Balance guarantee (spec-pinned): `floor(rank*k/n)` splits n ranks into
  * k groups whose sizes differ by at most one — so every STR tile holds
  * between floor(n/(sx*sy))-ish bounds regardless of how skewed the
  * coordinates are. Ties on a coordinate break by id, keeping the
  * assignment a pure function of the input set. */
object SpatialPartition {

  /** Per-group global 1-based rank by (key, tie) within `grpCol`, plus the
    * group's total row count — both attached without a per-group
    * single-task window: emits `rank` and `__tot`. */
  private[graft] def groupedGlobalRank(df: DataFrame, grpCol: String,
                                       key: Column, tie: Column): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    // pinned: __pid comes from a nondeterministic expression over a
    // sampled range partitioning, and BOTH the offsets aggregate and the
    // final join read it — without materialization the two subtrees can
    // re-evaluate the exchange with different boundaries (observed as a
    // run-to-run unstable rank when two levels compose)
    val ranged = df.repartitionByRange(parts, col(grpCol).asc, key.asc, tie.asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("__lr",
      row_number().over(Window.partitionBy(col("__pid"), col(grpCol))
        .orderBy(key.asc, tie.asc)))
    // one row per (range partition x group): the running sum and the group
    // total are windows over the partition COUNT, never data rows
    val offsets = local.groupBy(col("__pid"), col(grpCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.partitionBy(grpCol).orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum("__c").over(Window.partitionBy(grpCol)))
      .select(col("__pid"), col(grpCol), col("__off"), col("__tot"))
    local.join(broadcast(offsets), Seq("__pid", grpCol))
      .withColumn("rank", col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }

  /** Assign each point an (tx, ty) STR tile, tx in [0, sx), ty in [0, sy).
    * Output: the input columns plus tx, ty. */
  def strAssign(df: DataFrame, idCol: String, lonCol: String, latCol: String,
                sx: Int, sy: Int): DataFrame = {
    require(sx >= 1 && sy >= 1, s"grid must be >= 1x1: ${sx}x$sy")
    val level1 = groupedGlobalRank(df.withColumn("__g0", lit(0)), "__g0",
        col(lonCol), col(idCol))
      .withColumn("tx", expr(s"((rank - 1) * $sx) div __tot"))
      .drop("__g0", "rank", "__tot")
    groupedGlobalRank(level1, "tx", col(latCol), col(idCol))
      .withColumn("ty", expr(s"((rank - 1) * $sy) div __tot"))
      .drop("rank", "__tot")
  }
}
