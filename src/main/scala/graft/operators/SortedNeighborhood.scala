package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood dedup (Hernández & Stolfo's merge/purge) — the third
  * classic candidate-generation family next to blocking
  * ([[Dedup.exactDupGroups]], fingerprints) and LSH
  * ([[Dedup.nearDupPairs]], SimHash): sort the corpus by a key that places
  * near-duplicates adjacently, take every pair within `window` positions as
  * a candidate, verify candidates exactly. Deterministic end to end — the
  * key, the rank and the window arithmetic all replay in ANSI SQL, so the
  * catalog query is oracle-checked hash-exact rather than recall-pinned.
  *
  * The global rank is NOT a single-task window (the naive
  * `row_number() OVER (ORDER BY key)` serializes the corpus through one
  * reducer): [[globalRank]] uses the two-pass pattern — range-repartition
  * on (key, tie), per-range-partition local row_number, then one bounded
  * per-partition count aggregate whose running sum (a window over
  * #partitions ROWS, not data rows) broadcasts back as rank offsets.
  * Correctness does not depend on where the range sampler draws partition
  * boundaries: any boundary split of the total (key, tie) order yields the
  * same global ranks.
  *
  * Known SNM trade (documented, not hidden): a run of > window rows with
  * IDENTICAL keys pairs only within the window — exact-duplicate floods
  * belong on [[Dedup.collapseExact]] first, and edits in a document's
  * leading tokens move its sort position (the method's classic miss);
  * recall-critical corpora use the LSH path, this operator is the
  * cheap one-sort screen. */
object SortedNeighborhood {

  /** Scalable global 1-based rank by (key, tie) — see object doc. */
  private[graft] def globalRank(df: DataFrame, key: Column, tie: Column): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    // pinned: __pid is nondeterministic over a SAMPLED range partitioning
    // and two subtrees (offsets + join) read it — materializing prevents
    // the re-evaluations from drawing different range boundaries (the
    // instability SpatialPartition.groupedGlobalRank exhibited when two
    // rank levels composed)
    val ranged = df.repartitionByRange(parts, key.asc, tie.asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("__lr",
      row_number().over(Window.partitionBy("__pid").orderBy(key.asc, tie.asc)))
    // one row per range partition; the running-sum window is bounded by
    // the partition COUNT, never the data size
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn("rank", col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }

  /** Global weighted PREFIX SUM over a key-ordered table — for each row,
    * the sum of `weight` over all STRICTLY-smaller keys — with the same
    * two-pass range-partitioned shape as [[globalRank]] (per-partition
    * running sums + a partition-count-bounded offset broadcast; no
    * single-task sort). Keys must be DISTINCT (the per-key aggregate
    * shape every caller feeds); equal keys within a partition would
    * share a range-frame cumulative and the contract would be ill-posed.
    * Returns the input columns plus `below`. */
  private[graft] def globalPrefixSum(df: DataFrame, key: Column,
                                     weight: Column): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val ranged = df.repartitionByRange(parts, key.asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("__lc",
      sum(weight).over(Window.partitionBy("__pid").orderBy(key.asc)) - weight)
    val offsets = local.groupBy("__pid").agg(sum(weight).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn("below", col("__lc") + col("__off"))
      .drop("__pid", "__lc", "__off")
  }

  /** [[globalPrefixSum]] PER GROUP: for each row, the sum of `weight`
    * over strictly-smaller keys WITHIN its group — range-partitioned by
    * (group, key) with per-(partition, group) offsets, the
    * [[SpatialPartition.groupedGlobalRank]] shape for weighted sums.
    * Keys must be distinct within each group. Returns the input columns
    * plus `below`. */
  private[graft] def groupedPrefixSum(df: DataFrame, grpCol: String,
                                      key: Column, weight: Column): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val ranged = df.repartitionByRange(parts, col(grpCol).asc, key.asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("__lc",
      sum(weight).over(Window.partitionBy(col("__pid"), col(grpCol))
        .orderBy(key.asc)) - weight)
    val offsets = local.groupBy(col("__pid"), col(grpCol)).agg(sum(weight).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.partitionBy(grpCol).orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(grpCol), col("__off"))
    local.join(broadcast(offsets), Seq("__pid", grpCol))
      .withColumn("below", col("__lc") + col("__off"))
      .drop("__pid", "__lc", "__off")
  }

  /** Candidate pairs within `window` sorted positions of each other,
    * canonicalized to id_a < id_b. Candidate volume is exactly
    * n*(window-1) rows pre-join — a plan-time constant multiplier, never
    * data-dependent (the property blocking and LSH cannot promise). */
  private[graft] def candidates(df: DataFrame, idCol: String, key: Column,
                                window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    // (id, rank) feeds both join sides — pin it or the range sort + rank
    // runs twice (and the key expression re-reads the text column)
    val ranked = globalRank(df.select(col(idCol), key.as("__key")),
      col("__key"), col(idCol)).select(col(idCol), col("rank")).localCheckpoint()
    val probe = ranked
      .select(col(idCol).as("__ida"), col("rank").as("__r"),
        explode(sequence(lit(1), lit(window - 1))).as("__d"))
      .select(col("__ida"), (col("__r") + col("__d")).as("rank"))
    probe.join(ranked.select(col(idCol).as("__idb"), col("rank")), "rank")
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"))
  }

  /** Sorted-neighborhood near-dup pairs over a text column: key = the
    * whitespace-normalized lowercased text, window pairs verified by exact
    * trigram Jaccard >= minJaccard. Output (id_a, id_b, jaccard). */
  def snmNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                      window: Int, minJaccard: Double): DataFrame = {
    val key = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    val cand = candidates(df, idCol, key, window)
    Dedup.ngramJaccard(df, idCol, textCol, cand, shingleN = 3)
      .where(col("jaccard") >= minJaccard)
  }
}
