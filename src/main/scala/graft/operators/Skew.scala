package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot cells (north rule: "salting and AQE
  * handling skewed hot cells").
  *
  * Geotagged corpora concentrate in cities: a single level-8 tile can hold
  * orders of magnitude more rows than the median. Three mitigations, used
  * by the engine:
  *
  *  1. Spark's hash aggregation already partial-aggregates map-side, so
  *     `groupBy(tile)` skew only affects the reduce of *distinct* partial
  *     rows — usually harmless.
  *  2. For high-cardinality aggregates where partials don't collapse
  *     (e.g. collect-type or exact-distinct), [[saltedAgg]] splits each hot
  *     key across S salts, aggregates, then merges — two small shuffles
  *     instead of one skewed one.
  *  3. For joins keyed by cell, [[saltKey]]/[[explodeSaltedBuild]] salt the
  *     probe side and replicate the (small) build side xS, on top of AQE's
  *     runtime skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`).
  */
object Skew {

  /** Probe-side salt column: deterministic in [0, salts). */
  def saltKey(idCol: Column, salts: Int): Column =
    pmod(xxhash64(idCol), lit(salts.toLong))

  /** Build side replicated xS for a salted equi-join: join on
    * (key, salt). */
  def explodeSaltedBuild(build: DataFrame, salts: Int): DataFrame =
    build.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))

  /** Two-stage salted aggregation: count-style aggregates per (key, salt),
    * then merge per key. Exact same result as a direct groupBy(key). */
  def saltedCount(df: DataFrame, keyCol: String, idCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltKey(col(idCol), salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("n"))

  /** Salted distinct-count: exact count(distinct id) per key computed as a
    * sum over salt buckets (ids land in exactly one bucket). */
  def saltedDistinctCount(df: DataFrame, keyCol: String, idCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltKey(col(idCol), salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(countDistinct(col(idCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("distinct_n"))
}
