package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.s2functions.s2_distance_m

/** Record linkage / entity resolution between two tables of noisy entity
  * records (the merge/purge problem at corpus scale): find the RIGHT rows
  * that denote the same real-world entity as a LEFT row despite name
  * formatting drift, location jitter, and attribute noise.
  *
  * The classic two-stage shape:
  *
  *  1. *Blocking.* Candidates come from an EQUI-join on a normalized name
  *     key ([[normalizeEntityName]]: lowercase, strip separators, collapse
  *     zero-padded digit runs) — candidate volume is the block-size
  *     product, never |L|x|R|, and the join is an ordinary shuffle/broadcast
  *     hash join. The blocking trade (a true match whose name normalizes
  *     differently is unreachable) is the documented recall bound, exactly
  *     like SNM's window miss; multi-key blocking = union of linkages.
  *  2. *Scoring.* A Fellegi-Sunter-style agreement score in INTEGER
  *     weights: `wClose` if the exact haversine distance is within
  *     `maxDistM`, `wAttr` if the categorical attribute agrees. Integer
  *     scores make accept/reject decisions replayable in ANSI SQL with no
  *     float-tolerance ambiguity; pairs scoring >= `minScore` match.
  *
  * Output: (left id, right id, score) for accepted pairs. One shuffle
  * (the block join); the score is a pure row expression over the joined
  * pair. A hot block (a million records normalizing to one name) is the
  * standard blocking caveat — cap with [[Dedup]]-style bucket caps before
  * the join if the name key is adversarial. */
object RecordLinkage {

  /** Normalization used as the block key: lowercase, drop everything but
    * [a-z0-9#], collapse zero-padded digit runs after '#' ("Customer#000042",
    * "customer #42", "CUSTOMER#0042" all map to "customer#42"). */
  def normalizeEntityName(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), "[^a-z0-9#]", ""), "#0+", "#")

  def link(left: DataFrame, leftId: String, leftName: String,
           leftLat: String, leftLon: String, leftAttr: String,
           right: DataFrame, rightId: String, rightName: String,
           rightLat: String, rightLon: String, rightAttr: String,
           maxDistM: Double, wClose: Int, wAttr: Int, minScore: Int): DataFrame = {
    require(wClose >= 0 && wAttr >= 0 && minScore >= 1,
      s"degenerate weights: wClose=$wClose wAttr=$wAttr minScore=$minScore")
    val l = left.select(col(leftId).as("__lid"),
      normalizeEntityName(col(leftName)).as("__blk"),
      col(leftLat).as("__llat"), col(leftLon).as("__llon"),
      col(leftAttr).as("__lattr"))
    val r = right.select(col(rightId).as("__rid"),
      normalizeEntityName(col(rightName)).as("__blk"),
      col(rightLat).as("__rlat"), col(rightLon).as("__rlon"),
      col(rightAttr).as("__rattr"))
    l.join(r, "__blk")
      .withColumn("score",
        when(s2_distance_m(col("__llat"), col("__llon"),
          col("__rlat"), col("__rlon")) <= maxDistM, lit(wClose)).otherwise(lit(0))
          + when(col("__lattr") === col("__rattr"), lit(wAttr)).otherwise(lit(0)))
      .where(col("score") >= minScore)
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("score"))
  }
}
