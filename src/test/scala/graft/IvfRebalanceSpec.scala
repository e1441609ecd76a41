package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** IVF index lifecycle under drift (round-3 verdict ask #5): a planted
  * drifted append wave — every new vector near ONE existing point — must
  * trip the max/median skew policy, and the triggered rebuild must
  * restore list balance while recall and partition-pruned probing
  * survive on the grown corpus. */
class IvfRebalanceSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet").cache()

  test("drifted appends trip the skew policy; rebuild restores balance, recall and pruning") {
    val idx = java.nio.file.Files.createTempDirectory("ivf_drift").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, nlist = 32)
    val (max0, med0, _) = Similarity.ivfListStats(spark, idx)
    assert(max0 <= 4.0 * med0,
      s"fresh index should start balanced: max=$max0 median=$med0")
    assert(!Similarity.maybeRebalanceIvfIndex(spark, idx, nlist = 32),
      "balanced index must not trigger a rebuild")

    // drifted wave: 2x the corpus in a NEW angular region — every
    // vector near the all-ones direction (far from the base corpus's
    // spread), with ~10 degrees of internal angular spread. The stored
    // quantizer has no centroid near the region, so the whole wave lands
    // on one hot list; the internal spread is what a retrained quantizer
    // partitions. (A zero-spread blob — exact near-duplicates — is NOT
    // this test: an angularly-point-mass list is irreducible for any
    // spherical quantizer and harmless to recall; duplicates are the
    // dedup operators' job upstream.)
    val n = emb.count()
    val dim = emb.select(col("embedding")).head.getSeq[Float](0).length
    val drifted = spark.range(1000000L, 1000000L + 2 * n)
      .select(col("id").as("vec_id"),
        transform(typedlit((0 until dim).map(_.toFloat)), (x, i) =>
          (lit(1.0) + (pmod(xxhash64(col("id"), i), lit(1009L)).cast("double")
            / 1009.0 - 0.5) * 0.6).cast("float")).as("embedding"))
    Similarity.appendToIvfIndex(drifted, "vec_id", "embedding", idx)

    val (max1, med1, _) = Similarity.ivfListStats(spark, idx)
    assert(max1 > 4.0 * med1,
      s"drifted appends must skew the lists: max=$max1 median=$med1")
    assert(Similarity.maybeRebalanceIvfIndex(spark, idx, nlist = 32),
      "skewed index must trigger the rebuild")

    val (max2, med2, _) = Similarity.ivfListStats(spark, idx)
    info(s"list skew: fresh $max0/$med0 -> drifted $max1/$med1 -> rebuilt $max2/$med2")
    assert(max2 <= max1 / 2,
      s"rebuild must split the hot list: drifted max=$max1 rebuilt max=$max2")

    // the rebuilt index still answers: recall@5 vs brute force over the
    // GROWN corpus, probes still partition-pruned
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(drifted)
      .localCheckpoint()
    val queries = 0L until 20L
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", queries, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = Similarity.queryIvf(spark, idx,
      corpus.where(col("vec_id") < 20), "vec_id", "embedding", k = 5, nprobe = 18)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list#"),
      s"rebuilt index must still probe partition-pruned, got:\n$plan")
    val approx = q.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"post-rebalance IVF recall@5 = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9 after rebalance")
  }
}
