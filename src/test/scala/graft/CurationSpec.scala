package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Curation operators: reproducible splits, leakage-freedom, packing
  * invariants. */
class CurationSpec extends SparkTestBase {

  test("hashSplit is deterministic, row-local, and near the requested fraction") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("doc_id")
    val split = Curation.hashSplit(ids, "doc_id", 0.2)
    val valCnt = split.where(col("split") === "val").count()
    assert(valCnt > 1700 && valCnt < 2300, s"val fraction ${valCnt / 10000.0} far from 0.2")
    // row-local: the assignment of an id is identical in any subset
    val sub = Curation.hashSplit(ids.where(col("doc_id") % 7 === 0), "doc_id", 0.2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub.forall { case (k, v) => full(k) == v })
  }

  test("quantileNormalize equals the scalar empirical CDF, ties broken by id") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, (i * 7919) % 97)) // heavy ties
    val got = Curation.quantileNormalize(rows.toDF("doc_id", "v"), "v", "doc_id")
      .select("doc_id", "q").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = rows.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case ((id, _), r) => id -> r.toDouble / 499.0 }.toMap
    assert(got == want)
    // single row maps to 0.0, not NaN
    val one = Curation.quantileNormalize(Seq((1L, 42L)).toDF("doc_id", "v"), "v", "doc_id")
      .select("q").head().getDouble(0)
    assert(one == 0.0)
  }

  test("leakFreeSplit never lets a near-dup cluster straddle train/val") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs)
    val docs = (0L until 50L).toDF("doc_id")
    val split = Curation.leakFreeSplit(docs, "doc_id", clusters, 0.5)
    val byDoc = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (cluster <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L), Seq(20L, 21L, 22L)))
      assert(cluster.map(byDoc).distinct.size == 1, s"cluster $cluster straddles the split")
    // unclustered docs follow the plain hash split
    val plain = Curation.hashSplit(docs, "doc_id", 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (d <- 30L until 50L) assert(byDoc(d) == plain(d))
  }

  test("clusterSizeReport: exact histogram + redundancy over known clusters") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusterSizeReport(Dedup.duplicateClusters(pairs))
      .as[(Long, Long, Long, Long)].collect().toSet
    // clusters: {1,2,3} size 3, {10,11} size 2, {20..23} size 4
    assert(got == Set((3L, 1L, 3L, 2L), (2L, 1L, 2L, 1L), (4L, 1L, 4L, 3L)))
    // redundancy identity: sum(n_redundant) == docs - clusters
    assert(got.map(_._4).sum == 9L - 3L)
  }

  test("spatialBlockSplit: side is a pure function of the geohash block, matching the scalar fold") {
    import spark.implicits._
    val pts = (0L until 4000L).map { k =>
      (k, ((k * 9973 + 12345) % 18000) / 100.0 - 90.0,
        ((k * 31337 + 54321) % 36000) / 100.0 - 180.0)
    }.toDF("id", "lat", "lon")
    val split = Curation.spatialBlockSplit(pts, "lat", "lon", precision = 4, valFrac = 0.2)
      .select("id", "block", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // one side per block (the leakage guard), and that side is exactly the
    // documented arithmetic: portableHash(block) * A mod P < P * 0.2
    val thr = Curation.splitThreshold(0.2)
    val byBlock = split.groupBy(_._2)
    assert(byBlock.size > 100, s"degenerate fixture: ${byBlock.size} blocks")
    for ((block, rows) <- byBlock) {
      assert(rows.map(_._3).distinct.length == 1, s"block $block straddles the split")
      val expect =
        if ((Dedup.portableHashOf(block) * Curation.HashA) % Dedup.HashP < thr) "val" else "train"
      assert(rows.head._3 == expect, s"block $block side != scalar fold")
    }
    // the BLOCK fraction lands near valFrac (blocks are the split unit)
    val valBlocks = byBlock.count(_._2.head._3 == "val")
    val frac = valBlocks.toDouble / byBlock.size
    assert(frac > 0.12 && frac < 0.28, s"val block fraction $frac far from 0.2")
  }

  test("proportionalGroupSample: exact ceil quota per group, two-round-hash order") {
    import spark.implicits._
    // group sizes 1..60 so the ceil rounding is exercised at every residue
    val rows = (0 until 60).flatMap(g => (0 to g).map(i => (g.toLong * 1000 + i, g)))
      .toDF("id", "grp")
    val got = Curation.proportionalGroupSample(rows, Seq("grp"), "id", num = 1, den = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byGrp = rows.collect().map(r => (r.getLong(0), r.getInt(1))).groupBy(_._2)
    def h2(id: Long): Long = {
      val h1 = ((id % Dedup.HashP) * Curation.HashA) % Dedup.HashP
      (h1 * Curation.HashB) % Dedup.HashP
    }
    val gotByGrp = got.groupBy(_._2)
    for ((g, members) <- byGrp) {
      val n = members.length
      val quota = (n + 6) / 7 // ceil(n/7)
      val expect = members.map(_._1).sortBy(id => (h2(id), id)).take(quota).toSet
      val actual = gotByGrp.getOrElse(g, Array.empty).map(_._1).toSet
      assert(actual == expect, s"group $g: expected $quota rows by hash order")
    }
  }

  test("packByBudget: every document's start offset falls inside its batch window") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, 1 + (i % 97).toInt)).toDF("doc_id", "n_tokens")
    val budget = 150
    val packed = Curation.packByBudget(docs, "doc_id", "n_tokens", budget, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("n_tokens"), r.getInt(2), r.getLong(3)))
    // reconstruct per-bucket running offsets and check the invariant
    val byBucket = packed.groupBy(_._3).view.mapValues(_.sortBy(_._1))
    for ((_, rows) <- byBucket) {
      var cum = 0L
      for ((_, n, _, batch) <- rows) {
        assert(batch == cum / budget, s"batch $batch != ${cum / budget} at offset $cum")
        cum += n
      }
    }
    // deterministic: same input -> same assignment
    val again = Curation.packByBudget(docs, "doc_id", "n_tokens", budget, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(packed.forall { case (id, _, _, b) => again(id) == b })
  }

  test("chunkDocs reproduces brute-force token slices with overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 123).map(i => s"t$i").mkString(" ")), // 123 tokens
      (2L, "alpha  beta\tgamma"),                      // messy separators
      (3L, "solo"),
      (4L, ""), (5L, "   ")                            // empty -> no chunks
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocs(docs, "text", maxTokens = 50, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val want = Seq((1L, "1to123"), (2L, "abc"), (3L, "s")).flatMap {
      case (id, _) =>
        val toks = id match {
          case 1L => (1 to 123).map(i => s"t$i")
          case 2L => Seq("alpha", "beta", "gamma")
          case _ => Seq("solo")
        }
        (0 until toks.size by 40).map { i =>
          (id, i / 40, math.min(50, toks.size - i),
            toks.slice(i, i + 50).mkString(" "))
        }
    }
    assert(got.toSeq === want)
    // coverage invariant: the chunk windows [40*idx, 40*idx + n_tokens)
    // jointly cover every token position of doc 1 exactly
    val covered = got.filter(_._1 == 1L)
      .flatMap { case (_, idx, n, _) => (40 * idx) until (40 * idx + n) }.toSet
    assert(covered === (0 until 123).toSet)
  }

  test("mixtureSample: exact per-group ceil quotas in hash order; unlisted groups dropped") {
    import spark.implicits._
    val rows = (0L until 3000L).map(i => (i, s"src${i % 6}")).toDF("id", "src")
    val fr = Map("src0" -> (1, 2), "src1" -> (1, 4), "src5" -> (1, 1))
    val got = Curation.mixtureSample(rows, "src", "id", fr)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.map(_._2).toSet === fr.keySet)
    def h2(id: Long): Long = {
      val h1 = ((id % Dedup.HashP) * Curation.HashA) % Dedup.HashP
      (h1 * Curation.HashB) % Dedup.HashP
    }
    val byGrp = (0L until 3000L).map(i => (i, s"src${i % 6}")).groupBy(_._2)
    val gotByGrp = got.groupBy(_._2)
    for ((g, (num, den)) <- fr) {
      val members = byGrp(g).map(_._1)
      val quota = (members.size * num + den - 1) / den
      val expect = members.sortBy(id => (h2(id), id)).take(quota).toSet
      assert(gotByGrp(g).map(_._1).toSet === expect, s"group $g quota $quota")
    }
  }

  test("importanceSample keeps exactly the integer-threshold rows, monotone in weight") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, 1L + i % 400)).toDF("doc_id", "w")
    val wMax = 400L
    val kept = Curation.importanceSample(df, "doc_id", "w", wMax)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p = graft.operators.Dedup.HashP
    val a = 2654435761L
    val want = (0L until 5000L).map(i => i -> (1L + i % 400))
      .filter { case (i, w) => ((i % p) * a) % p < (p * w) / wMax }.toMap
    assert(kept === want)
    // max-weight rows are always kept; rates grow with weight
    assert(want.nonEmpty)
    val rateLow = want.count(_._2 <= 100).toDouble / 5000 * 4
    val rateHigh = want.count(_._2 > 300).toDouble / 5000 * 4
    assert(rateHigh > rateLow * 2,
      f"sampling not monotone in weight: high $rateHigh%.3f vs low $rateLow%.3f")
  }
}
