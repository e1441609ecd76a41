package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Curation, Profiling}

/** Bloom-pruned semi join, deterministic group sampling, one-scan
  * profiling. */
class BloomProfileSpec extends SparkTestBase {

  test("prunedSemiJoin == plain semi join (false positives dropped), codegen and eval agree") {
    import spark.implicits._
    val big = (0L until 20000L).map(i => (i, i % 997)).toDF("row_id", "k")
    val keys = (0L until 997L).filter(_ % 13 == 0).toDF("key")
    val got = BloomJoin.prunedSemiJoin(big, keys, "k", "key", nBits = 1 << 12, nHashes = 5)
      .select("row_id").as[Long].collect().sorted
    val want = big.join(broadcast(keys), big("k") === keys("key"), "left_semi")
      .select("row_id").as[Long].collect().sorted
    assert(got.sameElements(want))
    // interpreted eval path must agree with codegen
    val bloom = BloomJoin.buildBloom(keys, "key", 1 << 12, 5)
    val hits = (0L until 997L).filter(BloomJoin.mightContain(bloom, 5, _))
    assert((0L until 997L).filter(_ % 13 == 0).forall(hits.contains), "false negative!")
  }

  test("non-integral key types are rejected instead of silently cast to null") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val keys = Seq("a").toDF("key")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prunedSemiJoin(big, keys, "k", "key")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("bloom filter has no false negatives and a sane false-positive rate") {
    import spark.implicits._
    val n = 5000L
    val keys = (0L until n).map(_ * 3).toDF("key")
    // ~10 bits/key, 5 hashes -> theoretical fp ~1%
    val bloom = BloomJoin.buildBloom(keys, "key", 1 << 16, 5)
    val misses = (0L until n).map(_ * 3 + 1) // guaranteed non-members
    val fp = misses.count(BloomJoin.mightContain(bloom, 5, _))
    assert(fp.toDouble / n < 0.05, s"fp rate ${fp.toDouble / n} too high")
    assert((0L until n).map(_ * 3).forall(BloomJoin.mightContain(bloom, 5, _)),
      "bloom filter produced a false negative")
  }

  test("distributed bloom build == sequential build (merge is exact)") {
    import spark.implicits._
    val ks = (0L until 2000L).map(i => i * i + 7)
    val distributed = BloomJoin.buildBloom(ks.toDF("key").repartition(8), "key", 1 << 12, 4)
    val sequential = new Array[Long](1 << 6)
    ks.foreach(BloomJoin.add(sequential, 4, _))
    assert(distributed.sameElements(sequential))
  }

  test("groupSample: exact k per group, deterministic, subset-stable") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, s"g${i % 7}")).toDF("id", "g")
    val s1 = Curation.groupSample(df, Seq("g"), "id", 5)
    assert(s1.groupBy("g").count().collect().forall(_.getLong(1) == 5L))
    // repartitioned input -> identical sample (pure function of ids)
    val s2 = Curation.groupSample(df.repartition(13), Seq("g"), "id", 5)
    assert(s1.select("id").as[Long].collect().sorted
      .sameElements(s2.select("id").as[Long].collect().sorted))
    // k >= group size degrades to the whole group
    val small = df.where(col("id") < 10)
    assert(Curation.groupSample(small, Seq("g"), "id", 100).count() == 10)
  }

  test("profile: one row per column, exact stats, approx mode keeps min/max exact") {
    import spark.implicits._
    val df = Seq((1L, 2.5, "a"), (2L, -1.0, "b"), (3L, 4.0, null.asInstanceOf[String]))
      .toDF("id", "x", "s")
    val p = Profiling.profile(df, Seq("id", "x"), Seq("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 3 && p("id").getLong(2) == 3 &&
      p("id").getDouble(3) == 1.0 && p("id").getDouble(4) == 3.0)
    assert(p("x").getDouble(3) == -1.0 && p("x").getDouble(4) == 4.0)
    assert(p("s").getLong(1) == 2 && p("s").getLong(2) == 2 && p("s").isNullAt(3))
    val approx = Profiling.profile(df, Seq("id", "x"), Seq("s"), exact = false).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx("x").getDouble(3) == -1.0 && approx("x").getDouble(4) == 4.0)
  }
}
