package graft

import graft.operators.{Curation, Dedup, Sketches}

/** Rendezvous sharding: brute-force hash replay and the minimal-movement
  * property that is the whole reason HRW beats `key % n` routing. */
class ShardingSpec extends SparkTestBase {

  private def assign(ids: Seq[Long], shards: Seq[String]): Map[Long, String] = {
    import spark.implicits._
    Curation.rendezvousAssign(ids.toDF("id"), "id", shards)
      .as[(Long, String)].collect().toMap
  }

  test("rendezvousAssign == driver-side argmax over the portable hash") {
    val ids = (0L until 400L).toSeq
    val shards = Seq("s0", "s1", "s2", "s3", "s4")
    val got = assign(ids, shards)
    val want = ids.map { id =>
      id -> shards.maxBy(sh => (Sketches.finalizeHashOf(Dedup.portableHashOf(s"$sh|$id")), sh))
    }.toMap
    assert(got == want)
    // every shard owns a sane share (no degenerate hashing)
    val byShard = got.values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.size == 5 && byShard.values.forall(n => n > 40 && n < 120), s"$byShard")
  }

  test("adding a shard moves ONLY the keys the new shard wins (~1/(n+1) of them)") {
    val ids = (0L until 600L).toSeq
    val before = assign(ids, Seq("s0", "s1", "s2", "s3", "s4"))
    val after = assign(ids, Seq("s0", "s1", "s2", "s3", "s4", "s5"))
    val moved = ids.filter(id => before(id) != after(id))
    assert(moved.nonEmpty, "a new shard must win some keys")
    assert(moved.forall(id => after(id) == "s5"),
      "every moved key must land on the NEW shard — nothing else may reshuffle")
    val frac = moved.size.toDouble / ids.size
    assert(frac > 0.05 && frac < 0.35, s"movement fraction $frac far from 1/6")
    // removing the shard again restores the original assignment exactly
    assert(assign(ids, Seq("s0", "s1", "s2", "s3", "s4")) == before)
  }
}
