package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage

/** Record linkage: normalization vectors, accept/reject semantics of the
  * integer score, and the documented blocking recall bound. */
class RecordLinkageSpec extends SparkTestBase {

  test("normalizeEntityName collapses the classic surface forms") {
    import spark.implicits._
    val got = Seq("Customer#000000042", "customer #42", "CUSTOMER#0042",
      "Cust omer#42!", "Customer#000000000")
      .toDF("n").select(RecordLinkage.normalizeEntityName(col("n")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("customer#42", "customer#42", "customer#42",
      "customer#42", "customer#"))
  }

  test("linkage accepts drifted true matches and rejects imposters by score") {
    import spark.implicits._
    val left = Seq((1L, "Customer#000000001", 48.0, 11.0, 7),
      (2L, "Customer#000000002", -30.0, 100.0, 9))
      .toDF("id", "name", "lat", "lon", "nation")
    val right = Seq(
      // true match: 0.01 deg away (~1.1 km), same nation
      (101L, "customer #1", 48.01, 11.0, 7),
      // same name, same nation, ANTIPODAL -> distance kills it (score 2)
      (102L, "CUSTOMER#0001", -48.0, -169.0, 7),
      // close but wrong nation -> score 3 < 5
      (103L, "Customer#000000001", 48.0, 11.001, 8),
      // different entity entirely: blocks apart, never a candidate
      (104L, "Customer#000000002", 48.0, 11.0, 7))
      .toDF("rid", "rname", "rlat", "rlon", "rnation")
    val got = RecordLinkage.link(left, "id", "name", "lat", "lon", "nation",
        right, "rid", "rname", "rlat", "rlon", "rnation",
        maxDistM = 5000.0, wClose = 3, wAttr = 2, minScore = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 101L, 5)))
  }

  test("blocking recall bound: a name that normalizes differently is unreachable") {
    import spark.implicits._
    val left = Seq((1L, "Customer#000000001", 0.0, 0.0, 1)).toDF("id", "name", "lat", "lon", "a")
    // 'Kustomer' - same entity in the real world, different block key
    val right = Seq((9L, "Kustomer#1", 0.0, 0.0, 1)).toDF("rid", "rname", "rlat", "rlon", "ra")
    val n = RecordLinkage.link(left, "id", "name", "lat", "lon", "a",
      right, "rid", "rname", "rlat", "rlon", "ra", 5000.0, 3, 2, 5).count()
    assert(n == 0)
  }
}
