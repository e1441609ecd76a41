package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

/** SCD2 point-in-time join: semantics vs a driver-side scalar lookup,
  * half-open boundary behavior, inner/left fact handling on coverage gaps,
  * and the invariant checker on planted bad dimensions. */
class TemporalJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private val dimRows = Seq(
    // key 1: three contiguous versions
    (1L, 1, "A", ts("1990-01-01"), ts("1993-06-01")),
    (1L, 2, "B", ts("1993-06-01"), ts("1996-02-15")),
    (1L, 3, "C", ts("1996-02-15"), ts("2002-01-01")),
    // key 2: a coverage gap in 1995
    (2L, 1, "X", ts("1990-01-01"), ts("1995-01-01")),
    (2L, 2, "Y", ts("1996-01-01"), ts("2002-01-01")))

  test("each fact picks exactly the version containing its timestamp; boundaries are half-open") {
    import spark.implicits._
    val dim = dimRows.toDF("key", "version", "attr", "vfrom", "vto")
    val facts = Seq(
      (10L, 1L, ts("1992-12-31")), // v1
      (11L, 1L, ts("1993-06-01")), // boundary: belongs to v2, not v1
      (12L, 1L, ts("1996-02-14")), // v2
      (13L, 1L, ts("2001-12-31")), // v3 (vto exclusive, still inside)
      (14L, 2L, ts("1994-06-01"))) // v1 of key 2
      .toDF("fid", "key", "fts")
    val got = TemporalJoin.scd2Join(facts, "key", "fts", dim, "key", "vfrom", "vto")
      .select("fid", "version").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(10L -> 1, 11L -> 2, 12L -> 2, 13L -> 3, 14L -> 1))
  }

  test("coverage gaps: inner drops the fact, left keeps it with null dimension") {
    import spark.implicits._
    val dim = dimRows.toDF("key", "version", "attr", "vfrom", "vto")
    val orphan = Seq((20L, 2L, ts("1995-07-01"))).toDF("fid", "key", "fts")
    assert(TemporalJoin.scd2Join(orphan, "key", "fts", dim, "key", "vfrom", "vto").count() == 0)
    val left = TemporalJoin.scd2Join(orphan, "key", "fts", dim, "key", "vfrom", "vto", "left")
    assert(left.count() == 1 && left.select("version").head().isNullAt(0))
  }

  test("scd2Violations flags overlaps and empty intervals, passes clean dims") {
    import spark.implicits._
    val clean = dimRows.toDF("key", "version", "attr", "vfrom", "vto")
    assert(TemporalJoin.scd2Violations(clean, "key", "vfrom", "vto").count() == 0)
    val bad = (dimRows ++ Seq(
      (1L, 4, "D", ts("1995-01-01"), ts("1997-01-01")), // overlaps key 1 v2/v3
      (3L, 1, "E", ts("1999-01-01"), ts("1999-01-01")))) // empty
      .toDF("key", "version", "attr", "vfrom", "vto")
    val v = TemporalJoin.scd2Violations(bad, "key", "vfrom", "vto")
      .select("version", "violation").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSet
    // the overlap is reported on the predecessor in vfrom order: key 1's
    // v2 ends after the planted v4 starts, and v4 ends after v3 starts
    assert(v.contains(3 -> "empty_interval") || v.contains(1 -> "empty_interval"))
    assert(v.exists(_._2 == "overlaps_successor"), s"got $v")
    // an overlapping dimension would double-match a fact inside the overlap
    val f = Seq((30L, 1L, ts("1996-06-01"))).toDF("fid", "key", "fts")
    assert(TemporalJoin.scd2Join(f, "key", "fts", bad, "key", "vfrom", "vto").count() == 2)
  }
}
