package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics: latest right at-or-before, deterministic tie
  * handling, null when nothing qualifies. */
class AsOfJoinSpec extends SparkTestBase {

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("asOf == brute force with same-timestamp ties and no-match lefts") {
    import spark.implicits._
    val right = Seq(
      (10L, ts(5), 1L), (11L, ts(5), 1L), // tie at t=5: larger id (11) wins
      (12L, ts(20), 1L))
      .toDF("rid", "rts", "key")
    val left = Seq(
      (100L, ts(4), 1L),  // before any right -> null
      (101L, ts(5), 1L),  // same-timestamp right qualifies -> 11
      (102L, ts(25), 1L), // -> 12
      (103L, ts(10), 2L)) // key with no rights -> null
      .toDF("lid", "lts", "key")

    val got = AsOfJoin.asOf(left, right, Seq("key"), "lts", "rts",
      rightOrderCol = "rid", rightCarryCols = Seq("rid"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(100L -> -1L, 101L -> 11L, 102L -> 12L, 103L -> -1L))
  }

  test("asOfForward == brute force with same-timestamp ties and no-match lefts") {
    import spark.implicits._
    val right = Seq(
      (10L, ts(5), 1L), (11L, ts(5), 1L), // tie at t=5: SMALLEST id (10) wins
      (12L, ts(20), 1L))
      .toDF("rid", "rts", "key")
    val left = Seq(
      (100L, ts(4), 1L),  // -> 10 (earliest at/after, smallest id on tie)
      (101L, ts(5), 1L),  // same-timestamp right qualifies -> 10
      (102L, ts(21), 1L), // after every right -> null
      (103L, ts(10), 2L)) // key with no rights -> null
      .toDF("lid", "lts", "key")
    val got = AsOfJoin.asOfForward(left, right, Seq("key"), "lts", "rts",
      rightOrderCol = "rid", rightCarryCols = Seq("rid"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(100L -> 10L, 101L -> 10L, 102L -> -1L, 103L -> -1L))
  }

  test("asOfNearest picks the closer side; exact-distance ties go backward") {
    import spark.implicits._
    val right = Seq((10L, 100L, 1L), (20L, 200L, 1L)).toDF("rid", "rt", "key")
    val left = Seq(
      (100L, 140L, 1L), // 40 back vs 60 fwd -> 10
      (101L, 160L, 1L), // 60 back vs 40 fwd -> 20
      (102L, 150L, 1L), // exact tie -> backward -> 10
      (103L, 50L, 1L),  // before all -> forward 10
      (104L, 250L, 1L), // after all -> backward 20
      (105L, 10L, 2L))  // no rights -> null
      .toDF("lid", "lt", "key")
    val got = AsOfJoin.asOfNearest(left, right, Seq("key"), "lt", "rt",
      rightOrderCol = "rid", rightCarryCols = Seq("rid"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(100L -> 10L, 101L -> 20L, 102L -> 10L, 103L -> 10L,
      104L -> 20L, 105L -> -1L))
  }

  test("asOf on the events table == correlated-subquery brute force") {
    val ev = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val purchases = ev.where(col("event_type") === "purchase").select("event_id", "ts", "user_id")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"), col("user_id"))
    val got = AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "click_ts",
      rightOrderCol = "click_id", rightCarryCols = Seq("click_id"))
      .select(col("event_id"), coalesce(col("asof.click_id"), lit(-1L)).as("click_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // events.ts is TIMESTAMP_NTZ -> LocalDateTime in Spark 4 row access
    def millis(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[java.time.LocalDateTime](i).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val clickRows = clicks.collect().map(r => (r.getLong(0), millis(r, 1), r.getLong(2)))
    val expected = purchases.collect().map { p =>
      val (id, t, u) = (p.getLong(0), millis(p, 1), p.getLong(2))
      val best = clickRows.filter(c => c._3 == u && c._2 <= t)
        .sortBy(c => (c._2, c._1)).lastOption
      id -> best.map(_._1).getOrElse(-1L)
    }.toMap
    assert(got === expected)
    assert(expected.values.exists(_ >= 0), "some purchases should have prior clicks")
  }

  test("asOf rejects caller columns colliding with reserved names") {
    import spark.implicits._
    val left = Seq((1L, 5L, "x")).toDF("lid", "lt", "asof")
    val right = Seq((2L, 3L)).toDF("rid", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right.withColumn("key", lit(1)),
        Seq("key"), "lt", "rt", "rid", Seq("rid"))
    }
    assert(e.getMessage.contains("asof"))
  }

  test("asOfBucketed == asOf on random data including cross-bucket carries") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // long gaps force many left buckets whose answer lives several buckets back
    val right = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(100000).toLong, (i % 7).toLong)).toDF("rid", "rt", "key")
    val left = (0 until 600).map(i =>
      (1000L + i, rnd.nextInt(120000).toLong, (i % 9).toLong)).toDF("lid", "lt", "key")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lid"), coalesce(col("asof.rid"), lit(-1L)).as("rid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = run(AsOfJoin.asOf(left, right, Seq("key"), "lt", "rt", "rid", Seq("rid")))
    val bucketed = run(AsOfJoin.asOfBucketed(left, right, Seq("key"), "lt", "rt",
      "rid", Seq("rid"), t => (t / lit(1000L)).cast("long")))
    assert(bucketed === plain)
    assert(plain.values.exists(_ >= 0))
    assert(plain.values.exists(_ < 0))
  }

  test("asOfBucketed bounds the hot-key window: one key with most rows, same result") {
    import spark.implicits._
    // planted hot key: 50k right rows + 5k lefts on ONE key; bucketed windows
    // see at most ~rows-per-(key,bucket) rather than all 55k rows in one task
    val n = 50000
    val right = spark.range(n)
      .select(col("id").as("rid"), (col("id") * 13 % 100000).as("rt"), lit(1L).as("key"))
    val left = spark.range(5000)
      .select((col("id") + 1000000).as("lid"), (col("id") * 97 % 110000).as("lt"), lit(1L).as("key"))
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lid"), coalesce(col("asof.rid"), lit(-1L)).as("rid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = run(AsOfJoin.asOf(left, right, Seq("key"), "lt", "rt", "rid", Seq("rid")))
    val bucketed = run(AsOfJoin.asOfBucketed(left, right, Seq("key"), "lt", "rt",
      "rid", Seq("rid"), t => (t / lit(500L)).cast("long")))
    assert(bucketed === plain)
  }
}
