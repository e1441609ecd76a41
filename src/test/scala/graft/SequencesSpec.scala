package graft

import org.apache.spark.sql.functions._

import graft.operators.Sequences

/** Event-sequence analytics vs driver-side brute force, the greedy ==
  * iterated-min-after equivalence the q_funnel oracle relies on, and the
  * no-ts-tie precondition aligning the two orderings. */
class SequencesSpec extends SparkTestBase {

  private val steps = Seq("view", "click", "purchase")

  /** (user, ts-as-epoch-micros, event_id, type) — micros preserve the
    * sub-second ordering the engine sorts on. */
  private def collected(sfName: String): Array[(Long, Long, Long, String)] =
    spark.read.parquet(s"${sf(sfName)}/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        val micros = t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
        (r.getLong(0), micros, r.getLong(2), r.getString(3))
      }

  test("transitionCounts equals brute-force adjacent pairs (sf0.001)") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = Sequences.transitionCounts(events, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = collected("sf0.001").groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    assert(got === want)
    assert(want.values.sum > 0)
  }

  test("funnelDepths: greedy fold == brute greedy == iterated min-after (sf0.001)") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = Sequences.funnelDepths(events, "user_id", "ts", "event_type", "event_id", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    val byUser = collected("sf0.001").groupBy(_._1)
    val greedy = byUser.view.mapValues { g =>
      val sorted = g.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.foldLeft(0)((acc, t) =>
        if (acc < steps.size && t == steps(acc)) acc + 1 else acc)
    }.toMap
    // the oracle's independent formulation: iterated earliest-after
    val minAfter = byUser.view.mapValues { g =>
      var depth = 0
      var after = Long.MinValue
      var done = false
      for (s <- steps if !done) {
        val hit = g.filter(e => e._4 == s && e._2 > after)
          .map(_._2).sorted.headOption
        hit match {
          case Some(t) => depth += 1; after = t
          case None => done = true
        }
      }
      depth
    }.toMap
    assert(greedy === minAfter, "greedy subsequence != iterated min-after")
    val want = greedy.values.groupBy(identity).map { case (d, o) => d -> o.size.toLong }
    assert(got === want)
    assert(got.values.sum === byUser.size.toLong, "funnel must cover every user")
  }

  test("windowedFunnel equals per-anchor brute force (sf0.001 and sf0.01)") {
    val wSec = 43200L
    for (sfName <- Seq("sf0.001", "sf0.01")) {
      val events = spark.read.parquet(s"${sf(sfName)}/events.parquet")
      val got = Sequences.windowedFunnel(events, "user_id", "ts", "event_type", steps, wSec)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val byUser = collected(sfName).groupBy(_._1)
      val want = byUser.view.mapValues { g =>
        val anchors = g.filter(_._4 == steps.head).map(_._2)
        if (anchors.isEmpty) 0
        else anchors.map { a =>
          var depth = 1
          var prev = a
          var done = false
          for (s <- steps.drop(1) if !done) {
            g.filter(e => e._4 == s && e._2 > prev && e._2 <= a + wSec * 1000000L)
              .map(_._2).sorted.headOption match {
              case Some(t) => depth += 1; prev = t
              case None => done = true
            }
          }
          depth
        }.max
      }.toMap.values.groupBy(identity).map { case (d, o) => d -> o.size.toLong }
      assert(got === want, s"$sfName diverged")
      if (sfName == "sf0.01")
        assert(got.size >= 3, s"$sfName: degenerate windowed-funnel spread $got")
    }
  }

  test("topPaths equals brute-force adjacent trigrams under the (n desc, path) rank (sf0.001)") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = Sequences.topPaths(events, "user_id", "ts", "event_type", "event_id",
      len = 3, topK = 20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = collected("sf0.001").groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.sliding(3).filter(_.size == 3).map(_.mkString(">"))
    }.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq === want)
    assert(got.map(_._2).sum > 0)
  }

  test("topPaths rejects type values containing the separator") {
    import spark.implicits._
    val bad = Seq((1L, 1L, 1L, "a>b"), (1L, 2L, 2L, "c"), (1L, 3L, 3L, "d"))
      .toDF("user_id", "ts_raw", "event_id", "event_type")
      .select(col("user_id"), expr("timestamp_seconds(ts_raw)").as("ts"),
        col("event_id"), col("event_type"))
    val e = intercept[Exception] {
      Sequences.topPaths(bad, "user_id", "ts", "event_type", "event_id", 3, 5).collect()
    }
    assert(e.getMessage != null)
  }

  test("cusumAlarms: prefix-min identity equals the sequential recurrence (sf0.001)") {
    import org.apache.spark.sql.expressions.Window
    val k = 40000000000L
    val h = 200000000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val gaps = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .withColumn("__t", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap", col("__t") - lag(col("__t"), 1).over(w))
      .where(col("gap").isNotNull)
    val got = Sequences.cusumAlarms(gaps, "user_id", "ts", "event_id", "gap", k, h)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // the TRUE sequential definition: s_i = max(0, s_{i-1} + (x_i - k))
    val want = collected("sf0.001").groupBy(_._1).view.mapValues { g =>
      val ts = g.sortBy(e => (e._2, e._3)).map(_._2)
      val xs = ts.zip(ts.drop(1)).map { case (a, b) => b - a }
      var s = 0L
      var alarms = 0L
      var maxS = Long.MinValue
      xs.foreach { x =>
        s = math.max(0L, s + (x - k))
        if (s > h) alarms += 1
        maxS = math.max(maxS, s)
      }
      (xs.size.toLong, alarms, maxS)
    }.toMap
    assert(got === want)
    assert(got.values.exists(_._2 > 0), "degenerate: no alarms anywhere")
    assert(got.values.exists(_._2 == 0) || got.values.map(_._2).toSet.size > 1,
      "degenerate: alarms do not discriminate")
  }

  test("cusumAlarms: hand fixture with closed-form alarms") {
    import spark.implicits._
    // k=10, h=5: xs = 12, 13, 4, 20 -> s = 2, 5, 0, 10 -> alarms at s=10 only
    val rows = Seq((1L, 1L, 1L, 12L), (1L, 2L, 2L, 13L), (1L, 3L, 3L, 4L), (1L, 4L, 4L, 20L))
      .toDF("user_id", "ts_raw", "event_id", "x")
      .select(col("user_id"), expr("timestamp_seconds(ts_raw)").as("ts"),
        col("event_id"), col("x"))
    val got = Sequences.cusumAlarms(rows, "user_id", "ts", "event_id", "x", k = 10L, h = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 4L, 1L, 10L)))
  }

  test("cohortRetention equals brute-force first-day cohorts (sf0.001)") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = Sequences.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    val byUser = collected("sf0.001").groupBy(_._1)
    val dayOf = (micros: Long) => micros / 86400000000L
    val want = byUser.toSeq.flatMap { case (u, g) =>
      val cohort = g.map(e => dayOf(e._2)).min
      g.map(e => dayOf(e._2)).distinct.map(d => (u, cohort, (d - cohort).toInt))
    }.groupBy { case (_, c, o) => (c, o) }
      .map { case ((c, o), rows) =>
        (java.time.LocalDate.ofEpochDay(c).toString, o) -> rows.map(_._1).distinct.size.toLong
      }
    assert(got === want)
    assert(got.keys.map(_._2).max > 10, "retention triangle degenerate (no late offsets)")
  }

  test("planted hot key: one user with 10^6 events stays correct and bounded") {
    import spark.implicits._
    // the documented window/collect tail: a single pathological key holds
    // all its events in one task. Plant it and pin the exact answers — a
    // deterministic view/click/purchase/... rotation, so the transition
    // matrix and funnel depth are closed-form
    val types = Seq("view", "click", "purchase", "signup", "error")
    val n = 1000000L
    val hot = spark.range(n)
      .select(lit(7L).as("user_id"),
        expr("timestamp_seconds(1700000000 + id)").as("ts"),
        col("id").as("event_id"),
        element_at(array(types.map(lit): _*), (pmod(col("id"), lit(5)) + 1).cast("int"))
          .as("event_type"))
    val trans = Sequences.transitionCounts(hot, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // the rotation has exactly the 5 cyclic transitions; each appears
    // floor/ceil((n-1)/5) times
    assert(trans.keySet === types.zip(types.drop(1) :+ types.head).toSet)
    assert(trans.values.sum === n - 1)
    assert(trans(("view", "click")) === 200000L)
    val funnel = Sequences.funnelDepths(hot, "user_id", "ts", "event_type", "event_id",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(funnel === Map(3 -> 1L))
  }

  test("ewma == driver-side fold, bit for bit (sf0.001)") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = Sequences.ewma(events, "user_id", "ts", "event_id", "value", 0.25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .select("user_id", "ts", "event_id", "value").collect().map { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0), t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L,
          r.getLong(2), r.getDouble(3))
      }
    val want = rows.groupBy(_._1).values.flatMap { g =>
      var s = 0.0
      var first = true
      g.sortBy(e => (e._2, e._3)).map { e =>
        s = if (first) { first = false; e._4 } else 0.25 * e._4 + 0.75 * s
        e._3 -> s
      }
    }.toMap
    assert(got.keySet === want.keySet)
    // BIT equality, not approximate: the fold order is pinned
    got.foreach { case (id, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(want(id)), s"event $id: $v != ${want(id)}")
    }
  }

  test("holt == driver-side two-state fold, bit for bit (sf0.001)") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val got = Sequences.holt(events, "user_id", "ts", "event_id", "value", 0.25, 0.125)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val rows = events.where("value IS NOT NULL")
      .select("user_id", "ts", "event_id", "value").collect().map { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0), t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L,
          r.getLong(2), r.getDouble(3))
      }
    val want = rows.groupBy(_._1).map { case (id, g) =>
      var l = 0.0; var b = 0.0; var first = true
      g.sortBy(e => (e._2, e._3)).foreach { e =>
        if (first) { first = false; l = e._4; b = 0.0 }
        else {
          val ln = 0.25 * e._4 + 0.75 * (l + b)
          // b recomputes l's tree, exactly as the engine does
          b = 0.125 * ((0.25 * e._4 + 0.75 * (l + b)) - l) + 0.875 * b
          l = ln
        }
      }
      id -> ((g.size.toLong, l, b))
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (n, l, b)) =>
      val (wn, wl, wb) = want(id)
      assert(n === wn)
      assert(java.lang.Double.doubleToLongBits(l) === java.lang.Double.doubleToLongBits(wl),
        s"user $id level: $l != $wl")
      assert(java.lang.Double.doubleToLongBits(b) === java.lang.Double.doubleToLongBits(wb),
        s"user $id trend: $b != $wb")
    }
    // a single-observation entity (if any) yields (v, 0.0); at minimum the
    // fold must produce a non-zero trend somewhere on real data
    assert(got.values.exists(_._3 != 0.0))
  }

  test("holtStream: cross-batch continuity; last row per entity == batch holt") {
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.Event
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 60).map { i =>
      val user = i % 2
      val step = i / 2
      val v = if (user == 0) 1.0 + 0.5 * step else math.sin(step * 0.7) * 3.0
      Event(i.toLong, new java.sql.Timestamp(1700000000000L + step * 60000L),
        user.toLong, "m", v)
    }
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val query = EventStreams
      .holtStream(input.toDF(), "user_id", "ts", "event_id", "value", 0.25, 0.125)
      .writeStream.format("memory").queryName("holt_xbatch")
      .outputMode("append").start()
    try {
      input.addData(events.take(23): _*)
      query.processAllAvailable()
      input.addData(events.drop(23): _*)
      query.processAllAvailable()
      def asMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      val got = asMap(spark.sql(
        "SELECT entity_id, event_id, n_obs, level, trend FROM holt_xbatch").collect())
      val batch = asMap(EventStreams
        .holtStream(events.toDF(), "user_id", "ts", "event_id", "value", 0.25, 0.125)
        .toDF().collect())
      assert(got === batch)
      assert(got.size === 60)
      // bit-equality of the final row with the batch operator
      val last = got.groupBy(_._1._1).map { case (u, m) => u -> m.maxBy(_._1._2)._2 }
      val whole = Sequences.holt(events.toDF(), "user_id", "ts", "event_id", "value",
          0.25, 0.125)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      last.foreach { case (u, (n, l, b)) =>
        val (wn, wl, wb) = whole(u)
        assert(n == wn)
        assert(java.lang.Double.doubleToLongBits(l) == java.lang.Double.doubleToLongBits(wl))
        assert(java.lang.Double.doubleToLongBits(b) == java.lang.Double.doubleToLongBits(wb))
      }
    } finally query.stop()
  }

  test("oracle precondition: no user has two events at the same timestamp (sf0.01)") {
    val dups = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
      .groupBy("user_id", "ts").count().where(col("count") > 1).count()
    assert(dups === 0L, s"$dups (user, ts) collisions — strict-inequality oracle unsafe")
  }
}
