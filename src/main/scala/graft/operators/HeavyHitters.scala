package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-n-gram mining ("heavy hitters") — the contamination /
  * boilerplate screen of an LLM data pipeline: find every word n-gram
  * whose corpus frequency is at least a given fraction (eval-set leaks,
  * boilerplate headers, license blurbs all surface as abnormally frequent
  * n-grams).
  *
  * Why not just `groupBy(gram).count()`: at 100 TB the gram key space is
  * ~vocabulary^n — the full-cardinality shuffle moves (almost) one row per
  * input gram. The scale shape is candidates-then-verify:
  *
  *  1. CANDIDATE pass: one `mapPartitions` over the gram stream keeps a
  *     space-saving summary (Metwally et al., fixed `capacity` counters)
  *     per partition. The summary's standard guarantee: an item ABSENT
  *     from partition p's summary has local count <= that partition's
  *     minimum counter. Summing those minima over partitions gives a
  *     data-derived completeness bound B: any gram missing from EVERY
  *     summary has global count <= B.
  *  2. EXACT pass: grams equi-join (broadcast) the candidate set and the
  *     survivors get exact counts; `count >= minCount` filters.
  *
  * When `minCount > B` the result is EXACTLY the brute-force answer —
  * [[frequentNgrams]] `require`s that, failing loudly instead of silently
  * under-reporting (raise `capacity` if it trips). Only candidate grams
  * ever shuffle: the shuffled volume is O(partitions x capacity), not
  * O(corpus grams).
  *
  * The threshold is a FRACTION of the total gram count; the total rides
  * along in the candidate pass (one sentinel row per partition), so the
  * whole operator reads the text exactly twice — candidate pass + verify
  * pass — with no third counting scan.
  */
object HeavyHitters {

  /** Word n-grams with multiplicity (the ONE gram expression shared with
    * [[Dedup.shingles]], which dedups per doc on top; frequency semantics
    * here need every occurrence). */
  def ngrams(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(Dedup.ngramArray(col(textCol), n)).as("gram"))

  /** Space-saving summary of one partition's gram stream: at most
    * `capacity` counters; on overflow the minimum counter is evicted and
    * the newcomer inherits its count + 1 (the classic over-estimate that
    * preserves the no-false-negative guarantee). Returns (candidate grams,
    * final minimum counter =: eviction bound, grams seen).
    *
    * The counters live in count-keyed buckets (TreeMap count ->
    * insertion-ordered key set, the paper's stream-summary structure), so
    * increment and min-eviction are O(log #distinct-counts) — a naive
    * min-scan eviction is O(capacity) per NON-candidate gram, which on a
    * heavy-tailed stream at capacity 8k turns the pass from seconds into
    * minutes (measured). */
  private[graft] def spaceSaving(it: Iterator[String], capacity: Int): (Seq[String], Long, Long) = {
    import scala.jdk.CollectionConverters._
    val count = new java.util.HashMap[String, java.lang.Long]
    val buckets = new java.util.TreeMap[java.lang.Long, java.util.LinkedHashSet[String]]
    def addTo(g: String, c: Long): Unit = {
      var s = buckets.get(java.lang.Long.valueOf(c))
      if (s == null) { s = new java.util.LinkedHashSet[String](); buckets.put(c, s) }
      s.add(g)
    }
    def removeFrom(g: String, c: Long): Unit = {
      val key = java.lang.Long.valueOf(c)
      val s = buckets.get(key)
      s.remove(g)
      if (s.isEmpty) buckets.remove(key)
    }
    var seen = 0L
    var evicted = false
    while (it.hasNext) {
      val g = it.next()
      seen += 1
      val c = count.get(g)
      if (c != null) {
        val cv = c.longValue
        count.put(g, cv + 1); removeFrom(g, cv); addTo(g, cv + 1)
      } else if (count.size < capacity) {
        count.put(g, 1L); addTo(g, 1L)
      } else {
        evicted = true
        val minEntry = buckets.firstEntry()
        val minC = minEntry.getKey.longValue
        val victim = minEntry.getValue.iterator.next()
        removeFrom(victim, minC)
        count.remove(victim)
        count.put(g, minC + 1); addTo(g, minC + 1)
      }
    }
    // with zero evictions every gram of the stream is a candidate — an
    // absent gram truly has count 0, so the bound is 0 even when the
    // summary happens to sit exactly at capacity
    val bound = if (evicted) buckets.firstKey().longValue else 0L
    (count.keySet.iterator.asScala.toSeq, bound, seen)
  }

  /** All word n-grams with frequency >= `minFraction` of the corpus gram
    * count, with exact counts: `(gram, cnt)`. Exact by construction (see
    * object doc); `require`s the completeness bound. */
  def frequentNgrams(docs: DataFrame, textCol: String, n: Int,
                     minFraction: Double, capacity: Int = 8192): DataFrame = {
    require(minFraction > 0 && minFraction < 1, s"minFraction in (0,1): $minFraction")
    require(capacity > 0, s"capacity must be positive: $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = ngrams(docs, textCol, n)

    // candidate pass: per-partition summaries + one sentinel row carrying
    // (eviction bound, grams seen)
    // One job materializes the summaries driver-side: at most
    // partitions x capacity candidate strings — the same bounded exchange
    // as collecting a runtime filter (BloomJoin), NOT a per-row collect.
    val summaries = grams.as[String].mapPartitions { it =>
      val (cands, bound, seen) = spaceSaving(it, capacity)
      cands.iterator.map(g => (g, -1L, -1L)) ++ Iterator((null.asInstanceOf[String], bound, seen))
    }.toDF("gram", "bound", "seen")
      .collect()
    val totalBound = summaries.iterator.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    val totalGrams = summaries.iterator.filter(_.isNullAt(0)).map(_.getLong(2)).sum
    if (totalGrams == 0)
      // empty corpus: the exact answer is the empty set, not a guard trip
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("gram STRING, cnt BIGINT"))
    val minCount = math.ceil(minFraction * totalGrams).toLong
    require(minCount > totalBound,
      s"frequentNgrams not exact: threshold $minCount <= eviction bound $totalBound — raise capacity ($capacity)")
    val cands = summaries.iterator.filterNot(_.isNullAt(0)).map(_.getString(0)).toSeq
      .distinct.toDF("gram")
    // verify pass: exact counts for candidates only
    grams.join(broadcast(cands), "gram")
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }
}
