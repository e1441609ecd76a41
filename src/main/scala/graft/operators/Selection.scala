package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed order statistics without a global sort — the
  * iterative range-narrowing selection (the classic distributed k-th
  * element): each pass histograms the current [lo, hi] candidate range
  * into 1024 integer-width buckets with ONE partial+final aggregate
  * (1024 counter rows cross the exchange, never data), the driver walks
  * the counts to the bucket containing rank k, and the range narrows by
  * ~1024x per pass — <= 7 passes for the full int64 domain, 2-3 for
  * realistic columns. Contrast the alternatives at 100 TB: a global sort
  * shuffles everything; `approx_percentile`/[[graft.functions.Sketches]]
  * quantiles trade exactness for mergeability. This operator is the
  * exact path: deterministic, value-exact, driver state O(1024) longs.
  *
  * Ranks are 1-based over the multiset (duplicates counted), so
  * k = (n+1)/2 is the lower median, k = n the max — the unambiguous
  * contract `quantile_disc` replays. */
object Selection {

  /** The k-th smallest value (1-based, duplicates counted) of an integral
    * column. Throws on empty input or k out of range. */
  def kthSmallest(df: DataFrame, valueCol: String, k: Long): Long = {
    val vals = df.select(col(valueCol).cast("long").as("v")).where(col("v").isNotNull)
    val head = vals.agg(min("v"), max("v"), count(lit(1))).head()
    require(head.getLong(2) > 0, "kthSmallest on empty input")
    require(k >= 1 && k <= head.getLong(2),
      s"k=$k out of range 1..${head.getLong(2)}")
    var lo = head.getLong(0)
    var hi = head.getLong(1)
    var rank = k // rank within the narrowed [lo, hi] range
    var passes = 0
    while (lo < hi) {
      passes += 1
      require(passes <= 8, s"range narrowing failed to converge: [$lo, $hi]")
      // power-of-two bucket widths + unsigned shifts: the span hi-lo is a
      // correct UNSIGNED 64-bit value even when it wraps Long (full-domain
      // inputs), and shiftrightunsigned keeps bucket indices right when
      // (v - lo) wraps too — no overflow anywhere in the narrowing
      val span = hi - lo // unsigned semantics
      val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(span)
      val s = math.max(0, bitLen - 10)
      val counts = vals.where(col("v") >= lo && col("v") <= hi)
        .groupBy(shiftrightunsigned(col("v") - lo, s).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      var bucket = -1L
      var i = 0
      while (i < counts.length && bucket < 0) {
        if (acc + counts(i)._2 >= rank) bucket = counts(i)._1
        else { acc += counts(i)._2; i += 1 }
      }
      rank -= acc
      val lastBucket = span >>> s
      lo = lo + (bucket << s)
      hi = if (bucket == lastBucket) hi else lo + (1L << s) - 1
    }
    lo
  }

  /** EXACT (lower-)median and median absolute deviation of an integral
    * column — the robust location/scale pair behind MAD outlier gates
    * (modified z-scores): unlike mean ± k·stddev, a handful of huge
    * values cannot drag the threshold, so the gate is the curation-grade
    * length/size filter. Both medians are exact multiset order statistics
    * via [[kthSmallest]] (k = (n+1)/2, the lower median — the
    * `quantile_disc`-replayable contract), and the deviations
    * |v − median| are integer arithmetic, so the pair (and any integer
    * gate built on it) is hash-exact against SQL.
    *
    * Cost: one count + two narrowing selections (2-3 passes each of one
    * 1024-row partial+final aggregate) — ~5-7 scans of one column,
    * nothing wide ever shuffles, driver state O(1024) longs. Nulls are
    * excluded (they have no order rank). */
  def medianAndMad(df: DataFrame, valueCol: String): (Long, Long) = {
    val vals = df.select(col(valueCol).cast("long").as("v")).where(col("v").isNotNull)
    val n = vals.count()
    require(n > 0, "medianAndMad on empty input")
    val med = kthSmallest(vals, "v", (n + 1) / 2)
    val dev = vals.select(abs(col("v") - med).as("d"))
    val mad = kthSmallest(dev, "d", (n + 1) / 2)
    (med, mad)
  }

  /** WEIGHTED k-th: the smallest value whose cumulative integer weight
    * reaches `kWeight` (weighted median at kWeight = (W+1)/2) — robust
    * aggregation over weighted rows (token counts, durations, bytes)
    * with the identical narrowing shape: each pass aggregates SUM(weight)
    * per bucket instead of COUNT. Weights must be non-negative; rows of
    * zero weight never decide the answer. */
  def weightedKth(df: DataFrame, valueCol: String, weightCol: String,
                  kWeight: Long): Long = {
    val vals = df.select(col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .where(col("v").isNotNull && col("w") > 0)
    val head = vals.agg(min("v"), max("v"), sum("w")).head()
    require(!head.isNullAt(2) && head.getLong(2) > 0, "weightedKth on empty/zero-weight input")
    require(kWeight >= 1 && kWeight <= head.getLong(2),
      s"kWeight=$kWeight out of range 1..${head.getLong(2)}")
    var lo = head.getLong(0)
    var hi = head.getLong(1)
    var rank = kWeight
    var passes = 0
    while (lo < hi) {
      passes += 1
      require(passes <= 8, s"range narrowing failed to converge: [$lo, $hi]")
      val span = hi - lo
      val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(span)
      val s = math.max(0, bitLen - 10)
      val sums = vals.where(col("v") >= lo && col("v") <= hi)
        .groupBy(shiftrightunsigned(col("v") - lo, s).as("b"))
        .agg(sum("w").as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      var bucket = -1L
      var i = 0
      while (i < sums.length && bucket < 0) {
        if (acc + sums(i)._2 >= rank) bucket = sums(i)._1
        else { acc += sums(i)._2; i += 1 }
      }
      rank -= acc
      val lastBucket = span >>> s
      lo = lo + (bucket << s)
      hi = if (bucket == lastBucket) hi else lo + (1L << s) - 1
    }
    lo
  }
}
