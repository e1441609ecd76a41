package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Mergeable cardinality/frequency sketches — HyperLogLog, K-Minimum-Values
  * and Count-Min — built on the portable 31-bit hash family so every sketch
  * is REPLAYABLE IN ANSI SQL and the driver's DuckDB oracle can verify the
  * register/counter contents bit-for-bit (the same property the SimHash
  * pipeline relies on; see [[Dedup.portableHash]]).
  *
  * Why sketches at 100 TB: `count(DISTINCT x)` over a trillion rows shuffles
  * every distinct value; a sketch reduces each map task's partition to a
  * CONSTANT-size summary (256 registers / k hashes / d*w counters) that
  * merges associatively, so the exchange carries kilobytes per task no
  * matter the input size. All three sketches here are exposed both as
  * compositional DataFrame aggregations (partial+final hash aggregate,
  * whole-stage codegen) and — for HLL — as a typed [[Aggregator]] whose
  * merge is the elementwise register max, pinned equal to the compositional
  * path by SketchesSpec.
  *
  * Determinism contract: the only randomness is the fixed hash family
  * ([[Dedup.portableHashOf]], [[Dedup.gCoeffs]]); identical input yields
  * identical registers on every run, engine and oracle alike. Outputs
  * surfaced to oracled queries are INTEGERS (register harmonics, zero
  * counts, k-th minima, counter minima); the floating-point estimates
  * derived from them are single exact-integer divisions (deterministic in
  * IEEE doubles) and their accuracy is pinned by spec, not by oracle.
  */
object Sketches {

  import Dedup.{HashP, gCoeffs, portableHash}

  // --- hash finalizer ------------------------------------------------------

  /** Two rounds of square-then-affine over the portable hash. The raw
    * polynomial fold clusters same-length strings with a shared prefix into
    * narrow bands of the hash range — harmless for equality-style uses
    * (SimHash bits, banding, CMS column addressing all remix through the
    * affine family), FATAL for the tail statistics HLL ranks and KMV minima
    * read. Squaring mod P is nonlinear (an affine step alone maps a band to
    * a lattice, which still biases HLL ~30% high); two rounds with distinct
    * coefficients bring worst-case relative error across adversarial
    * same-prefix corpora to ~0.10 (HLL, m=256) / ~0.20 (KMV, k=128) —
    * within each sketch's nominal sigma band (SketchesSpec pins it).
    * Every operand stays < 2^62, and the identical integer arithmetic is
    * emitted for the DuckDB oracle by [[finalizeSqlOf]]. */
  private val FinA1 = gCoeffs(17)._1
  private val FinB1 = gCoeffs(17)._2
  private val FinA2 = gCoeffs(29)._1
  private val FinB2 = gCoeffs(29)._2

  def finalizeHash(h: Column): Column = {
    val g = (lit(FinA1) * ((h * h) % HashP) + lit(FinB1)) % HashP
    (lit(FinA2) * ((g * g) % HashP) + lit(FinB2)) % HashP
  }

  /** Scalar twin of [[finalizeHash]] (typed-aggregator path + specs). */
  private[graft] def finalizeHashOf(h: Long): Long = {
    val g = (FinA1 * ((h * h) % HashP) + FinB1) % HashP
    (FinA2 * ((g * g) % HashP) + FinB2) % HashP
  }

  /** The same two rounds as a SQL string over expression `e` — the oracle
    * derives its finalizer from here, so the arithmetic exists once. */
  private[graft] def finalizeSqlOf(e: String): String = {
    val g = s"(($FinA1 * ((($e) * ($e)) % $HashP) + $FinB1) % $HashP)"
    s"(($FinA2 * (($g * $g) % $HashP) + $FinB2) % $HashP)"
  }

  // --- HyperLogLog ---------------------------------------------------------

  /** Register count m = 2^P_BITS. 256 registers -> ~6.5% standard error. */
  val HllBuckets = 256
  /** Width of the rank field: the 31-bit hash minus the 8 bucket bits. */
  val HllRankBits = 23

  /** alpha_m * m^2 for m = 256 (Flajolet et al. 2007, Fig. 3 constants). */
  private val HllAlphaM2 = 0.7213 / (1.0 + 1.079 / HllBuckets) * HllBuckets * HllBuckets

  /** (bucket, rank) of one hashed value: bucket = h mod 256 (low 8 bits of
    * the mod-P polynomial hash), rank = 1 + leading zeros of the remaining
    * 23-bit word (24 when the word is 0). `length(bin(w))` is the exact
    * bit-length of w — the identical expression exists in DuckDB, which is
    * why rank is derived this way instead of via floating log2. */
  private def bucketCol(h: Column): Column = pmod(h, lit(HllBuckets.toLong))
  private def rankCol(h: Column): Column = {
    val w = (h / HllBuckets).cast("long") // floor div: h in [0, 2^31), w in [0, 2^23)
    when(w === 0, lit(HllRankBits + 1)).otherwise(lit(HllRankBits + 1) - length(bin(w)))
  }

  /** Per-group HLL registers: one row per (group, bucket) with the max rank
    * observed in that bucket. Two chained hash aggregates (distinct hashes
    * are NOT materialized — max(rank) absorbs duplicates map-side). */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = finalizeHash(portableHash(col(valueCol).cast("string")))
    df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ bucketCol(h).as("bucket") :+ rankCol(h).as("rank"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rank").as("register"))
  }

  /** Exact-integer HLL summary per group:
    *   - `hll_zeros`   V = number of untouched registers,
    *   - `hll_harmonic` S = sum over all 256 buckets of 2^(24 - M_j)
    *     (M_j = 0 for untouched buckets), so sum(2^-M_j) = S / 2^24 EXACTLY
    *     — every term is an integer <= 2^24 and the total <= 2^32, hence no
    *     floating rounding and no ordering sensitivity.
    * Both columns are integers, which is what makes the DuckDB oracle a
    * hash-exact gate rather than a tolerance check. */
  def hllStats(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    hllStatsOfRegisters(hllRegisters(df, groupCols, valueCol), groupCols)

  /** The (zeros, harmonic) summary from an existing register table — the
    * maintenance entry point: registers from different batches/days MERGE
    * by (group, bucket) max and summarize here, so a standing sketch table
    * is updated in O(batch) without rescanning history. */
  def hllStatsOfRegisters(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val maxPow = 1L << (HllRankBits + 1) // 2^24, the term of an empty bucket
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        (lit(HllBuckets) - count(lit(1))).as("hll_zeros"),
        // pow is exact for integer results <= 2^24, so the cast is lossless
        (sum(pow(lit(2.0), lit(HllRankBits + 1) - col("register")).cast("long"))
          + (lit(HllBuckets) - count(lit(1))) * maxPow).as("hll_harmonic"))
  }

  /** The HLL cardinality estimate from the exact integer summary: raw
    * estimate alpha*m^2*2^24/S, replaced by linear counting m*ln(m/V) in
    * the small range (raw <= 2.5m and V > 0). Accuracy pinned by spec. */
  def hllEstimate(zeros: Column, harmonic: Column): Column = {
    val raw = lit(HllAlphaM2 * (1L << (HllRankBits + 1)).toDouble) / harmonic.cast("double")
    when(zeros > 0 && raw <= 2.5 * HllBuckets,
      lit(HllBuckets.toDouble) * log(lit(HllBuckets.toDouble) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** Split a packed [[HllAggregator]] result back into (zeros, harmonic). */
  def unpackHll(packed: Long): (Long, Long) = (packed >>> 33, packed & ((1L << 33) - 1))

  /** Typed single-pass HLL aggregator over RAW portable hashes (it applies
    * [[finalizeHashOf]] itself): the buffer IS the register array and merge
    * is the elementwise max — the canonical mergeable-sketch shape (what a
    * 1000-executor partial aggregation exchanges). finish() returns the
    * same (zeros, harmonic) integers as [[hllStats]], packed into one long
    * (zeros:9 bits << 33 | harmonic:33 bits — harmonic <= 256*2^24 = 2^32)
    * so the output encoder stays primitive (a struct output under a binary
    * buffer trips Spark's typed-aggregate null-branch naming); unpack with
    * [[unpackHll]]. SketchesSpec pins the two paths equal. */
  class HllAggregator extends Aggregator[Long, Array[Byte], Long] {
    def zero: Array[Byte] = new Array[Byte](HllBuckets)
    def reduce(regs: Array[Byte], rawHash: Long): Array[Byte] = {
      val h = finalizeHashOf(rawHash)
      val bucket = (h % HllBuckets).toInt
      val w = h / HllBuckets
      val rank = if (w == 0) HllRankBits + 1 else HllRankBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > regs(bucket)) regs(bucket) = rank.toByte
      regs
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < HllBuckets) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(regs: Array[Byte]): Long = {
      var zeros = 0L
      var harmonic = 0L
      var i = 0
      while (i < HllBuckets) {
        if (regs(i) == 0) zeros += 1
        harmonic += 1L << (HllRankBits + 1 - regs(i))
        i += 1
      }
      (zeros << 33) | harmonic
    }
    def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
    def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
  }

  // --- K-Minimum-Values ----------------------------------------------------

  /** Per-group KMV sketch: the k smallest DISTINCT hashes of the value
    * column. distinct() is a partial+final aggregate on (group, h); the
    * k-min cut is a rank-1..k window (WindowGroupLimit pushes the limit
    * below the exchange, so each task forwards at most k rows per group). */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame = {
    val h = finalizeHash(portableHash(col(valueCol).cast("string"))).as("h")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ h: _*)
      .distinct()
      .withColumn("__rnk", row_number().over(w))
      .where(col("__rnk") <= k)
      .drop("__rnk")
  }

  /** Exact-integer KMV summary: number of hashes kept (min(k, distinct))
    * and the k-th minimum. Estimate when full: (k-1) * P / kth_min. */
  def kmvStats(sketch: DataFrame, groupCols: Seq[String]): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("kmv_filled"), max("h").as("kth_min"))

  /** Pairwise overlap of per-group KMV sketches, the mergeable-set-
    * intersection estimator: for each group pair take the k smallest of the
    * UNION of the two sketches, count how many of those hashes appear in
    * BOTH — matches/k estimates the Jaccard of the underlying sets.
    *
    * `pairs` is a (ga, gb) DataFrame naming the group pairs to score. The
    * sketch table is tiny BY CONSTRUCTION (k rows per group, whatever the
    * corpus size), so the pair expansion is a broadcast of a bounded table
    * — this is the whole point of sketch-then-compare at 100 TB.
    * Outputs integers only: (ga, gb, union_filled, matches). */
  def kmvOverlap(sketch: DataFrame, groupCol: String, pairs: DataFrame,
                 k: Int): DataFrame = {
    val joined = sketch.join(
      broadcast(pairs),
      col(groupCol) === pairs("ga") || col(groupCol) === pairs("gb"))
    val perHash = joined.groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(when(col(groupCol) === col("ga"), 1).otherwise(0)).as("in_a"),
           max(when(col(groupCol) === col("gb"), 1).otherwise(0)).as("in_b"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    perHash.withColumn("__rnk", row_number().over(w))
      .where(col("__rnk") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("union_filled"),
           sum(col("in_a") * col("in_b")).as("matches"))
  }

  // --- Count-Min -----------------------------------------------------------

  /** Count-Min counter table over the value column: `depth` independent
    * rows of `width` counters, row i addressed by g_i(h) mod width with the
    * shared affine family [[Dedup.gCoeffs]]. No [[finalizeHash]] here: CMS
    * needs only pairwise-independent COLUMN addressing, which the affine
    * remix already provides — it reads no tail statistics. The depth-way
    * explode happens BEFORE the partial aggregate, so each task exchanges
    * at most depth*width counter rows regardless of input size. */
  def cmsCounters(df: DataFrame, valueCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val h = portableHash(col(valueCol).cast("string"))
    val rows = (0 until depth).map { i =>
      val (a, b) = gCoeffs(i)
      struct(lit(i).as("row"), pmod((lit(a) * h + lit(b)) % HashP, lit(width.toLong)).as("col"))
    }
    df.where(col(valueCol).isNotNull)
      .select(explode(array(rows: _*)).as("rc"))
      .select(col("rc.row").as("row"), col("rc.col").as("col"))
      .groupBy("row", "col")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each probe value: est = min over the depth
    * rows of the addressed counters. Counters are depth*width rows (a
    * constant), so the probe join broadcasts the SKETCH — never the data. */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, valueCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val h = portableHash(col(valueCol).cast("string"))
    val rows = (0 until depth).map { i =>
      val (a, b) = gCoeffs(i)
      struct(lit(i).as("row"), pmod((lit(a) * h + lit(b)) % HashP, lit(width.toLong)).as("col"))
    }
    probes.select(col(valueCol), explode(array(rows: _*)).as("rc"))
      .join(broadcast(counters),
        col("rc.row") === counters("row") && col("rc.col") === counters("col"))
      .groupBy(col(valueCol))
      .agg(min("cnt").as("est_count"))
  }
}
