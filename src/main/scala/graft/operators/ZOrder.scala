package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic two-attribute Z-ORDER clustering — the lakehouse layout trick
  * (Delta/Iceberg `ZORDER BY`) the engine's S2/geohash layouts apply to
  * coordinates, generalized to ARBITRARY numeric columns: interleave the
  * bits of two quantized attributes into a Morton code, hive-partition by
  * its coarse prefix and sort files by the full code, and a conjunctive
  * range predicate on EITHER OR BOTH attributes prunes whole directories
  * + parquet row groups — one layout serving two filter columns, where
  * sorting by (a, b) would serve only `a`.
  *
  * Key property used by the pruner: a PREFIX of an interleaved code is
  * exactly an axis-aligned RECTANGLE in quantized (x, y) space (take the
  * prefix bits back apart; each axis gets its high bits, the low bits
  * free), so "which coarse partitions can contain matches" is a
  * driver-side intersection test over 2^coarseBits rectangles — no data
  * read, no index structure, O(64) work for the default 6-bit prefix.
  *
  * Quantization clamps out-of-range values into the edge cells with the
  * SAME function on the write and prune sides, so pruning never loses a
  * row regardless of the configured [min,max); the reader applies no
  * residual predicate itself — callers keep their exact filter on top
  * (the layout accelerates, never answers). */
object ZOrder {

  /** One z-ordered attribute: column name + the fixed quantization range
    * (plan-time constants, like a coverer level — pick generously; values
    * outside clamp to edge cells and stay correct). */
  final case class Dim(name: String, min: Double, max: Double) {
    require(max > min, s"empty quantization range for $name: [$min, $max]")
  }

  private def quantize(c: Column, d: Dim, bits: Int): Column = {
    val n = (1L << bits).toDouble
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c.cast("double") - d.min) / (d.max - d.min) * n).cast("long")))
  }

  /** Morton-interleave two `bits`-wide quantized values; x takes the odd
    * (higher) bit positions. Pure builtin shifts/masks — codegen'd. */
  private def interleave(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Write `df` z-ordered by (x, y): hive-partitioned on the
    * `coarseBits`-bit Morton prefix (`z_prefix`), rows sorted within files
    * by the full code (`__z` kept as a stats column for row-group
    * pruning, the `__leaf_ord` pattern of Tiling.clusteredWrite). */
  def zorderWrite(df: DataFrame, x: Dim, y: Dim, bits: Int, coarseBits: Int,
                  outDir: String): Unit = {
    require(bits >= 1 && bits <= 30, s"bits out of range: $bits")
    require(coarseBits >= 1 && coarseBits <= math.min(2 * bits, 16),
      s"coarseBits out of range: $coarseBits (2*bits=${2 * bits})")
    val z = interleave(quantize(col(x.name), x, bits), quantize(col(y.name), y, bits), bits)
    df.withColumn("__z", z)
      .withColumn("z_prefix", shiftright(col("__z"), 2 * bits - coarseBits))
      .repartition(col("z_prefix"))
      .sortWithinPartitions("z_prefix", "__z")
      .write.mode("overwrite")
      .partitionBy("z_prefix")
      .parquet(outDir)
  }

  /** The coarse prefixes whose rectangle intersects the quantized query
    * box — the driver-side prune set (2^coarseBits candidates tested). */
  private[graft] def prefixesForBox(x: Dim, y: Dim, bits: Int, coarseBits: Int,
                                    xLo: Double, xHi: Double,
                                    yLo: Double, yHi: Double): Seq[Long] = {
    def q(v: Double, d: Dim): Long = {
      val n = (1L << bits).toDouble
      math.min((1L << bits) - 1, math.max(0L,
        math.floor((v - d.min) / (d.max - d.min) * n).toLong))
    }
    val (qxLo, qxHi, qyLo, qyHi) = (q(xLo, x), q(xHi, x), q(yLo, y), q(yHi, y))
    (0L until (1L << coarseBits)).filter { p =>
      // de-interleave the prefix: walk its bits from the z MSB down; odd
      // global positions are x bits, even are y bits
      var (xh, yh, kx, ky) = (0L, 0L, 0, 0)
      for (j <- 0 until coarseBits) {
        val globalPos = 2 * bits - 1 - j
        val bit = (p >> (coarseBits - 1 - j)) & 1L
        if (globalPos % 2 == 1) { xh = (xh << 1) | bit; kx += 1 }
        else { yh = (yh << 1) | bit; ky += 1 }
      }
      val (cxLo, cxHi) = (xh << (bits - kx), ((xh + 1L) << (bits - kx)) - 1L)
      val (cyLo, cyHi) = (yh << (bits - ky), ((yh + 1L) << (bits - ky)) - 1L)
      cxLo <= qxHi && qxLo <= cxHi && cyLo <= qyHi && qyLo <= cyHi
    }
  }

  /** Partition-pruned read for a conjunctive box predicate: only the
    * directories whose prefix rectangle intersects the box are listed.
    * Callers apply their exact filter on top. */
  def readForBox(spark: SparkSession, dir: String, x: Dim, y: Dim,
                 bits: Int, coarseBits: Int,
                 xLo: Double, xHi: Double, yLo: Double, yHi: Double): DataFrame = {
    val keep = prefixesForBox(x, y, bits, coarseBits, xLo, xHi, yLo, yHi)
    spark.read.parquet(dir).where(col("z_prefix").isin(keep: _*))
  }
}
