package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter semi-join pruning — the standard 100-TB trick for a
  * selective join: before any join machinery touches the big side, filter
  * it map-side with a fixed-size bitset summarizing the key side.
  *
  * Why it matters at scale: a broadcast hash join needs the whole key set
  * as a hash table on every executor (~50+ bytes/key); a shuffle join
  * moves the entire big side. A Bloom filter needs ~10 BITS per key at 1%
  * false positives, so a 10^8-key build side compresses to ~125 MB — small
  * enough to ship — and the big side's shuffle (or final exact join) then
  * only sees `true_matches + fp_rate * rows` survivors. This is the same
  * shape as Spark's own runtime row-level filtering (InjectRuntimeFilter),
  * reimplemented portably so ANY operator in this engine can prune with it
  * (the filter is a plain deterministic function of the key set, usable in
  * specs and oracles).
  *
  * Determinism: hashing is splitmix64 double-hashing — a pure function of
  * the key, independent of partitioning or row order, so the pruned set is
  * reproducible run-to-run (bit-for-bit identical bitsets).
  *
  * Exactness: [[prunedSemiJoin]] follows the probabilistic prune with an
  * exact semi-join over the survivors, so its RESULT is exactly the plain
  * semi join (false positives are dropped); only the COST depends on the
  * fp rate. That makes it oracle-checkable by `WHERE key IN (SELECT ...)`.
  */
object BloomJoin {

  /** splitmix64 finalizer: a full-avalanche 64-bit mixer (public constant
    * set from the reference splitmix64 stream). */
  private[graft] def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Set the key's `nHashes` bits in `bits` (double hashing: the i-th
    * probe is `h1 + i*h2` over the bit space, h2 forced odd). */
  private[graft] def add(bits: Array[Long], nHashes: Int, key: Long): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < nHashes) {
      val b = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
      bits((b >>> 6).toInt) |= (1L << (b & 63L))
      i += 1
    }
  }

  /** True iff every probe bit is set (never a false negative). Static so
    * the codegen'd expression inlines one call, like the s2 kernels. */
  def mightContain(bits: Array[Long], nHashes: Int, key: Long): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < nHashes) {
      val b = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
      if ((bits((b >>> 6).toInt) & (1L << (b & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Distributed Bloom build: fixed-size mergeable state (one long array),
    * so Spark partial-aggregates map-side and the shuffle carries one
    * bitset per partition — never the keys themselves. */
  final class BloomAgg(nBits: Int, nHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(nBits >= 64 && (nBits & 63) == 0, s"nBits must be a positive multiple of 64: $nBits")
    require(nHashes >= 1 && nHashes <= 16, s"nHashes out of range: $nHashes")
    def zero: Array[Long] = new Array[Long](nBits / 64)
    def reduce(b: Array[Long], key: Long): Array[Long] = { add(b, nHashes, key); b }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Integral column types whose values embed losslessly in a long — the
    * key types the Bloom prune supports. A silent `cast("long")` on
    * anything else (strings, wide decimals) would null the key and DROP
    * the row from the prune, breaking the exact-result contract, so
    * non-integral keys are rejected loudly instead. */
  private def requireIntegralKey(df: DataFrame, keyCol: String, side: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(keyCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
      s"BloomJoin: $side key '$keyCol' must be an integral type (hash the key to a " +
        s"long upstream, e.g. xxhash64, for other types); got $dt")
  }

  /** Build the filter over `keys(keyCol)` (an integral column; null keys,
    * which never equi-join, are skipped). One aggregation job whose result
    * is a single `nBits/8`-byte row — the same driver-sized exchange
    * Spark's runtime-filter subqueries make. */
  def buildBloom(keys: DataFrame, keyCol: String, nBits: Int = 1 << 20,
                 nHashes: Int = 5): Array[Long] = {
    import keys.sparkSession.implicits._
    requireIntegralKey(keys, keyCol, "build")
    val agg = udaf(new BloomAgg(nBits, nHashes), Encoders.scalaLong)
    keys.select(col(keyCol).cast("long")).na.drop()
      .agg(agg(col(keyCol)).as("bits"))
      .as[Array[Long]].head()
  }

  /** `bloom_might_contain(key)` over a driver-built bitset. The bitset
    * rides along as a referenced object (exactly how Spark's own
    * BloomFilterMightContain ships its filter), so the probe inlines into
    * whole-stage codegen over the scan — zero exchanges, zero row
    * multiplication on the big side. */
  case class BloomMightContain(bits: Array[Long], nHashes: Int, child: Expression)
      extends UnaryExpression with Serializable {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs a long key, got ${child.dataType}")
    override protected def nullSafeEval(key: Any): Any =
      mightContain(bits, nHashes, key.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
      nullSafeCodeGen(ctx, ev, key =>
        s"${ev.value} = graft.operators.BloomJoin.mightContain($bitsRef, $nHashes, $key);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
    override def prettyName: String = "bloom_might_contain"
  }

  def mightContainCol(bits: Array[Long], nHashes: Int, key: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BloomMightContain(bits, nHashes, ColumnBridge.expression(key)))
  }

  /** PER-FILE Bloom skipping index — data-skipping for point lookups,
    * the storage-side dual of [[prunedSemiJoin]]: the table is written
    * hash-routed on the key (each key lives in exactly ONE data file),
    * and one extra pass builds a small Bloom bitset PER FILE, stored as
    * its own tiny table. A later point lookup reads the index (one row
    * per file), keeps only files whose bitset might contain a probe key,
    * and scans just those — at 100 TB that is the difference between
    * "open 100k files" and "open the 1 + fp·100k files that can match",
    * the same file-stats skipping Iceberg/Delta bloom columns buy,
    * expressed over plain parquet. The result is EXACT: false positives
    * only add files, and the final `isin` filter drops their rows.
    *
    * Layout under `dir`: `data/` (the hash-routed table, `nFiles`
    * files) and `index/` (file path, n_hashes, bits). The index pass
    * re-reads the data ONCE grouped by `input_file_name()` — its
    * exchange carries one bitset per file, never keys. */
  def writeIndexed(df: DataFrame, keyCol: String, dir: String, nFiles: Int,
                   nBits: Int = 1 << 17, nHashes: Int = 5): Unit = {
    import df.sparkSession.implicits._
    requireIntegralKey(df, keyCol, "index")
    require(nFiles >= 1, s"nFiles must be >= 1: $nFiles")
    df.repartition(nFiles, col(keyCol)).write.mode("overwrite").parquet(s"$dir/data")
    val data = df.sparkSession.read.parquet(s"$dir/data")
    val agg = udaf(new BloomAgg(nBits, nHashes), Encoders.scalaLong)
    data.select(input_file_name().as("file"), col(keyCol).cast("long").as("__k"))
      .groupBy("file").agg(agg(col("__k")).as("bits"))
      .withColumn("n_hashes", lit(nHashes))
      .write.mode("overwrite").parquet(s"$dir/index")
  }

  /** The data files of `dir` that might contain ANY of `keys` — the
    * skipping decision, exposed so specs and monitors can pin how many
    * files a probe set actually touches. Driver state: one (path,
    * bitset) row per file, the same driver-sized object every
    * file-pruning planner holds. */
  def matchedFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
                   keys: Seq[Long]): Seq[String] = {
    require(keys.nonEmpty, "matchedFiles needs at least one probe key")
    import spark.implicits._
    spark.read.parquet(s"$dir/index")
      .select(col("file"), col("n_hashes"), col("bits"))
      .as[(String, Int, Array[Long])].collect()
      .collect { case (f, h, b) if keys.exists(mightContain(b, h, _)) => f }
      .toSeq
  }

  /** Exact point lookup through the index: scan only the matched files,
    * then the exact `isin` filter (Bloom false positives contribute
    * files, never rows). Empty match -> empty result with the data
    * schema, zero data files opened. */
  def lookupIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
                    keyCol: String, keys: Seq[Long]): DataFrame = {
    val files = matchedFiles(spark, dir, keys)
    val all = spark.read.parquet(s"$dir/data")
    if (files.isEmpty) all.limit(0)
    else spark.read.schema(all.schema).parquet(files: _*)
      .where(col(keyCol).isin(keys: _*))
  }

  /** Exact semi join of `big` against `keys(keyCol)`, Bloom-pruned first.
    *
    * Plan shape: scan(big) -> codegen'd bitset probe (no exchange) ->
    * exact LEFT SEMI against the deduped key set. With `broadcastExact`
    * (the default; right for key sides that fit an executor hash table)
    * the exact pass is a BroadcastHashJoin, so the big side is NEVER
    * shuffled at all. With it off, the exact pass shuffles only the
    * pruned survivors — the 100-TB case where even that is too big to
    * broadcast still moves `matches + fp` rows, not the input.
    */
  def prunedSemiJoin(big: DataFrame, keys: DataFrame, bigKeyCol: String, keyCol: String,
                     nBits: Int = 1 << 20, nHashes: Int = 5,
                     broadcastExact: Boolean = true): DataFrame = {
    requireIntegralKey(big, bigKeyCol, "probe")
    val bloom = buildBloom(keys, keyCol, nBits, nHashes)
    val pruned = big.where(mightContainCol(bloom, nHashes, col(bigKeyCol).cast("long")))
    // keys is scanned once for the bloom and once here — inherent to the
    // pattern (Spark's own runtime filters do the same); the semi join
    // dedups keys inside its hash relation, no explicit distinct needed
    val keySet = keys.select(col(keyCol))
    val exactRight = if (broadcastExact) broadcast(keySet) else keySet
    pruned.join(exactRight, pruned(bigKeyCol) === exactRight(keyCol), "left_semi")
  }
}
