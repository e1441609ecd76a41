package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All variants are shuffle-frugal: exact dedup is one hash aggregation;
  * MinHash-LSH and SimHash shuffle only (id, signature) pairs — never
  * document bodies — and candidate verification joins back by id.
  *
  * Near-dup features are word n-grams (not character shingles): on corpora
  * drawn from a narrow vocabulary, character shingles of unrelated documents
  * overlap heavily, while word n-grams stay discriminative.
  */
object Dedup {

  /** Exact dedup: one row per distinct key set, keeping the smallest id.
    * A single partial+final hash aggregation. */
  def exactDedup(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Groups of exact duplicates (>= 2 members): (kept id, dup_count). */
  def exactDupGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    exactDedup(df, idCol, keyCols).where(col("dup_count") > 1)

  /** Word n-gram shingles of a text column, exploded to distinct
    * (id, shingle) rows. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol),
        filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0).as("__toks"))
      .select(col(idCol),
        explode(expr(
          s"transform(sequence(1, greatest(size(__toks) - ${n - 1}, 1)), i -> concat_ws(' ', slice(__toks, i, $n)))"))
          .as("shingle"))
      .distinct()

  /** MinHash signatures: numHashes independent hash functions realized as
    * xxhash64 salted by the hash index; one aggregation over the exploded
    * shingle rows. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, shingleN: Int = 3): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleN)
    val mins = (0 until numHashes).map(j => min(xxhash64(lit(j), col("shingle"))).as(s"mh$j"))
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; pairs are scored by signature agreement (estimated Jaccard).
    * Returns (id_a, id_b, est_jaccard) with a < b. */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
                           numHashes: Int = 32, bands: Int = 8,
                           shingleN: Int = 3, minEstJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, numHashes, shingleN)

    val sigCols = (0 until numHashes).map(j => col(s"mh$j"))
    val banded = sig.select(
      col(idCol),
      array(sigCols: _*).as("__sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh$j")): _*).as("bucket"))
      }: _*)).as("__bb"))
      .select(col(idCol), col("__sig"), col("__bb.band"), col("__bb.bucket"))

    val a = banded.select(col(idCol).as("id_a"), col("__sig").as("sig_a"), col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("__sig").as("sig_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))") /
          lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash over word-trigram features: per-bit weighted majority
    * vote, computed as 64 conditional sums in one aggregation. */
  def simhash(df: DataFrame, idCol: String, textCol: String, shingleN: Int = 3): DataFrame = {
    val features = shingles(df, idCol, textCol, shingleN)
      .withColumn("__h", xxhash64(col("shingle")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = features.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce[Column](_ bitwiseOR _)
    agg.select(col(idCol), sim.as("simhash"))
  }

  /** SimHash near-dup candidates: pairs within `maxHamming` bits, bucketed
    * by 16-bit bands so only same-band pairs are compared (hamming <= 3
    * implies at least one of 4 bands matches exactly). */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val sig = simhash(df, idCol, textCol)
    val banded = sig.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("bucket"))): _*)).as("__bb"))
      .select(col(idCol), col("simhash"), col("__bb.band"), col("__bb.bucket"))
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"), col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact word n-gram Jaccard for given candidate pairs (id_a, id_b). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   pairs: DataFrame, shingleN: Int = 3): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleN)
      .groupBy(col(idCol)).agg(collect_set(col("shingle")).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }
}
