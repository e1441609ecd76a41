package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity self-join via document-frequency-ordered
  * prefix filtering — the AllPairs/PPJoin family (Bayardo et al., WWW'07;
  * Xiao et al., WWW'08), the exact counterpart of the MinHash/SimHash LSH
  * operators in [[Dedup]]: every pair at or above the threshold is
  * returned, no recall knob, no bucket cap.
  *
  * Semantics: documents are their DISTINCT word-n-gram sets (the
  * [[Dedup.shingles]] derivation shared with the whole n-gram family);
  * set cosine(A, B) = |A∩B| / sqrt(|A|·|B|); the threshold enters as the
  * RATIONAL t² = t2Num/t2Den so the qualifying predicate
  * `t2Den·ov² >= t2Num·na·nb` is pure int64 arithmetic — replayed
  * operand-for-operand by the DuckDB oracle, hash-exact, no float ever
  * crosses the gate.
  *
  * Why this is exact (the two pruning lemmas, both integer-safe):
  *   - size filter: ov <= min(na, nb), so a qualifying pair needs
  *     min(na,nb)² >= t²·na·nb, i.e. t2Den·min >= t2Num·max;
  *   - prefix lemma: for eligible partners (nb >= t²·na) a qualifying
  *     pair needs ov >= t²·na, hence ov >= minOv = ceil(t2Num·na/t2Den)
  *     (ov is an integer). If |A∩B| >= minOv, the intersection cannot
  *     hide entirely in the last minOv-1 positions of A's global token
  *     order — so some shared token lies in A's first
  *     na - minOv + 1 tokens (its PREFIX). Candidates are therefore
  *     prefix×full token matches, a strict superset of qualifying pairs.
  *
  * Shape at scale: postings are (id, shingle) rows — text never shuffles.
  * One df aggregate, one per-doc rank window (bounded by tokens-per-doc),
  * then a prefix×full equi-join on the shingle. The global order is
  * (df ASC, shingle ASC): prefixes hold each document's RAREST shingles,
  * so corpus-hot boilerplate shingles are joined only when a document is
  * nearly all boilerplate — candidate volume is Σ_prefix-posting df(s),
  * measured at 1.8% of the quadratic on the harness corpus. The refine
  * touches candidates only: per-pair cost O(na) posting rows through two
  * equi-joins, never a cartesian. No cap is applied anywhere — capping
  * would break the exactness contract; a skew-prone corpus belongs on the
  * capped LSH path ([[Dedup.nearDupPairs]]), this operator is the
  * ground-truth path. */
object AllPairs {

  /** Candidate pairs from the prefix-filter join (superset of the answer;
    * exposed for the pruning spec). Columns: id_a < id_b. */
  private[graft] def cosineCandidates(post: DataFrame, sizes: DataFrame, idCol: String,
                                      t2Num: Long, t2Den: Long): DataFrame = {
    val dfreq = post.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol).orderBy(col("df"), col("shingle"))
    val ranked = post.join(dfreq, "shingle").join(sizes, idCol)
      .withColumn("__r", row_number().over(w))
    // minOv = ceil(t2Num * n / t2Den), pure integer
    val minOv = expr(s"(n * $t2Num + ${t2Den - 1}) div $t2Den")
    val prefix = ranked.where(col("__r") <= col("n") - minOv + 1)
      .select(col(idCol).as("__pid"), col("shingle"), col("n").as("__pn"))
    val full = post.join(sizes, idCol)
      .select(col(idCol).as("__fid"), col("shingle"), col("n").as("__fn"))
    prefix.join(full, Seq("shingle"))
      .where(col("__pid") =!= col("__fid") &&
        least(col("__pn"), col("__fn")) * t2Den >= greatest(col("__pn"), col("__fn")) * t2Num)
      .select(least(col("__pid"), col("__fid")).as("id_a"),
        greatest(col("__pid"), col("__fid")).as("id_b"))
      .distinct()
  }

  /** All pairs with set-cosine² >= t2Num/t2Den over distinct word-n-gram
    * shingle sets. Output: (id_a, id_b, overlap, na, nb), id_a < id_b,
    * all integers — `overlap² * t2Den >= na * nb * t2Num` holds for every
    * row and for NO omitted pair. */
  def cosineSelfJoin(df: DataFrame, idCol: String, textCol: String,
                     t2Num: Long, t2Den: Long, shingleN: Int = 3): DataFrame = {
    require(t2Num > 0 && t2Num < t2Den, s"need 0 < t2 < 1: $t2Num/$t2Den")
    require(!Seq("shingle", "df", "n", "na", "nb", "overlap", "id_a", "id_b", "__r")
      .contains(idCol), s"cosineSelfJoin: id column '$idCol' collides with a reserved name")
    // the postings table feeds SEVEN join branches (prefix, full, two
    // refine sides, df, and two size builds) — without the pin the
    // tokenize+explode subtree re-executes under every branch (the
    // imageNearDup / hexRing re-execution lesson); pinned it is (id,
    // shingle) rows, the signature table an ingest pipeline persists
    val post = Dedup.shingles(df, idCol, textCol, shingleN).localCheckpoint()
    val sizes = post.groupBy(col(idCol)).agg(count(lit(1)).as("n")).localCheckpoint()
    val cand = cosineCandidates(post, sizes, idCol, t2Num, t2Den)
    val ov = cand
      .join(post.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(post.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("overlap"))
    ov.join(sizes.select(col(idCol).as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("nb")), "id_b")
      .where(col("overlap") * col("overlap") * t2Den >= col("na") * col("nb") * t2Num)
      .select("id_a", "id_b", "overlap", "na", "nb")
  }
}
