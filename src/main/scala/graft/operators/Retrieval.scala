package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text retrieval: BM25 top-k document ranking for a fixed query set.
  *
  * The classic Okapi BM25 score,
  * {{{
  *   score(q, d) = sum over t in q of
  *     ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) *
  *     tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * dl_d / avgdl))
  * }}}
  * shaped for scale the way an inverted index would be:
  *
  *  - tokens are filtered to the query vocabulary INSIDE the scan (an
  *    array-level filter before the explode, codegen'd) — at 100 TB only
  *    rows containing query terms emit anything into the shuffle, and only
  *    (id, dl, term) triples ever move, never text;
  *  - tf is one partial-aggregated groupBy; df and the corpus stats (N,
  *    sum dl) are tiny aggregates of that and of the per-row lengths;
  *  - per-term contributions are summed in SORTED TERM ORDER via an ordered
  *    array fold (sort_array(collect_list(struct(term, c))) -> aggregate),
  *    so the floating score is bit-reproducible under any partitioning and
  *    a SQL oracle replays the identical addition order (the IDW
  *    discipline, SpatialJoin.idwInterpolate);
  *  - output is rank-contract only (query_id, rank, doc_id) — ranks are
  *    stable under sub-ulp cross-engine ln/division divergence because the
  *    fixture's adjacent-rank score gaps dwarf 1 ulp unless the tied docs'
  *    integer inputs (tf vector, dl) are identical, in which case both
  *    engines tie exactly and the doc_id tiebreak decides (RetrievalSpec
  *    pins that margin precondition, the q_knn discipline).
  *
  * The per-query top-k is a rank window over only the docs that matched at
  * least one query term — the candidate set an inverted index would
  * produce, typically orders of magnitude under |corpus|.
  */
object Retrieval {

  /** Whitespace tokens, lowercased, empties dropped — mirrored exactly by
    * the oracle's string_split_regex(lower(text), '\s+'). */
  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** BM25 top-k per query. `queries`: (query_id, terms); terms are matched
    * as whole lowercase tokens. Returns (query_id, rank, doc_id). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && k > 0)
    val spark = docs.sparkSession
    import spark.implicits._

    val vocab = queries.flatMap(_._2).map(_.toLowerCase).distinct.sorted
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))

    // corpus stats: one tiny aggregate (production computes these once per
    // corpus snapshot and reuses them across query batches)
    val statsRow = base.agg(count(lit(1)).as("n"), sum("dl").as("sumdl")).head()
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / nDocs

    // inverted-index postings restricted to the query vocabulary: the
    // array filter runs inside the scan stage, so non-matching tokens
    // never explode and non-matching docs emit zero rows
    val vocabCol = array(vocab.map(lit): _*)
    val tf = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("toks"), t => array_contains(vocabCol, t))).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

    // document frequencies: |vocab| rows, collected driver-side (bounded
    // by the query set, not the corpus) and folded into per-term idf
    // literal constants so the contribution is a single codegen'd
    // expression over the tf rows
    val dfMap = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf = vocab.map { t =>
      val df = dfMap.getOrElse(t, 0L).toDouble
      t -> math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    }.toMap

    val idfCol = vocab.foldRight(lit(0.0)) { (t, rest) =>
      when(col("term") === t, lit(idf(t))).otherwise(rest)
    }
    val contrib = tf.withColumn("c",
      idfCol * (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))))

    // fan contributions out to the queries that contain the term (tiny
    // broadcast), then fold each (query, doc) in sorted-term order
    val qTerms = queries.flatMap { case (qid, ts) => ts.map(_.toLowerCase).distinct.map(qid -> _) }
      .toDF("query_id", "term")
    val scored = contrib.join(broadcast(qTerms), "term")
      .groupBy("query_id", "doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("c")))).as("cs"))
      .withColumn("score",
        aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("c")))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }
}
