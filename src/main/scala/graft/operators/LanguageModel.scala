package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * filter real LLM data pipelines run over every crawled document: train a
  * bigram model ON the corpus itself, score each document by its average
  * negative log-likelihood under that model, and surface the worst
  * (highest-perplexity) documents for exclusion.
  *
  * Model: add-one-smoothed bigram,
  * {{{
  *   P(w2 | w1) = (c(w1 w2) + 1) / (ctx(w1) + V)
  *   avg_nll(d) = -(1/|bigrams(d)|) * sum ln P over d's bigrams
  * }}}
  * where `c` is the corpus bigram count, `ctx(w1)` the count of bigram
  * occurrences starting with `w1`, and `V` the corpus vocabulary size.
  *
  * Distributed shape (the bm25 discipline, [[Retrieval.bm25TopK]]):
  *
  *  - bigrams are produced INSIDE the scan by an array transform over the
  *    token list (codegen'd, no UDF) and immediately partial-aggregated to
  *    per-doc (w1, w2, m) multiplicities — document text never shuffles,
  *    only bigram triples do;
  *  - corpus counts `c` and `ctx` are second-level aggregates of the SAME
  *    per-doc table (sums of longs — exact), joined back by shuffled
  *    equi-joins on their keys; at 100 TB a production deployment
  *    materializes both count tables once per corpus snapshot exactly like
  *    bm25's df/idf stats, and scoring batches reuse them;
  *  - `V` is one tiny distinct-count job (a driver scalar, corpus-snapshot
  *    metadata);
  *  - per-doc contributions are folded in SORTED (w1, w2) ORDER via
  *    sort_array(collect_list(struct)) -> aggregate, so the float sum is
  *    bit-reproducible under any partitioning and the SQL oracle replays
  *    the identical addition order;
  *  - the output contract is RANK-ONLY (rank, doc_id, n_bigrams): ranks
  *    are stable under sub-ulp cross-engine ln divergence because adjacent
  *    ranks either differ by far more than accumulated ulp noise or tie
  *    exactly on identical integer inputs, where the doc_id tiebreak
  *    decides (LanguageModelSpec pins the margin precondition).
  */
object LanguageModel {

  /** Whitespace tokens, lowercased, empties dropped — mirrored exactly by
    * the oracle's string_split_regex(lower(text), '\s+'). */
  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** The k WORST documents by add-one bigram avg negative log-likelihood
    * under a model trained on `docs` itself. Returns (rank, doc_id,
    * n_bigrams); documents with fewer than 2 tokens are unscorable and
    * never rank. */
  def perplexityWorstK(docs: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))

    // vocabulary size: one tiny distinct-count job (corpus-snapshot
    // metadata, computed once and reused across scoring batches)
    val v = base.select(explode(col("toks")).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0)

    // per-doc bigram multiplicities: the array transform runs inside the
    // scan stage; only (doc_id, w1, w2, m) rows ever shuffle. MATERIALIZED
    // (the signature-table discipline) so training the counts and scoring
    // the docs pay ONE corpus scan + tokenization between them, not three
    // (plus the separate tiny V distinct-count scan above — vocabulary
    // includes single-token docs' words, which never form a bigram).
    val docbg = base
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(
        transform(slice(col("toks"), lit(1), size(col("toks")) - 1),
          (t, i) => struct(t.as("w1"), element_at(col("toks"), i + 2).as("w2"))))
        .as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
      .localCheckpoint()

    // corpus model: exact long sums of the per-doc table; ctx folds over
    // cnt (one fewer aggregation pass — same exact sums)
    val cnt = docbg.groupBy("w1", "w2").agg(sum("m").as("cb"))
    val ctx = cnt.groupBy("w1").agg(sum("cb").as("cc"))

    val contrib = docbg
      .join(cnt, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .withColumn("c", col("m").cast("double") *
        log((col("cb") + 1L).cast("double") / (col("cc") + lit(v)).cast("double")))

    val scored = contrib
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("w1"), col("w2"), col("c")))).as("cs"),
        sum("m").as("n_bigrams"))
      .withColumn("avg_nll",
        -aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("c")) /
          col("n_bigrams").cast("double"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("avg_nll").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("n_bigrams"))
  }
}
