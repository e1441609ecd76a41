package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the fastText-shaped
  * quality/domain/language classifier real LLM pipelines score every
  * crawled document with, in its exactly-reproducible counts-based form
  * (closed-form training: no SGD, no iteration order, nothing
  * nondeterministic).
  *
  * Add-one-smoothed class score for document d:
  * {{{
  *   score(c, d) = ln n_c + sum_t m_t * ln (cnt(c,t) + 1)
  *               - len_d * ln (tot_c + V)
  * }}}
  * (the constant -ln N is dropped — it never moves an argmax). Because
  * `ln(0 + 1) = 0`, absent (class, token) pairs contribute nothing to the
  * middle sum, so the sparse count join IS the exact dense model.
  *
  * Distributed shape (the bm25/perplexity discipline):
  *  - per-doc token multiplicities and per-class token counts are two
  *    partial-aggregated groupBys of the tokenized scan — text never
  *    shuffles, only (token, count) shaped rows;
  *  - scoring joins doc tokens to class counts by a shuffled equi-join on
  *    token (the count table is corpus-snapshot state a production
  *    deployment materializes once, like bm25's df/idf);
  *  - the per-(doc, class) sum folds in SORTED TOKEN ORDER so the float is
  *    bit-reproducible and the SQL oracle replays the identical addition
  *    order;
  *  - the (doc x class) frame is the doc table fanned out by the TINY
  *    class list (broadcast, |classes| rows), so classes sharing no token
  *    with a document still score (fold coalesced to 0);
  *  - output is ARGMAX-ONLY (doc_id, pred): stable under sub-ulp
  *    cross-engine ln divergence because per-doc class margins dwarf ulp
  *    noise (NaiveBayesSpec pins the precondition over the sf0.01 gate
  *    population).
  */
object NaiveBayes {

  /** Whitespace tokens, lowercased, empties dropped — mirrored exactly by
    * the oracle's string_split_regex(lower(text), '\s+'). */
  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Train on (`textCol`, `labelCol`) and predict every row: returns
    * (doc_id, pred) with pred = argmax class by (score desc, class asc).
    * Empty documents score on priors + lengths alone (fold 0). */
  def trainPredict(docs: DataFrame, idCol: String, textCol: String,
                   labelCol: String): DataFrame = {
    // ONE tokenization pass, materialized (the decode-once discipline):
    // every downstream consumer — vocabulary, class counts, doc lengths,
    // scoring — derives from this table or the thin (id, label) scan
    val docTok = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("m"))
      .localCheckpoint()
    // thin column-pruned scan: ids + labels only, no text
    val labels = docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"))

    // vocabulary size: one tiny distinct-count of the materialized table
    // (zero-token docs contribute no tokens by definition)
    val v = docTok.agg(count_distinct(col("token"))).head().getLong(0)

    // class model: exact long re-aggregations of the per-doc table
    val clsTok = docTok.join(labels, "doc_id")
      .groupBy("label", "token").agg(sum("m").as("cnt"))
    val clsStats = labels.groupBy("label").agg(count(lit(1)).as("n_c"))
      .join(clsTok.groupBy("label").agg(sum("cnt").as("tot_c")), Seq("label"), "left")
      .withColumn("lnprior", log(col("n_c").cast("double")))
      .withColumn("lnz", log((coalesce(col("tot_c"), lit(0L)) + lit(v)).cast("double")))
      .select("label", "lnprior", "lnz")

    // sparse per-(doc, class) fold of m * ln(cnt + 1) in sorted token order
    val folds = docTok.join(clsTok, "token")
      .withColumn("x", col("m").cast("double") * log((col("cnt") + 1L).cast("double")))
      .groupBy("doc_id", "label")
      .agg(sort_array(collect_list(struct(col("token"), col("x")))).as("xs"))
      .withColumn("fold",
        aggregate(col("xs"), lit(0.0), (acc, e) => acc + e.getField("x")))
      .select("doc_id", "label", "fold")

    // dense (doc x class) frame: fan the doc lengths out by the tiny
    // class list, left-join the sparse folds; zero-token docs keep len 0
    val lens = labels.select("doc_id")
      .join(docTok.groupBy("doc_id").agg(sum("m").as("len")), Seq("doc_id"), "left")
      .withColumn("len", coalesce(col("len"), lit(0L)))
    val scores = lens
      .crossJoin(broadcast(clsStats))
      .join(folds, Seq("doc_id", "label"), "left")
      .withColumn("score",
        coalesce(col("fold"), lit(0.0)) -
          col("len").cast("double") * col("lnz") + col("lnprior"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("label").asc)
    scores.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("doc_id"), col("label").as("pred"))
  }
}
