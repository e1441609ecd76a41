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
    val base = docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
      tokens(col(textCol)).as("toks"))

    // vocabulary size: one tiny distinct-count job (snapshot metadata)
    val v = base.select(explode(col("toks")).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0)

    val docTok = base
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("m"))

    // class model: per-class token counts + per-class totals and priors
    val clsTok = base
      .select(col("label"), explode(col("toks")).as("token"))
      .groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val clsStats = base.groupBy("label")
      .agg(count(lit(1)).as("n_c"), sum(size(col("toks"))).as("tot_c"))
      .withColumn("lnprior", log(col("n_c").cast("double")))
      .withColumn("lnz", log((col("tot_c") + lit(v)).cast("double")))
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
    // class list, left-join the sparse folds
    val lens = base.select(col("doc_id"), size(col("toks")).cast("long").as("len"))
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
