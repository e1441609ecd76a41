package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding TRAINER — the tokenizer-construction
  * step of an LLM data pipeline, in its exactly-reproducible classic form
  * (Sennrich et al.): start from characters, repeatedly merge the
  * globally most frequent adjacent symbol pair (ties by lexicographic
  * (left, right)), applying each merge greedily left-to-right within
  * every word.
  *
  * Scale shape: the corpus is scanned ONCE into the distinct-word
  * frequency table (the classic optimization — training then runs over
  * the vocabulary, weighted by freq, typically orders of magnitude
  * smaller than the corpus). Each merge round is one partial+final pair
  * count over that table, a TakeOrderedAndProject argmax (one row to the
  * driver — the merge IS driver state, like k-means centroids), and a
  * map over the symbol arrays; the working table is re-materialized per
  * round (fresh leaf, the connected-components loop discipline, so
  * lineage and stats never compound).
  *
  * Determinism: integer counts + lexicographic tiebreak — no floats
  * anywhere, so the learned merge list is exact and the SQL oracle can
  * replay it (unrolled per round, with greedy merge application as a
  * boundary-safe double-delimiter string replace). Symbols are Unicode
  * CODE POINTS (not UTF-16 units), matching SQL character semantics. */
object Bpe {

  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  private val splitUdf = udf { w: String =>
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  /** Greedy left-to-right, non-overlapping application of one merge. */
  private[graft] def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private val mergeUdf = udf((syms: Seq[String], l: String, r: String) =>
    applyMerge(syms, l, r))

  /** Learn `numMerges` merges from the corpus; returns the merge table
    * (rank, left, right) ordered by rank. Training stops early if no
    * adjacent pair remains. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._

    var vocab = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(splitUdf(col("word")).as("syms"), col("freq"))
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = vocab
        .select(explode(transform(slice(col("syms"), lit(1), size(col("syms")) - 1),
          (s, i) => struct(s.as("l"), element_at(col("syms"), i + 2).as("r"))))
          .as("p"), col("freq"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((rank, l, r))
        val next = vocab
          .withColumn("syms", mergeUdf(col("syms"), lit(l), lit(r)))
          .localCheckpoint() // fresh leaf per round (the CC-loop discipline)
        vocab.unpersist()
        vocab = next
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right")
  }

  private val encodeCountUdf = udf { (w: String, ls: Seq[String], rs: Seq[String]) =>
    var syms: Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toSeq
    }
    var m = 0
    while (m < ls.length) { syms = applyMerge(syms, ls(m), rs(m)); m += 1 }
    syms.length
  }

  /** BPE ENCODING with a learned merge list (rank order): per-document
    * token count under the trained tokenizer — the number that actually
    * prices a document into a training budget. One scan, merges inlined
    * as literals (tokenizers are tiny driver/broadcast state), the whole
    * thing a scan-stage map + one aggregate. Documents with no tokens
    * emit nothing (same universe rule as the other tokenized ops). */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val ls = array(merges.map(m => lit(m._1)): _*)
    val rs = array(merges.map(m => lit(m._2)): _*)
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("word"))
      .withColumn("__n", encodeCountUdf(col("word"), ls, rs))
      .groupBy("doc_id").agg(sum("__n").as("n_bpe_tokens"))
  }
}
