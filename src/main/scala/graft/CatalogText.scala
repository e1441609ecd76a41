package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.s2functions._
import graft.operators._
import graft.s2.{S2LatLngRect, S2Region, R1Interval, S1Interval}
import graft.sources.GeoJson

/** Catalog registry — text analysis: language id, quality, tokenization, retrieval, language models. Entries moved verbatim from SparkEntry
  * (round-3 verdict ask #7: per-domain registries behind the same
  * `queries` map; the 247-row correctness gate pins that nothing moved). */
private[graft] object CatalogText {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // characteristic terms per doc (tf-idf with an integer-exact rank
    // contract: tf DESC, df ASC, term ASC)
    "q_top_terms" -> ((s, dir) =>
      TextAnalysis.topTerms(documents(s, dir), "doc_id", "text", k = 3)),

    // Heaps-law vocabulary-growth curve: per corpus decile, exact integer
    // (n_tokens, new_types, cum_types) — the dedup/boilerplate health
    // probe (a flat tail = duplicate mass, a linear tail = id junk);
    // one token explode, two-pass doc rank, bucket-cardinality cumulative.
    // This synthetic corpus mints its whole 31-term vocabulary in decile
    // 0 — exactly the flat-tail signature the probe exists to flag
    // (VocabGrowthSpec plants a genuinely growing corpus)
    "q_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(documents(s, dir), "doc_id", "text", buckets = 10)),

    // corpus-level phrase mining: top-20 bigram collocations by PMI with
    // the integer-exact scaled-quotient score (same rank as PMI — the
    // N^2/B factor is a corpus constant); hapax filter c_xy >= 5
    "q_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(documents(s, dir), "text", minCount = 5, k = 20)),

    // TextRank keyword extraction: damped scaled-INTEGER PageRank over the
    // adjacent-token co-occurrence graph, WEIGHTED by bigram counts (the
    // word graph is near-complete, so weights carry the signal), top-20
    // under (pr DESC, word ASC) — hash-exact vs the unrolled-CTE replay
    "q_keywords" -> ((s, dir) =>
      TextAnalysis.textRankKeywords(documents(s, dir), "text",
        minCount = 2, rounds = 3, k = 20)),

    // BM25 full-text retrieval: top-5 docs per query, inverted-index shape
    // (vocabulary filter inside the scan, only (id, dl, term) shuffles,
    // ordered-fold score so the float is bit-reproducible); rank-only
    // contract — the oracle replays the identical addition order, and
    // RetrievalSpec pins the adjacent-rank margin that makes ranks stable
    // under cross-engine ln/division ulps
    "q_bm25" -> ((s, dir) =>
      Retrieval.bm25TopK(documents(s, dir), "doc_id", "text", Bm25Queries, k = 5)),

    // distributed BPE tokenizer training (3 merges for the oracle; the
    // spec trains 8 against a driver-side reference): corpus scanned once
    // into the distinct-word freq table, each round = one pair count +
    // TakeOrdered argmax + one map. Integer counts + lexicographic ties —
    // exact, no floats
    "q_bpe_train" -> ((s, dir) =>
      Bpe.train(documents(s, dir), "text", numMerges = 3)),

    // BPE encoding under the 3 learned merges: per-doc token count — the
    // number that prices a document into a training budget. The merge
    // list is driver state from train; the encode is a scan-stage map +
    // one aggregate
    "q_bpe_encode" -> ((s, dir) => {
      val merges = Bpe.train(documents(s, dir), "text", numMerges = 3)
        .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.encodeCounts(documents(s, dir), "doc_id", "text", merges)
    }),

    // context-window chunking (50 tokens, overlap 10): array transform +
    // explode inside the scan, no UDF, text never shuffles; integer
    // boundaries and space-rejoined slices are mirrored exactly in SQL
    "q_chunks" -> ((s, dir) =>
      Curation.chunkDocs(documents(s, dir).select("doc_id", "text"), "text",
          maxTokens = 50, overlap = 10)
        .select("doc_id", "chunk_idx", "n_tokens", "chunk")),

    // fastText-shaped multinomial Naive Bayes classifier (closed-form
    // counts training — nothing iterative or order-dependent): trained on
    // the lang labels, predicts every doc; argmax-only contract, per-doc
    // class margins spec-pinned over the gate population
    "q_nb_classify" -> ((s, dir) =>
      NaiveBayes.trainPredict(documents(s, dir), "doc_id", "text", "lang")),

    // CCNet-style LM perplexity quality filter: bigram model trained ON
    // the corpus, worst-50 documents by avg negative log-likelihood.
    // Ordered-fold float discipline + rank-only contract (the q_bm25
    // rules); LanguageModelSpec pins the adjacent-rank margin that makes
    // ranks stable under cross-engine ln ulps
    "q_lm_perplexity" -> ((s, dir) =>
      LanguageModel.perplexityWorstK(documents(s, dir), "doc_id", "text", k = 50)),

    // one-scan data profiling: per-column null/distinct/extreme stats over
    // the documents table (exact distincts -> DuckDB-checkable)
    "q_profile" -> ((s, dir) =>
      Profiling.profile(documents(s, dir),
        numericCols = Seq("doc_id", "n_chars"), stringCols = Seq("lang", "source"))),

    // --- text analysis ---
    "q_text_stats" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"),
          length(col("text")).as("n_chars_m"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))),

    // PII scrub: plant emails/phones/URLs/IPs deterministically (the
    // synthetic corpus has none), then count + replace with typed tags;
    // clean_text string-equality and integer counts are both oracle-exact
    "q_pii_scrub" -> ((s, dir) => {
      val planted = documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 20 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com or +1 555 123 4567 see https://ex.com/p"), col("doc_id")))
            .otherwise(lit("")),
          when(col("doc_id") % 30 === 0,
            concat(lit(" node 10.0."), col("doc_id") % 256, lit(".7")))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.scrubPii(planted, "doc_id", "text")
    }),

    // within-doc repetition signals (Gopher-rules family): integer
    // token/bigram multiplicity counts — pure per-row expressions, no
    // shuffle; the repetitive-doc ratios derive from these exactly
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(documents(s, dir), "doc_id", "text")),

    "q_lang_agg" -> ((s, dir) =>
      documents(s, dir).groupBy("lang").agg(count(lit(1)).as("cnt")).orderBy("lang")),

    "q_langid_pred" -> ((s, dir) =>
      TextAnalysis.langId(documents(s, dir), "doc_id", "text")
        .select("doc_id", "lang_pred")),

    "q_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(documents(s, dir), "doc_id", "text")
        .select("doc_id", "n_tokens", "quality"))
  )

  val oracles: Map[String, String] = Map(


    // identical scaled-integer rounds over the word co-occurrence graph;
    // the whitespace tokenizer and hapax filter mirror the Spark side
    "q_keywords" -> TextRankOracleSql,

    // the same whitespace tokenizer, rank, min-rank first occurrences,
    // decile index arithmetic, and bucket self-join cumulative
    "q_vocab_growth" ->
      """WITH r AS (SELECT row_number() OVER (ORDER BY doc_id) AS rank, text FROM documents),
        |t AS (SELECT count(*) AS d FROM r),
        |tk AS (SELECT r.rank, unnest(list_filter(string_split_regex(lower(r.text), '\s+'),
        |  x -> len(x) > 0)) AS tok FROM r),
        |occ AS (SELECT ((rank - 1) * 10) // d AS bucket, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM tk, t GROUP BY 1),
        |nt AS (SELECT ((fr - 1) * 10) // d AS bucket, CAST(count(*) AS BIGINT) AS new_types
        |  FROM (SELECT tok, min(rank) AS fr FROM tk GROUP BY 1) f, t GROUP BY 1),
        |j AS (SELECT occ.bucket, occ.n_tokens, COALESCE(nt.new_types, 0) AS new_types
        |  FROM occ LEFT JOIN nt ON nt.bucket = occ.bucket)
        |SELECT a.bucket, a.n_tokens, a.new_types, CAST(sum(b.new_types) AS BIGINT) AS cum_types
        |FROM j a JOIN j b ON b.bucket <= a.bucket GROUP BY 1, 2, 3""".stripMargin,

    // same tokenizer as q_langid_pred ([^a-z]+ == Spark's [^\p{L}]+ on
    // this corpus); the rank is pure integer comparison, no float score
    "q_top_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |  x -> len(x) > 0)) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, term, tf, df FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS r
        |  FROM tf JOIN df USING (term)) t
        |WHERE r <= 3""".stripMargin,

    // identical integer arithmetic: scaled quotient c_xy*10^12 // (c_x*c_y)
    // (PMI rank — N^2/B is a corpus constant, so the quotient order IS the
    // PMI order), whitespace tokenizer of the trigram family, total order
    // (score DESC, w1, w2) so the top-20 cut is deterministic both sides
    "q_collocations" ->
      """WITH docs AS (SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |uni AS (SELECT unnest(toks) AS w FROM docs),
        |ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        |big AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM docs, unnest(range(1, len(toks))) AS t(i)),
        |bcnt AS (SELECT w1, w2, count(*) AS cxy FROM big GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT b.w1, b.w2, b.cxy, ua.c AS cx, ub.c AS cy,
        |  (b.cxy * 1000000000000) // (ua.c * ub.c) AS score
        |FROM bcnt b JOIN ucnt ua ON b.w1 = ua.w JOIN ucnt ub ON b.w2 = ub.w
        |ORDER BY score DESC, b.w1, b.w2 LIMIT 20""".stripMargin,

    // identical BM25 formula with the identical addition order: per-term
    // contributions folded in sorted-term order (list(... ORDER BY term)
    // mirrors Spark's sort_array(collect_list) fold), k1/b spelled as the
    // same literals so both engines derive the same IEEE constants; the
    // rank is stable under cross-engine ln ulps by the RetrievalSpec
    // margin precondition (ties only between docs with identical integer
    // inputs, which tie identically in both engines and fall to doc_id)
    "q_bm25" -> {
      val vocab = Bm25Queries.flatMap(_._2).distinct.sorted
      val inList = vocab.map(t => s"'$t'").mkString(", ")
      val qRows = Bm25Queries.flatMap { case (qid, ts) =>
        ts.map(t => s"(CAST($qid AS BIGINT), '$t')")
      }.mkString(", ")
      s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |  x -> len(x) > 0)) AS term FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         |q(query_id, term) AS (VALUES $qRows),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ($inList) GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |contrib AS (SELECT tf.doc_id, tf.term,
         |  ln(1.0 + (CAST(stats.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
         |    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
         |    / (CAST(tf.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl.dl AS DOUBLE)
         |        / (CAST(stats.sumdl AS DOUBLE) / CAST(stats.n AS DOUBLE)))) AS c
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
         |scored AS (SELECT q.query_id, contrib.doc_id,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(contrib.c ORDER BY contrib.term)),
         |    (a, b) -> a + b) AS score
         |  FROM contrib JOIN q USING (term) GROUP BY 1, 2)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id FROM (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM scored) t
         |WHERE rank <= 5""".stripMargin
    },

    // the 3 merge rounds unrolled: pair counts from the double-delimited
    // symbol string, argmax by (cnt DESC, l, r), greedy merge application
    // as replace(R, '|l||r|', '|lr|') — boundary-safe (symbols never
    // contain '|', the pattern's outer bars pin true symbol boundaries)
    // and run-correct (adjacent matches don't share delimiter chars), so
    // SQL's left-to-right non-overlapping replace IS BPE's greedy rule
    "q_bpe_train" -> {
      def sy(r: String) = s"list_filter(string_split($r, '||'), x -> len(x) > 0)"
      def pairs(r: String) =
        s"list_transform(range(1, len(${sy(r)})), i -> struct_pack(l := ${sy(r)}[i], r := ${sy(r)}[i + 1]))"
      def pcnt(it: String, r: String) =
        s"SELECT u.p.l AS l, u.p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM $it, UNNEST(${pairs(r)}) AS u(p) GROUP BY 1, 2"
      def argmax(p: String) = s"SELECT l, r FROM $p ORDER BY cnt DESC, l ASC, r ASC LIMIT 1"
      def apply(it: String, r: String, m: String, out: String) =
        s"SELECT replace($r, '|' || $m.l || '||' || $m.r || '|', '|' || $m.l || $m.r || '|') AS $out, freq FROM $it CROSS JOIN $m"
      s"""WITH w AS (SELECT t AS word, count(*) AS freq FROM (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0)) AS t FROM documents) u GROUP BY 1),
         |it0 AS (SELECT '||' || array_to_string(
         |    list_transform(range(1, len(word) + 1), i -> word[i:i]), '||') || '||' AS r0,
         |  freq FROM w),
         |p1 AS (${pcnt("it0", "r0")}),
         |m1 AS (${argmax("p1")}),
         |it1 AS (${apply("it0", "r0", "m1", "r1")}),
         |p2 AS (${pcnt("it1", "r1")}),
         |m2 AS (${argmax("p2")}),
         |it2 AS (${apply("it1", "r1", "m2", "r2")}),
         |p3 AS (${pcnt("it2", "r2")}),
         |m3 AS (${argmax("p3")})
         |SELECT CAST(1 AS INTEGER) AS rank, l AS "left", r AS "right" FROM m1
         |UNION ALL SELECT CAST(2 AS INTEGER), l, r FROM m2
         |UNION ALL SELECT CAST(3 AS INTEGER), l, r FROM m3""".stripMargin
    },

    // the same trained merges applied per (doc, word) with the same
    // double-delimiter replace chain, token counts summed per doc
    "q_bpe_encode" -> {
      def sy(r: String) = s"list_filter(string_split($r, '||'), x -> len(x) > 0)"
      def pairs(r: String) =
        s"list_transform(range(1, len(${sy(r)})), i -> struct_pack(l := ${sy(r)}[i], r := ${sy(r)}[i + 1]))"
      def pcnt(it: String, r: String) =
        s"SELECT u.p.l AS l, u.p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM $it, UNNEST(${pairs(r)}) AS u(p) GROUP BY 1, 2"
      def argmax(p: String) = s"SELECT l, r FROM $p ORDER BY cnt DESC, l ASC, r ASC LIMIT 1"
      def apply(it: String, r: String, m: String, out: String, keep: String) =
        s"SELECT replace($r, '|' || $m.l || '||' || $m.r || '|', '|' || $m.l || $m.r || '|') AS $out$keep FROM $it CROSS JOIN $m"
      s"""WITH w AS (SELECT t AS word, count(*) AS freq FROM (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0)) AS t FROM documents) u GROUP BY 1),
         |it0 AS (SELECT '||' || array_to_string(
         |    list_transform(range(1, len(word) + 1), i -> word[i:i]), '||') || '||' AS r0,
         |  freq FROM w),
         |p1 AS (${pcnt("it0", "r0")}),
         |m1 AS (${argmax("p1")}),
         |it1 AS (${apply("it0", "r0", "m1", "r1", ", freq")}),
         |p2 AS (${pcnt("it1", "r1")}),
         |m2 AS (${argmax("p2")}),
         |it2 AS (${apply("it1", "r1", "m2", "r2", ", freq")}),
         |p3 AS (${pcnt("it2", "r2")}),
         |m3 AS (${argmax("p3")}),
         |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |  x -> len(x) > 0)) AS word FROM documents),
         |d0 AS (SELECT doc_id, '||' || array_to_string(
         |    list_transform(range(1, len(word) + 1), i -> word[i:i]), '||') || '||' AS r0 FROM dw),
         |d1 AS (${apply("d0", "r0", "m1", "r1", ", doc_id")}),
         |d2 AS (${apply("d1", "r1", "m2", "r2", ", doc_id")}),
         |d3 AS (${apply("d2", "r2", "m3", "r3", ", doc_id")})
         |SELECT doc_id, CAST(sum(len(${sy("r3")})) AS BIGINT) AS n_bpe_tokens
         |FROM d3 GROUP BY 1""".stripMargin
    },

    // identical slice boundaries (1-based inclusive list slicing == Spark
    // slice(arr, i+1, max)), same single-space rejoin
    "q_chunks" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |  x -> len(x) > 0) AS toks FROM documents)
        |SELECT doc_id, CAST(i // 40 AS INTEGER) AS chunk_idx,
        | CAST(least(50, len(toks) - i) AS INTEGER) AS n_tokens,
        | array_to_string(toks[i + 1 : i + 50], ' ') AS chunk
        |FROM tk, UNNEST(range(0, CAST(len(toks) AS BIGINT), 40)) AS r(i)
        |WHERE len(toks) >= 1""".stripMargin,

    // identical NB arithmetic: sparse sorted-token fold of m*ln(cnt+1)
    // (absent class-token pairs contribute ln(1)=0, so the sparse join IS
    // the dense model), then score = fold - len*lnz + lnprior assembled in
    // the same order; argmax with the same (score DESC, label ASC) window
    "q_nb_classify" ->
      """WITH tk AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\s+'),
        |  x -> len(x) > 0) AS toks FROM documents),
        |v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(toks) AS t FROM tk) u),
        |doctok AS (SELECT doc_id, t AS token, count(*) AS m
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM tk) x GROUP BY 1, 2),
        |clstok AS (SELECT lang AS label, t AS token, count(*) AS cnt
        |  FROM (SELECT lang, unnest(toks) AS t FROM tk) x GROUP BY 1, 2),
        |clsstats AS (SELECT lang AS label, ln(CAST(count(*) AS DOUBLE)) AS lnprior,
        |  ln(CAST(CAST(sum(len(toks)) AS BIGINT) + (SELECT v FROM v) AS DOUBLE)) AS lnz
        |  FROM tk GROUP BY 1),
        |folds AS (SELECT doc_id, label,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(m AS DOUBLE) * ln(CAST(cnt + 1 AS DOUBLE)) ORDER BY token)),
        |    (a, b) -> a + b) AS fold
        |  FROM doctok JOIN clstok USING (token) GROUP BY 1, 2),
        |lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM tk),
        |scores AS (SELECT lens.doc_id, clsstats.label,
        |  coalesce(folds.fold, 0.0) - CAST(lens.len AS DOUBLE) * clsstats.lnz
        |    + clsstats.lnprior AS score
        |  FROM lens CROSS JOIN clsstats
        |  LEFT JOIN folds ON folds.doc_id = lens.doc_id AND folds.label = clsstats.label)
        |SELECT doc_id, label AS pred FROM (
        |  SELECT doc_id, label, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rk FROM scores) t
        |WHERE rk = 1""".stripMargin,

    // identical bigram model (add-one smoothing, same casts and ln-ratio
    // arithmetic) with the per-doc fold replayed in the same sorted
    // (w1, w2) order; rank-only output, margin spec-pinned
    "q_lm_perplexity" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |  x -> len(x) > 0) AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM tk, UNNEST(range(1, len(toks))) AS r(i) WHERE len(toks) >= 2),
        |docbg AS (SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY 1, 2, 3),
        |cnt AS (SELECT w1, w2, sum(m) AS cb FROM docbg GROUP BY 1, 2),
        |ctx AS (SELECT w1, sum(m) AS cc FROM docbg GROUP BY 1),
        |v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(toks) AS t FROM tk) u),
        |contrib AS (SELECT docbg.doc_id, docbg.w1, docbg.w2, docbg.m,
        |  CAST(docbg.m AS DOUBLE)
        |    * ln(CAST(cnt.cb + 1 AS DOUBLE) / CAST(ctx.cc + v.v AS DOUBLE)) AS c
        |  FROM docbg JOIN cnt USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
        |scored AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
        |  -list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY w1, w2)),
        |    (a, b) -> a + b) / CAST(sum(m) AS DOUBLE) AS avg_nll
        |  FROM contrib GROUP BY 1)
        |SELECT CAST(rank AS INTEGER) AS rank, doc_id, n_bigrams FROM (
        |  SELECT doc_id, n_bigrams,
        |    row_number() OVER (ORDER BY avg_nll DESC, doc_id ASC) AS rank
        |  FROM scored) t
        |WHERE rank <= 50""".stripMargin,

    "q_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val
           |FROM documents""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val
           |FROM documents""".stripMargin
      Seq(num("doc_id"), num("n_chars"), str("lang"), str("source"))
        .mkString("\nUNION ALL\n")
    },

    "q_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars_m,
        | CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS INTEGER) AS n_tokens
        |FROM documents""".stripMargin,

    // PII scrub mirrored with RE2: same planted suffixes, same patterns in
    // the same replacement order ('g' flag: DuckDB replaces first-only by
    // default, Spark replaces all)
    "q_pii_scrub" -> {
      val patterns = graft.operators.TextAnalysis.PiiPatterns
      val cleanSql = patterns.foldLeft("text") { case (c, (_, pat, rep)) =>
        s"regexp_replace($c, '$pat', '$rep', 'g')"
      }
      val countSql = patterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS INTEGER) AS n_$name"
      }.mkString(",\n ")
      s"""WITH p AS (SELECT doc_id, text ||
         | CASE WHEN doc_id % 20 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
         |   || '@example.com or +1 555 123 4567 see https://ex.com/p' || CAST(doc_id AS VARCHAR)
         |   ELSE '' END ||
         | CASE WHEN doc_id % 30 = 0 THEN ' node 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
         |   ELSE '' END AS text FROM documents)
         |SELECT doc_id, $cleanSql AS clean_text,
         | $countSql
         |FROM p""".stripMargin
    },

    // repetition signals mirrored with DuckDB list functions; the engine's
    // "one short gram for sub-2-token docs" rule does NOT apply to bigrams
    // here (n_bigrams is 0 for 0/1-token docs on both sides)
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks FROM documents),
        |b AS (SELECT doc_id, toks, CASE WHEN len(toks) >= 2
        |  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |  ELSE CAST([] AS VARCHAR[]) END AS big FROM t)
        |SELECT doc_id,
        | CAST(len(toks) AS INTEGER) AS n_tokens,
        | CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
        | CAST(len(big) AS INTEGER) AS n_bigrams,
        | CAST(len(list_distinct(big)) AS INTEGER) AS n_distinct_bigrams,
        | CAST(coalesce(list_max(list_transform(list_distinct(big), x -> len(list_filter(big, y -> y = x)))), 0) AS INTEGER) AS top_bigram_count
        |FROM b""".stripMargin,

    "q_lang_agg" -> "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",

    // quality-score formula mirrored in SQL; on this corpus (no punctuation
    // or uppercase) the punct/upper penalty terms are exactly zero
    "q_quality" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS INTEGER) AS ntok,
        |  CAST(length(text) AS DOUBLE) AS nchars FROM documents),
        |g AS (SELECT doc_id, ntok,
        |  nchars / greatest(ntok, 1) AS mwl FROM f)
        |SELECT doc_id, ntok AS n_tokens,
        |  round(CASE WHEN ntok < 5 THEN 0.0 ELSE greatest(0.0,
        |    1.0 - (CASE WHEN mwl > 12 THEN (mwl - 12) * 0.05 ELSE 0.0 END)
        |        - (CASE WHEN mwl < 3 THEN (3 - mwl) * 0.2 ELSE 0.0 END)) END, 6) AS quality
        |FROM g""".stripMargin,

    // heuristic language id replicated in SQL; the corpus is pure ASCII so
    // the [^a-z]+ tokenizer matches Spark's [^\p{L}]+ exactly
    "q_langid_pred" ->
      """WITH dict(tok, cand_lang) AS (VALUES ('the','en'),('and','en'),('of','en'),('to','en'),('in','en'),('is','en'),('that','en'),('for','en'),('with','en'),('was','en'),('der','de'),('die','de'),('und','de'),('das','de'),('ist','de'),('nicht','de'),('mit','de'),('ein','de'),('von','de'),('für','de'),('le','fr'),('la','fr'),('et','fr'),('les','fr'),('des','fr'),('est','fr'),('pas','fr'),('pour','fr'),('dans','fr'),('que','fr'),('el','es'),('la','es'),('que','es'),('los','es'),('una','es'),('por','es'),('con','es'),('para','es'),('como','es'),('más','es'),('il','it'),('che','it'),('di','it'),('la','it'),('per','it'),('una','it'),('sono','it'),('non','it'),('con','it'),('del','it')),
        |toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |  x -> len(x) > 0)) AS tok FROM documents),
        |votes AS (SELECT doc_id, cand_lang, count(*) AS cnt
        |  FROM toks JOIN dict USING (tok) GROUP BY 1, 2),
        |best AS (SELECT doc_id, max(printf('%010d|%s', cnt, cand_lang)) AS key
        |  FROM votes GROUP BY 1)
        |SELECT d.doc_id, CASE WHEN b.key IS NULL THEN 'und' ELSE split_part(b.key, '|', 2) END AS lang_pred
        |FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN best b USING (doc_id)""".stripMargin
  )
}
