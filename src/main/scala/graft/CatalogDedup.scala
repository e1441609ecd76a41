package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.s2functions._
import graft.operators._
import graft.s2.{S2LatLngRect, S2Region, R1Interval, S1Interval}
import graft.sources.GeoJson

/** Catalog registry — text deduplication: exact, MinHash/SimHash/n-gram candidates, clusters, keep lists. Entries moved verbatim from SparkEntry
  * (round-3 verdict ask #7: per-domain registries behind the same
  * `queries` map; the 247-row correctness gate pins that nothing moved). */
private[graft] object CatalogDedup {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // --- dedup family over documents (augmented with planted duplicates) ---
    "q_exact_dedup" -> ((s, dir) =>
      Dedup.exactDedup(documents(s, dir), "doc_id", Seq("text"))
        .select("doc_id", "dup_count")),

    // LSH is the recall stage (bands of 2 rows: P(miss | jaccard >= 0.9)
    // ~ (1 - 0.81)^16 ~ 3e-12); exact n-gram Jaccard verification runs on
    // exact-dup representatives only, then expands (Dedup.nearDupPairs).
    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.nearDupPairs(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
        numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
        .select("id_a", "id_b")),

    "q_simhash_pairs" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b")
    }),

    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.nearDupPairs(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
        numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
        .select("id_a", "id_b", "jaccard")),

    // sorted-neighborhood near-dup (merge/purge — the third candidate
    // family next to blocking and LSH): one range sort + a constant
    // n*(window-1) candidate explode — never data-dependent — then exact
    // trigram-Jaccard verify; w=10 recovers this corpus's full LSH answer
    "q_snm_pairs" -> ((s, dir) =>
      SortedNeighborhood.snmNearDupPairs(documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", window = 10, minJaccard = 0.9)
        .select("id_a", "id_b", "jaccard")),

    // EXACT all-pairs set-cosine self-join (AllPairs/PPJoin prefix
    // filtering — the ground-truth counterpart of the LSH family): every
    // trigram-set pair with cosine^2 >= 49/100, integer predicate, no
    // recall knob, no bucket cap
    "q_allpairs_cosine" -> ((s, dir) =>
      AllPairs.cosineSelfJoin(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
        t2Num = 49, t2Den = 100)),

    // substring-level exact dedup: pairs sharing any verbatim >= 8-token
    // span (inverted n-gram-fingerprint join + exact set verification)
    "q_substring_dups" -> ((s, dir) =>
      Dedup.substringDups(documents(s, dir).select("doc_id", "text"), "doc_id", "text", n = 8)
        .select("id_a", "id_b")),

    // incremental corpus dedup: a new batch (doc_id % 10 == 0) deduped
    // against the standing corpus WITHOUT re-pairing the corpus with
    // itself. The corpus signature table is a build-once fixture (the
    // ingest-time persisted layout), so the measured run computes
    // signatures for the BATCH only and probes stored ones — corpus text
    // is read just for candidate verification
    "q_incremental_dedup" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      val sigDir = fixture(dir, "corpus_sigs") { p =>
        Dedup.minhashBandedSignatures(corpus, "doc_id", "text", numHashes = 32, bands = 16)
          .write.mode("overwrite").parquet(p)
      }
      Dedup.incrementalNearDupStored(
        s.read.parquet(sigDir), corpus,
        batch = docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", numHashes = 32, bands = 16,
        minJaccard = 0.9, minEstJaccard = 0.5)
        .select("id_a", "id_b")
    }),

    // decontamination: corpus docs sharing any verbatim >= 4-token span
    // with the eval set (doc_id % 25 == 0 plays the benchmark suite);
    // asymmetric fingerprint probe — the corpus is never self-paired.
    // n = 4 (not the production-default 8) because the synthetic corpus
    // draws from a ~40-word vocabulary, where 4-gram overlap plays the
    // role 8-13-gram overlap plays on real text
    "q_decontaminate" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      Dedup.decontaminate(
        docs.where(col("doc_id") % 25 =!= 0),
        docs.where(col("doc_id") % 25 === 0),
        "doc_id", "text", n = 4)
        .select("doc_id", "eval_id")
    }),

    // duplicate clusters: connected components over the verified near-dup
    // pair graph; cluster_id = canonical (minimum) doc id per component
    "q_dup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Dedup.nearDupPairs(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
          numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
          .select("id_a", "id_b"))
        .select("doc_id", "cluster_id")),

    // the dedup report: cluster-size histogram + exact redundancy counts
    // over the same connected components — "how much would dedup save?",
    // the summary a pipeline logs before committing its keep list
    "q_dedup_report" -> ((s, dir) =>
      Dedup.clusterSizeReport(
        Dedup.duplicateClusters(
          Dedup.nearDupPairs(documents(s, dir).select("doc_id", "text"), "doc_id", "text",
            numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
            .select("id_a", "id_b"))
          .select("doc_id", "cluster_id"))),

    // deduplicated-corpus keep list: the dedup pipeline's actual output —
    // every doc that is a singleton or its cluster's canonical (min) id;
    // non-canonical near-dup cluster members are dropped via one anti join
    "q_dedup_keep" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      Dedup.dedupKeep(docs, "doc_id",
        Dedup.nearDupPairs(docs, "doc_id", "text",
          numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
          .select("id_a", "id_b"))
        .select("doc_id")
    }),

    // END-TO-END curation pipeline — the composition showcase: language
    // gate (predicted en) -> minimum-length gate (>= 20 tokens) ->
    // exact-dup collapse (min doc_id per raw text) -> near-dup keep list
    // (LSH + exact trigram verify + connected components) -> token-budget
    // packing of the survivors. Every stage is an already-oracled
    // operator; the chain replays as ONE CTE pipeline, hash-exact —
    // proving the library COMPOSES, not just that each piece works
    "q_pipeline_keep" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      val en = docs.join(
        TextAnalysis.langId(docs, "doc_id", "text")
          .where(col("lang_pred") === "en").select("doc_id"), "doc_id")
      val sized = en.withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .where(col("n_tokens") >= 20)
      val reps = sized.groupBy("text")
        .agg(min("doc_id").as("doc_id"), max("n_tokens").as("n_tokens"))
      val repDocs = reps.select("doc_id", "text")
      val keep = Dedup.dedupKeep(repDocs, "doc_id",
        Dedup.nearDupPairs(repDocs, "doc_id", "text",
          numHashes = 32, bands = 16, minJaccard = 0.9, minEstJaccard = 0.5)
          .select("id_a", "id_b"))
      val kept = reps.join(keep.select("doc_id"), "doc_id").select("doc_id", "n_tokens")
      Curation.packByBudget(kept, "doc_id", "n_tokens", budgetTokens = 200, buckets = 8)
        .select("doc_id", "n_tokens", "bucket", "batch_id")
    }),

    // exact frequent trigrams (contamination/boilerplate screen):
    // space-saving candidate pass + exact verification; only candidates
    // ever shuffle
    "q_heavy_hitters" -> ((s, dir) =>
      HeavyHitters.frequentNgrams(documents(s, dir), "text", n = 3,
        minFraction = 0.0002)
        .select("gram", "cnt")),

    "q_fingerprint_dups" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
        .select("doc_id", "dup_count"))
  )

  val oracles: Map[String, String] = Map(


    "q_exact_dedup" ->
      "SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY text",

    "q_minhash_pairs" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE $TriJaccard >= 0.9""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $TriJaccard AS jaccard
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE $TriJaccard >= 0.9""".stripMargin,

    // the identical SNM pipeline: same normalized key, same total order,
    // same rank-window arithmetic, same trigram-Jaccard verify — the
    // single-node window here is the oracle's privilege; the engine's
    // rank is the two-pass range-partitioned one
    "q_snm_pairs" ->
      s"""WITH $TriCte,
         |k AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS key FROM documents),
         |r AS (SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS rnk FROM k),
         |cand AS (SELECT least(a.doc_id, b.doc_id) AS id_a, greatest(a.doc_id, b.doc_id) AS id_b
         |         FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 9)
         |SELECT c.id_a, c.id_b, $TriJaccard AS jaccard
         |FROM cand c JOIN tri a ON c.id_a = a.doc_id JOIN tri b ON c.id_b = b.doc_id
         |WHERE $TriJaccard >= 0.9""".stripMargin,

    // the identical integer cosine predicate over the shared trigram
    // derivation: t2Den*ov^2 >= t2Num*na*nb with t^2 = 49/100 — the
    // all-pairs SQL here is the ground truth the prefix filter must equal
    // exactly (completeness is the operator's contract, so the oracle is
    // the full quadratic, confined to oracle scale)
    "q_allpairs_cosine" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.tg, b.tg)) AS BIGINT) AS overlap,
         |  CAST(len(a.tg) AS BIGINT) AS na, CAST(len(b.tg) AS BIGINT) AS nb
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE 100 * CAST(len(list_intersect(a.tg, b.tg)) AS BIGINT) * len(list_intersect(a.tg, b.tg))
         |  >= 49 * CAST(len(a.tg) AS BIGINT) * len(b.tg)""".stripMargin,

    // verbatim >= 8-token spans: a pair shares a span iff their distinct
    // 8-gram sets intersect; mirrored with the null-filtered token-window
    // pattern so sub-8-token docs emit one short gram exactly like the
    // engine's slice()
    "q_substring_dups" -> {
      val win = (0 until 8).map(j => s"toks[i+$j]").mkString("[", ", ", "]")
      s"""WITH docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks FROM documents),
         |og AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 7, 1) + 1),
         |  i -> array_to_string(list_filter($win, t -> t IS NOT NULL), ' '))) AS g FROM docs)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM og a JOIN og b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.g, b.g)) > 0""".stripMargin
    },

    // incremental dedup == the full pair set restricted to pairs touching
    // the batch (the engine must find exactly these without generating any
    // corpus-corpus pair)
    "q_incremental_dedup" ->
      s"""WITH $TriCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM tri a JOIN tri b ON a.doc_id < b.doc_id
         |WHERE $TriJaccard >= 0.9
         |  AND (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)""".stripMargin,

    // decontamination == the substring-overlap pair set restricted to
    // (corpus doc, eval doc) pairs; same null-filtered token-window gram
    // construction as q_substring_dups
    "q_decontaminate" -> {
      val win = (0 until 4).map(j => s"toks[i+$j]").mkString("[", ", ", "]")
      s"""WITH docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks FROM documents),
         |og AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(toks) - 3, 1) + 1),
         |  i -> array_to_string(list_filter($win, t -> t IS NOT NULL), ' '))) AS g FROM docs)
         |SELECT d.doc_id, e.doc_id AS eval_id
         |FROM og d JOIN og e ON d.doc_id % 25 <> 0 AND e.doc_id % 25 = 0
         |WHERE len(list_intersect(d.g, e.g)) > 0""".stripMargin
    },

    // connected components in SQL: reachability closure via a recursive CTE
    // over the symmetrized true-trigram-jaccard pair graph, then min
    // reachable id per source — exactly the engine's min-label fixpoint
    "q_dup_clusters" ->
      s"""WITH RECURSIVE $TriCte,
         |${ccCte(0.9)}
         |SELECT doc_id, cluster_id FROM cc""".stripMargin,

    // the same reachability closure, then two aggregates to the size
    // histogram — every output an exact integer
    "q_dedup_report" ->
      s"""WITH RECURSIVE $TriCte,
         |${ccCte(0.9)},
         |s AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |      FROM cc GROUP BY 1)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
         |  CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_redundant
         |FROM s GROUP BY 1""".stripMargin,

    // keep list = corpus minus non-canonical cluster members, over the same
    // reachability closure as q_dup_clusters
    "q_dedup_keep" ->
      s"""WITH RECURSIVE $TriCte,
         |${ccCte(0.9)}
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)""".stripMargin,

    // the END-TO-END pipeline as ONE CTE chain: the q_langid_pred vote,
    // the token gate, the exact-text collapse, the trigram-CC keep rule
    // (triCteOver/ccCte — the same shared derivations), then the q_pack
    // bucket + cumulative-batch arithmetic on the survivors
    "q_pipeline_keep" -> {
      val dictVals = TextAnalysis.Stopwords.toSeq.sortBy(_._1).flatMap {
        case (lang, ws) => ws.map(w => s"('$w','$lang')")
      }.mkString(", ")
      val (p, a) = (Dedup.HashP, Curation.HashA)
      s"""WITH RECURSIVE dict(tok, cand_lang) AS (VALUES $dictVals),
         |ltoks AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |  x -> len(x) > 0)) AS tok FROM documents),
         |votes AS (SELECT doc_id, cand_lang, count(*) AS cnt
         |  FROM ltoks JOIN dict USING (tok) GROUP BY 1, 2),
         |best AS (SELECT doc_id, max(printf('%010d|%s', cnt, cand_lang)) AS key
         |  FROM votes GROUP BY 1),
         |en AS (SELECT d.doc_id, d.text FROM documents d JOIN best b USING (doc_id)
         |  WHERE split_part(b.key, '|', 2) = 'en'),
         |sized AS (SELECT doc_id, text,
         |  CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS INTEGER) AS n_tokens
         |  FROM en),
         |szf AS (SELECT * FROM sized WHERE n_tokens >= 20),
         |reps AS (SELECT min(doc_id) AS doc_id, max(n_tokens) AS n_tokens, text FROM szf GROUP BY text),
         |${triCteOver("reps")},
         |${ccCte(0.9)},
         |kept AS (SELECT r.doc_id, r.n_tokens FROM reps r
         |  WHERE r.doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)),
         |bk AS (SELECT doc_id, n_tokens,
         |  CAST(((doc_id % $p) * $a) % $p % 8 AS INTEGER) AS bucket FROM kept)
         |SELECT doc_id, n_tokens, bucket,
         | CAST((CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens) // 200 AS BIGINT) AS batch_id
         |FROM bk""".stripMargin
    },

    // brute-force trigram frequency with the same tokenizer/windowing as
    // the engine's candidates-then-verify path; the threshold is the same
    // ceil(fraction * total) double arithmetic
    "q_heavy_hitters" ->
      """WITH docs AS (SELECT list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks FROM documents),
        |g AS (SELECT unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |  i -> array_to_string(list_filter([toks[i], toks[i+1], toks[i+2]], t -> t IS NOT NULL), ' '))) AS gram FROM docs),
        |tot AS (SELECT count(*) AS n FROM g)
        |SELECT gram, count(*) AS cnt FROM g, tot
        |GROUP BY gram, n HAVING count(*) >= ceil(0.0002 * n)""".stripMargin,

    // SimHash recomputed bit-for-bit in SQL: Dedup.portableHash is the
    // polynomial char-code fold (h*131 + c) mod 2^31-1, and bit i of the
    // signature is the majority vote of g_i(h) = (a_i*h + b_i) mod P over
    // the doc's distinct trigrams (same a_i/b_i from Dedup.gCoeffs). The
    // engine's banded join is exact for hamming <= 3 (pigeonhole over four
    // 16-bit bands), so it must equal this all-pairs hamming filter.
    "q_simhash_pairs" -> {
      val P = Dedup.HashP
      val bitSums = (0 until 64).map { i =>
        val (a, b) = Dedup.gCoeffs(i)
        s"sum(CASE WHEN (($a * h + $b) % $P) * 2 < $P THEN 1 ELSE -1 END) AS s$i"
      }.mkString(", ")
      val bitsSel = (0 until 64).map(i => s"(CASE WHEN s$i > 0 THEN 1 ELSE 0 END) AS t$i").mkString(", ")
      val hammingExpr = (0 until 64).map(i => s"(CASE WHEN x.t$i <> y.t$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0) AS toks FROM documents),
         |tri AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
         |  i -> array_to_string(list_filter([toks[i], toks[i+1], toks[i+2]], t -> t IS NOT NULL), ' ')))) AS shingle FROM docs),
         |hashed AS (SELECT doc_id, list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, length(shingle) + 1),
         |  i -> CAST(ascii(substr(shingle, i, 1)) AS BIGINT)), (h, c) -> (h * 131 + c) % $P) AS h FROM tri),
         |sums AS (SELECT doc_id, $bitSums FROM hashed GROUP BY doc_id),
         |bits AS (SELECT doc_id, $bitsSel FROM sums)
         |SELECT x.doc_id AS id_a, y.doc_id AS id_b
         |FROM bits x JOIN bits y ON x.doc_id < y.doc_id
         |WHERE $hammingExpr <= 3""".stripMargin
    },

    // fingerprint groups == normalized-text groups (64-bit hash collisions
    // are vanishingly unlikely at this cardinality and would fail loudly)
    "q_fingerprint_dups" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents
        |GROUP BY regexp_replace(lower(text), '\s+', ' ', 'g')""".stripMargin
  )
}
