package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators a training pipeline needs downstream of
  * dedup: reproducible splits and token-budget packing. All arithmetic is
  * integer-exact and mirrored literally in the DuckDB oracles (SparkEntry),
  * so every operator here is oracle-checked end to end.
  */
object Curation {

  /** Affine 31-bit id hash shared with the oracle SQL: ((id mod P) * A)
    * mod P, P = 2^31-1 (prime, [[Dedup.HashP]]). Uniform enough for split
    * fractions and bucketing, and trivially portable. */
  private[graft] val HashA = 2654435761L

  def idHash(id: Column): Column = (pmod(id, lit(Dedup.HashP)) * HashA) % Dedup.HashP

  /** Split threshold as an exact integer literal (also used by the oracle
    * string builders). */
  def splitThreshold(valFrac: Double): Long = (Dedup.HashP * valFrac).toLong

  /** Quantile normalization (the empirical-CDF feature transform): map a
    * numeric column to its global rank scaled into [0, 1] —
    * `(rank - 1) / (n - 1)` with ties broken by id so the transform is a
    * pure function of the input set. The ML-preprocessing standard for
    * heavy-tailed features (doc lengths, view counts) before they feed
    * quality scores or mixtures. Rank comes from the two-pass
    * range-partitioned [[SortedNeighborhood.globalRank]] — no single-task
    * window, no collect — and the single final division is one IEEE op on
    * exact integer operands, so the DOUBLE output is bit-reproducible and
    * oracle-checkable. Output: input columns + `q` (n == 1 maps to 0.0). */
  def quantileNormalize(df: DataFrame, valCol: String, idCol: String): DataFrame = {
    // pinned: feeds both the 1-row total aggregate and the output rows
    val ranked = SortedNeighborhood.globalRank(df, col(valCol), col(idCol))
      .localCheckpoint()
    // n rides a broadcast 1-row aggregate — never a global window (which
    // would serialize the table through one task) and never a driver job
    val total = ranked.agg(max("rank").as("__n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("q",
        when(col("__n") === 1L, lit(0.0))
          .otherwise((col("rank") - 1L).cast("double") / (col("__n") - 1L).cast("double")))
      .drop("rank", "__n")
  }

  /** Deterministic, reproducible train/val split: `val` iff
    * idHash(id) < P * valFrac. No shuffle, no RNG state — re-running on a
    * grown table keeps every existing row's assignment stable (the classic
    * requirement for incremental corpus refreshes). */
  def hashSplit(df: DataFrame, idCol: String, valFrac: Double): DataFrame =
    df.withColumn("split",
      when(idHash(col(idCol)) < splitThreshold(valFrac), "val").otherwise("train"))

  /** Leakage-free split: every member of a near-duplicate cluster lands on
    * the SAME side, by hashing the cluster's canonical id (the doc's own id
    * when unclustered). `clusters` is [[Dedup.duplicateClusters]] output
    * (doc_id, cluster_id). This is the guard against the classic
    * train/val-contamination bug where near-copies of a validation doc sit
    * in train. Broadcast-friendly: clusters only contains docs that appear
    * in a near-dup pair. */
  def leakFreeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                    valFrac: Double): DataFrame = {
    val key = coalesce(col("cluster_id"), col(idCol))
    df.join(clusters.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .withColumn("split",
        when(idHash(key) < splitThreshold(valFrac), "val").otherwise("train"))
      .drop("cluster_id")
  }

  /** Spatially-blocked split — the GEOSPATIAL leakage guard the way
    * [[leakFreeSplit]] is the near-dup one: the split key is the row's
    * geohash BLOCK at `precision`, so every observation from one
    * geographic cell lands on the same side (spatial-cross-validation
    * blocking — under spatial autocorrelation a val point whose immediate
    * neighbors sit in train is as leaked as a near-dup text). Side =
    * affine hash of the block string's code-point fold
    * ([[Dedup.portableHash]]), all integer-exact and mirrored literally
    * by the SQL oracle. Pure function of (lat, lon): no shuffle, one
    * codegen span (floor+interleave geohash, fold, compare), stable under
    * corpus growth and re-partitioning. */
  def spatialBlockSplit(df: DataFrame, latCol: String, lonCol: String,
                        precision: Int, valFrac: Double,
                        blockOut: String = "block"): DataFrame = {
    require(!df.columns.contains(blockOut),
      s"spatialBlockSplit: input already has a '$blockOut' column")
    require(!df.columns.contains("split"),
      "spatialBlockSplit: input already has a 'split' column (would be silently overwritten)")
    Tiling.geohashEncode(df, latCol, lonCol, precision, blockOut)
      .withColumn("split",
        when((Dedup.portableHash(col(blockOut)) * HashA) % Dedup.HashP
          < splitThreshold(valFrac), "val").otherwise("train"))
  }

  /** Second-round id hash for [[groupSample]]'s ordering — one affine pass
    * decorrelates poorly from consecutive ids, two rounds with distinct
    * multipliers break the arithmetic progression. Pure int64 arithmetic
    * below 2^62, so DuckDB reproduces it exactly (BIGINT overflow would
    * ERROR there, not wrap). */
  private[graft] val HashB = 1327217885L

  def idHash2(id: Column): Column = (idHash(id) * HashB) % Dedup.HashP

  /** Deterministic per-group sample: the k rows of each group with the
    * smallest (idHash2(id), id) — a reproducible "random" subset (data
    * ablations, eval carve-outs, per-source caps) that is a pure function
    * of the ids: independent of partitioning, row order, cluster size, and
    * re-runs, unlike `TABLESAMPLE`/`df.sample` whose output moves with the
    * split layout. Requires unique ids (the id tiebreak makes row_number
    * deterministic). One shuffle on the group key; within a group the
    * window is the same per-key top-k shape as q_window_topk — a
    * pathologically hot group serializes through one task, the documented
    * window caveat (AsOfJoin.scala) shared by every ranking operator. */
  def groupSample(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    require(!df.columns.contains("__rank"),
      "groupSample: input must not have a '__rank' column (reserved internal name)")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(idHash2(col(idCol)), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .drop("__rank")
  }

  /** PROPORTIONAL per-group sample: `ceil(n_g * num / den)` rows of each
    * group — same deterministic two-round-hash order as [[groupSample]],
    * but the quota tracks group size instead of a fixed k (the
    * geo-balanced-subsampling case: thin a corpus to num/den per spatial
    * cell without flattening dense cities onto empty ocean the way a
    * fixed per-cell cap would). `rank <= ceil(n*num/den)` is evaluated as
    * the integer identity `(rank-1)*den < n*num` — no floating-point
    * quota, so the oracle is exact at any group size. One shuffle on the
    * group key; both windows (rank + count) share it. Requires unique
    * ids. */
  def proportionalGroupSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                              num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"sample fraction must be a rational in (0, 1]: $num/$den")
    require(!df.columns.contains("__rank") && !df.columns.contains("__n"),
      "proportionalGroupSample: input must not have '__rank'/'__n' columns (reserved)")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(idHash2(col(idCol)), col(idCol))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    // rank is IntegerType: cast before the multiply, or groups beyond
    // Int.MaxValue/den rows overflow the 32-bit product (ANSI: job death;
    // non-ANSI: silent oversampling)
    df.withColumn("__rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where((col("__rank").cast("long") - 1) * den < col("__n") * num)
      .drop("__rank", "__n")
  }

  /** TARGET-MIXTURE sampling — the data-mixing step (DoReMi-style domain
    * reweighting in its deterministic subsample form): each group keeps
    * its OWN rational fraction `num_g/den_g` of rows, by the same
    * two-round-hash order as [[groupSample]]. Groups absent from
    * `fractions` are DROPPED (an explicit mixture decision, not a
    * default). Quotas are exact ceil via the integer identity
    * `(rank-1)*den < n*num`; everything is a pure function of the ids, so
    * the mixture is reproducible and growth-stable. One shuffle on the
    * group key. */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    fractions: Map[String, (Int, Int)]): DataFrame = {
    require(fractions.nonEmpty, "mixtureSample needs at least one group fraction")
    fractions.foreach { case (g, (num, den)) =>
      require(num > 0 && den > 0 && num <= den,
        s"fraction for '$g' must be a rational in (0, 1]: $num/$den")
    }
    require(!df.columns.contains("__rank") && !df.columns.contains("__n") &&
      !df.columns.contains("__num") && !df.columns.contains("__den"),
      "mixtureSample: input must not have reserved '__rank'/'__n'/'__num'/'__den' columns")
    val numCol = fractions.foldLeft(lit(null).cast("int")) { case (acc, (g, (num, _))) =>
      when(col(groupCol) === g, lit(num)).otherwise(acc)
    }
    val denCol = fractions.foldLeft(lit(null).cast("int")) { case (acc, (g, (_, den))) =>
      when(col(groupCol) === g, lit(den)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(idHash2(col(idCol)), col(idCol))
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("__num", numCol).withColumn("__den", denCol)
      .where(col("__num").isNotNull)
      .withColumn("__rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where((col("__rank").cast("long") - 1) * col("__den") < col("__n") * col("__num"))
      .drop("__rank", "__n", "__num", "__den")
  }

  /** Fixed-token-budget packing: documents are bucketed by id hash (so the
    * sort is per-bucket, never global — the scale requirement) and packed
    * in id order; `batch_id` = the document's running-token START OFFSET
    * integer-divided by the budget. A batch's token total can exceed the
    * budget only by the overhang of its last (or an oversized) document —
    * consumers must size buffers to budget + max doc length, the usual
    * sequence-packing contract. One shuffle (by bucket) + per-bucket
    * sorted window. Requires unique ids (the ROWS frame and the oracle's
    * are only equivalent without peers). */
  def packByBudget(df: DataFrame, idCol: String, tokenCol: String,
                   budgetTokens: Int, buckets: Int): DataFrame = {
    // explicit ROWS frame: the default RANGE frame would give duplicate
    // id values a peer-inclusive cumulative sum
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("bucket", (idHash(col(idCol)) % buckets).cast("int"))
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      // integer `div`, not double division: exact for any cum/budget
      .withColumn("batch_id",
        expr(s"(__cum - $tokenCol) div CAST($budgetTokens AS BIGINT)"))
      .drop("__cum")
  }

  /** Fixed-token-budget document chunking with overlap — the context-window
    * preprocessing step every training pipeline runs on long documents.
    * Whitespace tokens; chunk starts advance by `maxTokens - overlap`;
    * each chunk is its token slice rejoined with single spaces (the
    * normalized form a tokenizer consumes). Tail chunks may be shorter;
    * empty documents emit nothing. Runs entirely inside the scan stage
    * (array transform + explode, codegen'd — no UDF, text never shuffles).
    * Returns the doc columns sans `textCol` plus (chunk_idx, n_tokens,
    * chunk). */
  def chunkDocs(docs: DataFrame, textCol: String,
                maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens: maxTokens=$maxTokens overlap=$overlap")
    val stride = maxTokens - overlap
    val reserved = Seq("__toks", "__c")
    require(!docs.columns.exists(reserved.contains),
      s"chunkDocs: reserved column name in input")
    docs
      .withColumn("__toks", filter(split(col(textCol), "\\s+"), t => length(t) > 0))
      .where(size(col("__toks")) >= 1)
      .withColumn("__c", explode(transform(
        sequence(lit(0), size(col("__toks")) - 1, lit(stride)),
        i => struct(
          (i / stride).cast("int").as("chunk_idx"),
          least(lit(maxTokens), size(col("__toks")) - i).cast("int").as("n_tokens"),
          array_join(slice(col("__toks"), i + 1, lit(maxTokens)), " ").as("chunk")))))
      .select(docs.columns.filterNot(_ == textCol).map(col) :+
        col("__c.chunk_idx") :+ col("__c.n_tokens") :+ col("__c.chunk"): _*)
  }

  /** Deterministic importance sampling: keep a row with probability
    * `weightCol / max(weightCol)` (integer weights), decided by the shared
    * affine id hash — keep iff idHash(id) < (P * w) div w_max, ALL integer
    * arithmetic, so the sample is exactly reproducible, stable under
    * corpus growth of lighter rows, and mirrored literally by the SQL
    * oracle. The quality-weighted data-selection step (heavier = likelier
    * kept), with none of the RNG-state nondeterminism of `sample()`.
    * `wMax` is the corpus max (one tiny aggregate, snapshot metadata). */
  def importanceSample(df: DataFrame, idCol: String, weightCol: String,
                       wMax: Long): DataFrame = {
    require(wMax > 0, s"wMax must be positive: $wMax")
    // `div`, not `/`: Spark's Column `/` is double division — the
    // threshold must stay in exact int64 like the oracle's `//`
    df.where(idHash(col(idCol)) <
      expr(s"(${Dedup.HashP}L * CAST($weightCol AS BIGINT)) div ${wMax}L"))
  }

  /** Rendezvous (highest-random-weight) shard assignment — the stable
    * routing rule an incremental pipeline uses to decide which worker/
    * store owns a key: shard = argmax over shards of hash(shard | key).
    * The property that matters (and the spec pins): adding a shard moves
    * ONLY the keys whose new argmax IS the new shard (~1/(n+1) of them,
    * each to the new shard); every other key keeps its owner — no
    * cascading reshuffle, unlike `key % n` routing where growing n moves
    * almost everything.
    *
    * Deterministic and oracle-replayable: the FINALIZED portable hash over
    * the literal "shard|key" string — argmax is an order statistic, so the
    * raw polynomial fold is disqualified for exactly the reason
    * [[Sketches.finalizeHash]] documents (same-length strings band into
    * narrow ranges; with the raw fold, two shards won every key of a
    * length class). Ties broken by shard name via the (hash, shard)
    * struct max. Pure row-local column arithmetic — zero exchanges,
    * |shards| hashes per row inside the scan. */
  def rendezvousAssign(df: DataFrame, idCol: String, shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      s"shards must be distinct and non-empty: $shards")
    require(!shards.exists(_.contains("|")), "shard names must not contain '|'")
    val scored = shards.map { sh =>
      struct(
        Sketches.finalizeHash(
          Dedup.portableHash(concat(lit(sh), lit("|"), col(idCol).cast("string")))).as("h"),
        lit(sh).as("shard"))
    }
    df.withColumn("shard", array_max(array(scored: _*)).getField("shard"))
  }
}
