package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pipeline a training-data
  * user actually runs over raw documents, built entirely from the
  * individually-oracle-verified primitives:
  *
  *   1. quality gate ([[TextAnalysis.quality]]): drop documents below
  *      an alphabetic-ratio / token-count floor;
  *   2. exact dedup ([[Dedup.exact]] semantics): keep the lowest doc_id
  *      per normalized-content fingerprint;
  *   3. near-dup removal ([[Dedup.minhashLsh]]): for every LSH pair
  *      above the similarity floor, drop the higher doc_id (greedy
  *      keep-lowest — deterministic, order-free);
  *   4. reproducible split ([[TextAnalysis.hashSplit]]): md5-bucket
  *      train/validation/test assignment.
  *
  * Scale shape: stages 1–2 are one narrow pass + one fingerprint
  * shuffle; stage 3 is the banded LSH join (bounded candidates); stage
  * 4 is narrow. Nothing here collects to the driver, and each stage
  * only shrinks the data.
  */
object Curation {

  def curate(docs: DataFrame, minAlpha: Double = 0.8, minTokens: Int = 25,
             nearDupSim: Double = 0.5): DataFrame = {
    val keep1 = exactKeepers(docs, minAlpha, minTokens)
    val drops = Dedup.minhashLsh(keep1, minEstSim = nearDupSim)
      .select(col("doc_b").as("doc_id")).distinct()
    val keep2 = keep1.join(drops, Seq("doc_id"), "left_anti")

    TextAnalysis.hashSplit(keep2)
      .select("doc_id", "n_tokens", "split")
  }

  /** Stages 1–2 (quality gate + exact dedup) as one frame — factored so
    * [[prefillShared]] derives the IDENTICAL plan `curate` hands to the
    * LSH stage (PlanMemo matches on sameResult; a re-derivation that
    * drifted would fill a parallel entry instead of the one curate
    * reads).
    */
  private def exactKeepers(docs: DataFrame, minAlpha: Double,
                           minTokens: Int): DataFrame = {
    val gated = TextAnalysis.quality(docs)
      .filter(col("alpha_ratio") >= minAlpha && col("n_tokens") >= minTokens)
      .select("doc_id", "n_tokens")
    val plan = docs.join(gated, "doc_id")
      .withColumn("fp", md5(TextAnalysis.normalized(col("text"))))
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keeper"))
      .select("doc_id", "text", "n_tokens")
    // curate consumes this frame twice (the LSH drop derivation and the
    // anti-join stream) — each a full quality+md5 corpus pass uncached.
    // Memoized HERE so curate and prefillShared hand the LSH stage the
    // same frame (and the signature memo one consistent key); size-gated
    // on the doc scan like every corpus-grain memo.
    if (docs.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
      graft.core.PlanMemo.cached("curation.exactKeepers", plan)
    else plan
  }

  /** Cluster-balanced curation (the DataComp/SemDeDup-adjacent recipe):
    * assign every document's embedding to its nearest centroid
    * ([[Similarity.assign]] — zero-shuffle, literal or broadcast
    * centroid path), then keep the `perCell` highest-quality documents
    * PER CELL (alphabetic-ratio desc, doc_id tie-break). Capping per
    * semantic cell instead of globally preserves topic diversity: a
    * global quality top-N would be dominated by whichever cluster
    * happens to score high, starving the tail topics a general model
    * still needs.
    *
    * Scale shape: the assignment is a narrow projection over the
    * embedding scan; the quality frame is a narrow projection over the
    * document scan; one id-grain shuffle joins them; the per-cell cap
    * is a rank-1..perCell window that Spark pre-truncates per partition
    * via WindowGroupLimit (each map task forwards at most perCell rows
    * per cell into the window shuffle) — no cell's full membership ever
    * sorts through one node.
    */
  def clusterBalance(docs: DataFrame, embeddings: DataFrame,
                     centroids: DataFrame, perCell: Int = 20): DataFrame = {
    val assigned = Similarity.assign(embeddings, centroids)
      .select(col("vec_id").as("doc_id"), col("centroid_id"))
    val q = TextAnalysis.quality(docs).select("doc_id", "alpha_ratio")
    val w = Window.partitionBy("centroid_id")
      .orderBy(desc("alpha_ratio"), asc("doc_id"))
    assigned.join(q, "doc_id")
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= perCell)
      // centroid_id rides as long: the literal assign path narrows ids
      // to int, and an int32/int64 output drift is exactly the
      // value-equal hash-unstable class the round-5 DECIMAL rows hit
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("doc_id"), col("alpha_ratio"), col("cell_rank"))
      .orderBy("centroid_id", "cell_rank")
  }

  /** Prototypicality pruning — the SSL-prototypes half of the D4
    * recipe (Tirumala et al., "D4: Improving LLM Pretraining via
    * Document De-Duplication and Diversification"): within each
    * semantic cell, the documents CLOSEST to their centroid are the
    * most redundant — near-duplicates of the cluster's prototype — so
    * the top `dropFrac` fraction by centroid-cosine is marked dropped,
    * keeping the cell's diverse tail. Complements [[clusterBalance]]
    * (which caps cell size by quality): balance bounds topic volume,
    * proto-pruning removes intra-topic redundancy.
    *
    * Scale shape: assignment is the zero-shuffle [[Similarity.assign]]
    * fold; the centroid join-back and per-cell counts are
    * aggregate-sized broadcasts; the only corpus shuffle is the
    * cell-grain rank window. The drop boundary is integer
    * (`rn ≤ floor(dropFrac·n)` — both engines multiply the same IEEE
    * doubles and floor the same value), never a float comparison on a
    * tie-able score.
    */
  def protoPrune(embeddings: DataFrame, centroids: DataFrame,
                 dropFrac: Double = 0.25): DataFrame = {
    val scored = Similarity.assign(embeddings, centroids)
      .join(broadcast(centroids), "centroid_id")
      .select(col("vec_id"), col("centroid_id"),
        Similarity.roundSim(
          Similarity.cosine(col("embedding"), col("cvec"))).as("proto"))
    val counts = scored.groupBy("centroid_id").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("centroid_id")
      .orderBy(desc("proto"), asc("vec_id"))
    scored.join(broadcast(counts), "centroid_id")
      .withColumn("cell_rank", row_number().over(w))
      .select(col("vec_id"),
        // long for the same int32/int64 hash-drift reason as
        // clusterBalance
        col("centroid_id").cast("long").as("centroid_id"),
        col("proto"), col("cell_rank"),
        (col("cell_rank") <=
          floor(lit(dropFrac) * col("n")).cast("long")).as("dropped"))
      .orderBy("vec_id")
  }

  /** Per-source quality pruning — the FineWeb-style selection shape:
    * within each source (domain), keep the top `keepFrac` fraction by
    * quality score rather than applying one global threshold (a global
    * cut lets a high-scoring domain crowd out every document of a
    * lower-scoring but valuable one; per-domain ranking preserves
    * coverage). Score here is the alphabetic ratio ([[TextAnalysis
    * .quality]]'s `alpha_ratio`, computed inline — same expression, no
    * wide join); the keep boundary is the integer
    * `rank ≤ floor(keepFrac·n_source)` — the [[protoPrune]] tie
    * discipline, a score tie can never flip a keep decision
    * cross-engine.
    *
    * Scale: per-source counts are aggregate-sized (broadcast back);
    * the one corpus shuffle is the source-grain rank window. An empty
    * text yields a NULL score and sorts last on both engines (DESC →
    * nulls last in Spark and DuckDB alike), i.e. prunes first.
    */
  def qualityPrune(docs: DataFrame, keepFrac: Double = 0.5): DataFrame = {
    val nChars = nullif(length(col("text")), lit(0))
    val scored = docs.select(col("doc_id"), col("source"),
      (length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
        nChars).as("alpha_ratio"))
    val counts = scored.groupBy("source").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("source")
      .orderBy(desc("alpha_ratio"), asc("doc_id"))
    scored.join(broadcast(counts), "source")
      .withColumn("src_rank", row_number().over(w))
      .select(col("doc_id"), col("source"), col("alpha_ratio"),
        col("src_rank"),
        (col("src_rank") <=
          floor(lit(keepFrac) * col("n")).cast("long")).as("kept"))
  }

  /** Bench cold-attribution hook (the __sqllab_fill pattern):
    * materialize the memoized minhash-signature frame stage 3 reads, so
    * a cold `curate` pays its own join/split work, not the shared cache
    * fill.
    */
  def prefillShared(docs: DataFrame, minAlpha: Double = 0.8,
                    minTokens: Int = 25): Unit =
    Dedup.prefillSignatures(exactKeepers(docs, minAlpha, minTokens))
}
