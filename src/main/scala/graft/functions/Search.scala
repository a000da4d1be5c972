package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Keyword search over a document corpus: BM25 ranking on an
  * inverted-index shape (reference analogue: the SQL-lab's ranked
  * reporting queries; the ranking function itself is the Robertson/
  * Spärck Jones BM25 used by Lucene/Elasticsearch — public algebra).
  *
  * Scale shape: one tokenize+explode pass, the postings list is filtered
  * to the query's terms BEFORE any shuffle (a query has a handful of
  * terms — the filter drops ~|vocab|/|Q| of the exploded rows at the
  * scan), per-term document frequencies are an aggregate over the
  * filtered postings, and the final ranking is a TakeOrderedAndProject
  * of per-doc sums. Corpus-level scalars (N, total token count) ride a
  * 1-row broadcast ([[graft.core.Scalars.crossBroadcast]]). Nothing in
  * the plan is proportional to vocabulary size.
  *
  * Determinism: the BM25 partial for each (doc, term) is computed in
  * IEEE doubles with an identical expression tree on both engines, then
  * rounded through decimal space at 9 dp and SUMMED AS DECIMAL — decimal
  * addition is exact and order-independent, so per-doc scores are
  * bit-identical regardless of aggregation order (the Money lesson; a
  * double sum would be partition-order-sensitive). The idf log is
  * rounded the same way first (the tfIdf libm precedent).
  */
object Search {

  private val Dec = DecimalType(20, 12)
  private def round9(c: Column): Column = round(c.cast(Dec), 9).cast("double")

  /** BM25 top-k documents for a bag of query terms.
    *
    * score(d, Q) = Σ_{t ∈ Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the always-positive
    * Lucene form). `avgdl` enters as |d|·N/Σ|d| — exact-integer inputs to
    * one double expression, no separately-rounded average.
    *
    * Emits (doc_id, n_hit, score) for the k best, score-desc with doc_id
    * tie-break; documents matching no query term never leave the scan.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val terms = queryTerms.distinct
    // postings come off the SHARED type-grain memo (docTokenCounts —
    // per-(doc, token) counts ARE the tf), filtered to the query terms
    // in ONE pass; df is a token-partitioned window over those postings
    // (postings grain, distributed) instead of a broadcast whose
    // subtree re-ran the filter pass. Doc lengths are memoized at doc
    // grain — their aggregate (the corpus scalars) reads the cache, so
    // a bm25 call costs one postings pass, not four corpus passes.
    val dtc = TextAnalysis.docTokenCounts(docs)
    val dlenPlan = dtc.groupBy("doc_id").agg(sum("n").as("dlen"))
    val dlen =
      if (docs.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
        graft.core.PlanMemo.cached("text.docLengths", dlenPlan)
      else dlenPlan
    val tf = dtc.filter(col("token").isin(terms: _*))
      .select(col("doc_id"), col("token"), col("n").as("tf"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("token")))
    val scalars = dlen.agg(
      count(lit(1)).as("n_docs"), sum("dlen").as("tot_len"))
    val idf = round9(log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5))))
    val part = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dlen") * col("n_docs") / col("tot_len")))
    graft.core.Scalars.crossBroadcast(
      tf.join(dlen, "doc_id"), scalars)
      .select(col("doc_id"),
        round9(part).cast(DecimalType(20, 9)).as("part"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"),
        sum("part").cast("double").as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Exact phrase search over a POSITIONAL inverted index — the
    * retrieval feature bag-of-words scoring ([[bm25TopK]]) and cosine
    * ANN cannot express: "these tokens, adjacent, in this order".
    *
    * Postings carry (doc_id, position) and are filtered to the
    * phrase's terms BEFORE any shuffle (the BM25 discipline); the
    * phrase then matches by chaining doc_id-co-keyed self-joins with
    * `pos_{i+1} = pos_i + 1` — L−1 equi-joins for an L-term phrase,
    * every frame bounded by the rarest term's postings list, never the
    * corpus. Emits (doc_id, n_occurrences) per matching document.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "phraseSearch: need at least two terms")
    // no pre-shuffle: the narrow explode+filter shrinks the corpus to
    // the phrase terms' postings, and the anchor equi-joins' own hash
    // exchanges distribute THOSE — repartitioning the raw text first
    // (the bm25 shape, which needs every token for doc lengths) would
    // move full documents for nothing
    val tok = docs
      .select(col("doc_id"), posexplode(
        split(TextAnalysis.normalized(col("text")), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("token"))
      .filter(col("token").isin(phrase.distinct: _*))
    def postings(term: String, i: Int) = tok
      .filter(col("token") === term)
      .select(col("doc_id"), (col("pos") - i).as("anchor"))
    val matches = phrase.zipWithIndex
      .map { case (t, i) => postings(t, i) }
      .reduce(_.join(_, Seq("doc_id", "anchor")))
    matches.groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy("doc_id")
  }

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al., RRF) of
    * the [[bm25TopK]] lexical ranking and the brute cosine vector
    * ranking ([[Similarity.bruteTopK]]) — the standard fusion modern
    * RAG serving stacks run, robust to the two scores living on
    * incomparable scales because only RANKS enter the fused score:
    * `rrf(d) = Σ_r 1/(kRrf + rank_r(d))` over the rankings that
    * retrieved d (a full-outer join — a doc found by one retriever
    * still scores).
    *
    * Scale shape: each retriever produces its own kCand-row candidate
    * frame (both are TakeOrderedAndProject tails over distributed
    * scans); everything after — the rank windows, the outer join, the
    * fused sort — runs over ≤ 2·kCand rows, so the single-partition
    * windows are by-contract tiny. Ranks are integers and 1/(kRrf+rank)
    * is a deterministic double; the sum of two such terms is rounded
    * through decimal at 9 dp for cross-engine hash stability.
    */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String], query: DataFrame, k: Int = 10,
                kCand: Int = 50, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, queryTerms, kCand)
      .select(col("doc_id").as("id"),
        row_number().over(Window.orderBy(desc("score"), asc("doc_id")))
          .as("lex_rank"))
    val vec = Similarity.bruteTopK(embeddings, query, kCand)
      .select(col("vec_id").as("id"),
        row_number().over(Window.orderBy(desc("sim"), asc("vec_id")))
          .as("vec_rank"))
    lex.join(vec, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"), col("lex_rank"), col("vec_rank"),
        round((coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("vec_rank")), lit(0.0)))
          .cast(Dec), 9).cast("double").as("rrf_score"))
      .orderBy(desc("rrf_score"), asc("doc_id"))
      .limit(k)
  }
}
